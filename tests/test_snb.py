"""Sorted-neighborhood blocking (operators/snb.py): exact agreement
with a brute-force sorted-window twin, multi-pass canonicalization,
and the distributed-rank plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.operators.snb import (
    global_rank,
    multipass_sorted_neighborhood,
    sorted_neighborhood_pairs,
)


def _brute_pairs(rows: list[tuple[int, str]], window: int) -> set[tuple[int, int]]:
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    return {
        (order[i], order[j])
        for i in range(len(order))
        for j in range(i + 1, min(i + window, len(order)))
    }


def test_global_rank_is_exact_sort_rank(spark):
    rnd = random.Random(7)
    rows = [(i, "".join(rnd.choices("abc", k=4))) for i in range(200)]
    df = spark.createDataFrame(rows, "id: long, k: string")
    got = {
        r.id: r.rank
        for r in global_rank(df, "k", "id", num_buckets=5).collect()
    }
    expect = {
        rid: rank
        for rank, (rid, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    assert got == expect


def test_pairs_match_brute_force_window(spark):
    rnd = random.Random(13)
    # duplicated keys on purpose: id tiebreak must keep ranks unique
    rows = [(i, "".join(rnd.choices("ab", k=3))) for i in range(150)]
    df = spark.createDataFrame(rows, "id: long, k: string")
    for window in (2, 4):
        got = {
            (r.id_a, r.id_b)
            for r in sorted_neighborhood_pairs(
                df, "id", F.col("k"), window, num_buckets=4
            ).collect()
        }
        assert got == _brute_pairs(rows, window)


def test_empty_and_null_keys_dropped(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, ""), (3, None), (4, "a")], "id: long, k: string"
    )
    got = sorted_neighborhood_pairs(df, "id", F.col("k"), 4).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(4, 1)}


def test_multipass_canonical_pairs_and_pass_names(spark):
    # pass "fwd" sorts 1,2,3; pass "rev" sorts 3,2,1 — window 2 pairs
    # neighbors: fwd {(1,2),(2,3)}, rev {(3,2),(2,1)} -> canonicalized
    # both passes agree on both pairs
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id: long, k: string")
    got = {
        (r.id_a, r.id_b): r.passes
        for r in multipass_sorted_neighborhood(
            df, "id", {"fwd": F.col("k"), "rev": F.reverse(F.col("k"))}, 2
        ).collect()
    }
    assert got == {(1, 2): "fwd,rev", (2, 3): "fwd,rev"}


def test_rank_plan_has_no_global_row_stream_window(spark):
    """The rank must come from the two-level prefix sum: the only
    unpartitioned window runs over the O(n_buckets) totals, and the
    offsets re-attach via broadcast — never a single-partition sort of
    the row stream."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = sorted_neighborhood_pairs(
        docs, "doc_id", F.substring("text", 1, 20), 5
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # full-stream window is partitioned by the range bucket
    assert "__bkt" in plan
