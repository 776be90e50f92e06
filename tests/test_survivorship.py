"""Attribute-level survivorship (golden records)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.operators.survivorship import golden_records


def _df(spark):
    rows = [
        ("c1", 1, "BUILDING", 10.0, "addr-a", None),
        ("c1", 2, "AUTO", 30.0, "addr-bbbb", "ph2"),
        ("c1", 3, "AUTO", 20.0, "addr-cccc", "ph3"),
        ("c2", 4, "HOUSE", 5.0, "x", None),
        ("c3", 5, None, None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "cluster_id string, k int, seg string, bal double, addr string, phone string",
    )


RULES = {
    "best_bal": ("max", "bal"),
    "addr": ("longest", "addr"),
    "phone": ("first", "phone", "k"),
    "seg": ("most_frequent", "seg"),
}


def test_golden_records_rules(spark):
    got = {r["cluster_id"]: r.asDict() for r in golden_records(_df(spark), RULES).collect()}
    c1 = got["c1"]
    assert c1["n_members"] == 3 and c1["best_bal"] == 30.0
    # longest ties (addr-bbbb vs addr-cccc, both 9 chars) break to the
    # lexicographically largest value
    assert c1["addr"] == "addr-cccc"
    # 'first' skips the NULL phone at k=1: priority goes to k=2
    assert c1["phone"] == "ph2"
    assert c1["seg"] == "AUTO"
    # singleton cluster: its own values survive
    assert got["c2"]["seg"] == "HOUSE" and got["c2"]["phone"] is None
    # all-NULL cluster: every merged attribute is NULL, count still 1
    c3 = got["c3"]
    assert c3["n_members"] == 1
    assert c3["best_bal"] is None and c3["addr"] is None and c3["seg"] is None


def test_most_frequent_tie_breaks_to_smallest_value(spark):
    df = spark.createDataFrame(
        [("c", "B"), ("c", "B"), ("c", "A"), ("c", "A")],
        "cluster_id string, seg string",
    )
    out = golden_records(df, {"seg": ("most_frequent", "seg")}).collect()
    assert out[0]["seg"] == "A"


def test_first_all_null_yields_null(spark):
    df = spark.createDataFrame(
        [("c", 1, None), ("c", 2, None)], "cluster_id string, k int, v string"
    )
    out = golden_records(df, {"v": ("first", "v", "k")}).collect()
    assert out[0]["v"] is None


def test_direct_rules_single_shuffle(spark):
    """Every non-modal rule folds into ONE partial-aggregable groupBy:
    exactly one Exchange in the plan, no window, no join."""
    from io import StringIO
    from contextlib import redirect_stdout

    out = golden_records(
        _df(spark),
        {
            "best_bal": ("max", "bal"),
            "addr": ("longest", "addr"),
            "phone": ("first", "phone", "k"),
        },
    )
    buf = StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # formatted explain prints each node twice (tree + details): count
    # the detail headers, which are unambiguous
    import re

    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "Window" not in plan and "Join" not in plan
    # ...and the map-side partial aggregate runs before the exchange
    assert "partial_max" in plan


def test_golden_records_matches_pandas(spark):
    """Randomized differential against a pandas twin."""
    import random

    rng = random.Random(7)
    rows = [
        (
            f"c{rng.randrange(6)}",
            i,
            rng.choice(["A", "B", "C", None]),
            float(rng.randrange(100)),
            "a" * rng.randrange(1, 6) + str(rng.randrange(4)),
            rng.choice([None, f"p{rng.randrange(5)}"]),
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows,
        "cluster_id string, k int, seg string, bal double, addr string, phone string",
    )
    got = {r["cluster_id"]: r.asDict() for r in golden_records(df, RULES).collect()}
    import collections

    by_c = collections.defaultdict(list)
    for r in rows:
        by_c[r[0]].append(r)
    for cid, members in by_c.items():
        g = got[cid]
        assert g["n_members"] == len(members)
        assert g["best_bal"] == max(m[3] for m in members)
        assert g["addr"] == max(
            (m[4] for m in members if m[4] is not None),
            key=lambda v: (len(v), v),
        )
        nn = [m for m in members if m[5] is not None]
        assert g["phone"] == (min(nn, key=lambda m: m[1])[5] if nn else None)
        segs = [m[2] for m in members if m[2] is not None]
        if segs:
            cnt = collections.Counter(segs)
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            assert g["seg"] == best
        else:
            assert g["seg"] is None


def test_unknown_rule_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown survivorship rule"):
        golden_records(_df(spark), {"x": ("median", "bal")}).collect()


def test_refresh_golden_records_equals_full_recompute(spark):
    from entity_linking_in_biomedical_spark.operators.survivorship import (
        refresh_golden_records,
    )

    old_records = _df(spark)
    old_golden = golden_records(old_records, RULES)
    # new snapshot: c1 gains a member, c2 vanishes (member moved to c1),
    # c4 appears, c3 untouched
    rows = [
        ("c1", 1, "BUILDING", 10.0, "addr-a", None),
        ("c1", 2, "AUTO", 30.0, "addr-bbbb", "ph2"),
        ("c1", 3, "AUTO", 20.0, "addr-cccc", "ph3"),
        ("c1", 4, "HOUSE", 99.0, "x-long-addr", "ph4"),
        ("c3", 5, None, None, None, None),
        ("c4", 6, "NEW", 7.0, "n", "ph6"),
    ]
    new_records = spark.createDataFrame(
        rows,
        "cluster_id string, k int, seg string, bal double, addr string, phone string",
    )
    touched = spark.createDataFrame([("c1",), ("c2",), ("c4",)], "cluster_id string")
    got = refresh_golden_records(new_records, old_golden, touched, RULES)
    want = golden_records(new_records, RULES)
    key = lambda r: r["cluster_id"]  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, want.collect()), key=lambda t: t[0]
    )
    # c3 was carried, not recomputed: present exactly once
    assert [r for r in got.collect() if r["cluster_id"] == "c3"]


def test_refresh_golden_records_schema_mismatch_raises(spark):
    import pytest

    from entity_linking_in_biomedical_spark.operators.survivorship import (
        refresh_golden_records,
    )

    recs = _df(spark)
    bad_old = golden_records(recs, RULES).drop("seg")
    touched = spark.createDataFrame([("c1",)], "cluster_id string")
    with pytest.raises(ValueError, match="schema"):
        refresh_golden_records(recs, bad_old, touched, RULES)
