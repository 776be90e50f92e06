"""Distributed BPE merge learning (operators/bpe.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.operators.bpe import (
    apply_merge,
    bpe_fit,
    word_freq,
)


def test_apply_merge_nonoverlapping_left_to_right(spark):
    """The lookaround replace-all must merge every leftmost
    non-overlapping occurrence — including same-symbol runs, where a
    boundary-consuming replace would miss alternate matches."""
    rows = [
        (" a a a a ", " aa aa "),  # two merges, not one
        (" a a a ", " aa a "),  # greedy leftmost: one merge
        (" x a b ", " x a b "),  # pair (a,a): untouched
        (" a ", " a "),
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "seq string")
    got = [
        r["m"] for r in df.select(apply_merge(F.col("seq"), "a", "a").alias("m")).collect()
    ]
    assert got == [want for _, want in rows]

    with pytest.raises(ValueError):
        apply_merge(F.col("seq"), "a(", "b")


def test_bpe_fit_hand_checked_merges(spark):
    # 'abab' x3 + 'ab' x2: pair (a,b) count 3*2+2 = 8 dominates; after
    # merging, (ab,ab) count 3 beats (b,a) count 3 on the pair
    # tie-break ('ab ab' < 'b a' lexicographically)
    docs = spark.createDataFrame(
        [(1, "abab abab abab ab ab")], "doc_id int, text string"
    )
    got = bpe_fit(docs, merges=2)
    assert got[0] == (1, "a b", "ab", 8)
    assert got[1] == (2, "ab ab", "abab", 3)

    with pytest.raises(ValueError):
        bpe_fit(docs, merges=0)
    # vocabulary exhausts once everything is one symbol
    with pytest.raises(ValueError, match="exhausted"):
        bpe_fit(spark.createDataFrame([(1, "ab ab")], "doc_id int, text string"), merges=2)


def test_bpe_fit_partition_invariant(spark):
    rows = [(i, f"token{i % 7} alpha beta{i % 3} gamma delta") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = bpe_fit(df, merges=3)
    b = bpe_fit(df.repartition(9), merges=3)
    assert a == b
    # sanity: word_freq weighted the stats (every doc contributes)
    assert word_freq(df).count() > 10


def test_bpe_encode_pieces_hand_checked(spark):
    from entity_linking_in_biomedical_spark.operators.bpe import bpe_encode_pieces

    docs = spark.createDataFrame(
        [(1, "abab abab abab ab ab"), (2, "ba abba"), (3, "")],
        "doc_id int, text string",
    )
    merges = bpe_fit(docs, merges=2)
    assert [m[2] for m in merges] == ["ab", "abab"]
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_pieces"])
        for r in bpe_encode_pieces(docs, merges).collect()
    }
    # abab -> 'abab' (1 piece), ab -> 'ab' (1); ba -> 'b a' (2),
    # abba -> 'ab b a' (3); empty doc drops out
    assert got == {1: (5, 5), 2: (2, 5)}
