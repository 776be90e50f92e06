"""Dedup family + ANN operators over the driver's flat documents /
embeddings tables (sf0.001)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.operators.dedup import (
    embedding_near_duplicates,
    exact_duplicates,
    fingerprint_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from entity_linking_in_biomedical_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_duplicates_synthetic(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "unique text"), (4, "a b c")],
        "doc_id bigint, text string",
    )
    got = exact_duplicates(df).collect()
    assert len(got) == 1
    assert got[0]["dup_count"] == 3
    assert got[0]["doc_ids"] == ["1", "2", "4"]


def test_fingerprint_catches_reorder(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "sat the CAT!"), (3, "a dog ran")],
        "doc_id bigint, text string",
    )
    got = fingerprint_duplicates(df).collect()
    assert len(got) == 1 and got[0]["doc_ids"] == ["1", "2"]


def test_minhash_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("lazy", "sleepy")
    far = "completely different content about spark dataframes and shuffles here"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id bigint, text string"
    )
    got = minhash_near_duplicates(df, jaccard_threshold=0.5)
    rows = got.collect()
    assert [(r["a_id"], r["b_id"]) for r in rows] == [("1", "2")]
    assert 0.5 <= rows[0]["jaccard"] <= 1.0


def test_ngram_jaccard_pairs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, "nothing shared at all whatsoever")],
        "doc_id bigint, text string",
    )
    rows = ngram_jaccard_pairs(df, jaccard_threshold=0.4).collect()
    assert [(r["a_id"], r["b_id"]) for r in rows] == [("1", "2")]


def test_simhash_near_duplicates(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # identical -> hamming 0, must be found
            (3, "spark catalyst tungsten arrow pandas codegen shuffle"),
        ],
        "doc_id bigint, text string",
    )
    rows = simhash_near_duplicates(df).collect()
    found = {(r["a_id"], r["b_id"]): r["hamming"] for r in rows}
    assert found.get(("1", "2")) == 0
    # contract: every reported pair respects the threshold; unrelated
    # docs (3) never pair with 1/2
    assert all(h <= 3 for h in found.values())
    assert all("3" not in p for p in found)


def test_simhash_pigeonhole_blocks(spark):
    """Pairs within the hamming threshold share >=1 exact 15-bit block
    (the lossless-blocking property the operator relies on)."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
            "kilo lima mike november oscar papa quebec romeo sierra tango") * 3
    df = spark.createDataFrame([(1, base), (2, base + " uniform")], "doc_id bigint, text string")
    from entity_linking_in_biomedical_spark.functions.text_metrics import simhash64

    a, b = [r[0] for r in df.select(simhash64("text")).collect()]
    hamming = bin(a ^ b).count("1")
    if hamming <= 3:
        shared = any(
            ((a >> (k * 15)) & 0x7FFF) == ((b >> (k * 15)) & 0x7FFF) for k in range(4)
        )
        assert shared


def test_brute_force_topk_self_is_nearest(spark, emb):
    db = emb.limit(200)
    queries = db.limit(5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = brute_force_topk(queries, db, k=3)
    top1 = {r["q_id"]: r["vec_id"] for r in got.filter("rank = 1").collect()}
    assert all(str(q) == str(v) or True for q, v in top1.items())
    # the query vector itself must rank first with cosine ~1
    for r in got.filter("rank = 1").collect():
        assert r["cosine"] == pytest.approx(1.0, abs=1e-4)
        assert r["q_id"] == r["vec_id"]


def test_lsh_topk_subset_of_bucket(spark, emb):
    db = emb.limit(300)
    queries = db.limit(4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = lsh_topk(queries, db, k=5, n_planes=4)
    # self always lands in its own bucket -> rank 1 with cosine ~1
    for r in got.filter("rank = 1").collect():
        assert r["q_id"] == r["vec_id"]
        assert r["cosine"] == pytest.approx(1.0, abs=1e-4)


def test_embedding_near_duplicates(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.04, 0.0]),  # near-dup of 1
            (3, [0.0, 1.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    rows = embedding_near_duplicates(df, cosine_threshold=0.95, n_planes=4).collect()
    assert [(r["a_id"], r["b_id"]) for r in rows] == [("1", "2")]
