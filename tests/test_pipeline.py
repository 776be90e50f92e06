"""End-to-end pipeline tests: oracle equality, ground-truth F1,
span-sequence invariant, determinism across parallelism levels.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.plans.pipeline import PipelineConfig, run_pipeline
from tests.oracle_impl import run_oracle


@pytest.fixture(scope="module")
def pipeline_result(spark, corpus):
    docs, ents, labels, abbr, split = corpus.to_spark(spark)
    emb = corpus.embeddings_df(spark)
    return run_pipeline(spark, docs, ents, embeddings=emb, abbr_map=abbr)


def clusters_from_spark(pipeline_result) -> dict:
    rows = pipeline_result["mention_clusters"].collect()
    return {(r["doc_id"], r["span_seq"]): r["cluster_id"] for r in rows}


def pairwise_f1(pred: dict, gold: dict) -> float:
    keys = sorted(set(pred) & set(gold))
    tp = fp = fn = 0
    for a, b in itertools.combinations(keys, 2):
        p = pred[a] == pred[b]
        g = gold[a] == gold[b]
        tp += p and g
        fp += p and not g
        fn += g and not p
    if tp == 0:
        return 0.0
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    return 2 * prec * rec / (prec + rec)


def test_matches_pandas_oracle_exactly(spark, corpus, pipeline_result):
    """The Spark pipeline and the single-node oracle implement the same
    math — the clustering partitions must be identical (F1 == 1.0)."""
    got = clusters_from_spark(pipeline_result)
    want = run_oracle(corpus)
    assert set(got) == set(want), "surviving mention sets differ"
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, f"{len(mismatches)} cluster mismatches, e.g. {list(mismatches.items())[:5]}"


def test_ground_truth_f1(spark, corpus, pipeline_result):
    """North rule: pairwise F1 >= 0.99 on labeled pairs (surviving,
    linkable mentions)."""
    got = clusters_from_spark(pipeline_result)
    gold = {
        (l["doc_id"], l["span_seq"]): l["cluster_id"]
        for l in corpus.labels
        if (l["doc_id"], l["span_seq"]) in got
    }
    f1 = pairwise_f1(got, gold)
    assert f1 >= 0.99, f"pairwise F1 {f1:.4f} < 0.99"


def test_span_sequence_invariant(spark, corpus, pipeline_result):
    """Per-row invariant: output (kind, text, media_ref, order) sequence
    equals the input for every doc_id."""
    docs, *_ = corpus.to_spark(spark)
    out = pipeline_result["linked_documents"]
    seq = lambda df: df.select(
        "doc_id",
        F.transform("spans", lambda s: F.struct(s["kind"], s["text"], s["media_ref"])).alias("sq"),
    )
    diff = seq(out).exceptAll(seq(docs))
    assert diff.count() == 0
    assert out.count() == docs.count()


def test_nil_mentions_get_nil_clusters(pipeline_result):
    rows = pipeline_result["mention_clusters"].filter(
        F.col("norm").startswith("zz")
    ).collect()
    assert rows, "synthetic corpus should contain NIL mentions"
    assert all(r["cluster_id"].startswith("NIL_") for r in rows)


def test_cluster_is_partition(pipeline_result):
    """No mention in two clusters; every surviving mention has one."""
    mc = pipeline_result["mention_clusters"]
    assert mc.filter(F.col("cluster_id").isNull()).count() == 0
    assert (
        mc.groupBy("doc_id", "span_seq").count().filter(F.col("count") > 1).count() == 0
    )


def test_determinism_across_parallelism(spark, corpus):
    """Same clusters at different shuffle-partition counts (local[2]-vs-
    local[8] analogue within one session)."""
    docs, ents, _, abbr, _ = corpus.to_spark(spark)
    emb = corpus.embeddings_df(spark)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        r2 = clusters_from_spark(run_pipeline(spark, docs, ents, embeddings=emb, abbr_map=abbr))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        r13 = clusters_from_spark(run_pipeline(spark, docs, ents, embeddings=emb, abbr_map=abbr))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert r2 == r13
