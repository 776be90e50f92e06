"""Incremental ER (plans/incremental_er.py): linking a corpus in
snapshots composes to the batch result on the synthetic corpus, and
the merged state keeps its invariants across snapshot folds."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.plans.incremental_er import (
    link_snapshot,
    relabel_mentions,
)
from entity_linking_in_biomedical_spark.plans.pipeline import run_pipeline
from entity_linking_in_biomedical_spark.sources.synthetic import synth_corpus


def _mc(df):
    return {
        (r["doc_id"], r["span_seq"]): r["cluster_id"] for r in df.collect()
    }


def test_two_snapshots_match_full_batch(spark):
    """Parity-split the synthetic corpus, link snapshot A then fold
    snapshot B in: every mention's merged cluster label equals the
    full-batch run's."""
    corpus = synth_corpus(n_docs=36, n_entities=18, seed=7)
    docs, ents, _, abbr, _ = corpus.to_spark(spark)
    emb = corpus.embeddings_df(spark)
    full = _mc(
        run_pipeline(spark, docs, ents, embeddings=emb, abbr_map=abbr)[
            "mention_clusters"
        ]
    )

    half = F.abs(F.hash("doc_id")) % 2 == 0
    r1 = link_snapshot(
        spark, docs.filter(half), ents, None, embeddings=emb, abbr_map=abbr
    )
    state = r1["assignments"].localCheckpoint()
    r2 = link_snapshot(
        spark, docs.filter(~half), ents, state, embeddings=emb, abbr_map=abbr
    )
    merged = r2["assignments"].localCheckpoint()

    inc = _mc(relabel_mentions(r1["mentions"], merged))
    inc.update(_mc(relabel_mentions(r2["mentions"], merged)))
    assert inc == full
    assert r2["merge_iterations"] >= 1

    # state invariants: one row per node, re-occurring surfaces not
    # duplicated by the fold
    rows = merged.groupBy("node").count().filter(F.col("count") > 1).count()
    assert rows == 0
    # every snapshot node is present in the merged state
    n_nodes = (
        r1["assignments"]
        .select("node")
        .unionByName(r2["assignments"].select("node"))
        .distinct()
        .count()
    )
    assert merged.count() >= n_nodes


def test_first_snapshot_none_equals_batch(spark):
    """prior_assignments=None: the first snapshot's merged state IS the
    batch clustering of that snapshot."""
    corpus = synth_corpus(n_docs=12, n_entities=6, seed=3)
    docs, ents, _, abbr, _ = corpus.to_spark(spark)
    res = link_snapshot(spark, docs, ents, None, abbr_map=abbr)
    batch = run_pipeline(spark, docs, ents, abbr_map=abbr)
    got = {
        r["node"]: r["cluster_id"] for r in res["assignments"].collect()
    }
    want = {
        r["node"]: r["cluster_id"]
        for r in batch["assignments"].select("node", "cluster_id").collect()
    }
    assert got == want
    assert _mc(res["mention_clusters"]) == _mc(batch["mention_clusters"])
