"""Resumability: per-stage manifests skip committed stages; a killed
stage recomputes; final output identical."""

from __future__ import annotations

import json
import os
import shutil

from entity_linking_in_biomedical_spark.plans.pipeline import run_pipeline
from entity_linking_in_biomedical_spark.plans.resume import StageStore, stage_signature


def clusters(res) -> dict:
    return {
        (r["doc_id"], r["span_seq"]): r["cluster_id"]
        for r in res["mention_clusters"].collect()
    }


def test_stage_store_roundtrip(spark, tmp_path):
    store = StageStore(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    sig = stage_signature("s1", {"p": 1}, [])
    out = store.commit("s1", sig, df)
    assert out.count() == 2
    assert store.committed("s1", sig)
    assert not store.committed("s1", stage_signature("s1", {"p": 2}, []))
    m = json.load(open(tmp_path / "s1" / "_MANIFEST.json"))
    assert m["rows"] == 2 and sum(m["partition_rows"].values()) == 2


def test_corrupt_manifest_treated_as_uncommitted(spark, tmp_path):
    """A truncated/corrupt _MANIFEST.json (external tampering, partial
    copy of a user-supplied out_dir) must read as NOT committed — the
    stage recomputes instead of the pipeline crashing — and load() must
    degrade to a plain parquet read of whatever data exists."""
    store = StageStore(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    sig = stage_signature("s1", {"p": 1}, [])
    store.commit("s1", sig, df)
    assert store.committed("s1", sig)

    mpath = tmp_path / "s1" / "_MANIFEST.json"
    mpath.write_text('{"signature": "tru')  # truncated mid-write
    assert not store.committed("s1", sig)
    assert store.load("s1").count() == 2  # data files still readable


def test_pipeline_resume_identical_and_skips(spark, corpus, tmp_path):
    docs, ents, _, abbr, _ = corpus.to_spark(spark)
    emb = corpus.embeddings_df(spark)
    out_dir = str(tmp_path / "run")

    r1 = run_pipeline(spark, docs, ents, embeddings=emb, abbr_map=abbr, out_dir=out_dir)
    c1 = clusters(r1)
    # simulate a crash after stage-2 commit: wipe downstream stages
    for stage in ("me_scores", "mm_scores", "assignments"):
        shutil.rmtree(os.path.join(out_dir, stage), ignore_errors=True)

    r2 = run_pipeline(spark, docs, ents, embeddings=emb, abbr_map=abbr, out_dir=out_dir)
    c2 = clusters(r2)
    assert c1 == c2
    resumed = [m["stage"] for m in r2["metrics"] if m.get("resumed")]
    assert "mentions" in resumed and "candidates" in resumed
    recomputed = [m["stage"] for m in r2["metrics"] if not m.get("resumed")]
    assert "me_scores" in recomputed and "assignments" in recomputed


def test_pipeline_stage_snapshots_join_exchange_free(spark, corpus, tmp_path):
    """The stage sinks bucket on the re-join key: a resumed run joins
    the committed ``candidates``/``mentions`` snapshots on ``norm`` with
    NO Exchange on either side — the write-time shuffle amortized."""
    from entity_linking_in_biomedical_spark.plans.resume import make_stage_store
    from entity_linking_in_biomedical_spark.sources.bucketed import (
        join_is_exchange_free,
    )

    docs, ents, _, abbr, _ = corpus.to_spark(spark)
    out_dir = str(tmp_path / "run")
    run_pipeline(spark, docs, ents, abbr_map=abbr, out_dir=out_dir)

    store = make_stage_store(spark, out_dir)
    cands = store.load("candidates")
    mentions_by_norm = store.load("mentions")
    assert join_is_exchange_free(cands, mentions_by_norm, ["norm"])

    # the manifest carries the layout for fresh-session re-registration
    m = json.load(open(os.path.join(out_dir, "candidates", "_MANIFEST.json")))
    assert m["bucket"]["keys"] == ["norm"]
    assert m["bucket"]["n_buckets"] == store.n_buckets

    # fresh-catalog path: drop the catalog entries (files are external →
    # survive), reload — register_bucketed re-attaches the layout from
    # the manifest DDL and the join still plans shuffle-free
    for stage in ("candidates", "mentions"):
        spark.sql(f"drop table if exists {store._catalog_table(stage)}")
    assert join_is_exchange_free(
        store.load("candidates"), store.load("mentions"), ["norm"]
    )

    # windowed top-k over the bucketed me_scores needs no Exchange either
    # (the assignments stage's per-surface argmax on a resumed run)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    me = store.load("me_scores")
    w = Window.partitionBy("a_norm").orderBy(F.desc("score"))
    plan = (
        me.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_config_change_invalidates(spark, corpus, tmp_path):
    from entity_linking_in_biomedical_spark.plans.pipeline import PipelineConfig
    from entity_linking_in_biomedical_spark.operators.scoring import ScoringConfig

    docs, ents, _, abbr, _ = corpus.to_spark(spark)
    out_dir = str(tmp_path / "run")
    run_pipeline(spark, docs, ents, abbr_map=abbr, out_dir=out_dir)
    r = run_pipeline(
        spark,
        docs,
        ents,
        abbr_map=abbr,
        out_dir=out_dir,
        cfg=PipelineConfig(scoring=ScoringConfig(threshold=0.6)),
    )
    # different params -> different signatures -> nothing resumed
    assert not any(m.get("resumed") for m in r["metrics"])
