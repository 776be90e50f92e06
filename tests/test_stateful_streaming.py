"""Stateful streaming dedup: keyed state across micro-batches AND
across query restarts (checkpoint-restored state)."""

from __future__ import annotations

import pandas as pd

from entity_linking_in_biomedical_spark.streaming.stateful import (
    streaming_exact_dedup,
)

SCHEMA = "doc_id bigint, text string"


def _run_batch(spark, src_dir, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir).toPandas()


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    # micro-batch 1: two distinct texts, one in-batch duplicate
    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")], SCHEMA
    )
    b1.write.mode("append").parquet(src)
    out1 = _run_batch(spark, src, ckpt, str(tmp_path / "out"))
    got1 = {r.doc_id: r.is_duplicate for r in out1.itertuples()}
    assert got1 == {"1": False, "2": False, "3": True}

    # micro-batch 2 in a NEW query (restart): duplicates of batch-1 docs
    # must be flagged — only possible if state was restored from the
    # checkpoint, not recomputed from this batch
    b2 = spark.createDataFrame(
        [(4, "alpha text"), (5, "gamma text"), (6, "beta text")], SCHEMA
    )
    b2.write.mode("append").parquet(src)
    out2 = _run_batch(spark, src, ckpt, str(tmp_path / "out"))
    new = out2[out2.doc_id.isin({"4", "5", "6"})]
    got2 = {r.doc_id: r.is_duplicate for r in new.itertuples()}
    assert got2 == {"4": True, "5": False, "6": True}


def test_streaming_dedup_output_schema(spark, tmp_path):
    src = str(tmp_path / "one")
    spark.createDataFrame([(7, "solo")], SCHEMA).write.parquet(src)
    out = _run_batch(spark, src, str(tmp_path / "c2"), str(tmp_path / "out2"))
    assert list(out.columns) == ["text_hash", "doc_id", "is_duplicate"]
    assert len(out) == 1 and not out.is_duplicate.iloc[0]
    assert isinstance(out.text_hash.iloc[0], str) and len(out.text_hash.iloc[0]) == 32
    assert pd.api.types.is_bool_dtype(out.is_duplicate)
