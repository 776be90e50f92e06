"""Distributed logistic-regression quality classifier
(operators/classifier.py): fixed-iteration full-batch GD with
decimal-quantized gradients — fit is partition-invariant and replayable
by a pure-python reference (and the DuckDB gate twin)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.operators.classifier import (
    FEATURES,
    _round9,
    lr_fit,
    lr_score,
    quality_features,
)


def _py_features(text: str) -> tuple[float, float, float]:
    text = text or ""
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]
    x1 = round(math.log(1.0 + len(text)), 9)
    x2 = round(sum(map(len, toks)) / len(toks), 9) if toks else 0.0
    x3 = (
        round(len(re.sub(r"[^a-z0-9]", "", text.lower())) / len(text), 9)
        if text
        else 0.0
    )
    return x1, x2, x3


def _py_fit(rows, iters=2, lr=0.5):
    """rows = [(x1, x2, x3, y)]; replay of lr_fit's exact update rule
    (9-decimal contributions, exact sums, HALF_UP updates)."""
    w, b = [0.0, 0.0, 0.0], 0.0
    n = len(rows)
    for _ in range(iters):
        g = [0.0, 0.0, 0.0]
        gb = 0.0
        for x1, x2, x3, y in rows:
            z = b + w[0] * x1 + w[1] * x2 + w[2] * x3
            err = 1.0 / (1.0 + math.exp(-z)) - y
            for j, x in enumerate((x1, x2, x3)):
                g[j] += round(err * x, 9)
            gb += round(err, 9)
        w = [_round9(w[j] - _round9(lr * g[j] / n)) for j in range(3)]
        b = _round9(b - _round9(lr * gb / n))
    return w, b


_ROWS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank", 1),
    (2, "Comprehensive analysis of distributed query engines at scale", 1),
    (3, "a comparative study of tokenization strategies for web corpora", 1),
    (4, "!!! $$$ ??? ###", 0),
    (5, "zz", 0),
    (6, "1 2 3 4 5 6 7 8 9 0 . . . . . . . . . .", 0),
    (7, "", 0),
]


def test_quality_features_match_python_reference(spark):
    df = spark.createDataFrame(_ROWS, "doc_id int, text string, y int")
    got = {
        r["doc_id"]: (r["x1"], r["x2"], r["x3"])
        for r in quality_features(df, carry=("y",)).collect()
    }
    for doc_id, text, _ in _ROWS:
        want = _py_features(text)
        for a, b in zip(got[doc_id], want):
            assert a == pytest.approx(b, abs=1e-9), (doc_id, got[doc_id], want)


def test_lr_fit_matches_reference_and_separates(spark):
    df = spark.createDataFrame(_ROWS, "doc_id int, text string, y int")
    feats = quality_features(df, carry=("y",))
    model = lr_fit(feats, "y", iters=2, lr=0.5)

    pyrows = [(*_py_features(t), y) for _, t, y in _ROWS]
    w_want, b_want = _py_fit(pyrows)
    assert model["bias"] == pytest.approx(b_want, abs=1e-9)
    for j, c in enumerate(FEATURES):
        assert model[c] == pytest.approx(w_want[j], abs=1e-9)

    # 2 GD steps are enough for this separable toy set: every positive
    # doc outscores every negative one
    scored = {
        r["doc_id"]: r["score"] for r in lr_score(feats, model).collect()
    }
    pos = [scored[i] for i, _, y in _ROWS if y == 1]
    neg = [scored[i] for i, _, y in _ROWS if y == 0]
    assert min(pos) > max(neg)
    assert all(0.0 <= s <= 1.0 for s in scored.values())

    with pytest.raises(ValueError):
        lr_fit(feats, "y", iters=0)


def test_lr_fit_partition_invariant(spark):
    rows = [
        (i, f"document number {i} with some repeated filler words " * (1 + i % 3),
         1 if i % 2 == 0 else 0)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, y int")
    m1 = lr_fit(quality_features(df, carry=("y",)), "y")
    m4 = lr_fit(quality_features(df.repartition(7), carry=("y",)), "y")
    # decimal(38,9) gradient sums: bit-identical under any layout
    assert m1 == m4


def test_lr_score_is_streaming_native(spark, tmp_path):
    """Unlike the LM scorer (per-doc aggregate -> foreachBatch), the
    classifier's featurize+score path is a pure stateless projection,
    so it composes DIRECTLY onto a streaming frame — the plan Spark
    runs per micro-batch is the batch plan, and outputs agree exactly."""
    df = spark.createDataFrame(_ROWS, "doc_id int, text string, y int")
    model = lr_fit(quality_features(df, carry=("y",)), "y")
    want = {
        r["doc_id"]: r["score"]
        for r in lr_score(quality_features(df), model).collect()
    }

    src = str(tmp_path / "qc_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        lr_score(quality_features(stream), model)
        .writeStream.format("memory")
        .queryName("qc_stream")
        .option("checkpointLocation", str(tmp_path / "qc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["score"]
        for r in spark.sql("select * from qc_stream").collect()
    }
    assert got == want


def test_lr_fit_rejects_empty_frame(spark):
    df = spark.createDataFrame([], "doc_id int, text string, y int")
    with pytest.raises(ValueError, match="empty"):
        lr_fit(quality_features(df, carry=("y",)), "y")
