"""Unit tests: snapshot diffing, blocking-channel stats, cluster-size
histogram (the driver-gate queries give the cross-engine value checks;
these pin the operator semantics on hand-built micro-cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.operators.clustering import (
    cluster_size_histogram,
)
from entity_linking_in_biomedical_spark.operators.diffing import diff_snapshots
from entity_linking_in_biomedical_spark.operators.profiling import blocking_key_stats


def test_diff_snapshots_semantics(spark):
    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z"), (4, None, "w")],
        "id int, t string, u string",
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "B", "y"), (5, "e", "v"), (4, None, "w")],
        "id int, t string, u string",
    )
    got = {
        r["id"]: r["change"]
        for r in diff_snapshots(old, new, "id", ["t", "u"]).collect()
    }
    # 1 unchanged (absent), 2 changed, 3 removed, 5 added, 4 unchanged
    # (null-tagged fingerprint treats equal nulls as equal)
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_diff_snapshots_null_vs_empty_string_differ(spark):
    old = spark.createDataFrame([(1, None)], "id int, t string")
    new = spark.createDataFrame([(1, "")], "id int, t string")
    got = diff_snapshots(old, new, "id", ["t"]).collect()
    assert [(r["id"], r["change"]) for r in got] == [(1, "changed")]


def test_blocking_key_stats_counts(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("c",), ("c",)], "k string"
    )
    r = blocking_key_stats(df, "k", "ch").collect()[0]
    assert r["channel"] == "ch"
    assert r["n_keys"] == 3 and r["n_items"] == 6 and r["max_bucket"] == 3
    # pairs: 3C2 + 1C2 + 2C2 = 3 + 0 + 1
    assert r["candidate_pairs"] == 4
    # skew = max / mean = 3 / 2
    assert r["skew"] == pytest.approx(1.5)


def test_cluster_size_histogram(spark):
    assign = spark.createDataFrame(
        [("n1", "c1"), ("n2", "c1"), ("n3", "c2"), ("n4", "c3"), ("n5", "c3")],
        "node string, cluster_id string",
    )
    got = {
        r["cluster_size"]: r["n_clusters"]
        for r in cluster_size_histogram(assign).collect()
    }
    assert got == {1: 1, 2: 2}
