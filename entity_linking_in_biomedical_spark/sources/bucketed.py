"""Bucketed stage tables: exchange-free repeated joins.

The ER pipeline joins on the same key over and over — ``norm`` ties
mentions ↔ candidates ↔ me_scores ↔ embeddings across stages, runs, and
incremental updates. At 100 TB every such join is a full shuffle of
both sides unless the storage layout already clusters the key. Spark's
answer is bucketing: ``bucketBy(n, key)`` + ``saveAsTable`` records the
hash-partitioning in the catalog, and every later equi-join or groupBy
on that key reads the buckets back with NO Exchange — the shuffle is
paid once at write time and amortized over every downstream job.

This module is the thin, tested wrapper the stage sinks use. Bucketing
requires the table catalog (``saveAsTable``; a path-based ``save`` has
nowhere to record the layout) — the default in-memory/derby catalog in
tests, a Hive/Iceberg catalog in deployment. Iceberg note: its
``write.distribution-mode`` + hidden ``bucket(n, col)`` partition
transform plays the same role for the iceberg:// stage store; this
wrapper covers the classic Parquet/Hive layout.

Sizing at 10^12 docs: buckets should land 100-500 MB each, so
n_buckets ≈ table_bytes / 256 MB, rounded to a power of two; both
sides of a co-located join must use the SAME bucket count (or an exact
multiple, with spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed by ``keys`` (and per-bucket sorted
    by them when ``sort`` — sorted buckets additionally drop the Sort
    from sort-merge joins)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the catalog carries the layout, so
    joins/aggregations on the bucket keys plan without an Exchange."""
    return spark.table(table)


def join_is_exchange_free(a: DataFrame, b: DataFrame, on: list[str]) -> bool:
    """True iff the equi-join of two (bucketed) frames plans with no
    shuffle on either input — the property the layout buys. Broadcast
    is disabled for the probe so the planner must choose a co-located
    sort-merge join rather than hiding the question."""
    spark = a.sparkSession
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = a.join(b, on)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return "Exchange" not in plan
