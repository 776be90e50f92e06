"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the conf choices below are the ones that
matter identically on a 1000-executor cluster: AQE (runtime re-plan,
skew-join splitting, dynamic coalesce), Arrow for every pandas UDF
boundary, and a shuffle-partition count sized to the parallelism level.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.storagelevel import StorageLevel

# ---- engine-wide barrier storage policy ------------------------------------
# Every operator's materialization barrier (localCheckpoint) stores its
# blocks at this level. Default is serialized + lz4 (MEMORY_AND_DISK is
# PySpark's serialized variant; spark.rdd.compress below turns on lz4
# for serialized blocks): barrier blocks are written once and re-read
# by every consumer stage, so their format is pure memory-bandwidth
# load, and serialized+compressed trades linearly-scaling CPU for
# non-scaling DRAM bandwidth — the same call Spark SQL's own cache
# makes (compressed columnar batches). Measured on this host
# (BENCH/ab_barrier_level.json, interleaved A/B at 20k docs in a
# bandwidth-starved window): serialized won all three rounds, min-of-3
# 6.5% on the full ER pipeline, with a 14.5x smaller block footprint
# on long-typed data. EL_SPARK_BARRIER_LEVEL=deser restores the
# deserialized default; =disk spills barriers entirely (memory-starved
# executors).
_BARRIER_LEVELS: dict[str, StorageLevel | None] = {
    "ser": StorageLevel.MEMORY_AND_DISK,
    "deser": None,  # pyspark default: MEMORY_AND_DISK_DESER
    "disk": StorageLevel.DISK_ONLY,
}


def barrier_level() -> StorageLevel | None:
    """Storage level for lineage barriers, selected by
    EL_SPARK_BARRIER_LEVEL (ser | deser | disk; default ser)."""
    name = os.environ.get("EL_SPARK_BARRIER_LEVEL", "ser")
    try:
        return _BARRIER_LEVELS[name]
    except KeyError:
        raise ValueError(
            f"EL_SPARK_BARRIER_LEVEL={name!r}: expected one of "
            f"{sorted(_BARRIER_LEVELS)}"
        ) from None


def get_spark(
    app_name: str = "el-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    # parallelism implied by the master string, e.g. local[8] -> 8
    n = cpus
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        n = cpus if inner == "*" else int(inner)
    shuffle_partitions = shuffle_partitions or max(2 * n, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(n))
        # AQE: runtime coalesce of tiny shuffle partitions, broadcast-join
        # conversion, and automatic skew-join splitting for the pair joins.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing floor kept at the 1 MB default deliberately: a
        # 64 KB floor widens the compute-heavy consumers of small
        # shuffles (the entity-keying explode coalesces to ONE task,
        # the pair-scoring Arrow stage to six), but an interleaved A/B
        # on the full ER pipeline measured the extra small tasks as a
        # net 1.4-1.6x LOSS on this memory-bandwidth-starved host
        # (OPTIMIZATION_r06.md); override per-run when profiling via
        # EL_SPARK_EXTRA_CONF.
        # Arrow on for every pandas UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # lz4 for serialized storage blocks — the barrier policy above
        # stores barriers serialized, and compressed blocks halve the
        # DRAM traffic their re-reads cost (no effect on deserialized
        # storage or on shuffle, which compresses independently).
        .config("spark.rdd.compress", "true")
        # Deterministic timestamps in tests / oracle comparisons.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("EL_SPARK_DRIVER_MEM", "8g"))
    )
    # extra confs from the environment (JSON) — used by the standalone-
    # cluster scaling harness to pass executor sizing + py-files
    env_conf = os.environ.get("EL_SPARK_EXTRA_CONF")
    if env_conf:
        import json

        for k, v in json.loads(env_conf).items():
            b = b.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
