"""Per-stage checkpointed snapshots with commit manifests.

The north rule requires every stage to resume from its last committed
snapshot with per-partition lineage + metrics. On a real deployment the
stage sinks are Iceberg tables and the manifest is the Iceberg snapshot;
in this sandbox the same semantics are emulated on plain Parquet:

  <out_dir>/<stage>/data/...parquet      the snapshot
  <out_dir>/<stage>/_MANIFEST.json       commit record: stage signature
                                         (md5 over params + parent
                                         signatures), total rows, and
                                         per-partition row counts

A stage is *committed* iff the manifest exists and its signature matches
the requested computation; committed stages are read back instead of
recomputed. The manifest is written after the data (write-then-commit
ordering), so a crash mid-write leaves an uncommitted, restartable
stage.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def stage_signature(
    stage: str, params: dict, parents: list[str], inputs: list[int] | None = None
) -> str:
    """``inputs``: identity fingerprints of the stage's source
    DataFrames (df.semanticHash() — hashes the canonicalized logical
    plan, i.e. source paths + transformations). Without them, re-running
    into the same out_dir with *different inputs* but identical params
    would silently serve the stale committed snapshot. semanticHash does
    not see in-place content changes under an unchanged path — for that,
    use a fresh out_dir per dataset version (documented contract)."""
    payload = json.dumps(
        {"stage": stage, "params": params, "parents": parents, "inputs": inputs or []},
        sort_keys=True,
        default=str,
    )
    return hashlib.md5(payload.encode()).hexdigest()


class StageStore:
    def __init__(
        self, spark: SparkSession, out_dir: str | None, eager_timing: bool = False
    ):
        """``eager_timing``: force (count) each stage at commit time and
        record wall seconds in metrics — the bench's per-stage breakdown.
        Off by default: eager materialization adds one job per stage
        (driver-side fixed cost that hurts scaling efficiency)."""
        self.spark = spark
        self.out_dir = out_dir
        self.eager_timing = eager_timing
        self.metrics: list[dict] = []

    def _paths(self, stage: str) -> tuple[str, str]:
        assert self.out_dir is not None
        base = os.path.join(self.out_dir, stage)
        return os.path.join(base, "data"), os.path.join(base, "_MANIFEST.json")

    def committed(self, stage: str, signature: str) -> bool:
        if self.out_dir is None:
            return False
        _, mpath = self._paths(stage)
        if not os.path.exists(mpath):
            return False
        with open(mpath) as f:
            m = json.load(f)
        return m.get("signature") == signature

    def load(self, stage: str) -> DataFrame:
        dpath, _ = self._paths(stage)
        return self.spark.read.parquet(dpath)

    def commit(
        self, stage: str, signature: str, df: DataFrame, record_metrics: bool = True
    ) -> DataFrame:
        """Write snapshot, record per-partition metrics, commit manifest,
        return the re-read (physically materialized) DataFrame.
        ``record_metrics=False``: the caller records its own entry (the
        eager-timing path), so skip this one to avoid duplicates."""
        if self.out_dir is None:
            # no persistence requested: lazy localCheckpoint — the first
            # downstream action materializes it; an eager checkpoint +
            # count here would add two extra jobs per stage (driver-side
            # fixed cost that caps scaling efficiency)
            out = df.localCheckpoint(eager=False)
            if record_metrics:
                self.metrics.append(
                    {"stage": stage, "rows": None, "partitions": None}
                )
            return out
        dpath, mpath = self._paths(stage)
        # invalidate any previous commit BEFORE touching the data: a
        # crash between the data overwrite and the manifest replace must
        # leave the stage uncommitted, never an old manifest pointing at
        # new data (write-then-commit invariant across signature changes)
        if os.path.exists(mpath):
            os.remove(mpath)
        df.write.mode("overwrite").parquet(dpath)
        out = self.spark.read.parquet(dpath)
        per_part = (
            out.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        part_rows = {int(r["pid"]): int(r["rows"]) for r in per_part}
        manifest = {
            "stage": stage,
            "signature": signature,
            "rows": int(sum(part_rows.values())),
            "partition_rows": part_rows,
        }
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, mpath)  # atomic commit
        if record_metrics:
            self.metrics.append(
                {
                    "stage": stage,
                    "rows": manifest["rows"],
                    "partitions": len(part_rows),
                }
            )
        return out

    def get_or_compute(self, stage: str, signature: str, compute) -> DataFrame:
        if self.committed(stage, signature):
            out = self.load(stage)
            self.metrics.append({"stage": stage, "rows": None, "resumed": True})
            return out
        if self.eager_timing:
            import time

            t0 = time.time()
            out = self.commit(stage, signature, compute(), record_metrics=False)
            rows = out.count()  # force materialization inside the timer
            self.metrics.append(
                {"stage": stage, "rows": rows, "sec": round(time.time() - t0, 3)}
            )
            return out
        return self.commit(stage, signature, compute())


class IcebergStageStore(StageStore):
    """Iceberg-backed stage snapshots — the north rule's storage contract
    taken literally where a catalog is available.

    ``ref`` is ``catalog.namespace``; each stage becomes the table
    ``<catalog>.<namespace>.<stage>``. The commit signature rides as a
    table property inside the same ``createOrReplace`` transaction as
    the data, so data + manifest swap atomically in one Iceberg snapshot
    — the write-then-commit invariant the Parquet emulation enforces by
    hand (delete manifest → overwrite data → os.replace manifest) is
    native here. Per-partition lineage comes from Iceberg's own file
    manifests; we still record row metrics for parity with the base
    store.

    Requires ``iceberg-spark-runtime`` on the session classpath and a
    configured ``spark.sql.catalog.<name>``; ``available()`` probes for
    both so callers (and tests) can fall back to the Parquet store.
    """

    SIG_PROP = "el.stage.signature"

    def __init__(
        self, spark: SparkSession, ref: str, eager_timing: bool = False
    ):
        super().__init__(spark, out_dir=ref, eager_timing=eager_timing)
        self.ref = ref
        catalog = ref.split(".", 1)[0]
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if impl is None:
            raise RuntimeError(
                f"Iceberg stage store requested but no catalog "
                f"'spark.sql.catalog.{catalog}' is configured on this "
                f"session; configure an Iceberg catalog or use a plain "
                f"path out_dir for the Parquet store"
            )

    @staticmethod
    def available(spark: SparkSession) -> bool:
        """True iff the Iceberg Spark runtime is on the classpath."""
        try:
            spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
                "org.apache.iceberg.spark.SparkCatalog"
            )
            return True
        except Exception:
            return False

    def _table(self, stage: str) -> str:
        return f"{self.ref}.{stage}"

    def committed(self, stage: str, signature: str) -> bool:
        try:
            props = {
                r["key"]: r["value"]
                for r in self.spark.sql(
                    f"SHOW TBLPROPERTIES {self._table(stage)}"
                ).collect()
            }
        except Exception:  # table absent → not committed
            return False
        return props.get(self.SIG_PROP) == signature

    def load(self, stage: str) -> DataFrame:
        return self.spark.read.table(self._table(stage))

    def commit(
        self, stage: str, signature: str, df: DataFrame, record_metrics: bool = True
    ) -> DataFrame:
        tbl = self._table(stage)
        (
            df.writeTo(tbl)
            .using("iceberg")
            .tableProperty(self.SIG_PROP, signature)
            .createOrReplace()  # one atomic snapshot: data + signature
        )
        out = self.spark.read.table(tbl)
        if record_metrics:  # eager-timing caller counts (and records) itself
            rows = out.count()
            self.metrics.append({"stage": stage, "rows": rows, "table": tbl})
        return out


def make_stage_store(
    spark: SparkSession, out_dir: str | None, eager_timing: bool = False
) -> StageStore:
    """Pick the stage-store backend from the out_dir spec:

    - ``None`` → no persistence (lazy localCheckpoint barriers)
    - ``iceberg://catalog.namespace`` → :class:`IcebergStageStore`
      (raises with a clear message if the runtime/catalog is absent)
    - any other string → Parquet+manifest :class:`StageStore`
    """
    if out_dir is not None and out_dir.startswith("iceberg://"):
        ref = out_dir[len("iceberg://") :]
        if not IcebergStageStore.available(spark):
            raise RuntimeError(
                "iceberg:// stage store requested but the Iceberg Spark "
                "runtime is not on this session's classpath (add the "
                "iceberg-spark-runtime jar via spark.jars.packages)"
            )
        return IcebergStageStore(spark, ref, eager_timing=eager_timing)
    return StageStore(spark, out_dir, eager_timing=eager_timing)
