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
from ..session import barrier_level


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
        self,
        spark: SparkSession,
        out_dir: str | None,
        eager_timing: bool = False,
        n_buckets: int = 32,
    ):
        """``eager_timing``: force (count) each stage at commit time and
        record wall seconds in metrics — the bench's per-stage breakdown.
        Off by default: eager materialization adds one job per stage
        (driver-side fixed cost that hurts scaling efficiency).
        ``n_buckets``: bucket count for stages committed with
        ``bucket_by`` keys (see :meth:`commit`); both sides of a
        co-located join must agree on it. At 10^12 docs size so buckets
        land 100-500 MB (table_bytes / 256 MB, power of two)."""
        self.spark = spark
        self.out_dir = out_dir
        self.eager_timing = eager_timing
        self.n_buckets = n_buckets
        self.metrics: list[dict] = []

    def _paths(self, stage: str) -> tuple[str, str]:
        assert self.out_dir is not None
        base = os.path.join(self.out_dir, stage)
        return os.path.join(base, "data"), os.path.join(base, "_MANIFEST.json")

    def _catalog_table(self, stage: str) -> str:
        """Catalog name for a bucketed stage snapshot. The out_dir hash
        keys the name so concurrent runs (or parallel tests) against
        different stores never collide on the shared session catalog."""
        assert self.out_dir is not None
        tag = hashlib.md5(os.path.abspath(self.out_dir).encode()).hexdigest()[:10]
        return f"el_stage_{tag}_{stage}"

    def committed(self, stage: str, signature: str) -> bool:
        if self.out_dir is None:
            return False
        _, mpath = self._paths(stage)
        if not os.path.exists(mpath):
            return False
        try:
            with open(mpath) as f:
                m = json.load(f)
        except (OSError, ValueError):
            # a corrupt/truncated manifest (tampering, partial copy of a
            # user-supplied out_dir) means the stage is not trustworthy:
            # treat as uncommitted and recompute, mirroring load()
            return False
        return m.get("signature") == signature

    def load(self, stage: str) -> DataFrame:
        """Read a committed snapshot back. Bucketed stages (manifest
        carries the layout) come back through the catalog so downstream
        joins/aggs on the bucket keys plan with no Exchange; if this
        session's catalog lost the table (fresh session, in-memory
        catalog), the manifest's recorded DDL re-attaches the files.
        Any layout-level failure degrades to a plain Parquet read —
        correctness never depends on the catalog."""
        dpath, mpath = self._paths(stage)
        try:
            with open(mpath) as f:
                m = json.load(f)
        except (OSError, ValueError):
            m = {}
        bucket = m.get("bucket")
        if bucket:
            from ..sources.bucketed import register_bucketed

            tbl = self._catalog_table(stage)
            try:
                if self.spark.catalog.tableExists(tbl):
                    return self.spark.table(tbl)
                return register_bucketed(
                    self.spark,
                    tbl,
                    dpath,
                    bucket["schema_ddl"],
                    bucket["keys"],
                    bucket["n_buckets"],
                )
            except Exception as e:
                # correctness never depends on the catalog, but a
                # silent fall-through would erase the amortized-shuffle
                # benefit with nothing observable — surface it in the
                # run metrics and on stderr before degrading
                import sys

                self.metrics.append(
                    {"stage": stage, "bucket_layout": "degraded", "err": repr(e)}
                )
                print(
                    f"stage store: bucketed layout for '{stage}' could not "
                    f"be (re)attached ({e!r}); reading plain parquet — "
                    f"downstream joins on {bucket['keys']} will re-shuffle",
                    file=sys.stderr,
                )
        return self.spark.read.parquet(dpath)

    def commit(
        self,
        stage: str,
        signature: str,
        df: DataFrame,
        record_metrics: bool = True,
        bucket_by: list[str] | None = None,
    ) -> DataFrame:
        """Write snapshot, record per-partition metrics, commit manifest,
        return the re-read (physically materialized) DataFrame.
        ``record_metrics=False``: the caller records its own entry (the
        eager-timing path), so skip this one to avoid duplicates.
        ``bucket_by``: hash-bucket + sort the snapshot by these keys
        (sources/bucketed.py) so every downstream equi-join/groupBy on
        them — in this run or a resumed one — plans without an Exchange;
        the stage's one shuffle is paid at write time and amortized."""
        if self.out_dir is None:
            # no persistence requested: lazy localCheckpoint — the first
            # downstream action materializes it; an eager checkpoint +
            # count here would add two extra jobs per stage (driver-side
            # fixed cost that caps scaling efficiency)
            out = df.localCheckpoint(eager=False, storageLevel=barrier_level())
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
        bucket_meta = None
        if bucket_by:
            from ..sources.bucketed import write_bucketed

            tbl = self._catalog_table(stage)
            write_bucketed(
                df, tbl, bucket_by, n_buckets=self.n_buckets, path=dpath
            )
            out = self.spark.table(tbl)
            bucket_meta = {
                "keys": list(bucket_by),
                "n_buckets": self.n_buckets,
                "table": tbl,
                # recorded so a fresh session can re-register the layout
                "schema_ddl": out._jdf.schema().toDDL(),  # type: ignore[operator]
            }
        else:
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
        if bucket_meta:
            manifest["bucket"] = bucket_meta
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

    def get_or_compute(
        self,
        stage: str,
        signature: str,
        compute,
        bucket_by: list[str] | None = None,
    ) -> DataFrame:
        if self.committed(stage, signature):
            out = self.load(stage)
            self.metrics.append({"stage": stage, "rows": None, "resumed": True})
            return out
        if self.eager_timing:
            import time

            t0 = time.time()
            out = self.commit(
                stage, signature, compute(), record_metrics=False, bucket_by=bucket_by
            )
            rows = out.count()  # force materialization inside the timer
            self.metrics.append(
                {"stage": stage, "rows": rows, "sec": round(time.time() - t0, 3)}
            )
            return out
        return self.commit(stage, signature, compute(), bucket_by=bucket_by)


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
        self,
        spark: SparkSession,
        ref: str,
        eager_timing: bool = False,
        n_buckets: int = 32,
    ):
        super().__init__(
            spark, out_dir=ref, eager_timing=eager_timing, n_buckets=n_buckets
        )
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
        self,
        stage: str,
        signature: str,
        df: DataFrame,
        record_metrics: bool = True,
        bucket_by: list[str] | None = None,
    ) -> DataFrame:
        tbl = self._table(stage)
        w = (
            df.writeTo(tbl)
            .using("iceberg")
            .tableProperty(self.SIG_PROP, signature)
        )
        if bucket_by:
            # Iceberg's native bucketing: the hidden bucket(n, col)
            # partition transform is this catalog's equivalent of the
            # Parquet store's bucketBy layout (sources/bucketed.py)
            w = w.partitionedBy(
                *[F.bucket(self.n_buckets, F.col(k)) for k in bucket_by]
            )
        w.createOrReplace()  # one atomic snapshot: data + signature
        out = self.spark.read.table(tbl)
        if record_metrics:  # eager-timing caller counts (and records) itself
            rows = out.count()
            self.metrics.append({"stage": stage, "rows": rows, "table": tbl})
        return out


def make_stage_store(
    spark: SparkSession,
    out_dir: str | None,
    eager_timing: bool = False,
    n_buckets: int = 32,
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
        return IcebergStageStore(
            spark, ref, eager_timing=eager_timing, n_buckets=n_buckets
        )
    return StageStore(spark, out_dir, eager_timing=eager_timing, n_buckets=n_buckets)
