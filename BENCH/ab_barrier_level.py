#!/usr/bin/env python
"""A/B: barrier (localCheckpoint) storage level for the ER pipeline.

Barrier blocks are written once and re-read by every consumer stage, so
their storage format is pure memory-bandwidth load. Hypothesis: on
memory-bandwidth-bound hosts (this sandbox saturates at ~8 busy cores;
a 1000-executor cluster's cached stage snapshots compete with shuffle
buffers for the same DRAM channels) storing barriers serialized +
lz4-compressed (MEMORY_AND_DISK_SER + spark.rdd.compress=true) trades
linearly-scaling CPU for non-scaling bandwidth and should win.

Interleaved A/B/A/B draws inside ONE session (same JIT state, same
host window), min per arm. Emits one JSON record.

Usage: python BENCH/ab_barrier_level.py [out.json]
Env: AB_DOCS (default 20000), AB_ROUNDS (default 3), SPARK_GRAFT_CPUS.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from entity_linking_in_biomedical_spark.session import get_spark
from entity_linking_in_biomedical_spark.plans.pipeline import run_pipeline
from entity_linking_in_biomedical_spark.sources.synthetic import synth_corpus

_ORIG = DataFrame.localCheckpoint


def set_level(level: StorageLevel | None) -> None:
    if level is None:
        DataFrame.localCheckpoint = _ORIG
    else:
        def patched(self, eager=True, storageLevel=None):
            return _ORIG(self, eager, storageLevel or level)

        DataFrame.localCheckpoint = patched


def membw() -> float:
    import numpy as np

    buf = np.zeros(2**23)
    t0 = time.time()
    for _ in range(2):
        buf = buf.copy()
    return round(2 * 2 * (2**23 * 8) / (time.time() - t0) / 1e9, 2)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH", "ab_barrier_level.json"
    )
    n_docs = int(os.environ.get("AB_DOCS", "20000"))
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        "ab-barrier", extra_conf={"spark.rdd.compress": "true"}
    )

    n_entities = max(100, min(n_docs // 4, 37_500))
    corpus = synth_corpus(n_docs=n_docs, n_entities=n_entities, seed=42)
    docs, ents, _, abbr, _ = corpus.to_spark(spark)
    emb = corpus.embeddings_df(spark)
    docs = docs.repartition(cpus).localCheckpoint(eager=True)
    ents = ents.localCheckpoint(eager=True)
    emb = emb.localCheckpoint(eager=True)

    # JIT warm (same recipe as bench.py)
    import pandas

    @F.pandas_udf("long")
    def _warm(x: pandas.Series) -> pandas.Series:
        return x

    spark.range(cpus * 10000, numPartitions=cpus).select(
        F.sum(_warm(F.col("id")))
    ).collect()
    warm_docs = docs.limit(2000).repartition(cpus).localCheckpoint(eager=True)
    r = run_pipeline(spark, warm_docs, ents, embeddings=emb, abbr_map=abbr)
    r["linked_documents"].write.format("noop").mode("overwrite").save()

    arms = {
        "deser_default": None,
        "ser_compressed": StorageLevel.MEMORY_AND_DISK,
    }
    draws: dict[str, list[float]] = {k: [] for k in arms}
    probes: list[float] = []
    for rd in range(rounds):
        for name, lvl in arms.items():
            probes.append(membw())
            set_level(lvl)
            try:
                t0 = time.time()
                res = run_pipeline(
                    spark, docs, ents, embeddings=emb, abbr_map=abbr
                )
                res["linked_documents"].write.format("noop").mode(
                    "overwrite"
                ).save()
                sec = round(time.time() - t0, 2)
            finally:
                set_level(None)
            draws[name].append(sec)
            print(f"round {rd} {name}: {sec}s (membw {probes[-1]} GB/s)",
                  file=sys.stderr)

    rec = {
        "n_docs": n_docs,
        "cpus": cpus,
        "rounds": rounds,
        "draws": draws,
        "min": {k: min(v) for k, v in draws.items()},
        "membw_probes_gbps": probes,
        "win_pct_ser_vs_deser": round(
            100 * (1 - min(draws["ser_compressed"]) / min(draws["deser_default"])), 1
        ),
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
