#!/usr/bin/env python
"""Measure the retraction advantage: when a review batch rejects R
match edges over an already-clustered corpus graph, compare

  full recluster — connected_components over (edges \\ rejected) with
                   the full node universe (what a non-incremental
                   engine must pay per review batch), vs
  retraction     — retract_from_clusters (operators/clustering.py):
                   re-cluster ONLY the clusters the rejected edges
                   touch, splice everything else through untouched.

At 10^12 docs a review batch touches a few hundred clusters; the
update must cost O(affected), not O(corpus). Both timed runs execute
back-to-back in the same process (min-of-K each) so the RATIO is
comparable inside a degraded host window (BENCH/BASELINE.md
measurement protocol); absolutes are quotable only when
probe_membw_gbps is healthy. Equality of the two resulting
assignments is asserted (count + full anti-join both ways), so the
speedup is for a PROVEN-identical result.

Graph shape: a chain forest over N string node ids (chains of length
~L, so clusters are L-sized and a mid-chain rejection actually splits)
plus cross-chain merge edges every M nodes; R rejections sampled
deterministically (every k-th chain edge).

Prints one JSON line:
  {"full_recluster_sec": ..., "retract_sec": ..., "speedup": ...,
   "n_nodes": N, "n_edges": E, "n_rejected": R,
   "assignments_equal": bool, "probe_membw_gbps": ...}

Env: SPARK_GRAFT_RETRACT_NODES (default 2000000),
SPARK_GRAFT_RETRACT_CHAIN (default 10),
SPARK_GRAFT_RETRACT_REJECT_EVERY (default 20000 chain edges),
SPARK_GRAFT_BENCH_REPEATS (min-of-K, default 2), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _membw() -> float:
    import numpy as np

    buf = np.zeros(2**23)
    t0 = time.time()
    for _ in range(2):
        buf = buf.copy()
    return round(2 * 2 * (2**23 * 8) / (time.time() - t0) / 1e9, 2)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    n_nodes = int(os.environ.get("SPARK_GRAFT_RETRACT_NODES", 2_000_000))
    chain = int(os.environ.get("SPARK_GRAFT_RETRACT_CHAIN", 10))
    rej_every = int(os.environ.get("SPARK_GRAFT_RETRACT_REJECT_EVERY", 20_000))
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    membw = _membw()

    from entity_linking_in_biomedical_spark.operators.clustering import (
        connected_components,
        retract_from_clusters,
    )
    from entity_linking_in_biomedical_spark.session import get_spark

    spark = get_spark("el-retract-bench", master=f"local[{cpus}]")

    # chain forest: node i links i -> i+1 unless i closes a chain
    # (i % chain == chain-1); zero-padded ids keep string order == int
    # order so cluster roots are the chain heads
    ids = spark.range(n_nodes).select(
        F.col("id"), F.format_string("n%09d", F.col("id")).alias("node")
    )
    nodes = ids.select("node").repartition(cpus).localCheckpoint(eager=True)
    chain_edges = (
        ids.filter((F.col("id") % chain != chain - 1) & (F.col("id") < n_nodes - 1))
        .select(
            F.format_string("n%09d", F.col("id")).alias("src"),
            F.format_string("n%09d", F.col("id") + 1).alias("dst"),
            F.col("id"),
        )
    )
    edges = (
        chain_edges.select("src", "dst")
        .repartition(cpus)
        .localCheckpoint(eager=True)
    )
    # rejections: every rej_every-th chain edge, offset mid-chain so
    # each one genuinely splits a cluster in two
    rejected = (
        chain_edges.filter(F.col("id") % rej_every == chain // 2)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    n_rej = rejected.count()

    # the persisted state the review batch arrives against
    assignments, _ = connected_components(edges, nodes=nodes)
    assignments = assignments.repartition(cpus).localCheckpoint(eager=True)

    surviving = edges.join(rejected, ["src", "dst"], "left_anti").localCheckpoint(
        eager=True
    )

    def timed(fn):
        best = None
        for _ in range(repeats):
            t0 = time.time()
            fn()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        return round(best, 3)

    full_out = {}

    def run_full():
        a, _ = connected_components(surviving, nodes=nodes)
        force(a)
        full_out["a"] = a

    retract_out = {}

    def run_retract():
        a, _ = retract_from_clusters(assignments, edges, rejected)
        force(a)
        retract_out["a"] = a

    full_sec = timed(run_full)
    retract_sec = timed(run_retract)

    fa, ra = full_out["a"], retract_out["a"]
    same = (
        fa.count() == ra.count()
        and fa.join(ra, ["node", "cluster_id"], "left_anti").count() == 0
        and ra.join(fa, ["node", "cluster_id"], "left_anti").count() == 0
    )

    print(
        json.dumps(
            {
                "full_recluster_sec": full_sec,
                "retract_sec": retract_sec,
                "speedup": round(full_sec / retract_sec, 2),
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "n_rejected": n_rej,
                "repeats": repeats,
                "assignments_equal": bool(same),
                "cpus": cpus,
                "probe_membw_gbps": membw,
                "probe_membw_gbps_post": _membw(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
