#!/usr/bin/env python
"""Measure the incremental-ER advantage: when a snapshot of new
documents arrives over an already-linked corpus, compare

  full relink   — run_pipeline over corpus ∪ snapshot (what a
                  non-incremental engine must pay per arrival), vs
  incremental   — link_snapshot over the SNAPSHOT only, folded into
                  the persisted assignments (plans/incremental_er.py).

This quantifies the north rule's snapshot-resumable contract at the
corpus level: at 10^12 docs an arriving 10% crawl must cost O(snapshot),
not O(corpus). Both timed runs execute in the same process back-to-back
(min-of-K each), so the RATIO is comparable even inside a degraded
host window (BENCH/BASELINE.md measurement protocol); the absolute
docs/s numbers are only quotable when probe_membw_gbps is healthy.

Prints one JSON line:
  {"full_relink_sec": ..., "incremental_sec": ..., "speedup": ...,
   "snapshot_docs": S, "corpus_docs": N, "snapshot_docs_per_sec": ...,
   "merged_clusters_equal": bool, "probe_membw_gbps": ...}

The label cross-check splits disagreement into its three semantic
classes (plans/incremental_er.py module docstring):
  entity_label_diff     — both paths link to an entity but DIFFERENT
                          CUIs; per-surface me decisions are
                          split-invariant so this stays ~0, the
                          residual being >=2-entity clusters whose min-
                          CUI root moves under a path-dependent merge.
  entity_nil_flips      — entity-rooted in one path, NIL in the other:
                          mm transitivity INTO entity clusters is
                          path-dependent (documented bounded deviation).
  nil_granularity_diff  — both NIL but different cluster ids: NIL
                          cluster granularity, the approximation class —
                          single-best mm attachment depends on which
                          partners are visible in the same run, so a
                          snapshot split coarsens/refines NIL components
                          without any individually-wrong merge.
(The 60-doc driver corpus has none of the latter two classes, which is
why er_incremental hash-matches the batch golden exactly.)

Env: SPARK_GRAFT_INC_DOCS (corpus size, default 20000),
SPARK_GRAFT_INC_SNAP_FRAC (snapshot fraction, default 0.1),
SPARK_GRAFT_INC_INDEX (1 = probe the durable surface index for
cross-snapshot near-dup recovery [production path, coarser-merge
deviation], 0 = index-less [misses cross-snapshot NIL near-dup pairs,
the other documented approximation]; default 1),
SPARK_GRAFT_BENCH_REPEATS (min-of-K, default 2), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas  # noqa: F401

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
    n_docs = int(os.environ.get("SPARK_GRAFT_INC_DOCS", 20000))
    frac = float(os.environ.get("SPARK_GRAFT_INC_SNAP_FRAC", 0.1))
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    membw = _membw()

    from entity_linking_in_biomedical_spark.plans.incremental_er import (
        build_surface_index,
        link_snapshot,
        relabel_mentions,
    )
    from entity_linking_in_biomedical_spark.plans.pipeline import run_pipeline
    from entity_linking_in_biomedical_spark.session import get_spark
    from entity_linking_in_biomedical_spark.sources.synthetic import synth_corpus

    spark = get_spark("el-incremental-bench", master=f"local[{cpus}]")
    corpus = synth_corpus(
        n_docs=n_docs, n_entities=max(100, min(n_docs // 4, 37_500)), seed=42
    )
    docs, ents, _, abbr, _ = corpus.to_spark(spark)
    emb = corpus.embeddings_df(spark)
    # deterministic corpus/snapshot split: ~frac of docs arrive "later"
    mod = max(2, int(round(1 / frac)))
    is_snap = F.abs(F.hash("doc_id")) % mod == 0
    base_docs = docs.filter(~is_snap).repartition(cpus).localCheckpoint(eager=True)
    snap_docs = docs.filter(is_snap).repartition(cpus).localCheckpoint(eager=True)
    all_docs = docs.repartition(cpus).localCheckpoint(eager=True)
    ents = ents.localCheckpoint(eager=True)
    emb = emb.localCheckpoint(eager=True)
    n_snap = snap_docs.count()

    # warm executor pool + codegen cache (identical to bench.py)
    @F.pandas_udf("long")
    def _warm(x: pandas.Series) -> pandas.Series:
        return x

    spark.range(cpus * 10000, numPartitions=cpus).select(
        F.sum(_warm(F.col("id")))
    ).collect()
    warm_docs = all_docs.limit(2000).repartition(cpus).localCheckpoint(eager=True)
    force(
        run_pipeline(spark, warm_docs, ents, embeddings=emb, abbr_map=abbr)[
            "linked_documents"
        ]
    )

    # untimed: the pre-existing linked corpus + its durable surface index
    # (both are deploy-time state, maintained across arrivals)
    base_res = link_snapshot(
        spark, base_docs, ents, None, embeddings=emb, abbr_map=abbr
    )
    state = (
        base_res["assignments"]
        .select("node", "cluster_id")
        .localCheckpoint(eager=True)
    )
    base_mentions = base_res["mentions"].localCheckpoint(eager=True)
    use_index = os.environ.get("SPARK_GRAFT_INC_INDEX", "1") != "0"
    index = (
        build_surface_index(state).localCheckpoint(eager=True) if use_index else None
    )

    # timed, INTERLEAVED [inc, full] × repeats so a host-window shift
    # mid-process (BENCH/BASELINE.md) biases neither side — min-of-K each:
    #   A incremental — link ONLY the snapshot, fold into state, index-
    #     probed cross-snapshot near-dup recovery (full-fidelity path)
    #   B full relink — corpus ∪ snapshot through the batch pipeline
    inc_sec, inc_res = None, None
    full_sec, full_res = None, None
    for _ in range(repeats):
        t0 = time.time()
        r = link_snapshot(
            spark, snap_docs, ents, state, embeddings=emb, abbr_map=abbr,
            surface_index=index,
        )
        force(r["mention_clusters"])
        sec = time.time() - t0
        if inc_sec is None or sec < inc_sec:
            inc_sec, inc_res = sec, r

        t0 = time.time()
        r = run_pipeline(spark, all_docs, ents, embeddings=emb, abbr_map=abbr)
        force(r["linked_documents"])
        sec = time.time() - t0
        if full_sec is None or sec < full_sec:
            full_sec, full_res = sec, r

    # cross-check: both paths induce the same mention->cluster partition
    # (compare cluster ids directly — e| roots are canonical CUIs, and NIL
    # roots follow the same lexicographic-min node rule in both paths)
    # corpus-wide incremental labeling: base + snapshot mentions, both
    # relabeled under the MERGED assignments (what a reader of the
    # persisted state sees after the fold)
    inc_lab = relabel_mentions(
        base_mentions.unionByName(inc_res["mentions"]), inc_res["assignments"]
    ).select("doc_id", "span_seq", F.col("cluster_id").alias("inc_id"))
    full_lab = relabel_mentions(
        full_res["mentions"], full_res["assignments"]
    ).select("doc_id", "span_seq", F.col("cluster_id").alias("full_id"))
    both = inc_lab.join(full_lab, ["doc_id", "span_seq"]).select(
        F.col("inc_id").startswith("NIL_").alias("inc_nil"),
        F.col("full_id").startswith("NIL_").alias("full_nil"),
        (F.col("inc_id") == F.col("full_id")).alias("eq"),
    )
    agg = both.agg(
        F.count("*").alias("n"),
        # entity-label disagreement: per-surface me DECISIONS are
        # split-invariant, so this stays ~0 — the residual is clusters
        # holding >=2 entity nodes, whose root (min CUI) moves when a
        # path-dependent mm merge joins different entity clusters
        F.sum(
            F.when(~F.col("inc_nil") & ~F.col("full_nil") & ~F.col("eq"), 1).otherwise(0)
        ).alias("ent_diff"),
        # entity-vs-NIL flips: mm transitivity INTO entity clusters is
        # path-dependent (documented bounded deviation)
        F.sum(F.when(F.col("inc_nil") != F.col("full_nil"), 1).otherwise(0)).alias(
            "flip_diff"
        ),
        # NIL-vs-NIL id disagreement: NIL cluster GRANULARITY, the
        # approximation class (single-best mm attachment is split-dependent)
        F.sum(
            F.when(F.col("inc_nil") & F.col("full_nil") & ~F.col("eq"), 1).otherwise(0)
        ).alias("nil_diff"),
    ).collect()[0]
    n_mentions = agg["n"]
    diff = agg["ent_diff"] + agg["flip_diff"] + agg["nil_diff"]

    print(
        json.dumps(
            {
                "full_relink_sec": round(full_sec, 2),
                "incremental_sec": round(inc_sec, 2),
                "speedup": round(full_sec / inc_sec, 2),
                "snapshot_docs": n_snap,
                "corpus_docs": n_docs,
                "snapshot_docs_per_sec": round(n_snap / inc_sec, 2),
                "full_docs_per_sec": round(n_docs / full_sec, 2),
                "merged_clusters_equal": diff == 0,
                "label_diff_rows": diff,
                "entity_label_diff": agg["ent_diff"],
                "entity_nil_flips": agg["flip_diff"],
                "nil_granularity_diff": agg["nil_diff"],
                "mention_rows": n_mentions,
                "label_diff_frac": round(diff / max(1, n_mentions), 4),
                "merge_iterations": inc_res["merge_iterations"],
                "surface_index": use_index,
                "repeats": repeats,
                "cpus": cpus,
                "probe_membw_gbps": membw,
                "probe_membw_gbps_post": _membw(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()


