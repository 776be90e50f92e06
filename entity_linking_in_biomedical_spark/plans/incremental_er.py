"""Incremental entity resolution over arriving document snapshots.

The batch pipeline (``plans/pipeline.run_pipeline``) re-derives the
whole match graph per run. At 10^12-document scale a corpus is not
re-linked when a crawl snapshot lands — the snapshot is linked in
isolation (O(snapshot × entities) work: mentions, blocking, scoring,
and clustering all touch only the arriving documents plus the static
entity dictionary) and its match DECISIONS are folded into the
persisted cluster assignments with
``operators/clustering.merge_into_clusters`` (contracted-graph CC +
one broadcast relabel — no corpus shuffle).

Semantics: the merged clustering is the transitive closure of BOTH
runs' match edges. Surfaces are nodes ("s|<norm>"), so a surface seen
in an earlier snapshot unifies with its re-occurrence automatically
(identical node id); entity-pinned roots ("e|<cui>" < "m|", "s|")
compose across snapshots by the same lexicographic-min rule the batch
clustering uses. Mention→entity decisions are per-surface against the
STATIC dictionary, hence split-invariant: linking a corpus in K
snapshots yields the same me-edges as one batch run. The one
documented approximation is the mention↔mention channel: NEAR-dup NIL
surface pairs whose two members arrive in different snapshots are not
paired (exact re-occurrences are — same node). Recovering those needs
a persisted surface blocking-key index, the same state trade every
incremental blocker makes; on the shipped synthetic corpus the
snapshot composition reproduces the full-batch golden exactly
(tests/test_incremental_er.py, and the ``er_incremental`` driver query
hash-matches the same frozen golden as ``er_synthetic``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.clustering import merge_into_clusters
from .pipeline import PipelineConfig, run_pipeline


def assignments_to_edges(assignments: DataFrame) -> DataFrame:
    """Star edges (cluster_id -> node) of a clustering — the minimal
    edge set whose CC reproduces it. Singletons emit no edge."""
    return assignments.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("cluster_id").alias("src"), F.col("node").alias("dst")
    )


def link_snapshot(
    spark: SparkSession,
    new_documents: DataFrame,
    entities: DataFrame,
    prior_assignments: DataFrame | None,
    embeddings: DataFrame | None = None,
    abbr_map: DataFrame | None = None,
    cfg: PipelineConfig = PipelineConfig(),
    out_dir: str | None = None,
) -> dict:
    """Link an arriving snapshot and merge into ``prior_assignments``
    (node, cluster_id; None or empty for the first snapshot).

    Runs the full three-stage pipeline on the SNAPSHOT only (resumable
    via ``out_dir`` exactly like a batch run — use a fresh directory
    per snapshot), converts its clustering to star edges plus singleton
    nodes, and folds both into the persisted assignments. Returns the
    pipeline's result dict with ``assignments`` replaced by the MERGED
    corpus-level assignments, ``mention_clusters`` relabeled to the
    merged cluster ids, and ``merge_iterations`` added.
    """
    res = run_pipeline(
        spark,
        new_documents,
        entities,
        embeddings=embeddings,
        abbr_map=abbr_map,
        cfg=cfg,
        out_dir=out_dir,
    )
    snap = res["assignments"].select("node", "cluster_id")
    if prior_assignments is None:
        prior_assignments = snap.limit(0)
    merged, iters = merge_into_clusters(
        prior_assignments,
        assignments_to_edges(snap),
        new_nodes=snap.select("node"),
    )
    res["assignments"] = merged
    res["merge_iterations"] = iters
    res["mention_clusters"] = relabel_mentions(res["mentions"], merged)
    return res


def relabel_mentions(mentions: DataFrame, assignments: DataFrame) -> DataFrame:
    """(doc_id, span_seq, surface, norm, cluster_id) under corpus-level
    ``assignments`` — the same e|->CUI / NIL_<root> mapping the batch
    pipeline applies (plans/pipeline.py), against the merged state."""
    surf = assignments.filter(F.col("node").startswith("s|")).select(
        F.expr("substring(node, 3)").alias("norm"),
        F.when(
            F.col("cluster_id").startswith("e|"),
            F.expr("substring(cluster_id, 3)"),
        )
        .otherwise(F.concat(F.lit("NIL_"), F.expr("substring(cluster_id, 3)")))
        .alias("cluster_id"),
    )
    return mentions.join(surf, "norm", "left").select(
        "doc_id", "span_seq", "surface", "norm", "cluster_id"
    )
