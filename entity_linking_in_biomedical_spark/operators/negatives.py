"""W3 — semi-hard negative selection (the last §2 operator).

The reference's batch sampler (src/data/batch_sampler.py:242-264) picks,
per anchor, the highest-scoring negative strictly inside the semi-hard
band (pos - margin < neg < pos); if the band is empty it falls back to
the easiest negative when negatives outscore the positive, else the
hardest. (The reference probes ``neg_affin[0]`` — the first negative in
batch order — for that fallback test; batch order is a sampling
artifact, so this operator uses the deterministic equivalent "any
negative >= pos".)

Expressed as two aggregations + one window over the pair frame — no
UDF, no per-anchor Python. At scale the window partitions by anchor,
the same key the scoring join already shuffled on, so AQE reuses the
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def semi_hard_negatives(
    pairs: DataFrame,
    anchor: str = "anchor",
    cand: str = "cand",
    score: str = "score",
    is_pos: str = "is_pos",
    margin: float = 0.2,
) -> DataFrame:
    """pairs(anchor, cand, score, is_pos) -> one negative per anchor:
    (anchor, cand, score, kind) with kind in
    {semi_hard, easiest, hardest}. Anchors lacking a positive or a
    negative are dropped (the reference iterates anchors that have
    both)."""
    pos = (
        pairs.filter(F.col(is_pos))
        .groupBy(anchor)
        .agg(F.max(score).alias("_pos"))
    )
    negs = pairs.filter(~F.col(is_pos)).join(pos, anchor)
    in_band = (F.col(score) < F.col("_pos")) & (
        F.col(score) > F.col("_pos") - margin
    )
    negs = negs.withColumn("_in_band", in_band)
    kinds = negs.groupBy(anchor).agg(
        F.max(F.col("_in_band")).alias("_has_band"),
        F.max(F.col(score) >= F.col("_pos")).alias("_any_ge"),
    )
    negs = negs.join(kinds, anchor).withColumn(
        "kind",
        F.when(F.col("_has_band"), F.lit("semi_hard"))
        .when(F.col("_any_ge"), F.lit("easiest"))
        .otherwise(F.lit("hardest")),
    )
    # eligible rows: the band when it exists, every negative otherwise
    negs = negs.filter(F.col("_in_band") | ~F.col("_has_band"))
    # easiest -> min score; semi_hard / hardest -> max score; ties by cand
    order = F.when(F.col("kind") == "easiest", F.col(score)).otherwise(-F.col(score))
    w = Window.partitionBy(anchor).orderBy(order.asc(), F.col(cand).asc())
    return (
        negs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(anchor, cand, score, "kind")
    )
