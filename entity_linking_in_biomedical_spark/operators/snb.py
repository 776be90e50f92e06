"""Multi-pass sorted-neighborhood blocking (Hernández & Stolfo 1995).

The third classic blocking family, complementing the engine's existing
key-equality + deletion-neighborhood + MinHash/LSH channels
(operators/blocking.py — the reference's own blocking is a dense
cosine top-k, candidate_generator.py:89-127, which none of this
resembles by design): sort all records by a blocking key, slide a
window of ``w`` down the sorted list, and emit every pair that
co-occurs inside the window. Errors in the key's *tail* don't break
the pairing (unlike key equality), and no token overlap at all is
needed (unlike LSH) — two records pair whenever their keys land
lexicographically close. Multi-pass SNB runs several cheap passes with
differently-built keys and unions the pairs, which is how the method
reaches high recall in practice.

Scale shape — the textbook formulation is a global sort plus
``row_number()`` over an UNPARTITIONED window: one partition holding
all 10^12 rows. Here the global rank is distributed:

  1. ``repartitionByRange`` on (key, id) — Spark's sampled range
     exchange, which balances bucket sizes even under adversarial key
     skew (a fixed key-prefix bucketing would put every "the ..."
     document in one task) and guarantees bucket order is consistent
     with key order;
  2. the shared two-level prefix sum (functions/prefix_sum.py) over
     the partition id: a per-bucket window (parallel) plus an
     O(n_buckets)-row offset table broadcast back.

The global rank is exact regardless of where the sampled boundaries
fall, because ranks only depend on the total order, not the split
points. The window pairing is then an equi-join on a DENSE INTEGER
rank (left side exploded over offsets 1..w-1) — uniform keys by
construction, so no skew handling is needed; cost O(n·(w−1)) rows.

Pairs are emitted in sort order per pass (``id_a`` precedes ``id_b``
in the pass' key order); the multi-pass wrapper canonicalizes to
``least/greatest`` and records which passes produced each pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.prefix_sum import bucketed_prefix_sum


def global_rank(
    df: DataFrame,
    order_col: str,
    id_col: str,
    out_col: str = "rank",
    num_buckets: int | None = None,
) -> DataFrame:
    """Append the exact 0-based global rank of each row under
    (order_col, id_col) ordering — distributed (no unpartitioned
    window over the row stream). ``id_col`` must be unique: it breaks
    order ties, keeping "rows strictly before" well-defined."""
    n = num_buckets or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    parted = (
        df.repartitionByRange(n, F.col(order_col), F.col(id_col))
        .withColumn("__bkt", F.spark_partition_id())
        .withColumn("__one", F.lit(1))
    )
    return bucketed_prefix_sum(
        parted, "__bkt", (order_col, id_col), "__one", out_col
    ).drop("__bkt", "__one")


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key: Column,
    window: int,
    num_buckets: int | None = None,
) -> DataFrame:
    """One SNB pass: -> (id_a, id_b), every unordered record pair whose
    ranks under the key sort are less than ``window`` apart. ``id_a``
    is the rank-earlier record. Rows with NULL/empty keys carry no
    blocking signal and are dropped (standard SNB practice — they
    would otherwise all sort adjacent and pair with each other)."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    keyed = (
        df.select(F.col(id_col).alias("id"), key.alias("__k"))
        .filter(F.col("__k").isNotNull() & (F.col("__k") != ""))
    )
    ranked = global_rank(keyed, "__k", "id", num_buckets=num_buckets)
    left = ranked.select(
        F.col("id").alias("id_a"),
        F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("__d"),
        "rank",
    ).select("id_a", (F.col("rank") + F.col("__d")).alias("rank"))
    return left.join(
        ranked.select(F.col("id").alias("id_b"), "rank"), "rank"
    ).select("id_a", "id_b")


def multipass_sorted_neighborhood(
    df: DataFrame,
    id_col: str,
    passes: dict[str, Column],
    window: int,
    num_buckets: int | None = None,
) -> DataFrame:
    """Multi-pass SNB: union the per-pass pair sets, canonicalize each
    pair to (least, greatest) id, and record the sorted set of pass
    names that produced it -> (id_a, id_b, passes). The result is the
    candidate-pair frame a pairwise scoring stage consumes; to use SNB
    as an extra channel of the ER pipeline, union these id pairs with
    ``block_candidates``' output before scoring."""
    if not passes:
        raise ValueError("at least one pass is required")
    per_pass = [
        sorted_neighborhood_pairs(
            df, id_col, key, window, num_buckets=num_buckets
        ).withColumn("__pass", F.lit(name))
        for name, key in passes.items()
    ]
    u = per_pass[0]
    for p in per_pass[1:]:
        u = u.unionByName(p)
    return (
        u.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "__pass",
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.array_join(F.array_sort(F.collect_set("__pass")), ",").alias(
                "passes"
            )
        )
    )
