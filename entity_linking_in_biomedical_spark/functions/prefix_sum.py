"""Two-level distributed prefix sum — the scalable global running sum
shared by sequence packing (operators/packing.py) and contiguous output
sharding (operators/sharding.py).

A naive global-window cumsum collapses to ONE partition at 10^12 rows.
Instead: (1) a within-bucket running sum, parallel across buckets;
(2) per-bucket totals (one row per bucket) running-summed on a single
partition that holds only O(n_buckets) rows, broadcast back as each
bucket's starting offset. Requires the bucket column to sort
consistently with the global order (range buckets of a numeric order
key, or the order key's own string prefix). Integer arithmetic
throughout — exact past 2^53.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def bucketed_prefix_sum(
    df: DataFrame,
    bucket_col: str,
    order_cols: tuple[str, ...],
    size_col: str,
    out_col: str,
) -> DataFrame:
    """Append ``out_col`` = sum of ``size_col`` over all rows strictly
    BEFORE this one in the (bucket, *order) global order. ``size_col``
    must be integral; ties across ``order_cols`` must not exist (they
    would make "before" ill-defined)."""
    in_bucket = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within: Column = F.coalesce(
        F.sum(F.col(size_col).cast("bigint")).over(in_bucket),
        F.lit(0).cast("bigint"),
    )
    totals = df.groupBy(bucket_col).agg(
        F.sum(F.col(size_col).cast("bigint")).alias("__bt")
    )
    bucket_order = Window.orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        bucket_col,
        F.coalesce(F.sum("__bt").over(bucket_order), F.lit(0).cast("bigint")).alias(
            "__boff"
        ),
    )
    return (
        df.withColumn("__cum_in", within)
        .join(F.broadcast(offsets), bucket_col)
        .withColumn(out_col, F.col("__boff") + F.col("__cum_in"))
        .drop("__cum_in", "__boff")
    )
