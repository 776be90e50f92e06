"""Distribution profiling: per-group quantiles of a numeric column —
the length/size histograms a curation run reports before and after
every filter stage (and the input to length-based quality cuts).

Two modes with one signature:

- ``exact=True``: Spark's sort-based exact ``percentile`` — linear
  interpolation, bit-identical to DuckDB's ``quantile_cont`` (verified
  cross-engine in the gate query). Exact percentile buffers each
  group's value-counts in the aggregation state, so it is for
  model-sized groups or audit passes, not the 100 TB hot path.
- ``exact=False``: ``approx_percentile`` (Greenwald-Khanna sketch,
  ``accuracy`` trades memory for error) — bounded state per group,
  mergeable map-side, the form that survives 10^12 rows. Tested
  against the exact mode with a rank-error contract rather than an
  equality oracle (sketches are not replayable cross-engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_PROBS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def length_quantiles(
    df: DataFrame,
    col: str,
    by: str | None = None,
    probs: tuple[float, ...] = DEFAULT_PROBS,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """(group?, n, mean, q) — count, mean (exact integer sum / count),
    and the quantile vector of ``col`` per ``by`` group (or globally
    when ``by`` is None)."""
    parr = "array(" + ",".join(repr(float(p)) for p in probs) + ")"
    if exact:
        q = F.expr(f"percentile(`{col}`, {parr})")
    else:
        q = F.expr(f"approx_percentile(`{col}`, {parr}, {int(accuracy)})")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(col).cast("double") / F.count(F.lit(1)), 6).alias("mean"),
        q.alias("q"),
    ]
    g = df.groupBy(by) if by else df.groupBy()
    out = g.agg(*aggs)
    return out


def blocking_key_stats(df: DataFrame, key, channel: str) -> DataFrame:
    """One-row skew/pair-mass profile of a blocking channel: the
    numbers that predict a blocking join's shuffle cost and skew
    BEFORE running it (the pre-flight check the er_pipeline's
    ``blocking_skew_bound`` applies analytically).

    ``key``: the channel's blocking-key column/expression.
    Output row: ``channel, n_keys, n_items, max_bucket,
    candidate_pairs`` (sum of n*(n-1)/2 over buckets — the within-
    channel self-join mass) and ``skew`` (max bucket over mean
    bucket, rounded to 6).

    Cost: one map-side-partial groupBy on the key + a scalar
    aggregate — same shape at 500 rows and 10^12.
    """
    key = F.col(key) if isinstance(key, str) else key
    per_key = df.select(key.alias("_bk")).groupBy("_bk").agg(F.count("*").alias("n"))
    n = F.col("n")
    return per_key.agg(
        F.lit(channel).alias("channel"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum(n).cast("bigint").alias("n_items"),
        F.max(n).cast("bigint").alias("max_bucket"),
        (F.sum(n * (n - F.lit(1))) / F.lit(2)).cast("bigint").alias("candidate_pairs"),
        F.round(F.max(n) * F.count("*") / F.sum(n), 6).alias("skew"),
    )
