"""Event-time windowed aggregation with watermarked late-data handling
— the Structured-Streaming face of the engine's analytics operators
(batch twin: __spark_entry__.q_events_hourly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming events -> (window_start, window_end, event_type, n,
    sum_value). Watermark bounds state: rows later than ``watermark``
    behind the max event time are dropped and their windows finalized —
    the standard late-data contract for an append-mode sink."""
    # watermarks require TIMESTAMP (with zone); parquet often carries NTZ
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(type_col))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            type_col,
            "n",
            "sum_value",
        )
    )
