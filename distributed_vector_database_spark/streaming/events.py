"""Structured Streaming operators over the events schema.

The reference has NO streaming surface (SURVEY.md §2.9) — ingest is a
synchronous HTTP POST loop (`reference: src/test.py:97-98`). This module is
the beyond-reference extension: the same windowed aggregations the batch
operators compute, expressed so ONE definition serves both batch and
streaming DataFrames (pass either; Spark plans micro-batch state handling
automatically for streams).

Late data: ``tumbling_counts`` applies a watermark when the input is
streaming — state for windows older than the watermark is dropped, bounding
memory at 100 TB/day rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_event_stream", "tumbling_counts", "session_window_stats"]

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, directory: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source event stream: new parquet files in ``directory`` become
    micro-batches (the Spark-native replacement for the reference's per-record
    HTTP ingest)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(directory)
    )


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per (tumbling window, event_type): count + exact DECIMAL value sum.

    Works on batch or streaming input; watermark applied only for streams.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(
        F.window(ts_col, window).alias("w"), F.col(type_col)
    ).agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        type_col,
        "n_events",
        "sum_value",
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user gap-based session windows via Spark's native session_window
    (stream-capable form of operators/sessions.py's sessionize; window end =
    last event + gap by session_window semantics)."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
    ).agg(F.count("*").alias("n_events")).select(
        F.col(user_col),
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )
