"""Event-stream batch operators: sessionization, windowed rollups, running
aggregates.

Beyond-reference surface (the reference has zero streaming/temporal operators,
SURVEY.md §2.9) over the ``events`` table; the Structured-Streaming versions
live in streaming/. All window specs are (user_id) partitions ordered by
(ts, event_id) — the event_id tie-break keeps results deterministic.

Scale notes: every operator here shuffles once by user_id (the session key).
Skewed power-users are the classic hazard — AQE skew-join/partition splitting
handles moderate skew; for pathological keys pre-aggregate per (user_id, day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats", "running_totals", "latest_event_per_user"]


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign a per-user session index: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``.

    Classic two-window plan: lag to flag boundaries, running sum to number
    sessions. Returns the input plus ``session_ix`` (1-based per user).
    """
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    # cast: unix_timestamp is LTZ-strict and parquet ts may arrive NTZ
    # under a default session; the gap DIFFERENCE cancels any fixed offset
    gap = F.unix_timestamp(F.col(ts_col).cast("timestamp")) - F.unix_timestamp(
        prev_ts.cast("timestamp")
    )
    boundary = F.when(
        prev_ts.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_ix",
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """One row per session: start/end, event count, exact value sum.

    Value sums go through DECIMAL so they are order-independent (double
    summation order differs between engines and between Spark runs).
    """
    s = sessionize(
        events, gap_seconds, user_col=user_col, ts_col=ts_col, id_col=id_col
    )
    return s.groupBy(user_col, "session_ix").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_value"),
    )


def running_totals(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running event count and running value sum (exact DECIMAL
    accumulation), ordered by (ts, event_id)."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        F.col(id_col),
        F.col(user_col),
        F.count("*").over(w).alias("running_n"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,2)")).over(w).cast("double"),
            2,
        ).alias("running_value"),
    )


def latest_event_per_user(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Most recent event per user (row_number DESC = keep-latest dedup —
    the same window shape as the vector store's upsert, SURVEY.md §2.5)."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
