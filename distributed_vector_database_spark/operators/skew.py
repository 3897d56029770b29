"""Skew-resistant aggregation: explicit two-phase (salted) combine.

Spark's hash aggregate already does map-side partial aggregation, but when
a handful of group keys dominate (classic: event_type with 6 values over
billions of rows) the FINAL combine still funnels each hot key through one
reducer task. Salting the first phase spreads each hot key over ``buckets``
reducers; the second phase combines ``|keys| x buckets`` tiny partials.

Exactness: counts are integers and value sums go through DECIMAL, so the
two-phase regrouping cannot change results (double sums would differ by
accumulation order — that's why the contract bans them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skew_safe_totals"]


def skew_safe_totals(
    df: DataFrame,
    keys: list[str],
    *,
    value_col: str = "value",
    salt_from: str | None = None,
    buckets: int = 32,
) -> DataFrame:
    """Per-key ``n_events`` (count) and ``sum_value`` (exact DECIMAL sum,
    rounded to 2dp) via salt -> partial agg -> final combine.

    ``salt_from`` names a high-cardinality column whose deterministic hash
    spreads the hot keys (defaults to the value column). Random salts would
    also work but make runs non-reproducible.
    """
    salt = F.pmod(F.hash(F.col(salt_from or value_col)), F.lit(buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_s"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_events"),
        F.round(F.sum("_s").cast("double"), 2).alias("sum_value"),
    )
