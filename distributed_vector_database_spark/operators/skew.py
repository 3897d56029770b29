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

__all__ = ["skew_safe_totals", "salted_join"]


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


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    *,
    buckets: int = 16,
    how: str = "inner",
    salt_from: str | None = None,
) -> DataFrame:
    """Equi-join that survives hot keys on the big side without AQE.

    A shuffled equi-join routes every row of a key to ONE reducer; a key
    holding 10% of 100 TB stalls the stage on a single task. Remedy when
    the dim side is too big to broadcast but small enough to replicate
    ``buckets``-fold: salt the big side with a deterministic hash in
    ``[0, buckets)``, explode the dim side once per salt value, and join on
    ``on + [salt]`` — each hot key now spreads over ``buckets`` tasks.

    Trade-off: dim shuffle volume grows ``buckets``-fold; pick
    ``buckets ~ (hot-key rows / target task rows)``. AQE's skew-split
    (``spark.sql.adaptive.skewJoin``) does this adaptively for sort-merge
    joins; this operator is the explicit form for when AQE is off, the
    plan is a shuffled-hash join, or the salt must be deterministic.

    ``how`` ∈ {inner, left}: every big-side row has exactly one salt, so
    inner/left semantics are preserved exactly. (right/full would need the
    dim side de-duplicated after the join — not supported.)

    ``salt_from``: big-side column to hash for the salt. Default hashes the
    WHOLE row (deterministic, and spreads a hot key's rows across buckets
    even when all its join-key values are equal); pass a single
    high-cardinality column (e.g. the event id) to keep the salt stable
    under schema changes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt_src = F.col(salt_from) if salt_from else F.struct(*big.columns)
    salt_col = F.pmod(F.xxhash64(salt_src), F.lit(buckets)).cast("int")
    big_s = big.withColumn("_salt", salt_col)
    # explode cannot nest inside another expression (e.g. a cast); the int
    # literals already make sequence() produce array<int>
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return big_s.join(dim_s, keys + ["_salt"], how).drop("_salt")
