"""Deterministic sketches: KMV distinct-count estimation, hash sampling.

Classic sketches (HyperLogLog, theta) are engine-specific — their estimates
can't be oracle-compared across engines. These variants are built on the
portable md5 hash (functions/text.py convention: both engines emit the same
lowercase hex), so the ESTIMATES themselves are bit-identical in any engine
— Spark and the DuckDB oracle agree exactly, and re-runs are reproducible.

  - KMV (k minimum values): per group keep the k smallest hash fractions of
    the distinct keys; estimate = (k-1)/h_k [Bar-Yossef et al. 2002]. Error
    ~ 1/sqrt(k). Shuffle cost: one distinct + one window over (group, hash)
    — the k survivors per group are tiny however large the group is.
  - Hash Bernoulli sample: keep rows with hash_fraction(key) < rate — a
    deterministic, join-stable sample (the same key samples identically in
    every table, every run, every engine; no global sort, no RNG state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_fraction",
    "kmv_distinct",
    "hash_sample",
    "hash_split",
    "stratified_hash_sample",
]

_HEX_DIGITS = 12
_DENOM = float(16**_HEX_DIGITS)  # 2^48 — exact in float64


def hash_fraction(col: Column | str) -> Column:
    """md5-derived uniform fraction in [0, 1) — first 12 hex chars as an
    integer over 16^12. DuckDB mirror:
    ``('0x' || substr(md5(x), 1, 12))::BIGINT / 281474976710656.0``."""
    c = F.col(col) if isinstance(col, str) else col
    hx = F.substring(F.md5(c.cast("string")), 1, _HEX_DIGITS)
    return F.conv(hx, 16, 10).cast("double") / F.lit(_DENOM)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    *,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT key): KMV estimator.

    Exact when a group has <= k distinct keys (the sketch holds them all);
    otherwise ``round((k-1) / h_k)`` where h_k is the k-th smallest hash
    fraction. Returns (group_cols..., kmv_distinct BIGINT).
    """
    groups = group_cols or []
    distinct = df.select(*groups, key_col).distinct()
    h = hash_fraction(key_col).alias("_h")
    w = Window.partitionBy(*groups).orderBy(F.asc("_h"))
    ranked = distinct.select(*groups, h).withColumn(
        "_rn", F.row_number().over(w)
    )
    agg = ranked.groupBy(*groups).agg(
        F.count("*").alias("_nd"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_hk"),
    )
    est = F.when(
        F.col("_nd") <= k, F.col("_nd")
    ).otherwise(F.round(F.lit(float(k - 1)) / F.col("_hk")).cast("long"))
    return agg.select(*groups, est.cast("long").alias("kmv_distinct"))


def hash_sample(
    df: DataFrame, key_col: str, rate: float
) -> DataFrame:
    """Deterministic Bernoulli sample: rows whose key's hash fraction is
    below ``rate``. Same keys survive in every run/engine/table."""
    return df.filter(hash_fraction(key_col) < F.lit(rate))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps rows whose
    key hash fraction is below that stratum's rate (``sampleBy`` without
    RNG state). The training-data use: rebalance a corpus — e.g. keep all
    of a rare language but 10% of the dominant one — reproducibly, so a
    re-run or a second table carves the identical subset. Narrow filter,
    no shuffle.
    """
    frac = hash_fraction(key_col)
    s = F.col(strata_col)
    rate = None
    for name, r in rates.items():
        cond = s == F.lit(name)
        rate = (
            F.when(cond, F.lit(float(r)))
            if rate is None
            else rate.when(cond, F.lit(float(r)))
        )
    rate = (
        F.lit(float(default_rate))
        if rate is None
        else rate.otherwise(F.lit(float(default_rate)))
    )
    return df.filter(frac < rate)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
) -> DataFrame:
    """Deterministic train/val/test split: a ``split`` column assigned by
    the key's hash fraction against cumulative ``fractions`` boundaries
    (e.g. ``{"train": 0.8, "val": 0.1, "test": 0.1}``).

    Properties a training pipeline needs and RNG-based ``randomSplit``
    lacks: reproducible across runs/engines/cluster sizes, join-stable
    (the same key lands in the same split in every table), leakage-free
    (membership depends only on the key), and a narrow projection — no
    shuffle, no RNG state.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    frac = hash_fraction(key_col)
    expr = None
    cum = 0.0
    *head, (last_name, _) = list(fractions.items())
    for name, f in head:
        cum += f
        cond_expr = frac < F.lit(cum)
        expr = (
            F.when(cond_expr, F.lit(name))
            if expr is None
            else expr.when(cond_expr, F.lit(name))
        )
    expr = F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))
    return df.withColumn("split", expr)
