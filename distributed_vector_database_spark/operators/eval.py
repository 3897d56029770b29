"""Search-quality evaluation: recall@k of an approximate result vs exact.

"Measure, don't guess" for the approximate operators (IVF with
nprobe < num_shards, sign-LSH buckets): recall@k against the brute-force
top-k is the scalar that tells you whether a speedup was free or paid for
in quality. The reference never measures recall (its benchmarks are
latency-only, `reference: report/benchmarks.py:5-24`); at 100 TB you tune
nprobe / LSH bits against THIS number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["recall_at_k"]


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    *,
    id_col: str = "vec_id",
    query_col: str | None = None,
) -> DataFrame:
    """|approx ∩ exact| / |exact| per query (one global row when
    ``query_col`` is None — the single-query case).

    Both inputs are top-k result frames carrying ``id_col`` (and
    ``query_col`` for batched search). Join is a broadcast-friendly semi
    join on the tiny result sets.
    """
    keys = [query_col, id_col] if query_col else [id_col]
    hit = approx.select(*keys).join(exact.select(*keys), keys, "left_semi")
    group = [query_col] if query_col else []
    n_exact = (
        exact.groupBy(*group).agg(F.count("*").alias("n_exact"))
        if group
        else exact.agg(F.count("*").alias("n_exact"))
    )
    n_hit = (
        hit.groupBy(*group).agg(F.count("*").alias("n_hit"))
        if group
        else hit.agg(F.count("*").alias("n_hit"))
    )
    joined = (
        n_exact.join(n_hit, group, "left") if group else n_exact.crossJoin(n_hit)
    )
    return joined.select(
        *group,
        F.round(
            F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 6
        ).alias("recall"),
        "n_hit",
        "n_exact",
    )
