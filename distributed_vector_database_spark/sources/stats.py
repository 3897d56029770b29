"""File-level min/max statistics + manual data skipping.

Lakehouse engines (public technique — Delta file stats, Iceberg manifest
metrics, Hudi column stats) keep per-FILE min/max/count so point and
range predicates skip whole files without opening them. Parquet already
stores row-group stats INSIDE each footer, but the scan still has to
open every footer; a stats TABLE moves that check to one tiny metadata
read — at 100 TB (≈ 10⁵-10⁶ files) the difference between "list + open
a million footers" and "filter a million-row stats table" is the
planning time of every selective query.

This module is that pattern on plain parquet:

  - ``collect_file_stats``   one pass over the layout grouped by
                             ``input_file_name()`` → (file, per-column
                             min/max, n_rows), written as a ``_stats``
                             subdir inside the layout (``_`` = hidden to
                             parquet readers, same convention as
                             ``IVFIndex.save_centroids``).
  - ``prune_files``          the files whose [min, max] interval
                             intersects a [lo, hi] predicate range —
                             driver-side over the tiny stats table.
  - ``read_pruned``          ``spark.read.parquet(*survivors)`` with the
                             residual filter re-applied (stats skipping
                             is a superset guarantee, never a substitute
                             for the predicate).

Skipping quality is a LAYOUT property: files written via
``repartitionByRange`` (or the Z-order layout, ``sources/layout.py``)
have disjoint/narrow ranges and skip almost everything; randomly
laid-out files have full-range stats and skip nothing — same contract
as every lakehouse. Composes with partition pruning: stats cover the
files INSIDE surviving partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["collect_file_stats", "prune_files", "read_pruned", "save_stats", "load_stats"]


def collect_file_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """(file, n_rows, <c>_min, <c>_max per col): one aggregation pass
    grouped by ``input_file_name()`` — partial-agg combinable, shuffle
    width = one row per file."""
    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def save_stats(stats: DataFrame, path: str, *, subdir: str = "_stats") -> None:
    """Persist the stats table inside the layout (hidden subdir)."""
    stats.coalesce(1).write.mode("overwrite").json(f"{path}/{subdir}")


def load_stats(
    spark: SparkSession, path: str, *, subdir: str = "_stats"
) -> DataFrame:
    return spark.read.json(f"{path}/{subdir}")


def prune_files(
    stats: DataFrame, col: str, lo, hi
) -> list[str]:
    """Files whose [min, max] interval intersects [lo, hi] (inclusive).
    Null-stat files (all-null column) are kept — stats skipping must be
    a superset guarantee. Driver-side collect of the (tiny) stats table."""
    lo_c, hi_c = F.lit(lo), F.lit(hi)
    keep = (
        F.col(f"{col}_min").isNull()
        | F.col(f"{col}_max").isNull()
        | ~((F.col(f"{col}_max") < lo_c) | (F.col(f"{col}_min") > hi_c))
    )
    return [r["file"] for r in stats.filter(keep).select("file").collect()]


def read_pruned(
    spark: SparkSession,
    stats: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Read ONLY the files surviving stats pruning, with the range
    predicate re-applied as the residual filter (files may straddle the
    boundary). Returns an empty frame with the right schema when nothing
    survives."""
    files = prune_files(stats, col, lo, hi)
    pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    if not files:
        any_file = [r["file"] for r in stats.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError(
                "stats table is empty — collect_file_stats over a layout "
                "with at least one file first"
            )
        return spark.read.parquet(*any_file).filter(F.lit(False))
    return spark.read.parquet(*files).filter(pred)
