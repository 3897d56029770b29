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

__all__ = [
    "collect_file_stats",
    "prune_files",
    "read_pruned",
    "save_stats",
    "load_stats",
    "collect_file_blooms",
    "prune_files_bloom",
    "read_bloom_pruned",
    "footer_stats",
]


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


# ---------------------------------------------------------------------------
# File-level Bloom filters: point-lookup skipping where min/max can't help.
#
# Min/max stats only skip when the LAYOUT clusters the column (range /
# Z-order); on a hash-distributed or append-ordered layout every file spans
# the full key range and min/max prunes nothing. A per-file Bloom filter
# skips by CONTENT instead: k hash-bit positions per value, OR-ed into a
# per-file bitset; a point lookup opens only files whose bitset has all k
# bits of the probe key (public technique — Parquet bloom_filter column
# option, Delta/Hudi bloom indexes). False positives cost an extra file
# open; false negatives are impossible, so the residual filter keeps
# results exact.
# ---------------------------------------------------------------------------


def collect_file_blooms(
    spark: SparkSession,
    path: str,
    col: str,
    *,
    m_bits: int = 32768,
    k: int = 5,
) -> DataFrame:
    """Per-file Bloom bitsets for ``col``, stored SPARSE as the sorted
    array of set bit positions (bounded by ``m_bits`` entries).

    SIZE ``m_bits`` TO THE LAYOUT: false-positive rate is
    ``(1 - e^(-k*n/m))^k`` for n distinct keys per file — aim for
    ~10 bits per key (the default 32768 holds ~3k keys per file at
    <0.1% FP; a saturated filter silently keeps every file). At 100 TB
    file sizes (10^6+ keys), pass m_bits in the tens of millions — the
    sparse array then approaches dense-bitset size, which is still only
    ~1-10 MB per file row.

    One pass: k xxhash64 bit positions per row (JVM-side, codegen'd),
    explode, map-side-deduped collect_set per file — shuffle width is at
    most files x m_bits rows, independent of table size.
    """
    df = spark.read.parquet(path)
    # hash the STRING form: xxhash64 output depends on the input's physical
    # type (int32 vs int64 hash differently), and the probe side builds its
    # key from a Python literal whose Spark type need not match the column's.
    # Casting both sides to string makes build and probe agree by canon.
    key = F.col(col).cast("string")
    pos = F.array_distinct(
        F.array(
            *[
                F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
                for i in range(k)
            ]
        )
    )
    return (
        df.select(F.input_file_name().alias("file"), F.explode(pos).alias("bit"))
        .groupBy("file")
        .agg(F.array_sort(F.collect_set("bit")).alias("bits"))
        .withColumn("m_bits", F.lit(m_bits))
        .withColumn("k", F.lit(k))
    )


def prune_files_bloom(blooms: DataFrame, value) -> list[str]:
    """Files that MAY contain ``value``: all k probe bits set in the
    file's bitset. Hash params come from the bloom table itself so probe
    and build always agree. Driver-side over the tiny metadata table."""
    head = blooms.select("m_bits", "k").head()
    if head is None:
        raise ValueError(
            "bloom table is empty — collect_file_blooms over a layout "
            "with at least one file first"
        )
    m_bits, k = int(head["m_bits"]), int(head["k"])
    cond = F.lit(True)
    probe = F.lit(value).cast("string")  # canon type, mirrors the build side
    for i in range(k):
        bit = F.pmod(F.xxhash64(probe, F.lit(i)), F.lit(m_bits))
        cond = cond & F.array_contains(F.col("bits"), bit)
    return [r["file"] for r in blooms.filter(cond).select("file").collect()]


def read_bloom_pruned(
    spark: SparkSession, blooms: DataFrame, col: str, value
) -> DataFrame:
    """Point lookup over ONLY the bloom-surviving files, with the
    equality predicate re-applied (false positives open a file and then
    filter to nothing — never a wrong row)."""
    files = prune_files_bloom(blooms, value)
    if not files:
        any_file = [r["file"] for r in blooms.select("file").limit(1).collect()]
        return spark.read.parquet(*any_file).filter(F.lit(False))
    return spark.read.parquet(*files).filter(F.col(col) == F.lit(value))


def footer_stats(spark, path: str, minmax_cols, *, count: bool = True):
    """MIN/MAX/COUNT answered entirely from parquet FOOTERS — zero row
    groups decoded. Uses the V2 parquet scan's aggregate pushdown
    (`spark.sql.parquet.aggregatePushdown`; the plan's BatchScan carries
    ``PushedAggregation: [MIN(..), MAX(..), COUNT(*)]``), the engine-side
    twin of this module's manual min/max skipping.

    The V2-source and pushdown confs are flipped only around this call
    (execution is forced inside the scope — laziness would otherwise
    plan the scan AFTER the confs are restored) and restored afterwards,
    so surrounding queries keep their V1 plans. Returns a
    ``(row, plan)`` tuple: the one-row aggregate Row (fields
    ``min_<c>/max_<c>/cnt``) and the formatted physical plan string the
    scan executed under (so callers can assert ``PushedAggregation`` —
    see ``queries.q_footer_minmax_stats``).

    At 100 TB this is the difference between a metadata-only job (one
    footer read per file) and a full-column scan for audit queries like
    "what id range / how many rows does this dataset hold".
    """
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.sources.useV1SourceList",
            "spark.sql.parquet.aggregatePushdown",
        )
    }
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        df = spark.read.parquet(path)
        aggs = []
        for c in minmax_cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        if count:
            aggs.append(F.count(F.lit(1)).alias("cnt"))
        agg_df = df.agg(*aggs)
        plan = agg_df._sc._jvm.PythonSQLUtils.explainString(
            agg_df._jdf.queryExecution(), "formatted"
        )
        row = agg_df.head()  # force execution while the V2 confs hold
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return row, plan
