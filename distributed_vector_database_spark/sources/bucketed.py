"""Bucketed table layouts: pay the shuffle once at write time.

Workloads that re-join or re-aggregate on the same key every run (session
analytics by user_id, dedup by shingle, vector lookups by id) should not
re-shuffle the fact table every query. ``save_bucketed`` persists the table
hash-partitioned by the key (Spark bucketing); any later equi-join or
groupBy on that key between co-bucketed tables plans WITHOUT an Exchange —
verified by ``tests/test_plans.py``-style plan assertions.

At 100 TB this converts the dominant recurring cost (a full-table shuffle
per pipeline run) into a one-time layout decision, exactly like the IVF
layout converts search into partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["save_bucketed"]


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    *,
    num_buckets: int = 32,
    path: str | None = None,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a bucketed parquet table and return the re-read
    table (whose scan carries the bucketing spec Catalyst needs to elide
    exchanges). ``path`` makes it an external table (recommended — keeps
    data out of the default warehouse)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)
    return df.sparkSession.table(table)
