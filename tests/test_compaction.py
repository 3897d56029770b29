"""Compaction of streamed small-file layouts (ROADMAP #4)."""

import pyspark.sql.functions as F
import pytest

from distributed_vector_database_spark.operators.ivf import IVFIndex
from distributed_vector_database_spark.sources.compaction import (
    compact_layout,
    layout_file_stats,
)

N_SHARDS = 4


@pytest.fixture()
def fragmented_index(spark, embeddings, tmp_path):
    """A path-backed IVF layout fragmented by many tiny appends (the state
    stream_ingest leaves after many micro-batches)."""
    path = str(tmp_path / "ivf_layout")
    cents = [
        [float(i == j) for j in range(64)] for i in range(N_SHARDS)
    ]
    idx = IVFIndex(spark, cents, path=path)
    emb = embeddings.limit(200)
    idx.write(emb.limit(40))  # initial batch
    for i in range(1, 5):  # 4 tiny appends, each adds files per shard
        batch = emb.filter(
            (F.col("vec_id") >= 40 * i) & (F.col("vec_id") < 40 * (i + 1))
        )
        (
            idx.assign(batch)
            .repartition("shard_id")
            .write.mode("append")
            .partitionBy("shard_id")
            .parquet(path)
        )
    return idx, path, emb


def test_compaction_preserves_rows_and_reduces_files(
    spark, fragmented_index
):
    idx, path, emb = fragmented_index
    before = {
        r["partition"]: r["n_files"]
        for r in layout_file_stats(spark, path).collect()
    }
    assert max(before.values()) >= 3, "fixture should be fragmented"
    rows_before = sorted(
        (r["vec_id"], r["shard_id"])
        for r in spark.read.parquet(path).collect()
    )

    summary = compact_layout(spark, path, min_files=1)
    assert summary["partitions_compacted"] >= 1
    assert summary["files_after"] < summary["files_before"]

    after = layout_file_stats(spark, path).collect()
    assert all(r["n_files"] == 1 for r in after), after
    rows_after = sorted(
        (r["vec_id"], r["shard_id"])
        for r in spark.read.parquet(path).collect()
    )
    assert rows_after == rows_before


def test_compaction_keeps_partition_pruning(spark, fragmented_index):
    idx, path, emb = fragmented_index
    compact_layout(spark, path, min_files=1)
    df = spark.read.parquet(path).filter(F.col("shard_id") == 0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard_id" in plan or (
        "shard_id" in plan.split("PartitionFilters")[1].split("]")[0]
    )
    assert df.count() > 0


def test_compaction_idempotent_and_respects_target(spark, fragmented_index):
    idx, path, emb = fragmented_index
    s1 = compact_layout(spark, path, min_files=1)
    s2 = compact_layout(spark, path, min_files=1)
    assert s2["partitions_compacted"] == 0
    assert s2["files_before"] == s2["files_after"] == s1["files_after"]
