"""Streaming vector ingest into an IVF layout.

The reference ingests vectors one synchronous HTTP POST at a time
(`reference: src/test.py:97-98` -> `src/compute_server.py:82-91`). The
Spark-native continuous form is a Structured Streaming sink: each
micro-batch is shard-assigned with the index's broadcast centroids and
APPENDED to the partitioned parquet layout — the same write path as the
batch `IVFIndex.write`, with exactly-once progress via the checkpoint.

Scale notes: assignment is a narrow map (centroids broadcast); the only
wide step is the per-batch repartition by shard_id so each micro-batch adds
O(num_shards) files instead of O(input_partitions x num_shards). Compact
small files periodically (a batch `write` over the accumulated table) if
micro-batches are tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from distributed_vector_database_spark.operators.ivf import IVFIndex

__all__ = ["stream_ingest"]


def stream_ingest(
    index: IVFIndex,
    stream_df: DataFrame,
    checkpoint_dir: str,
):
    """Start a streaming query appending ``stream_df`` into ``index.path``.

    Returns the StreamingQuery; call ``processAllAvailable()`` /
    ``stop()`` (or let it run). The index must be path-backed.
    """
    if index.path is None:
        raise ValueError("stream_ingest requires a path-backed IVFIndex")
    if not stream_df.isStreaming:
        raise ValueError("stream_df must be a streaming DataFrame")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        assigned = index.assign(batch_df)
        (
            assigned.repartition("shard_id")
            .write.mode("append")
            .partitionBy("shard_id")
            .parquet(index.path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
