from distributed_vector_database_spark.streaming.events import (
    tumbling_counts,
    session_window_stats,
    read_event_stream,
    join_event_streams,
)
from distributed_vector_database_spark.streaming.docs import (
    read_document_stream,
    stream_minhash_dedup,
    read_bucket_owners,
    stream_bigram_counts,
)

__all__ = [
    "tumbling_counts",
    "session_window_stats",
    "read_event_stream",
    "join_event_streams",
    "read_document_stream",
    "stream_minhash_dedup",
    "read_bucket_owners",
    "stream_bigram_counts",
]
