from distributed_vector_database_spark.streaming.events import (
    tumbling_counts,
    session_window_stats,
    read_event_stream,
    join_event_streams,
)

__all__ = [
    "tumbling_counts",
    "session_window_stats",
    "read_event_stream",
    "join_event_streams",
]
