from distributed_vector_database_spark.streaming.events import (
    tumbling_counts,
    session_window_stats,
    read_event_stream,
)

__all__ = ["tumbling_counts", "session_window_stats", "read_event_stream"]
