from .windows import (
    read_events_stream,
    tumbling_counts,
    sliding_counts,
    session_aggregates,
    run_to_memory_sink,
    stream_upsert_sink,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_aggregates",
    "run_to_memory_sink",
    "stream_upsert_sink",
]
