from .stream import (
    hourly_rollup_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
)

__all__ = [
    "hourly_rollup_stream",
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize_stream",
]
