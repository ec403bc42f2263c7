from .incremental_profile import profile_of_stream, run_incremental_profile
from .stream import (
    hourly_rollup_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
)

__all__ = [
    "hourly_rollup_stream",
    "profile_of_stream",
    "run_incremental_profile",
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize_stream",
]
