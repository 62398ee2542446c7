from .events import (
    hourly_rollup_stream,
    read_event_stream,
    run_available_now,
    run_foreach_batch,
    sessionize_stream,
    stream_dedup,
)

__all__ = [
    "hourly_rollup_stream",
    "read_event_stream",
    "run_available_now",
    "run_foreach_batch",
    "sessionize_stream",
    "stream_dedup",
]
