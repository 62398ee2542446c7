from .events import (
    bottom_k_stream,
    funnel_stream,
    click_purchase_join_stream,
    enrich_stream,
    hourly_rollup_stream,
    read_event_stream,
    run_available_now,
    run_foreach_batch,
    sessionize_stream,
    sliding_rollup_stream,
    stream_dedup,
    value_histogram_stream,
)

__all__ = [
    "bottom_k_stream",
    "funnel_stream",
    "click_purchase_join_stream",
    "enrich_stream",
    "hourly_rollup_stream",
    "read_event_stream",
    "run_available_now",
    "run_foreach_batch",
    "sessionize_stream",
    "sliding_rollup_stream",
    "stream_dedup",
    "value_histogram_stream",
]
