"""Structured Streaming operators (SURVEY.md §2.5 N6)."""

from .events import (  # noqa: F401
    dedup_within_watermark,
    foreach_batch_upsert,
    read_documents_stream,
    read_events_stream,
    read_rate_stream,
    run_to_memory,
    session_window_stats,
    sliding_window_counts,
    stream_static_enrich,
    stream_stream_join,
    tumbling_window_counts,
    user_running_state,
    user_running_state_tws,
)
