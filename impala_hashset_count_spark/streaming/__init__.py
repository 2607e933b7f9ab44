from .windows import (
    approx_distinct_stateful,
    events_stream,
    foreach_batch_parquet_sink,
    hashset_count_stateful,
    run_to_memory,
    sessionize_stateful,
    stream_dedup_within_watermark,
    stream_interval_join,
    stream_interval_join_left_outer,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_counts,
)

__all__ = [
    "approx_distinct_stateful",
    "events_stream",
    "foreach_batch_parquet_sink",
    "hashset_count_stateful",
    "run_to_memory",
    "sessionize_stateful",
    "stream_dedup_within_watermark",
    "stream_interval_join",
    "stream_interval_join_left_outer",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_tumbling_counts",
]
