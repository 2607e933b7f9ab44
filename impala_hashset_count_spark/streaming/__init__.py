from .windows import (
    events_stream,
    run_to_memory,
    sessionize_stateful,
    stream_dedup_within_watermark,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_counts,
)

__all__ = [
    "events_stream",
    "run_to_memory",
    "sessionize_stateful",
    "stream_dedup_within_watermark",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_tumbling_counts",
]
