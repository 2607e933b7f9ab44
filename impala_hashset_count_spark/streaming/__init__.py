from .windows import (
    approx_distinct_stateful,
    events_stream,
    foreach_batch_parquet_sink,
    hashset_count_stateful,
    read_snapshot,
    run_to_memory,
    sessionize_stateful,
    snapshot_changes,
    snapshot_versions,
    stream_bloom_dedup,
    stream_cdc_upsert,
    stream_corpus_drift,
    stream_dedup_within_watermark,
    stream_interval_join,
    stream_interval_join_full_outer,
    stream_index_maintenance,
    stream_interval_join_left_outer,
    stream_quantiles_sketch,
    stream_session_windows,
    stream_sliding_counts,
    stream_static_enrich,
    stream_summary_maintenance,
    stream_top_users_sketch,
    stream_tumbling_counts,
    vacuum_snapshots,
)

# Every public streaming face imported above; submodules excluded so
# star-imports stay function-only (same convention as operators/).
__all__ = sorted(
    n for n, v in globals().items()
    if not n.startswith("_") and callable(v)
)
