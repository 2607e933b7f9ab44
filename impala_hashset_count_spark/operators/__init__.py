from .analytics import cohort_retention, gap_fill
from .asof import asof_join
from .corpus_stats import (
    bm25_topn,
    doc_frequency,
    term_doc_stats,
    tfidf_top_terms,
    top_tokens,
    unigram_logprob_scores,
)
from .decontaminate import contamination_stats, decontaminate, eval_shingle_index
from .dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    exact_dedup_incremental,
    minhash_lsh_pairs,
    near_dup_components,
    near_dup_components_star,
    near_dup_dedup,
    ngram_jaccard_pairs,
    semantic_dedup,
    semantic_dedup_components,
    simhash_n_chunks,
    simhash_pairs,
    simhash_pairs_from_signatures,
    simhash_pairs_incremental,
)
from .line_dedup import boilerplate_lines, strip_boilerplate_lines
from .bitmap_distinct import (
    bitmap_accumulate,
    bitmap_count,
    bitmap_distinct_count,
    bitmap_merge,
    bitmap_set_counts,
)
from .substring_dedup import (
    duplicated_spans,
    duplicated_spans_incremental,
    gram_count_index,
    strip_duplicated_spans,
    update_gram_index,
)
from .hashset_count import (
    approx_distinct_count,
    distinct_sketch_table,
    hashset_count_agg,
    hashset_count_df,
    hashset_count_df_guarded,
    hashset_count_rdd,
    make_hashset_count_udaf,
    register_sql_udaf,
    rollup_distinct_from_sketches,
)
from .packing import chunk_documents, pack_sequences_greedy
from .sampling import (
    cap_per_key,
    hash_split,
    mix_corpus,
    priority_sample,
    shuffle_rows,
    stratified_hash_sample,
    temperature_mix,
)
from .similarity import (
    brute_force_topk,
    ivf_topk,
    ivfpq_topk,
    lsh_topk,
    pq_encode,
    pq_topk,
    train_pq,
)
from .skew import bucketed_table, salted_join
from .aggstate import (
    agg_state_accumulate,
    agg_state_finalize,
    agg_state_merge,
)
from .analytics import event_transitions, histogram_fixed
from .bloom import bloom_build, bloom_dedup_incremental, bloom_probe
from .checks import (
    check_constraints,
    check_foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    observe_constraints,
    satisfies,
    unique,
)
from .cms import cms_accumulate, cms_estimate, cms_merge
from .decontaminate import semantic_decontaminate
from .dedup import (
    edit_distance_pairs,
    minhash_lsh_index,
    minhash_lsh_pairs_incremental,
    ngram_jaccard_pairs_prefix,
)
from .drift import distribution_drift, drift_from_counts
from .fileindex import (
    build_file_index,
    build_rowgroup_index,
    compact_small_files,
    prune_files,
    prune_rowgroups,
    read_pruned,
    read_pruned_rowgroups,
    update_file_index,
)
from .graph import degrees, pagerank_fixed, triangle_counts, triangles
from .ivm import maintain_join_view
from .kmv import (
    kmv_accumulate,
    kmv_combine,
    kmv_estimate,
    kmv_set_estimates,
)
from .merge import apply_changes, diff_snapshots, latest_changes, merge_scd2
from .multimodal import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    extract_audio_features,
    extract_image_metadata,
    frame_sample_hashes,
    resize_images,
    wav_features,
)
from .profile import profile_table
from .quality_model import filter_by_quality_model, train_quality_model
from .quantiles import bottomk_sample, mad_disc, quantiles_disc
from .range_join import binned_interval_join, binned_range_join
from .zorder import cluster_write, zorder_key

# Every public operator imported above; submodules (non-callables) are
# excluded so star-imports stay function-only.
__all__ = sorted(
    n for n, v in globals().items()
    if not n.startswith("_") and callable(v)
)
