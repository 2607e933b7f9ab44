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
    near_dup_dedup,
    ngram_jaccard_pairs,
    semantic_dedup,
    semantic_dedup_components,
    simhash_pairs,
)
from .line_dedup import boilerplate_lines, strip_boilerplate_lines
from .hashset_count import (
    approx_distinct_count,
    distinct_sketch_table,
    hashset_count_agg,
    hashset_count_df,
    hashset_count_rdd,
    make_hashset_count_udaf,
    register_sql_udaf,
    rollup_distinct_from_sketches,
)
from .packing import chunk_documents, pack_sequences_greedy
from .sampling import hash_split, mix_corpus, shuffle_rows, stratified_hash_sample
from .similarity import brute_force_topk, ivf_topk, lsh_topk
from .skew import bucketed_table, salted_join

__all__ = [
    "approx_distinct_count",
    "bm25_topn",
    "boilerplate_lines",
    "strip_boilerplate_lines",
    "doc_frequency",
    "hash_split",
    "term_doc_stats",
    "tfidf_top_terms",
    "top_tokens",
    "unigram_logprob_scores",
    "asof_join",
    "brute_force_topk",
    "bucketed_table",
    "chunk_documents",
    "cohort_retention",
    "contamination_stats",
    "decontaminate",
    "eval_shingle_index",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "exact_dedup_incremental",
    "gap_fill",
    "distinct_sketch_table",
    "hashset_count_agg",
    "hashset_count_df",
    "hashset_count_rdd",
    "ivf_topk",
    "lsh_topk",
    "make_hashset_count_udaf",
    "minhash_lsh_pairs",
    "mix_corpus",
    "near_dup_components",
    "near_dup_dedup",
    "ngram_jaccard_pairs",
    "pack_sequences_greedy",
    "register_sql_udaf",
    "rollup_distinct_from_sketches",
    "salted_join",
    "semantic_dedup",
    "shuffle_rows",
    "semantic_dedup_components",
    "simhash_pairs",
    "stratified_hash_sample",
]
