"""Empty-input robustness: at 100 TB, empty partitions and empty date
slices are routine — every major operator must produce an empty result
(not crash on a missing first row, a NULL aggregate, or a zero
denominator)."""

import pytest

from impala_hashset_count_spark.operators import (
    bm25_topn,
    exact_dedup,
    hash_split,
    minhash_lsh_pairs,
    shuffle_rows,
    strip_boilerplate_lines,
    term_doc_stats,
    tfidf_top_terms,
    top_tokens,
    unigram_logprob_scores,
)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


@pytest.mark.parametrize(
    "name,op",
    [
        ("term_doc_stats", lambda d: term_doc_stats(d)),
        ("tfidf_top_terms", lambda d: tfidf_top_terms(d)),
        ("bm25_topn", lambda d: bm25_topn(d, ["x"])),
        ("top_tokens", lambda d: top_tokens(d)),
        ("unigram_logprob_scores", lambda d: unigram_logprob_scores(d)),
        ("strip_boilerplate_lines", lambda d: strip_boilerplate_lines(d)),
        ("shuffle_rows", lambda d: shuffle_rows(d, "doc_id")),
        (
            "hash_split",
            lambda d: hash_split(d, "doc_id", {"a": 0.5, "b": 0.5}),
        ),
        ("exact_dedup", lambda d: exact_dedup(d, ["text"], "doc_id")),
        ("minhash_lsh_pairs", lambda d: minhash_lsh_pairs(d, "doc_id", "text")),
    ],
    ids=lambda p: p if isinstance(p, str) else "",
)
def test_operator_empty_input_yields_empty_output(empty_docs, name, op):
    out = op(empty_docs)
    assert out.count() == 0
    # and the schema is still fully resolved (collect of nothing works)
    assert out.collect() == []


def test_gap_fill_empty_events_yields_empty_spine(spark):
    """Empty input -> NULL min/max bounds -> sequence() of NULLs must
    collapse to zero spine rows, not crash."""
    from impala_hashset_count_spark.operators.analytics import gap_fill

    ev = spark.createDataFrame([], "event_id bigint, user_id bigint, event_type string, ts timestamp")
    out = gap_fill(ev, "ts", "event_type", unit="hour")
    assert out.count() == 0
    assert out.collect() == []


def test_simhash_md5_tier_empty_input(spark):
    from impala_hashset_count_spark.operators.dedup import simhash_pairs

    d = spark.createDataFrame([], "doc_id bigint, text string")
    assert simhash_pairs(d, "doc_id", "text", hash_fn="md5").count() == 0


def test_contamination_ops_empty_corpus_and_empty_eval(spark):
    from impala_hashset_count_spark.operators.decontaminate import (
        contamination_stats,
        decontaminate,
    )

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    docs = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id bigint, text string")
    # empty corpus: no rows out
    assert contamination_stats(empty, docs).count() == 0
    assert decontaminate(empty, docs).count() == 0
    # empty eval set: nothing is contaminated, corpus passes through
    assert decontaminate(docs, empty).count() == 1
    stats = contamination_stats(docs, empty).collect()
    assert len(stats) == 1 and stats[0].n_hits == 0 and not stats[0].contaminated


def test_bmp_resize_tier_empty_dataframe(spark):
    from impala_hashset_count_spark.operators.multimodal import resize_images

    df = spark.createDataFrame([], "doc_id bigint, payload binary")
    assert resize_images(df, target=8, decode="bmp").count() == 0
