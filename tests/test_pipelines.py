"""End-to-end curation pipeline: operator composition, accounting
invariants, and packed-output contract."""

from pyspark.sql import functions as F

from impala_hashset_count_spark.functions.text import fingerprint_md5, quality_score
from impala_hashset_count_spark.pipelines import corpus_token_histogram, curate_corpus
from impala_hashset_count_spark.sources.tables import load_table


def test_curate_corpus_end_to_end(spark, sf_small, tmp_path):
    out_dir = str(tmp_path / "curated")
    stats = curate_corpus(
        spark, sf_small, out_dir, min_quality=0.3, chunk_tokens=64, pack_budget=512
    )

    docs = load_table(spark, sf_small, "documents")
    # dedup accounting: rows after dedup == distinct fingerprints
    n_fp = docs.select(fingerprint_md5("text").alias("fp")).distinct().count()
    assert stats["n_after_dedup"] == n_fp
    assert stats["n_docs"] == docs.count()
    assert 0 < stats["n_after_quality"] <= stats["n_after_dedup"]

    # every bin respects the token budget (chunks are <= 64 <= 512, so
    # no single-oversized-row exemption applies)
    assert stats["max_bin_tokens"] <= 512
    assert stats["n_bins"] >= 1

    # written output is readable, clustered columns present, and chunk
    # text is non-empty
    written = spark.read.parquet(out_dir)
    assert {"lang", "bin_id", "seq_id", "n_chunk_tokens", "chunk_text"} <= set(
        written.columns
    )
    assert written.filter(F.length("chunk_text") == 0).count() == 0
    assert stats["n_chunks"] == written.count()

    # chunks of one doc stay adjacent within a language's packing order:
    # seq_id encodes (doc_id, chunk_id) and packing scans seq_id order
    one = written.groupBy("lang").agg(F.count("*").alias("n")).collect()
    assert sum(r["n"] for r in one) == stats["n_chunks"]


def test_curate_corpus_quality_threshold_monotone(spark, sf_small, tmp_path):
    lo = curate_corpus(spark, sf_small, str(tmp_path / "lo"), min_quality=0.0)
    hi = curate_corpus(spark, sf_small, str(tmp_path / "hi"), min_quality=0.6)
    assert hi["n_after_quality"] <= lo["n_after_quality"]
    # min_quality=0.0 keeps everything that survived dedup
    docs = load_table(spark, sf_small, "documents")
    n_q0 = (
        docs.filter(quality_score("text") >= 0.0).count()
    )
    assert n_q0 == docs.count()
    assert lo["n_after_quality"] == lo["n_after_dedup"]


def test_curate_corpus_near_dup_tier(spark, sf_small, tmp_path):
    """With the transitive near-dup tier enabled, the corpus can only
    shrink further, and the rest of the pipeline is unaffected."""
    stats = curate_corpus(
        spark,
        sf_small,
        str(tmp_path / "near"),
        min_quality=0.0,
        near_dup_threshold=0.5,
    )
    assert stats["n_after_near_dedup"] is not None
    assert stats["n_after_near_dedup"] <= stats["n_after_dedup"]
    assert stats["n_after_quality"] == stats["n_after_near_dedup"]
    assert stats["max_bin_tokens"] <= 512


def test_curate_corpus_all_options_compose(spark, sf_small, tmp_path):
    """Every optional stage enabled at once (near-dup tier, eval-set
    decontamination, repetition gates, PII scrub): the accounting chain
    must be monotone non-increasing and the output contract intact."""
    eval_df = spark.createDataFrame(
        [(1, "What is the capital of France? Paris is the capital of France.")],
        "eval_id bigint, text string",
    )
    stats = curate_corpus(
        spark,
        sf_small,
        str(tmp_path / "all"),
        min_quality=0.1,
        near_dup_threshold=0.5,
        eval_df=eval_df,
        max_dup_line_ratio=0.9,
        max_dup_ngram_ratio=0.9,
        scrub_pii=True,
        strip_boilerplate_min_docs=3,
        strip_span_min_tokens=8,
    )
    chain = [
        stats["n_docs"],
        stats["n_after_dedup"],
        stats["n_after_near_dedup"],
        stats["n_after_decontaminate"],
        stats["n_after_quality"],
    ]
    assert all(a >= b for a, b in zip(chain, chain[1:])), chain
    assert stats["n_after_quality"] > 0
    assert stats["n_boilerplate_lines"] is not None
    written = spark.read.parquet(stats["out_dir"])
    assert stats["n_chunks"] == written.count() > 0
    assert stats["max_bin_tokens"] <= 512


def test_curate_corpus_max_doc_chars_truncates(spark, tmp_path):
    """The straggler guard caps text length before any metric runs, and
    two docs identical up to the cap dedup together."""
    long_tail_a = "shared prefix " * 20 + "unique tail alpha " * 10
    long_tail_b = "shared prefix " * 20 + "unique tail beta " * 10
    rows = [(1, "en", long_tail_a), (2, "en", long_tail_b)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id bigint, lang string, text string").write.parquet(
        src + "/documents.parquet"
    )
    stats = curate_corpus(
        spark, src, str(tmp_path / "out"), min_quality=0.0, max_doc_chars=100
    )
    assert stats["n_after_dedup"] == 1  # identical within the cap
    written = spark.read.parquet(stats["out_dir"])
    assert written.filter(F.length("chunk_text") > 100).count() == 0


def test_corpus_token_histogram_covers_all_docs(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    hist = corpus_token_histogram(spark, sf_small, bucket=100).collect()
    assert sum(r["n_docs"] for r in hist) == docs.count()
    assert all(r["bucket"] % 100 == 0 for r in hist)


def test_curate_corpus_boilerplate_stage_dedups_header_twins(spark, tmp_path):
    """Two docs identical except for a shared license header must exact-
    dedup AFTER the boilerplate strip removes the header from both."""
    import pyspark.sql.functions as F

    hdr = "Copyright (c) Example Corp. All rights reserved."
    rows = [
        (1, "en", f"{hdr}\nthe same body text here"),
        (2, "en", "the same body text here"),
        (3, "en", f"{hdr}\na different body entirely"),
        (4, "en", f"{hdr}\nyet another unique body"),
    ]
    src = tmp_path / "bp_sf"
    (src).mkdir()
    spark.createDataFrame(rows, "doc_id bigint, lang string, text string").write.parquet(
        str(src / "documents.parquet")
    )
    from impala_hashset_count_spark.pipelines import curate_corpus

    stats = curate_corpus(
        spark,
        str(src),
        str(tmp_path / "bp_out"),
        min_quality=0.0,
        strip_boilerplate_min_docs=3,
    )
    assert stats["n_boilerplate_lines"] == 1
    # docs 1 and 2 collapse post-strip; 3 and 4 stay
    assert stats["n_after_dedup"] == 3


def test_curate_corpus_unigram_lm_gate(spark, tmp_path):
    """The LM gate must drop the rare-token garbage doc that the
    rule-based quality score alone cannot distinguish."""
    subjects = ["fox", "dog", "cat", "bird", "horse", "mouse"]
    rows = [
        (i, "en", f"the quick {subjects[i - 1]} jumps over the lazy dog")
        for i in range(1, 7)
    ] + [(7, "en", "zxqv jkwp qqrtx mbvnz lkjhg pzwxc vvbnm")]
    src = tmp_path / "lm_sf"
    src.mkdir()
    spark.createDataFrame(rows, "doc_id bigint, lang string, text string").write.parquet(
        str(src / "documents.parquet")
    )
    from impala_hashset_count_spark.pipelines import curate_corpus

    no_gate = curate_corpus(
        spark, str(src), str(tmp_path / "lm_out0"), min_quality=0.0
    )
    # 6 distinct prose docs + the garbage doc all survive dedup/quality
    assert no_gate["n_after_quality"] == 7
    gated = curate_corpus(
        spark,
        str(src),
        str(tmp_path / "lm_out1"),
        min_quality=0.0,
        min_unigram_lp=-3.0,
    )
    # common-word prose scores ~ln(6/T) per token, the rare-token
    # garbage ~ln(1/T): only the prose clears -3.0
    assert gated["n_after_quality"] == 6


def test_curate_corpus_model_gate(spark, sf_small, tmp_path):
    """The model-assisted gate composes with the heuristic gates: a
    classifier trained to reject short docs shrinks n_after_quality
    relative to the heuristics-only run, and only model-approved docs
    reach the packed output."""
    import os

    from pyspark.sql import functions as F

    from impala_hashset_count_spark.operators.quality_model import (
        quality_logit_expr,
        train_quality_model,
    )
    from impala_hashset_count_spark.pipelines import curate_corpus
    from impala_hashset_count_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    lab = docs.withColumn("label", (F.length("text") > 150).cast("double"))
    w = train_quality_model(lab, "label")

    base = curate_corpus(
        spark, sf_small, os.path.join(str(tmp_path), "base"), min_quality=0.0
    )
    gated = curate_corpus(
        spark,
        sf_small,
        os.path.join(str(tmp_path), "gated"),
        min_quality=0.0,
        quality_model_weights=w,
    )
    assert gated["n_after_quality"] < base["n_after_quality"]
    assert gated["n_after_quality"] > 0
    # the gate is exactly logit > 0 over the post-dedup corpus
    approved = docs.filter(quality_logit_expr(w) > 0).count()
    assert gated["n_after_quality"] <= approved


def test_curate_corpus_history_gate_exact_and_bloom(spark, sf_small, tmp_path):
    """Incremental ingestion: documents whose fingerprint history
    already holds are dropped before curation; the bloom tier drops a
    superset (no false survivals) of what the exact tier drops."""
    from impala_hashset_count_spark.functions.text import fingerprint_md5
    from impala_hashset_count_spark.pipelines import curate_corpus
    from impala_hashset_count_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    history = docs.filter("doc_id % 4 = 0").select(
        fingerprint_md5("text").alias("fp")
    )
    base = curate_corpus(spark, sf_small, str(tmp_path / "o0"))
    exact = curate_corpus(
        spark, sf_small, str(tmp_path / "o1"),
        history_keys=history, history_filter="exact",
    )
    bloom = curate_corpus(
        spark, sf_small, str(tmp_path / "o2"),
        history_keys=history, history_filter="bloom",
    )
    assert base["n_after_history"] is None
    assert exact["n_after_history"] < base["n_after_dedup"]
    assert exact["n_after_dedup"] == exact["n_after_history"]
    # bloom never passes a true duplicate: it keeps at most what exact keeps
    assert bloom["n_after_history"] <= exact["n_after_history"]
    # and with a 1% fpp filter over this tiny history it keeps almost all
    assert bloom["n_after_history"] >= exact["n_after_history"] * 0.95

    import pytest

    with pytest.raises(ValueError):
        curate_corpus(spark, sf_small, str(tmp_path / "o3"),
                      history_keys=history, history_filter="nope")


def test_curate_corpus_span_strip_removes_planted_passage(spark, tmp_path):
    """strip_span_min_tokens cuts a passage repeated mid-document
    across two otherwise-different documents, so they dedup together
    afterwards (line stripping could never fire: no line boundary)."""
    import os

    passage = " ".join(f"tok{i}" for i in range(12))
    rows = [
        (1, f"{passage}", "en"),
        (2, f"{passage}", "en"),
        (3, "completely different content with plenty of words here now", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    src = str(tmp_path / "sf")
    docs.write.parquet(os.path.join(src, "documents.parquet"))
    stats = curate_corpus(
        spark, src, str(tmp_path / "out"),
        min_quality=0.0, strip_span_min_tokens=8,
    )
    # docs 1 and 2 are fully-duplicated passages: the strip empties
    # them and the stage drops them; doc 3 survives untouched
    assert stats["n_docs"] == 3
    assert stats["n_after_dedup"] == 1
