"""End-to-end corpus curation: the engine's LLM-data-pipeline operators
composed into one deployable flow.

``curate_corpus`` is the canonical composition a training-data pipeline
runs over raw documents:

1. **exact dedup** on the normalized-text md5 fingerprint
   (``functions.text.fingerprint_md5`` + ``operators.dedup.exact_dedup``
   — deterministic keep-lowest, one shuffle on the fingerprint);
2. **quality filter** (``functions.text.quality_score`` — pure column
   math, fused into the same stage by Catalyst);
3. **context-length chunking** (``operators.packing.chunk_documents``
   — per-row array explode, zero shuffle);
4. **greedy token-budget packing** per language
   (``operators.packing.pack_sequences_greedy`` — one shuffle on the
   group key, linear Arrow pass per group);
5. **range-clustered sorted write** by (lang, bin_id)
   (``sources.tables.write_clustered`` — downstream readers of one
   language/bin range prune to few files via parquet min/max stats).

Scale accounting (100 TB corpus): two data shuffles total (fingerprint
dedup, pack-group exchange) plus the write's range partitioning; every
other step is embarrassingly parallel column work in the scan pipeline.
The stats the function returns are computed with one tiny aggregate per
stage boundary on the already-materialized frames — no collect of data
rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import (
    dup_line_ratio,
    dup_ngram_ratio,
    fingerprint_md5,
    quality_score,
    redact_pii,
    token_count,
)
from .operators.decontaminate import decontaminate
from .operators.dedup import exact_dedup, near_dup_dedup
from .operators.corpus_stats import unigram_logprob_scores
from .operators.line_dedup import boilerplate_lines, strip_boilerplate_lines
from .operators.substring_dedup import strip_duplicated_spans
from .operators.packing import chunk_documents, pack_sequences_greedy
from .sources.tables import load_table, write_clustered


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_quality: float = 0.3,
    chunk_tokens: int = 64,
    pack_budget: int = 512,
    n_files: int | None = None,
    near_dup_threshold: float | None = None,
    scrub_pii: bool = False,
    eval_df: DataFrame | None = None,
    decontaminate_ngram: int = 8,
    max_dup_line_ratio: float | None = None,
    max_dup_ngram_ratio: float | None = None,
    max_doc_chars: int | None = None,
    strip_boilerplate_min_docs: int | None = None,
    strip_span_min_tokens: int | None = None,
    min_unigram_lp: float | None = None,
    quality_model_weights: dict | None = None,
    history_keys: DataFrame | None = None,
    history_filter: str = "exact",
) -> dict:
    """Run the full curation flow over ``{sf_dir}/documents.parquet``
    and write packed training sequences to ``out_dir``.

    ``near_dup_threshold`` enables the transitive MinHash-LSH near-dup
    tier after exact dedup (``operators.dedup.near_dup_dedup``): pair
    candidates -> connected components -> keep each component's min-id
    representative. None (default) runs exact dedup only.

    ``scrub_pii=True`` redacts emails/SSNs/IPs/phones
    (``functions.text.redact_pii``) after the quality filter and before
    chunking, so no PII reaches the written training sequences.

    ``eval_df`` (a DataFrame with a ``text`` column) enables eval-set
    decontamination after dedup: any document sharing a normalized
    ``decontaminate_ngram``-gram with the eval set is dropped
    (``operators.decontaminate``, broadcast anti-join — no corpus
    shuffle).

    ``max_dup_line_ratio`` / ``max_dup_ngram_ratio`` add the
    Gopher-style repetition gates to the quality filter (docs above the
    threshold are dropped); both fuse into the same filter stage as the
    quality score — no extra pass.

    ``min_unigram_lp`` adds the corpus-level LM quality gate: documents
    whose mean log-probability under the corpus's own unigram
    distribution (``operators.corpus_stats.unigram_logprob_scores``)
    falls below the threshold are dropped — the model-free axis the
    per-row heuristics cannot see (rare-token garbage reads as "clean"
    to punctuation/stopword rules). Costs one corpus explode/agg plus a
    doc_id join when enabled. Documents with NO scoreable tokens
    (empty/blank text — e.g. fully-stripped boilerplate) have no
    defined log-prob and are dropped by the gate.

    ``quality_model_weights`` (a ``train_quality_model`` coefficient
    dict) adds the model-assisted gate: rows whose classifier logit is
    not positive are dropped. Pure column expression — it fuses into
    the same filter stage as the heuristic gates.

    ``max_doc_chars`` truncates each document at ingestion (straggler
    guard: every per-doc metric below is O(len) or O(len log len) on
    ONE row, so a single pathological multi-GB document would otherwise
    pin one task while 999 executors idle). Truncation happens BEFORE
    fingerprinting, so two docs identical up to the cap dedup together
    — the standard corpus-pipeline behavior.

    ``strip_boilerplate_min_docs`` enables C4/RefinedWeb-style
    cross-document boilerplate line removal BEFORE fingerprinting
    (``operators.line_dedup``): trimmed lines appearing in at least that
    many distinct documents are removed from every document, so docs
    differing only in a shared license header / nav menu dedup together
    in the next stage. Adds one corpus shuffle (the document
    reassembly) when enabled.

    ``strip_span_min_tokens`` enables EXACT-SUBSTRING span removal
    after line stripping (``operators.substring_dedup``): any run of
    tokens whose every ``strip_span_min_tokens``-gram occurs >= 2
    times corpus-wide — a quoted article, a templated paragraph, in
    the same or different documents — is cut from every occurrence,
    the rung line-level removal cannot reach (no line boundary
    needed). Documents the strip reduces to empty/whitespace are
    dropped in the same stage (fully-duplicated content keeps
    nothing). Adds the gram aggregate + one reassembly shuffle.

    Returns a stats dict: ``n_docs`` (input), ``n_boilerplate_lines``
    (None when stripping is disabled), ``n_after_dedup``,
    ``n_after_near_dedup`` (None when disabled),
    ``n_after_decontaminate`` (None when disabled), ``n_after_quality``,
    ``n_chunks``, ``n_bins`` (packed bins across all languages),
    ``max_bin_tokens`` (must be <= pack_budget when every chunk fits
    the budget, which chunk_tokens <= pack_budget guarantees)."""
    docs = load_table(spark, sf_dir, "documents")
    if max_doc_chars is not None:
        docs = docs.withColumn(
            "text", F.substring("text", 1, int(max_doc_chars))
        )
    n_docs = docs.count()
    n_boilerplate_lines = None
    if strip_boilerplate_min_docs is not None:
        # corpus-level boilerplate removal BEFORE fingerprinting: two
        # documents differing only in a shared license header / nav menu
        # dedup together afterwards (operators/line_dedup.py; the
        # reassembly groupBy is the stage's one corpus shuffle)
        bp = boilerplate_lines(docs, min_docs=strip_boilerplate_min_docs)
        # bounded at max_lines rows (it is broadcast downstream anyway):
        # materialize ONCE to the driver and rebuild as a local
        # DataFrame, so the count and the broadcast side share one
        # computation. (A persist here would leak cached partitions for
        # the rest of the session — nothing below ever unpersisted it.)
        bp_rows = bp.collect()
        n_boilerplate_lines = len(bp_rows)
        bp_local = spark.createDataFrame(bp_rows, bp.schema)
        docs = strip_boilerplate_lines(docs, "doc_id", "text", boilerplate=bp_local)

    if strip_span_min_tokens is not None:
        # exact-substring span removal AFTER line stripping: repeated
        # passages with no line boundary (quoted articles, templated
        # paragraphs) are cut from every occurrence, so docs differing
        # only by such a passage dedup together below
        # (operators/substring_dedup.py — gram aggregate + one
        # doc-keyed reassembly shuffle, nothing all-pairs). Documents
        # reduced to empty/whitespace — fully-duplicated content with
        # nothing unique to keep — are dropped in the same stage
        # (downstream ratio metrics are undefined on zero-length text).
        docs = strip_duplicated_spans(
            docs, "doc_id", "text", min_tokens=strip_span_min_tokens
        ).filter(F.length(F.trim("text")) > 0)

    deduped = exact_dedup(
        docs.withColumn("__fp", fingerprint_md5("text")), ["__fp"], "doc_id"
    )
    n_after_history = None
    if history_keys is not None:
        # incremental-ingestion gate: drop documents whose normalized
        # fingerprint the corpus has already admitted. 'exact' anti-joins
        # the (distinct, broadcastable) history key set; 'bloom' probes a
        # filter built over it (operators/bloom.py — the new batch never
        # shuffles against a 100 TB history; ~fpp genuinely-new docs
        # wrongly dropped, no false survivals).
        hk = history_keys.selectExpr(
            f"{history_keys.columns[0]} AS __fp"
        ).where(F.col("__fp").isNotNull())
        if history_filter == "exact":
            deduped = deduped.join(hk.distinct(), ["__fp"], "left_anti")
        elif history_filter == "bloom":
            from .operators.bloom import bloom_build, bloom_probe, suggest_bits

            bits = suggest_bits(1_000_000, 0.01)
            filt = bloom_build(hk, "__fp", bits)
            deduped = (
                bloom_probe(deduped, "__fp", filt, bits)
                .filter(~F.col("maybe_seen"))
                .drop("maybe_seen")
            )
        else:
            raise ValueError(
                f"history_filter must be 'exact' or 'bloom', got {history_filter!r}"
            )
        n_after_history = deduped.count()
    deduped = deduped.drop("__fp")
    n_after_dedup = deduped.count()
    n_after_near_dedup = None
    if near_dup_threshold is not None:
        deduped = near_dup_dedup(
            deduped, "doc_id", "text", threshold=near_dup_threshold
        )
        n_after_near_dedup = deduped.count()
    n_after_decontaminate = None
    if eval_df is not None:
        deduped = decontaminate(
            deduped, eval_df, "doc_id", "text", n=decontaminate_ngram
        )
        n_after_decontaminate = deduped.count()
    keep_cond = quality_score("text") >= min_quality
    if max_dup_line_ratio is not None:
        keep_cond = keep_cond & (dup_line_ratio("text") <= max_dup_line_ratio)
    if max_dup_ngram_ratio is not None:
        keep_cond = keep_cond & (dup_ngram_ratio("text") <= max_dup_ngram_ratio)
    kept = deduped.filter(keep_cond).select("doc_id", "lang", "text")
    if min_unigram_lp is not None:
        # corpus-level LM gate: unlike the per-row gates above this
        # needs corpus state (the unigram distribution), so it costs
        # the corpus-stats explode/agg plus a doc_id join of the
        # (doc_id, mean_lp) table back onto the kept corpus
        scores = unigram_logprob_scores(kept, "doc_id", "text")
        # inner join: a doc with no score row has no scoreable tokens
        # (empty/blank text, e.g. fully stripped boilerplate) and is
        # dropped by the gate — documented behavior, not an accident
        kept = (
            kept.join(scores.select("doc_id", "mean_lp"), "doc_id")
            .where(F.col("mean_lp") >= float(min_unigram_lp))
            .drop("mean_lp")
        )
    if quality_model_weights is not None:
        # model-assisted gate (operators.quality_model): the trained
        # LR reduces to a coefficient dict, so this is ONE more
        # codegen'd filter expression fused into the same stage as
        # the heuristic gates — no model object on executors
        from .operators.quality_model import filter_by_quality_model

        kept = filter_by_quality_model(kept, quality_model_weights)
    n_after_quality = kept.count()
    if scrub_pii:
        # scrub AFTER dedup/quality (cheaper: fewer rows) but BEFORE
        # anything persists text; four regexp_replace ops fused into
        # the same scan stage by Catalyst
        kept = kept.withColumn("text", redact_pii("text"))

    chunks = chunk_documents(kept, "doc_id", "text", chunk_tokens)
    # a globally-unique, order-preserving sequence id per chunk: packing
    # scans (lang, seq_id) in order, so chunks of one doc stay adjacent
    with_lang = chunks.join(kept.select("doc_id", "lang"), "doc_id").withColumn(
        "seq_id", F.col("doc_id") * 100_000 + F.col("chunk_id")
    )
    packed = pack_sequences_greedy(
        with_lang.select("lang", "seq_id", "n_chunk_tokens"),
        group_col="lang",
        order_col="seq_id",
        token_col="n_chunk_tokens",
        budget=pack_budget,
    )
    out = packed.join(with_lang.select("seq_id", "chunk_text"), "seq_id")

    write_clustered(out, out_dir, cluster_by=["lang", "bin_id"], n_files=n_files)

    written = spark.read.parquet(out_dir)
    bin_stats = (
        written.groupBy("lang", "bin_id")
        .agg(F.sum("n_chunk_tokens").alias("bin_tokens"))
        .agg(
            F.count("*").alias("n_bins"),
            F.max("bin_tokens").alias("max_bin_tokens"),
        )
        .first()
    )
    return {
        "n_docs": n_docs,
        "n_boilerplate_lines": n_boilerplate_lines,
        "n_after_history": n_after_history,
        "n_after_dedup": n_after_dedup,
        "n_after_near_dedup": n_after_near_dedup,
        "n_after_decontaminate": n_after_decontaminate,
        "n_after_quality": n_after_quality,
        "n_chunks": written.count(),
        "n_bins": int(bin_stats["n_bins"]),
        "max_bin_tokens": int(bin_stats["max_bin_tokens"]),
        "out_dir": os.path.abspath(out_dir),
    }


def corpus_token_histogram(spark: SparkSession, sf_dir: str, bucket: int = 100) -> DataFrame:
    """Token-count histogram of the raw corpus (planning aid for
    chunk/pack parameters): one scan, one tiny aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select((F.floor(token_count("text") / bucket) * bucket).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bucket")
    )
