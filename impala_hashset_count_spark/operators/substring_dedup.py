"""Exact-substring (span-level) deduplication.

The strongest exact-dedup rung in LLM data pipelines removes DUPLICATED
SPANS, not just duplicated documents or lines: a passage that occurs
twice anywhere in the corpus (a quoted article, a license text, a
templated paragraph — in the SAME or different documents) is cut out of
every occurrence context while the surrounding unique text survives.
Document-level dedup can't see it (the containing documents differ);
line-level dedup only fires on exact line boundaries.

This module implements the scalable L-gram-cover formulation of
exact-substring dedup (the distributed equivalent of the suffix-array
"ExactSubstr" method): token position ``p`` of a document is COVERED
iff the ``min_tokens``-token gram starting at ``p`` occurs at least
twice in the corpus (counting every occurrence, including repeats
within one document). Maximal runs of covered positions are the
duplicated spans; a span of ``r`` consecutive covered gram-starts
duplicates ``r + min_tokens - 1`` tokens. Every duplicated substring of
length >= ``min_tokens`` is covered by construction (each of its grams
occurs twice), so recall is exact at the threshold; a covered run may
stitch together overlapping repeats with *different* partners — the
aggressive-removal convention the span formulation shares with
cross-document boilerplate stripping.

Scale design (nothing all-pairs, no driver state):

- Gram ids are hashes of the joined token window (64-bit ``xxhash64``
  production tier; a 60-bit md5 tier mirrors term-for-term in DuckDB;
  ``hash_fn=None`` groups by the gram STRING for collision-free
  semantics at the cost of shuffling gram bytes).
- Duplication is ONE ``groupBy(gram_id)`` count with map-side partial
  aggregation — the canonical word-count shape — followed by a
  shuffle join of the gram frame against the repeated ids. Positions
  without a gram (the last ``min_tokens - 1`` of each document) are
  never emitted at all, so no NULL keys reach the shuffle.
- Span assembly and text rewriting are per-document windows over the
  token position (islands by ``pos - row_number()``; removal flag by
  a ``RANGE min_tokens-1 PRECEDING`` max) — shuffles keyed by doc_id,
  never corpus-wide fan-out.
- A gram repeated across millions of documents (boilerplate) is ONE
  aggregate row and never replicates the corpus: membership is tested
  by the join, the count itself is not fanned back out.

The reference engine's exact distinct state (hashset-count.cc:105-192)
is the membership primitive this generalizes: instead of counting
distinct values per group, the corpus is asked which fixed-width
windows are NOT distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .line_dedup import _regex_quote


def _gram_id(gram: Column, hash_fn: str | None) -> Column:
    if hash_fn == "xxhash64":
        return F.xxhash64(gram)
    if hash_fn == "md5":
        # 60-bit md5 prefix — the SQL-mirrorable tier (matches the
        # minhash/simhash oracle convention)
        return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    if hash_fn is None:
        return gram
    raise ValueError("hash_fn must be 'xxhash64', 'md5', or None")


def _gram_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int,
    sep: str,
    hash_fn: str | None,
) -> DataFrame:
    """(id_col, __pos, __gh): every 1-based gram-start position with
    its gram id. The token array is staged as an attribute BEFORE the
    explode — inlining it into the lambda re-splits the text once per
    gram (the Generate re-evaluation hazard measured at 20x on the
    bigram pass, corpus_stats.py)."""
    tk = F.split(F.col(text_col), F.lit(_regex_quote(sep)), -1)
    # stage the token array as an attribute BEFORE the explode —
    # inlining it into the lambda re-splits the text once per gram
    # (the Generate re-evaluation hazard measured at 20x on the
    # bigram pass, corpus_stats.py)
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), tk.alias("__tk"))
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    # sequence(1, n) DESCENDS for n < 1 (Spark emits
                    # [1, 0], not []), so short documents must take the
                    # empty-array branch explicitly
                    F.when(
                        F.size("__tk") >= min_tokens,
                        F.sequence(
                            F.lit(1),
                            F.size("__tk") - F.lit(min_tokens - 1),
                        ),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.concat_ws(
                        sep, F.slice("__tk", i, min_tokens)
                    ),
                )
            ).alias("__i", "__g"),
        )
        .select(
            id_col,
            (F.col("__i") + 1).alias("__pos"),  # posexplode is 0-based
            _gram_id(F.col("__g"), hash_fn).alias("__gh"),
        )
    )


def _covered_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int,
    sep: str,
    hash_fn: str | None,
) -> DataFrame:
    """(id_col, __pos) of every 1-based token position whose
    ``min_tokens``-gram occurs >= 2 times corpus-wide."""
    grams = _gram_frame(df, id_col, text_col, min_tokens, sep, hash_fn)
    dup = (
        grams.groupBy("__gh")
        .agg(F.count("*").alias("__n"))
        .where(F.col("__n") >= 2)
        .select("__gh")
    )
    return grams.join(dup, "__gh").select(id_col, "__pos")


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    sep: str = " ",
    hash_fn: str | None = "xxhash64",
) -> DataFrame:
    """Maximal duplicated spans per document:
    ``(id_col, span_start, span_tokens, n_grams)`` with ``span_start``
    the 1-based token index of the first duplicated token,
    ``span_tokens`` the number of tokens the span removes, and
    ``n_grams`` the count of covered gram-starts it merges. Documents
    with no duplicated span emit no row."""
    cov = _covered_positions(df, id_col, text_col, min_tokens, sep, hash_fn)
    w = Window.partitionBy(id_col).orderBy("__pos")
    isl = cov.withColumn("__grp", F.col("__pos") - F.row_number().over(w))
    return (
        isl.groupBy(id_col, "__grp")
        .agg(
            F.min("__pos").alias("span_start"),
            (F.count("*") + F.lit(min_tokens - 1)).alias("span_tokens"),
            F.count("*").alias("n_grams"),
        )
        .drop("__grp")
    )


def strip_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    sep: str = " ",
    hash_fn: str | None = "xxhash64",
) -> DataFrame:
    """Rewrite ``text_col`` with every duplicated span removed: token
    ``t`` is dropped iff some covered gram-start lies in
    ``[t - min_tokens + 1, t]`` (i.e. some duplicated gram contains
    it). Kept tokens preserve exact bytes and order; a document that
    was one big duplicated span becomes the empty string; NULL text
    stays NULL. All non-text columns ride through the reassembly
    grouping (``id_col`` must make rows document-unique, as in
    ``strip_boilerplate_lines``)."""
    if id_col not in df.columns:
        raise ValueError(
            f"id_col {id_col!r} not in {df.columns} — reassembly needs a "
            "document-unique key column"
        )
    cov = _covered_positions(
        df, id_col, text_col, min_tokens, sep, hash_fn
    ).withColumn("__cov", F.lit(1))

    others = [c for c in df.columns if c != text_col]
    toks = df.select(
        *others,
        F.col(text_col).isNull().alias("__was_null"),
        F.posexplode_outer(
            F.split(F.col(text_col), F.lit(_regex_quote(sep)), -1)
        ).alias("__p0", "__raw"),
    ).withColumn("__pos", F.col("__p0") + 1)
    flagged = toks.join(cov, [id_col, "__pos"], "left")
    wr = (
        Window.partitionBy(id_col)
        .orderBy("__pos")
        .rangeBetween(-(min_tokens - 1), 0)
    )
    marked = flagged.withColumn(
        "__rm", F.max(F.coalesce("__cov", F.lit(0))).over(wr) == 1
    )
    rebuilt = marked.groupBy(*others, "__was_null").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("__rm"), F.struct("__pos", "__raw"))
                    )
                ),
                lambda s: s["__raw"],
            ),
            sep,
        ).alias("__text")
    )
    return rebuilt.select(
        *others,
        F.when(F.col("__was_null"), F.lit(None).cast("string"))
        .otherwise(F.coalesce("__text", F.lit("")))
        .alias(text_col),
    )


def gram_count_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    sep: str = " ",
    hash_fn: str | None = "xxhash64",
) -> DataFrame:
    """The STORED artifact of span dedup over a corpus:
    ``(__gh, __n)`` gram-occurrence counts, SUM-mergeable — persist it
    (parquet, bucketed by ``__gh`` for the probe join) and a
    continuously-ingesting corpus never re-shingles history (see
    ``duplicated_spans_incremental``). One word-count aggregate; the
    index size is the corpus's distinct-gram count, not its row
    count."""
    return (
        _gram_frame(df, id_col, text_col, min_tokens, sep, hash_fn)
        .groupBy("__gh")
        .agg(F.count("*").alias("__n"))
    )


def update_gram_index(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a batch's gram counts into the stored index: counts are
    additive, so the merge is union + SUM — the same mergeable-state
    convention as the drift/summary maintenance faces."""
    return (
        stored.unionByName(delta)
        .groupBy("__gh")
        .agg(F.sum("__n").alias("__n"))
    )


def duplicated_spans_incremental(
    new_df: DataFrame,
    stored_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    sep: str = " ",
    hash_fn: str | None = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """INCREMENTAL span dedup: find every duplicated span in the NEW
    batch — duplicated against history OR within the batch itself —
    WITHOUT re-shingling the stored corpus (the production shape: a
    daily crawl lands against a 100 TB history). The exact-key and
    near-dup tiers of this story are ``exact_dedup_incremental`` and
    ``minhash_lsh_pairs_incremental`` (`operators/dedup.py`); this is
    the span tier.

    A position is covered iff its gram's count over history + batch
    is >= 2 — IDENTICAL to re-running ``duplicated_spans`` over the
    full corpus and keeping the new batch's rows (property-tested):
    history documents are immutable (their spans were emitted when
    they were new), so only the batch is spanned and rewritten.

    Returns ``(spans, batch_counts)``: spans as in
    ``duplicated_spans`` (new-batch rows only), plus the batch's gram
    counts for the caller to fold into the stored index with
    ``update_gram_index``.

    Shuffle budget: shingling and counting are O(new batch); history
    participates only through the ``__gh`` probe join against the
    stored index (bucket/broadcast by size), never re-read as text."""
    grams = _gram_frame(new_df, id_col, text_col, min_tokens, sep, hash_fn)
    batch_counts = grams.groupBy("__gh").agg(F.count("*").alias("__n"))
    dup = (
        batch_counts.join(
            stored_index.withColumnRenamed("__n", "__n_hist"), "__gh", "left"
        )
        .where(F.col("__n") + F.coalesce(F.col("__n_hist"), F.lit(0)) >= 2)
        .select("__gh")
    )
    cov = grams.join(dup, "__gh").select(id_col, "__pos")
    w = Window.partitionBy(id_col).orderBy("__pos")
    isl = cov.withColumn("__grp", F.col("__pos") - F.row_number().over(w))
    spans = (
        isl.groupBy(id_col, "__grp")
        .agg(
            F.min("__pos").alias("span_start"),
            (F.count("*") + F.lit(min_tokens - 1)).alias("span_tokens"),
            F.count("*").alias("n_grams"),
        )
        .drop("__grp")
    )
    return spans, batch_counts
