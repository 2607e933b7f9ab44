"""Corpus-level term statistics: document frequency, TF-IDF, BM25
retrieval scoring, and corpus-wide heavy-hitter tokens.

The reference engine's host exposed only per-group distinct counting
(`/root/reference/README.md:25-33`); a training-data pipeline at 100 TB
additionally needs corpus-level lexical statistics — which documents are
dominated by which terms (TF-IDF), which documents match a query best
(BM25), and which tokens dominate the corpus (heavy hitters, the
boilerplate detector).

Scale design:

- ``term_doc_stats`` performs the ONLY full-corpus explode: tokens are
  exploded once and partially aggregated map-side before the single
  shuffle on (doc, term). Document frequency is a second, vocabulary-
  sized aggregation ON TOP of that output (never re-reads the corpus).
- The IDF table is vocabulary-sized — orders of magnitude smaller than
  the corpus. ``broadcast_vocab=True`` (default) broadcasts it so the
  big (doc, term) side never shuffles for the join; pass False when the
  vocabulary itself is huge (web-scale with URLs/typos) to fall back to
  a sort-merge join.
- BM25 filters to the query's terms BEFORE any aggregation — per-row
  ``array_intersect`` against a literal array — so the exploded volume
  is O(matching tokens), not O(corpus tokens).
- Top-k outputs use rank-limited windows / ``TakeOrderedAndProject``
  (never a full global sort).

Every statistic is exact and deterministic (ties broken by term /
doc id), so each has a term-by-term DuckDB mirror in the registry
oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def _qfix(col, scale: float):
    """Boundary-robust fixed-point quantization: ``floor(x*scale + 0.5)
    / scale`` as a double.

    Unlike ``ROUND(x, d)``, whose result can flip on the d-th decimal
    when an upstream float sum lands near a rounding boundary (the sum
    depends on partition order, so Spark and an oracle engine can
    disagree in the last ulps), this is a single deterministic IEEE
    multiply/add/floor/divide — identical bit-for-bit in any engine
    given the same input double. Where the input itself is an
    order-dependent SUM, quantize the addends first and sum integers
    (see ``bm25_topn`` / ``unigram_logprob_scores``)."""
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("double") / F.lit(scale)


def _qint(col, scale: float):
    """Integer fixed-point: ``floor(x*scale + 0.5)`` as BIGINT — the
    summable form of ``_qfix`` (integer addition is exact and
    order-independent, so SUMs of these are engine-stable)."""
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def _sig40(*cols) -> Column:
    """40-bit integer signature of the ':'-joined decimal renderings
    of EXACT-INTEGER (or string) columns:
    ``conv(substr(md5(s), 1, 10), 16, 10)`` as BIGINT.

    This is the log-free hashed surface for the LM/ranking scores: a
    score of the form ``sum_i k_i * ln(num_i / den_i)`` is fully
    determined by the multiset of its integer components
    ``{(k, num, den)}``, so summing a per-component signature verifies
    the entire computation EXCEPT the final (deterministic, libm-local)
    ``ln`` application — removing the one cross-engine assumption a
    quantized-log surface carries (Spark's and the oracle's ``LN``
    agreeing to within the quantum). md5 of a decimal string is
    engine-identical by definition. 40 bits keeps per-document SUMs of
    up to ~2^22 components inside BIGINT with no overflow. DuckDB
    mirror: ``CAST('0x' || substr(md5(CONCAT_WS(':', ...)), 1, 10) AS
    BIGINT)``. Inputs must be NULL-free (coalesce first): concat_ws
    SKIPS nulls in both engines, which would alias distinct tuples."""
    rendered = [
        (c if hasattr(c, "cast") else F.lit(c)).cast("string") for c in cols
    ]
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *rendered)), 1, 10), 16, 10
    ).cast("long")


def _tok_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per token instance: (id, term). NULL/blank documents
    contribute no rows; empty-string terms (split artifacts) are
    dropped. The mirror is UNNEST(STRING_SPLIT_REGEX(TRIM(text),
    '\\s+')) with the same <> '' guard."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .where(F.col("term") != "")
    )


def term_doc_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term, tf): term frequency per document.

    One explode + one shuffle on (id, term); partial map-side counts
    bound the shuffle volume by (partitions x per-doc vocabulary)."""
    return (
        _tok_rows(df, id_col, text_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_frequency(tf_table: DataFrame) -> DataFrame:
    """(term, df): number of documents containing each term, derived
    from ``term_doc_stats`` output — (id, term) rows are unique there,
    so a row count per term IS the document frequency. Shuffles only
    the vocabulary-sized aggregate."""
    return tf_table.groupBy("term").agg(F.count("*").alias("df"))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    broadcast_vocab: bool = True,
    tf_table: DataFrame | None = None,
    integer_scores: bool = False,
    component_scores: bool = False,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    score = tf * (ln((1 + N) / (1 + df)) + 1)   (sklearn's smooth idf)

    Returns (id, term, tf, tfidf, rank), rank 1..k ordered by
    (tfidf desc, term) with tfidf quantized via ``_qfix(., 1e4)`` —
    quantizing before ranking keeps both tie order and the emitted
    value engine-deterministic for the oracle comparison (all inputs
    to the score are exact integers, so the score itself is a single
    deterministic float expression per row).

    Shuffle account: corpus explode -> (id, term) agg [1], vocab agg
    [2, tiny], broadcast join back (no corpus shuffle), rank-limited
    window on id [3]. All three survive a 100x scale-up: 1 and 3 are
    corpus-proportional with partial-agg / rank-limit pushdown, 2 is
    vocabulary-sized. Pass ``tf_table`` (a materialized
    ``term_doc_stats`` output) to share the corpus explode with other
    statistics families — the production shape at 100 TB.

    ``integer_scores=True`` emits ``tfidf`` as the BIGINT fixed-point
    value itself (``floor(score*1e4 + 0.5)``) instead of dividing back
    to a double — the hash-gate-safe surface: an all-integer column
    survives every engine->pandas conversion with dtype intact
    (DuckDB's HUGEINT and float64 conversions are exactly what made a
    mixed union column hash-diverge on the external driver). Ranking is
    identical either way (same quantized values).

    ``component_scores=True`` goes one rung further: the emitted value
    column is ``df`` (the exact-integer document frequency) instead of
    the quantized-log score — together with ``tf`` and the corpus-wide
    N, it fully DETERMINES the score without putting any ``ln`` output
    under a hash gate (see ``_sig40``; ranking still uses the quantized
    score internally, where the 1e-4 quantum + term tie-break keep the
    order engine-deterministic)."""
    tf = tf_table if tf_table is not None else term_doc_stats(df, id_col, text_col)
    dfreq = doc_frequency(tf)
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    n_docs = df.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).agg(F.count("*").alias("__n"))
    score_expr = F.col("tf") * (
        F.log((1 + F.col("__n")) / (1 + F.col("df"))) + F.lit(1.0)
    )
    quant = _qint(score_expr, 1e4) if integer_scores else _qfix(score_expr, 1e4)
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", quant)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    out_cols = (
        [id_col, "term", "tf", "df", "rank"]
        if component_scores
        else [id_col, "term", "tf", "tfidf", "rank"]
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*out_cols)
    )


def bm25_topn(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    n: int = 20,
    integer_scores: bool = False,
    component_scores: bool = False,
) -> DataFrame:
    """Okapi BM25 document ranking for a bag-of-words query.

    score(d) = sum over matched terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Returns the top ``n`` documents as (id, score, n_matched) ordered by
    (score desc, id) — a ``TakeOrderedAndProject``, no full sort. The
    score is an exact BIGINT sum of per-term contributions quantized to
    micro-units (``_qint(., 1e6)``), divided back to a double: integer
    addition is order-independent, so the emitted score is bit-stable
    across partitionings AND engines (a float SUM rounded after the
    fact is not — the summation order differs). ``integer_scores=True``
    emits the BIGINT micro-unit sum itself (no divide back to double) —
    the hash-gate-safe all-integer surface.

    ``component_scores=True`` replaces the score column with
    ``comp_sig``: the per-document SUM of ``_sig40('bm', term, tf, df,
    dl, N, dl_total)`` over matched terms — exact integers that fully
    determine the score with no ``ln`` output under the hash (avgdl =
    dl_total / N, so the float never enters the signature). The top-n
    SELECTION still orders by the quantized score (membership at the
    n-boundary keeps the established quantum + id tie-break).

    The corpus-wide pieces (N, avgdl) are one tiny aggregate; tf and df
    for the QUERY terms only come from a per-row ``array_intersect``
    prefilter, so the explode/aggregate volume is proportional to query
    matches, not corpus tokens. dl (document length) is computed per row
    before the explode and carried through — no extra join against a
    doc-length table."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # SQL-text expressions (r9): the per-call plan-build cost of this
    # operator was ~0.35 s, dominated by py4j round-trip volume (the
    # Python ``filter`` lambdas and chained withColumns) — planning
    # latency paid per bench repetition / per production query. The
    # parsed expressions are term-for-term the same logical plan.
    qarr = (
        "array("
        + ", ".join("'" + t.replace("'", "\\'") + "'" for t in sorted(set(query_terms)))
        + ")"
    )
    base = df.where(
        F.expr(f"`{text_col}` IS NOT NULL AND trim(`{text_col}`) != ''")
    ).select(
        F.col(id_col),
        tokens(text_col).alias("__toks"),
    )
    withlen = base.select(
        id_col,
        F.expr("size(filter(__toks, t -> t != ''))").alias("dl"),
        F.expr(f"array_intersect(__toks, {qarr})").alias("__qhit"),
        F.expr(f"filter(__toks, t -> array_contains({qarr}, t))").alias("__qtoks"),
    )
    stats = withlen.agg(
        F.count("*").alias("__N"),
        F.avg("dl").alias("__avgdl"),
        F.sum("dl").cast("long").alias("__dl_total"),
    )
    # df per query term: __qhit is the per-document DISTINCT matched
    # term set, so exploding it and counting rows per term is exactly
    # document frequency — and only query-term rows ever materialize.
    dfreq = (
        withlen.select(F.explode("__qhit").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    tf = (
        withlen.where(F.size("__qtoks") > 0)
        .select(id_col, "dl", F.explode("__qtoks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    # one SELECT instead of two withColumns: each withColumn re-analyzes
    # the whole join tree driver-side. The SQL floats mirror the Python
    # column arithmetic literal-for-literal (repr() round-trips doubles
    # exactly; ``1 - b`` was already folded to one Python float before
    # it ever reached Catalyst).
    contrib_sql = (
        f"ln(1 + (__N - df + 0.5D) / (df + 0.5D)) * tf * {k1 + 1!r}D"
        f" / (tf + {k1!r}D * ({1 - b!r}D + {b!r}D * dl / __avgdl))"
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("*", F.expr(contrib_sql).alias("__contrib"))
    )
    micro_sum = F.sum(_qint(F.col("__contrib"), 1e6)).cast("long")
    score = (
        micro_sum
        if integer_scores
        else (micro_sum.cast("double") / F.lit(1e6))
    )
    if component_scores:
        sig = _sig40(
            "bm",
            F.col("term"),
            F.col("tf"),
            F.col("df"),
            F.col("dl"),
            F.col("__N"),
            F.col("__dl_total"),
        )
        return (
            scored.groupBy(id_col)
            .agg(
                micro_sum.alias("__score"),
                F.sum(sig).cast("long").alias("comp_sig"),
                F.count("*").alias("n_matched"),
            )
            .orderBy(F.col("__score").desc(), F.col(id_col))
            .limit(n)
            .select(id_col, "comp_sig", "n_matched")
        )
    return (
        scored.groupBy(id_col)
        .agg(
            score.alias("score"),
            F.count("*").alias("n_matched"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(n)
    )


def top_tokens(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Corpus-wide top-k tokens by instance count — the boilerplate /
    stopword detector. (term, n, n_docs), ordered by (n desc, term).

    Exact, and still scale-correct: the explode feeds a partial
    (map-side) aggregation, so the shuffle carries at most
    (partitions x vocabulary) pre-aggregated rows, and the final top-k
    is a ``TakeOrderedAndProject``."""
    toks = df.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(tokens(text_col).alias("__toks"))
    per_term = (
        toks.select(
            F.explode(
                F.filter(F.col("__toks"), lambda t: t != "")
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    per_doc = (
        toks.select(
            F.explode(
                F.array_distinct(
                    F.filter(F.col("__toks"), lambda t: t != "")
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("n_docs"))
    )
    return (
        per_term.join(per_doc, "term")
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(k)
        .select("term", "n", "n_docs")
    )


def top_tokens_from_tf(tf_table: DataFrame, k: int = 20) -> DataFrame:
    """``top_tokens`` derived from a materialized ``term_doc_stats``
    table instead of re-exploding the corpus: per term, n = SUM(tf)
    (instance count) and n_docs = COUNT(*) ((id, term) rows are unique
    there). Same result, zero additional corpus work — the shape a
    production pipeline uses when several statistics families share
    one explode."""
    return (
        tf_table.groupBy("term")
        .agg(
            F.sum("tf").cast("long").alias("n"),
            F.count("*").alias("n_docs"),
        )
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(k)
        .select("term", "n", "n_docs")
    )


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
    tf_table: DataFrame | None = None,
    integer_scores: bool = False,
    component_scores: bool = False,
) -> DataFrame:
    """Corpus-trained unigram language-model score per document: the
    mean natural-log probability of the document's token instances
    under the corpus's own unigram distribution,

        mean_lp(d) = sum_t tf(d,t) * ln(c(t) / T) / dl(d)

    with c(t) the corpus count of token t and T the total token count.
    This is the classic LM-based quality signal (KenLM-style pipelines
    use a trained n-gram model; self-scoring against the corpus unigram
    distribution is its model-free floor): documents full of rare
    garbage tokens score far below prose assembled from common words —
    a complementary axis to the rule-based ``quality_score``. Smoothing
    is unnecessary by construction: every scored token occurs in the
    corpus (c >= 1).

    Returns (id, n_tokens, mean_lp) with the log-prob sum accumulated
    as an exact BIGINT of micro-unit addends (``_qint(., 1e6)``) so the
    emitted mean is bit-stable across partitionings and engines.
    ``integer_scores=True`` emits the BIGINT micro-unit SUM itself in
    place of the mean (same ``mean_lp`` slot, column renamed
    ``lp_micro``): mean = lp_micro / 1e6 / n_tokens is recoverable, and
    the all-integer surface is the one a dtype-sensitive hash gate can
    compare across engines (a final float division is where
    engine->pandas conversions diverge). ``component_scores=True`` goes
    log-free: the value column becomes ``comp_sig`` — the per-document
    SUM of ``_sig40('u', term, tf, c, T)`` over (doc, term) rows, exact
    integers that fully determine the score with no ``ln`` output under
    the hash (see ``_sig40``).
    Shuffle account: the one corpus
    explode feeds the partial-aggregated (doc, term) shuffle, the
    token-count table (vocabulary-sized) aggregates on top and
    broadcasts back, T rides a single-row broadcast cross join, and the
    per-doc mean is a second corpus-proportional partial aggregation —
    nothing corpus-sized ever shuffles for a join. ``tf_table`` shares
    a materialized ``term_doc_stats`` as in ``tfidf_top_terms``."""
    tf = tf_table if tf_table is not None else term_doc_stats(df, id_col, text_col)
    counts = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    if broadcast_vocab:
        counts = F.broadcast(counts)
    total = tf.agg(F.sum("tf").alias("__T"))
    micro = F.sum(
        _qint(F.col("tf") * F.log(F.col("c") / F.col("__T")), 1e6)
    ).cast("long")
    if component_scores:
        score = (
            F.sum(_sig40("u", F.col("term"), F.col("tf"), F.col("c"), F.col("__T")))
            .cast("long")
            .alias("comp_sig")
        )
    elif integer_scores:
        score = micro.alias("lp_micro")
    else:
        score = ((micro.cast("double") / F.lit(1e6)) / F.sum("tf")).alias(
            "mean_lp"
        )
    return (
        tf.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(F.sum("tf").cast("long").alias("n_tokens"), score)
    )


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per adjacent token pair instance: (id, w1, w2). Blank /
    one-token documents contribute nothing; adjacency is over the raw
    whitespace-token array (identical on both engines: split of the
    trimmed text on \\s+ yields no interior empties).

    The token array is STAGED as an attribute before the pair lambda —
    an inline split expression referenced inside ``transform`` is
    re-evaluated per element (O(chars x pairs) per row; measured 20x
    on this pass — the same hazard `functions/text.py` documents for
    every tokenized metric).

    The pair expression is ONE SQL-text ``inline(...)`` (r9): the
    driver-side plan build of this pass previously issued hundreds of
    py4j round-trips (the Python ``transform`` lambda constructs its
    body element-call by element-call, and the explode +
    field-extraction selects re-analyze the tree), measured at ~0.14 s
    per call — pure planning latency the bench pays per repetition and
    a production driver pays per query. A single parsed expression
    builds the identical pairs; ``inline`` is ``explode`` +
    struct-field projection in one operator."""
    pair_sql = (
        "CASE WHEN size(__t) >= 2 THEN "
        "transform(sequence(1, size(__t) - 1), "
        "i -> struct(element_at(__t, i) AS w1, element_at(__t, i + 1) AS w2)) "
        "ELSE CAST(array() AS array<struct<w1:string,w2:string>>) END"
    )
    return (
        df.where(F.expr(f"`{text_col}` IS NOT NULL AND trim(`{text_col}`) != ''"))
        .select(F.col(id_col), tokens(text_col).alias("__t"))
        .select(F.col(id_col), F.expr(f"inline({pair_sql})"))
        .where(F.expr("w1 != '' AND w2 != ''"))
    )


def bigram_logprob_scores(
    df: DataFrame,
    train_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    broadcast_vocab: bool = True,
    component_scores: bool = False,
) -> DataFrame:
    """Bigram language-model score per document with Stupid Backoff
    (Brants et al., 2007) — the next quality rung above the unigram
    self-score: word-ORDER-aware, so shuffled/garbled prose scores low
    even when its word bag looks fine.

    The model is trained on ``train_df`` (a reference slice — at 100 TB
    a curated held-out sample), then every document in ``df`` is
    scored; because the trained bigram table does NOT contain every
    scored document's bigrams, the backoff path genuinely fires (a
    self-trained bigram score never backs off — every observed bigram
    is in its own corpus):

        lp(w2 | w1) = ln(c12 / c1)            if bigram seen in train
                    = ln(alpha * c2 / T)      elif w2 seen in train
                    = ln(alpha * 1  / T)      else (OOV floor)

    Returns (id, n_bigrams, lp_micro): the per-pair-type contribution
    k * lp is quantized to BIGINT micro-units and summed exactly, so
    the emitted sum is engine-bit-stable (same contract as
    ``unigram_logprob_scores(integer_scores=True)``); mean log-prob =
    lp_micro / 1e6 / n_bigrams. Documents with < 2 tokens emit no row.

    ``component_scores=True`` replaces ``lp_micro`` with ``comp_sig``:
    per pair type, ``_sig40('s', w1, w2, k, c12, c1)`` on the seen path
    or ``_sig40('b', w1, w2, k, coalesce(c2,1), T)`` on the backoff
    path (alpha is a global constant and stays out), summed per
    document — the exact-integer multiset that fully determines the
    score, with no ``ln`` output under the hash and hence no
    cross-engine libm assumption at all (see ``_sig40``).

    Shuffle account: one bigram explode + (id, w1, w2) partial-agg
    shuffle over the SCORED corpus; the train-side bigram and unigram
    count tables are vocabulary-sized aggregates that broadcast back
    (`broadcast_vocab=False` falls back to shuffle joins for web-scale
    vocabularies) — the scored corpus never shuffles for a join.

    ``train_df`` must contain at least one tokenizable document: with
    an empty train slice T is NULL and every score degenerates to NULL
    (there is no model to score against) — both engines agree on that
    propagation, but callers should treat it as a configuration
    error."""
    train_bg = (
        _bigram_rows(train_df, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    train_tf = (
        _tok_rows(train_df, id_col, text_col)
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    if broadcast_vocab:
        train_bg, train_tf = F.broadcast(train_bg), F.broadcast(train_tf)
    total = train_tf.agg(F.sum("c").cast("long").alias("__T"))
    doc_bg = (
        _bigram_rows(df, id_col, text_col)
        .groupBy(id_col, "w1", "w2")
        .agg(F.count("*").alias("k"))
    )
    c1 = train_tf.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    c2 = train_tf.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    lp = F.when(
        F.col("c12").isNotNull(), F.log(F.col("c12") / F.col("c1"))
    ).otherwise(
        F.log((F.lit(alpha) * F.coalesce(F.col("c2"), F.lit(1))) / F.col("__T"))
    )
    if component_scores:
        sig = F.when(
            F.col("c12").isNotNull(),
            _sig40(
                "s", F.col("w1"), F.col("w2"), F.col("k"),
                F.col("c12"), F.col("c1"),
            ),
        ).otherwise(
            _sig40(
                "b", F.col("w1"), F.col("w2"), F.col("k"),
                F.coalesce(F.col("c2"), F.lit(1)), F.col("__T"),
            )
        )
        value = F.sum(sig).cast("long").alias("comp_sig")
    else:
        value = F.sum(_qint(F.col("k") * lp, 1e6)).cast("long").alias(
            "lp_micro"
        )
    return (
        doc_bg.join(train_bg, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(c2, "w2", "left")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(F.sum("k").cast("long").alias("n_bigrams"), value)
    )


def top_tokens_sketch(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    group_col: str | None = None,
    max_items: int = 10_000,
    saturation_guard: str = "ndv",
) -> DataFrame:
    """Mergeable frequent-items sketch tier of the heavy-hitter query
    (the frequency twin of the Datasketches-HLL distinct tier): token
    streams accumulate into per-group ``approx_top_k_accumulate``
    sketches, any coarser rollup is ``approx_top_k_combine`` over the
    STORED sketch structs — zero raw-data re-access — and
    ``approx_top_k_estimate`` answers top-k from the merged state. At
    100 TB: materialize the per-(day, source) sketch table once;
    every ad-hoc "top tokens overall / per source / per week" query
    reads sketches, not the corpus. Exact while per-sketch distinct
    tokens <= ``max_items`` (tested); beyond that, counts degrade
    gracefully like any Misra-Gries-family summary.

    Returns (token, est_count) rows, count-desc. ``group_col`` groups
    the accumulation (proving the merge path); None accumulates
    globally.

    ``saturation_guard="ndv"`` (default — the batch convention
    ``streaming/windows.topk_active_users_stream`` documents): beyond
    capacity, Spark's ``approx_top_k_estimate`` returns neither the
    exact ranking nor an empty array but a SHRUNKEN,
    eviction-order-defined partial result (measured on Spark 4.1; the
    r9 sf100 run saw it shrink all the way to zero rows at ~100k
    distinct tokens against 10k slots) — content no oracle can
    reproduce. One extra exact ``count_distinct`` over the token
    stream detects saturation, and a saturated sketch emits ONE
    sentinel row ``(token=NULL, est_count=0)`` instead of
    approximation content — "resize max_items", never silence. The
    global NDV bounds every per-group NDV, so one global check covers
    the grouped accumulate AND the combine. ``"none"`` keeps the raw
    sketch output (the sketch's production contract: approximate
    beyond capacity)."""
    if saturation_guard not in ("ndv", "none"):
        raise ValueError(
            f"saturation_guard must be 'ndv' or 'none', got "
            f"{saturation_guard!r}"
        )
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    if group_col is not None:
        toks = df.select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(F.col(text_col))).alias("w"),
        ).filter(F.col("w") != "")
        per_group = toks.groupBy("__g").agg(
            F.expr(f"approx_top_k_accumulate(w, {int(max_items)})").alias("sk")
        )
        merged = per_group.agg(
            F.expr(f"approx_top_k_combine(sk, {int(max_items)})").alias("sk")
        )
    else:
        merged = toks.agg(
            F.expr(f"approx_top_k_accumulate(w, {int(max_items)})").alias("sk")
        )
    est = F.expr(f"approx_top_k_estimate(sk, {int(k)})")
    if saturation_guard == "ndv":
        ndv = toks.agg(F.count_distinct("w").alias("__ndv"))
        sentinel = F.expr(
            "array(named_struct('item', CAST(NULL AS STRING),"
            " 'count', CAST(0 AS BIGINT)))"
        )
        staged = merged.crossJoin(F.broadcast(ndv)).select(
            "__ndv", est.alias("__arr")
        )
        exploded = staged.select(
            F.explode(
                F.when(
                    F.col("__ndv") > F.lit(int(max_items)), sentinel
                ).otherwise(F.col("__arr"))
            ).alias("e")
        )
    else:
        exploded = merged.select(F.explode(est).alias("e"))
    return (
        exploded
        .select(
            F.col("e.item").alias("token"),
            F.col("e.count").cast("long").alias("est_count"),
        )
        .orderBy(F.col("est_count").desc(), "token")
    )
