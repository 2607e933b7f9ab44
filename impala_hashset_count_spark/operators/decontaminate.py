"""Eval-set decontamination: flag / remove corpus documents that
overlap a benchmark (eval) set by exact word-n-gram collision.

Distinct from dedup: dedup compares the corpus against ITSELF
(symmetric, similarity-thresholded); decontamination compares it
against a small external eval set (asymmetric, any overlap is a hit —
the standard n-gram decontamination used for LLM training corpora,
e.g. 8-13-gram collision against benchmark questions/answers).

Scale design (the part that matters at 100 TB):

- The eval side is SMALL by construction (benchmarks are MBs). Its
  distinct-shingle index is explicitly ``broadcast()`` — the corpus is
  NEVER shuffled to meet it (BroadcastHashJoin, map-side,
  plan-asserted in tests/test_plans.py).
- The only aggregation is over the HITS (rare by construction), so the
  one shuffle in ``contamination_stats`` moves O(contaminated
  shingles) rows, not O(corpus).
- ``decontaminate`` removes docs via a broadcast LEFT ANTI join on the
  contaminated-id set — zero corpus shuffle end to end.

Shingles are built on ``normalize_text`` (lowercase, punctuation
stripped, whitespace collapsed) so cosmetic formatting differences
between a corpus copy and the benchmark original still collide — the
same canonicalization the exact-dedup fingerprint uses.

The reference has no analogue (it is a single aggregate —
/root/reference/hashset-count.cc); this operator belongs to the
repo's LLM-pipeline extension surface (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text


def _norm_tokens(text_col: str | Column) -> Column:
    """Tokens of the NORMALIZED text; blank-after-normalization yields
    an empty array."""
    norm = normalize_text(text_col)
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def _shingles_from_tokens(toks: Column, n: int) -> Column:
    """Distinct word n-grams from a token-array column; < n tokens
    yields an empty array (the same descending-sequence guard as
    functions.text.word_shingles). ``toks`` must be an ATTRIBUTE (a
    materialized column), not an inline expression: it is referenced
    inside the per-shingle lambda, and an inline normalize+split there
    would be re-evaluated per shingle — O(tokens x chars) per row (the
    HOF-inlining hazard documented at text.winnowing_fingerprint)."""
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def _shingled(
    df: DataFrame, id_cols: list[str], text_col: str, n: int
) -> DataFrame:
    """(ids..., __shs) with the token array staged as its own projection
    so the shingle lambda references an attribute."""
    toks = df.select(*id_cols, _norm_tokens(text_col).alias("__toks"))
    return toks.select(
        *id_cols, _shingles_from_tokens(F.col("__toks"), n).alias("__shs")
    )


def eval_shingle_index(
    eval_df: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct normalized n-grams of the eval set — the broadcast
    side. One tiny input => one tiny index; the ``distinct()`` runs on
    the eval set's own partitions, never touching the corpus."""
    return (
        _shingled(eval_df, [], text_col, n)
        .select(F.explode("__shs").alias("sh"))
        .distinct()
    )


def contamination_stats(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document contamination audit: ``(id, n_shingles, n_hits,
    contamination_ratio, contaminated)``.

    ``n_hits`` counts the doc's DISTINCT shingles that appear anywhere
    in the eval set; ``contaminated`` is any-hit (the standard
    decontamination policy — a single 8-gram collision with a benchmark
    is disqualifying). Docs too short to form a shingle have
    ratio 0.0, not NULL (ANSI-safe: the division is guarded)."""
    idx = eval_shingle_index(eval_df, eval_text_col, n)
    shs = _shingled(docs, [id_col], text_col, n)
    base = shs.select(F.col(id_col), F.size("__shs").alias("n_shingles"))
    hits = (
        shs.select(F.col(id_col), F.explode("__shs").alias("sh"))
        .join(F.broadcast(idx), "sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    # hits is O(contaminated docs) — small by construction, so the
    # join-back to the full corpus is broadcast too (no corpus shuffle)
    return (
        base.join(F.broadcast(hits), id_col, "left")
        .fillna(0, ["n_hits"])
        .select(
            F.col(id_col),
            "n_shingles",
            "n_hits",
            F.round(
                F.when(F.col("n_shingles") == 0, F.lit(0.0)).otherwise(
                    F.col("n_hits") / F.col("n_shingles")
                ),
                4,
            ).alias("contamination_ratio"),
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """The corpus minus every document sharing >= 1 normalized n-gram
    with the eval set. Broadcast LEFT ANTI on the contaminated-id set:
    the corpus is filtered in place, never shuffled."""
    idx = eval_shingle_index(eval_df, eval_text_col, n)
    contaminated_ids = (
        _shingled(docs, [id_col], text_col, n)
        .select(F.col(id_col), F.explode("__shs").alias("sh"))
        .join(F.broadcast(idx), "sh")
        .select(id_col)
        .distinct()
    )
    return docs.join(F.broadcast(contaminated_ids), id_col, "left_anti")


def semantic_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """The SEMANTIC tier of eval-set decontamination: drop every corpus
    row whose embedding is cosine-close (>= ``threshold`` on the
    6dp-rounded cosine, the engine-deterministic boundary the dedup
    tiers use) to ANY eval embedding — catching paraphrased/reworded
    eval leakage the n-gram tier (``decontaminate``) cannot see. The
    two tiers compose: run the n-gram screen first (cheap, exact), the
    semantic screen on survivors.

    Scale shape: the EVAL side is small by nature (benchmarks, not
    corpora) — it broadcasts, the corpus is scanned once and NEVER
    shuffled (a broadcast nested-loop over eval rows per corpus
    partition, then a broadcast anti join of the tiny contaminated-id
    set). For very large eval sets, pre-restrict candidates with the
    ANN machinery (`operators/similarity.py`) and exact-verify only
    candidates, exactly as the dedup tiers do."""
    from ..functions.vectors import cosine

    ev = F.broadcast(eval_df.select(F.col(vec_col).alias("__ev")))
    contaminated = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .join(ev)
        .withColumn("__cos", F.round(cosine(vec_col, "__ev"), 6))
        .filter(F.col("__cos") >= threshold)
        .select(id_col)
        .distinct()
    )
    return corpus.join(F.broadcast(contaminated), id_col, "left_anti")
