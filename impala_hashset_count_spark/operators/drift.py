"""Corpus distribution drift: compare the token distributions of two
corpus slices (yesterday's crawl vs today's, one source vs another,
train vs eval) — the monitoring pass a continuously-ingesting training
pipeline runs before a new slice is allowed to shift the mix.

Two metrics, chosen for ENGINE-BIT-STABILITY under the oracle hash:

- **Total variation, exact-integer form**: TV = 1/2 * sum_t
  |c_a(t)/N_a - c_b(t)/N_b| has the pure-INTEGER numerator
  ``sum_t |c_a(t)*N_b - c_b(t)*N_a|`` over the common denominator
  ``2*N_a*N_b`` — emitted as (tv_num, n_a, n_b) so the hashed surface
  is integers only. (At extreme scale c*N can approach int64 limits:
  ~1e13 tokens/slice overflows — switch the cross-product to DECIMAL
  there; at any realistic slice granularity BIGINT holds.)
- **Jensen-Shannon divergence, quantized-addend form**: with add-alpha
  smoothing, each per-token addend ``p*ln(p/m)`` is one chain of
  single IEEE ops on exact operands (counts + alpha are exact doubles,
  the denominators exact, ln correctly rounded in both engines — the
  discipline proven by corpus_stats' unigram-LM score), quantized to
  integer nano-units (``floor(x*1e9 + 0.5)``) and SUMMED AS BIGINT so
  the total is independent of partitioning and summation order.

Scale shape: one explode + map-side partial agg per slice, one
full-outer join on the token (vocabulary-sized, not corpus-sized), a
broadcast 1-row totals join, one final 1-row aggregate. The corpus
text is scanned once per slice and never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus_stats import _qint


def _token_counts(df: DataFrame, text_col: str, out: str) -> DataFrame:
    """(tok, <out>) whitespace-token counts; blank tokens and NULL
    texts contribute nothing (mirror: UNNEST(STRING_SPLIT_REGEX(
    TRIM(text), '\\s+')) WHERE tok <> '')."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias(out))
    )


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    q_scale: float = 1e9,
) -> DataFrame:
    """One-row drift summary between two corpus slices:

    (n_a, n_b, v, tv_num, kl_ab_q, kl_ba_q, js_q) where n_* are total
    token counts, v the joint vocabulary size, tv_num the exact-integer
    total-variation numerator (TV = tv_num / (2*n_a*n_b)), kl_*_q the
    add-``alpha``-smoothed KL divergences to the midpoint distribution
    in integer nano-nats, and js_q their integer mean (JS divergence =
    js_q / 1e9 nats; 0 = identical, ln(2) ~ 0.693 = disjoint)."""
    return drift_from_counts(
        _token_counts(df_a, text_col, "c_a"),
        _token_counts(df_b, text_col, "c_b"),
        alpha=alpha,
        q_scale=q_scale,
    )


def drift_from_counts(
    ca: DataFrame,
    cb: DataFrame,
    alpha: float = 0.5,
    q_scale: float = 1e9,
) -> DataFrame:
    """``distribution_drift`` over PRE-COUNTED token tables
    (tok, c_a) / (tok, c_b) — the face incremental maintenance uses
    (token counts are exactly mergeable by SUM, so a maintained count
    table feeds this directly; the raw corpus is never rescanned)."""
    j = ca.join(cb, "tok", "full").select(
        "tok",
        F.coalesce("c_a", F.lit(0)).alias("c_a"),
        F.coalesce("c_b", F.lit(0)).alias("c_b"),
    )
    tot = j.agg(
        F.sum("c_a").alias("n_a"),
        F.sum("c_b").alias("n_b"),
        F.count(F.lit(1)).alias("v"),
    )
    x = j.join(F.broadcast(tot))
    p = (F.col("c_a") + F.lit(alpha)) / (F.col("n_a") + F.lit(alpha) * F.col("v"))
    q = (F.col("c_b") + F.lit(alpha)) / (F.col("n_b") + F.lit(alpha) * F.col("v"))
    m = (p + q) / F.lit(2.0)
    agg = x.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max("v").alias("v"),
        F.sum(
            F.abs(F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a"))
        ).alias("tv_num"),
        F.sum(_qint(p * F.log(p / m), q_scale)).alias("kl_ab_q"),
        F.sum(_qint(q * F.log(q / m), q_scale)).alias("kl_ba_q"),
    )
    return agg.withColumn(
        "js_q", F.expr("(kl_ab_q + kl_ba_q) div 2")
    )


def drift_oracle_ctes(slice_a_sql: str, slice_b_sql: str, alpha: float = 0.5,
                      q_scale: str = "1e9", prefix: str = "d") -> str:
    """DuckDB CTE chain mirroring ``distribution_drift`` term-for-term,
    spliceable into a larger WITH; emits ``{prefix}final(n_a, n_b, v,
    tv_num, kl_ab_q, kl_ba_q, js_q)``. ``slice_*_sql`` must each select
    one VARCHAR column ``text``. js_q mirror note: Spark's ``div``
    TRUNCATES toward zero while DuckDB's ``//`` floors — they differ on
    negative odd sums, so the mirror truncates an exact double division
    ((a+b) far below 2^53 here)."""
    p = prefix
    return f"""{p}ta AS (
        SELECT t.tok, COUNT(*) AS c_a
        FROM ({slice_a_sql}) s,
             UNNEST(STRING_SPLIT_REGEX(TRIM(s.text), '\\s+')) AS t(tok)
        WHERE t.tok <> '' GROUP BY t.tok
    ),
    {p}tb AS (
        SELECT t.tok, COUNT(*) AS c_b
        FROM ({slice_b_sql}) s,
             UNNEST(STRING_SPLIT_REGEX(TRIM(s.text), '\\s+')) AS t(tok)
        WHERE t.tok <> '' GROUP BY t.tok
    ),
    {p}jj AS (
        SELECT COALESCE({p}ta.tok, {p}tb.tok) AS tok,
               COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
        FROM {p}ta FULL OUTER JOIN {p}tb ON {p}ta.tok = {p}tb.tok
    ),
    {p}tt AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
                     CAST(SUM(c_b) AS BIGINT) AS n_b, COUNT(*) AS v
              FROM {p}jj),
    {p}xx AS (
        SELECT c_a, c_b, n_a, n_b, v,
               (c_a + {alpha}) / (n_a + {alpha} * v) AS p,
               (c_b + {alpha}) / (n_b + {alpha} * v) AS q
        FROM {p}jj CROSS JOIN {p}tt
    ),
    {p}ag AS (
        SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b, MAX(v) AS v,
               CAST(SUM(ABS(c_a * n_b - c_b * n_a)) AS BIGINT) AS tv_num,
               CAST(SUM(CAST(FLOOR(p * LN(p / ((p + q) / 2.0)) * {q_scale} + 0.5)
                        AS BIGINT)) AS BIGINT) AS kl_ab_q,
               CAST(SUM(CAST(FLOOR(q * LN(q / ((p + q) / 2.0)) * {q_scale} + 0.5)
                        AS BIGINT)) AS BIGINT) AS kl_ba_q
        FROM {p}xx
    ),
    {p}final AS MATERIALIZED (
        -- one row; MATERIALIZED so multi-branch consumers (the
        -- hygiene oracle references it from 7 branches) evaluate the
        -- token-count chain once, and the sweep's prefix-export path
        -- can snapshot it (tools/sf1_oracle_sweep)
        SELECT n_a, n_b, v, tv_num, kl_ab_q, kl_ba_q,
               CAST(TRUNC((kl_ab_q + kl_ba_q) / 2.0) AS BIGINT) AS js_q
        FROM {p}ag
    )"""


def drift_oracle_select(slice_a_sql: str, slice_b_sql: str, alpha: float = 0.5,
                        q_scale: str = "1e9") -> str:
    """Standalone DuckDB SELECT form of ``drift_oracle_ctes``."""
    return (
        "WITH "
        + drift_oracle_ctes(slice_a_sql, slice_b_sql, alpha, q_scale)
        + "\n    SELECT * FROM dfinal"
    )
