"""Declarative Bloom filter: a bitmap-WORD TABLE built with plain
aggregates — no UDF, no driver-side state, no internal expressions.

Spark's own ``bloom_filter_agg``/``might_contain`` exist only as
internal optimizer expressions (the runtime-filter rewrite injects
them; they are not registered SQL routines), and ``df.stat.bloomFilter``
materializes a driver-side JVM object that executors cannot probe. So
the operator-level Bloom filter is built from first principles, in the
engine's own algebra:

- the filter IS a DataFrame ``(word_idx BIGINT, word BIGINT)`` — 64
  bits per row, ``n_bits/64`` rows total. Build = explode each key into
  ``k`` bit positions, ``BIT_OR`` the shifted masks per word. One
  narrow aggregate; mergeable (BIT_OR is associative/commutative —
  union of filters = BIT_OR of their word tables); tiny (1M bits =
  16k rows = ~128 KB) and therefore broadcastable.
- probe = explode each candidate key into the same ``k`` positions,
  LEFT-join the broadcast word table, ``bool_and(bit set)`` per key.
  The probed side never shuffles against history.

Everything is integer/boolean arithmetic, so the filter is
ENGINE-BIT-STABLE: a SQL oracle can rebuild the exact same words and
reproduce every membership verdict — including the false positives —
value-for-value (the md5 hash tier; production uses xxhash64).

Error model: no false negatives (a true duplicate always probes all
its bits set); an ~fpp fraction of genuinely-new keys is wrongly
flagged seen. For crawl-scale ingestion that trade buys never
shuffling the new batch against a 100 TB history; where wrong drops
are unacceptable, use the flag as a PRE-FILTER and exact-anti-join
only the flagged rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_expr(key, i: int, hash_fn: str):
    """64-bit non-negative hash of (i, key). ``xxhash64`` (production)
    seeds the n-ary hash with the literal round index; ``md5`` derives
    60 bits from the hex digest (the DuckDB-mirrorable tier, same
    construction as the MinHash/SimHash md5 tiers)."""
    if hash_fn == "xxhash64":
        # abs() would bias Long.MIN_VALUE; mask the sign bit instead
        return F.xxhash64(F.lit(i), key).bitwiseAND(F.lit((1 << 63) - 1))
    if hash_fn == "md5":
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def suggest_bits(expected_items: int, fpp: float) -> int:
    """Standard sizing: m = -n * ln(fpp) / ln(2)^2, rounded up to a
    multiple of 64."""
    m = int(-expected_items * math.log(fpp) / (math.log(2) ** 2))
    return max(64, (m + 63) & ~63)


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int,
    k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the (word_idx, word) bitmap table from a key column.
    NULL keys are ignored (NULL is never 'seen'). One explode (k rows
    per key) + one BIT_OR aggregate; output has at most n_bits/64
    rows regardless of key count."""
    if n_bits % 64 != 0:
        raise ValueError("n_bits must be a multiple of 64")
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[(_hash_expr(key, i, hash_fn) % n_bits) for i in range(k)])
    ).alias("pos")
    return (
        keys.filter(key.isNotNull())
        .select(pos)
        .select(
            F.expr("pos div 64").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int,
    k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Append ``maybe_seen`` (boolean) to ``df``: true iff all k of the
    key's filter bits are set. The word table joins BROADCAST; the
    per-key verdict is computed over distinct keys then joined back, so
    duplicate keys in ``df`` hash only once. NULL keys probe as
    ``maybe_seen = false``."""
    key = F.col(key_col)
    keys = df.select(key_col).filter(key.isNotNull()).distinct()
    kp = keys.select(
        key_col,
        F.explode(
            F.array(*[(_hash_expr(key, i, hash_fn) % n_bits) for i in range(k)])
        ).alias("pos"),
    ).select(
        key_col,
        F.expr("pos div 64").alias("word_idx"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("mask"),
    )
    hit = F.coalesce(
        F.col("word").bitwiseAND(F.col("mask")) != 0, F.lit(False)
    )
    verdict = (
        kp.join(F.broadcast(bloom), "word_idx", "left")
        .groupBy(key_col)
        .agg(F.bool_and(hit).alias("maybe_seen"))
    )
    return df.join(verdict, key_col, "left").withColumn(
        "maybe_seen", F.coalesce(F.col("maybe_seen"), F.lit(False))
    )


def bloom_dedup_incremental(
    new_df: DataFrame,
    seen_keys: DataFrame,
    key_col: str,
    order_col: str,
    expected_items: int = 1_000_000,
    fpp: float = 0.01,
    k: int = 5,
    hash_fn: str = "xxhash64",
    n_bits: int | None = None,
) -> DataFrame:
    """Probabilistic tier of ``dedup.exact_dedup_incremental``: dedup
    the new batch within itself exactly (keep-lowest ``order_col``),
    then drop rows whose key the Bloom filter over ``seen_keys`` flags
    as maybe-seen. No false survivals of true duplicates; ~fpp of
    genuinely-new keys wrongly dropped (see module docstring for when
    that trade is right and the exact-pre-filter alternative)."""
    from .dedup import exact_dedup

    bits = n_bits if n_bits is not None else suggest_bits(expected_items, fpp)
    bloom = bloom_build(seen_keys, key_col, bits, k=k, hash_fn=hash_fn)
    fresh = exact_dedup(new_df, [key_col], order_col)
    return (
        bloom_probe(fresh, key_col, bloom, bits, k=k, hash_fn=hash_fn)
        .filter(~F.col("maybe_seen"))
        .drop("maybe_seen")
    )


#: Sign-bit-safe 64-bit mask: DuckDB raises on ``1::BIGINT << 63``
#: where Spark's shiftleft wraps to Long.MIN_VALUE — mirror the wrap.
_MASK_SQL = (
    "CASE WHEN {bit} = 63 THEN CAST('-9223372036854775808' AS BIGINT) "
    "ELSE CAST(1 AS BIGINT) << CAST({bit} AS INTEGER) END"
)


def bloom_oracle_ctes(
    history_sql: str, batch_sql: str, n_bits: int, k: int = 5
) -> str:
    """DuckDB CTEs mirroring the md5-tier build AND probe
    term-for-term. ``history_sql``/``batch_sql`` must each select one
    column aliased ``key``. Emits ``bhist(key)``, ``bwords(word_idx,
    word)``, and ``bprobe(key, maybe_seen)`` over the batch keys."""
    pos = (
        "(CAST('0x' || SUBSTRING(MD5(CONCAT(CAST(t.i AS VARCHAR), ':', key)),"
        f" 1, 15) AS BIGINT)) % {n_bits}"
    )
    return f"""bhist AS ({history_sql}),
    bpos AS (
        SELECT {pos} AS pos
        FROM bhist, UNNEST(GENERATE_SERIES(0, {k - 1})) AS t(i)
    ),
    bwords AS (
        SELECT pos // 64 AS word_idx,
               BIT_OR({_MASK_SQL.format(bit="pos % 64")}) AS word
        FROM bpos GROUP BY 1
    ),
    bbatch AS ({batch_sql}),
    bqpos AS (
        SELECT key, {pos} AS pos
        FROM bbatch, UNNEST(GENERATE_SERIES(0, {k - 1})) AS t(i)
    ),
    bprobe AS (
        SELECT q.key,
               BOOL_AND(COALESCE(
                   (w.word & {_MASK_SQL.format(bit="q.pos % 64")}) <> 0,
                   FALSE)) AS maybe_seen
        FROM bqpos q LEFT JOIN bwords w ON w.word_idx = q.pos // 64
        GROUP BY q.key
    )"""
