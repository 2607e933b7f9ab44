"""Declarative Count-Min Sketch: approximate per-key FREQUENCIES in
bounded space — the frequency twin of `operators/bloom.py`'s
membership filter, built the same way: the sketch IS a DataFrame
``(r, c, cnt)`` of touched cells (at most depth*width rows regardless
of key cardinality), maintained with plain aggregates.

- **accumulate**: each input row explodes into ``depth`` (row, col)
  cells (col = hash_r(key) % width), one COUNT aggregate. Map-side
  partial agg absorbs the fan-out.
- **merge**: SUM per cell — associative/commutative, so sketches over
  batches fold into the sketch over the union exactly (the same
  mergeable-state discipline as kmv/aggstate/bloom; incremental
  maintenance = keep the cell table, add each batch's delta).
- **estimate**: per queried key, min over the depth cells it hashes to
  (missing cell = 0). Count-Min guarantees est >= true count always
  (never an undercount), with overestimates bounded by the collision
  mass ~ N/width per row.

Everything is integer arithmetic on md5/xxhash64-derived cells, so the
md5 tier sits under the DuckDB hash oracle — including the
OVERESTIMATES, which an independent engine reproduces exactly.

When to use which frequency structure: ``approx_top_k`` (frequent-items
sketch, `operators/corpus_stats.py`) answers "which keys are heavy";
CMS answers "how heavy is THIS key" for arbitrary point queries without
storing keys at all (cells only) — at 100 TB the sketch is a few MB
regardless of vocabulary, join-free to maintain, and private to the
keys it saw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(key, r: int, width: int, hash_fn: str):
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.lit(r), key).bitwiseAND(F.lit((1 << 63) - 1))
    elif hash_fn == "md5":
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{r}:"), key.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    return h % width


def cms_accumulate(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the (r, c, cnt) cell table over a key column. NULL keys
    contribute nothing (no identity to count)."""
    key = F.col(key_col)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"), _cell(key, r, width, hash_fn).alias("c")
                )
                for r in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.filter(key.isNotNull())
        .select(cells)
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Fold cell tables: SUM per cell == the sketch over the union of
    the inputs, exactly (integer addition, order-independent)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "c").agg(F.sum("cnt").cast("long").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(key, est) for each queried key: min over its depth cells,
    missing cells as 0. The sketch side broadcasts (bounded by
    depth*width cells); the queried keys never shuffle against the
    counted corpus."""
    key = F.col(key_col)
    kp = keys.select(key_col).filter(key.isNotNull()).distinct()
    probes = kp.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cell(key, r, width, hash_fn).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
    return (
        probes.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


def cms_oracle_ctes(
    src_sql: str, keys_sql: str, width: int, depth: int = 4
) -> str:
    """DuckDB CTEs mirroring the md5 tier term-for-term:
    ``src_sql``/``keys_sql`` each select one column aliased ``key``.
    Emits ``cmsest(key, est)``."""
    h = (
        "(CAST('0x' || SUBSTRING(MD5(CONCAT(CAST(t.r AS VARCHAR), ':', key)),"
        f" 1, 15) AS BIGINT)) % {width}"
    )
    return f"""cmssrc AS ({src_sql}),
    cmscells AS (
        SELECT t.r, {h} AS c, COUNT(*) AS cnt
        FROM cmssrc, UNNEST(GENERATE_SERIES(0, {depth - 1})) AS t(r)
        GROUP BY 1, 2
    ),
    cmskeys AS ({keys_sql}),
    cmsprobe AS (
        SELECT key, t.r, {h} AS c
        FROM cmskeys, UNNEST(GENERATE_SERIES(0, {depth - 1})) AS t(r)
    ),
    cmsest AS (
        SELECT p.key, MIN(COALESCE(s.cnt, 0)) AS est
        FROM cmsprobe p
        LEFT JOIN cmscells s ON s.r = p.r AND s.c = p.c
        GROUP BY p.key
    )"""
