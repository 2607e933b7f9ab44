"""Skew- and shuffle-management operators.

The reference never faced these (one node, one aggregate — Impala's
exchange handled distribution; `/root/reference/README.md:26-33`), but
any 100 TB deployment of this engine does:

- ``salted_join`` — explicit key-salting for joins whose key
  distribution is so skewed that one task would receive a large
  fraction of all rows. AQE's skew-join splitting
  (``spark.sql.adaptive.skewJoin``) handles moderate skew
  transparently; salting is the heavy hammer for a single hot key
  (e.g. the null-ish placeholder id that is 30% of a log table).
  The left (fact) side gets a deterministic pseudo-random salt in
  [0, salt); the right side is replicated salt times; the join key
  becomes (key, salt) so the hot key spreads over ``salt`` tasks.

- ``bucketed_table`` / co-located joins — persisting both sides
  bucketed by the join key (``bucketBy`` + ``sortBy``) lets repeated
  joins run with ZERO exchange: each task reads matching buckets from
  both sides. This is the physical-design answer when the same join
  runs daily over 100 TB — pay the shuffle once at write time.
  Asserted shuffle-free in tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``left`` (large, skewed) with ``right`` (small-ish but
    above the broadcast threshold) on column ``on``, spreading each key
    over ``salt`` reduce tasks.

    The salt is a deterministic hash of the whole left row id-space
    (xxhash64 of key + a per-partition counter), so retries produce the
    same placement. Supported ``how``: inner / left — semantics are
    identical to the unsalted join because every right row exists for
    every salt value."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    lsalt = F.pmod(
        F.xxhash64(F.col(on), F.monotonically_increasing_id()), F.lit(salt)
    ).alias("__salt")
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, [on, "__salt"], how)
    return out.drop("__salt")


def bucketed_table(
    df: DataFrame,
    spark: SparkSession,
    name: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Persist ``df`` as an external table bucketed (and sorted) by
    ``bucket_col``. A join between two tables bucketed the same way on
    the join key plans with NO Exchange — the write paid the shuffle
    once, every subsequent join is co-located."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )
    return spark.table(name)
