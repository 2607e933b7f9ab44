"""Exact distinct counting over bounded integer domains via bitmap
aggregation — the roaring-bitmap-style exact-NDV tier.

The reference engine keeps exact distinct state as a sorted
``\\0``-delimited value list and merges by sort-merge-union-with-dedup
(`hashset-count.cc:269-461`). For INTEGER-valued columns with a
bounded (dense-ish) domain there is a far cheaper exact state the
Impala ecosystem itself reaches for (Kylin/Druid-style exact count
distinct): a bitmap. Value ``v`` maps to bucket ``v >> 6`` and bit
``v & 63``; per (group, bucket) the state is ONE 64-bit word — the
``BIT_OR`` of the set bits — and the distinct count is
``SUM(bit_count(word))``.

Why this scales where the value-list state cannot:

- **State is bounded by the DOMAIN, not the row count**: a group with
  10^12 rows over a 10^8-value id space holds at most 10^8/64 words
  (~12 MB), however many rows hit it. The reference's list state grows
  with distinct VALUES *and* pays per-row memcmp dedup on merge.
- **Merge is word-wise BIT_OR** — associative, commutative, fixed
  width — so Spark's partial aggregation combines map-side and the
  shuffle carries (group, bucket, word) rows: occupied buckets only,
  16 bytes of payload each, never the raw values.
- **Whole-stage codegen end to end**: shift/mask/BIT_OR/bit_count are
  all JVM built-ins; no Python, no UDAF, no sketch error.
- **Set algebra is exact and stateless-mergeable**: intersections and
  unions of two accumulated states are word-wise ``AND`` / ``OR`` —
  the capability the reference's merge can never offer (its merge can
  only union then count, `hashset-count.cc:269-461`); the KMV tier
  (`operators/kmv.py`) estimates these, the bitmap tier is EXACT.

The trade is the domain bound: values must be integers in a range you
are willing to hold /64 words for (ids, enum codes, date ordinals).
For unbounded or string domains the exact-list (`hashset_count`),
KMV, or HLL tiers remain the path — this module is the fourth point
on that state-size/exactness frontier.

Contract parity with the reference UDA (`hashset-count.cc:464-524`):
NULL values are skipped on accumulate; a group with no non-NULL value
yields NULL (never 0) from the finalizer helpers when joined against
the group spine (``bitmap_distinct_count`` handles the spine join).
Negative values are handled exactly: arithmetic ``>> 6`` floors the
bucket and ``& 63`` is the non-negative bit index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__bd_bucket"
_WORD = "__bd_word"


def bitmap_accumulate(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Accumulate exact bitmap distinct state: one row per
    ``(group_cols..., __bd_bucket)`` whose ``__bd_word`` has bit
    ``v & 63`` set for every distinct non-NULL ``value_col`` with
    ``v >> 6 == __bd_bucket``. The state table is persistable and
    re-mergeable (``bitmap_merge``) — the bitmap analog of the
    reference's serialized list state (`hashset-count.cc:195-262`)."""
    v = F.col(value_col).cast("long")
    return (
        df.filter(v.isNotNull())
        .select(
            *group_cols,
            F.shiftright(v, 6).alias(_BUCKET),
            F.expr(
                f"shiftleft(1L, cast(cast(`{value_col}` as long) & 63 as int))"
            ).alias("__bd_bit"),
        )
        .groupBy(*group_cols, _BUCKET)
        .agg(F.expr("bit_or(__bd_bit)").alias(_WORD))
    )


def bitmap_merge(states: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge any number of accumulated state tables (already unioned
    into ``states``): word-wise BIT_OR per (group, bucket). Exactly
    lossless — the bitmap form of the reference's
    sort-merge-union-dedup merge (`hashset-count.cc:269-461`), at one
    associative JVM aggregate instead of per-value memcmp."""
    return states.groupBy(*group_cols, _BUCKET).agg(
        F.expr(f"bit_or({_WORD})").alias(_WORD)
    )


def bitmap_count(states: DataFrame, group_cols: list[str]) -> DataFrame:
    """Finalize a state table to ``(group_cols..., distinct_count)``.
    Groups absent from the state (no non-NULL values ever accumulated)
    emit no row — join against a group spine (or use
    ``bitmap_distinct_count``) for the reference's NULL-not-0 edge."""
    return states.groupBy(*group_cols).agg(
        F.expr(f"sum(bit_count({_WORD}))").alias("distinct_count")
    )


def bitmap_distinct_count(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """One-shot exact distinct count per group with the reference's
    output contract (`hashset-count.cc:464-524`): STRING count, NULL —
    not 0, not a dropped row — for groups whose every value is NULL.
    Two codegen'd hash aggregations (group+bucket, then group), both
    with map-side partial combine; the group spine rides the same scan
    via a count of non-NULL values, so no second pass over the data."""
    v = F.col(value_col).cast("long")
    per_bucket = (
        df.select(
            *group_cols,
            F.when(v.isNotNull(), F.shiftright(v, 6)).alias(_BUCKET),
            F.when(
                v.isNotNull(),
                F.expr(
                    f"shiftleft(1L, cast(cast(`{value_col}` as long)"
                    " & 63 as int))"
                ),
            ).alias("__bd_bit"),
        )
        # NULL values keep their group alive through the bucket grain
        # (a NULL bucket row) so empty groups survive to the spine
        # without a separate scan; bit_or ignores NULL bits only when
        # mixed, so guard with a count of real bits per bucket.
        .groupBy(*group_cols, _BUCKET)
        .agg(
            F.expr("bit_or(__bd_bit)").alias(_WORD),
            F.count("__bd_bit").alias("__bd_n"),
        )
    )
    return (
        per_bucket.groupBy(*group_cols)
        .agg(
            F.sum(
                F.when(
                    F.col("__bd_n") > 0, F.expr(f"bit_count({_WORD})")
                ).otherwise(F.lit(0))
            ).alias("__bd_cnt"),
            F.sum("__bd_n").alias("__bd_vals"),
        )
        .select(
            *group_cols,
            F.when(F.col("__bd_vals") > 0, F.col("__bd_cnt"))
            .cast("string")
            .alias("hashset_count"),
        )
    )


def bitmap_set_counts(
    state_a: DataFrame, state_b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """EXACT set algebra per group from two accumulated states alone:
    ``(group_cols..., inter_count, union_count, only_a, only_b)`` via
    word-wise AND/OR over a full-outer (group, bucket) join — no
    re-scan of either input, no estimate. Groups present in only one
    state get inter 0 and union = that side's count. This is the
    exact counterpart of ``kmv_set_estimates`` (`operators/kmv.py`)
    and the operation the reference's union-only merge cannot express
    (`hashset-count.cc:269-461`)."""
    a = state_a.withColumnRenamed(_WORD, "__wa")
    b = state_b.withColumnRenamed(_WORD, "__wb")
    j = a.join(b, [*group_cols, _BUCKET], "full")
    return j.groupBy(*group_cols).agg(
        F.sum(F.expr("bit_count(coalesce(__wa, 0L) & coalesce(__wb, 0L))"))
        .alias("inter_count"),
        F.sum(F.expr("bit_count(coalesce(__wa, 0L) | coalesce(__wb, 0L))"))
        .alias("union_count"),
        F.sum(F.expr("bit_count(coalesce(__wa, 0L) & ~coalesce(__wb, 0L))"))
        .alias("only_a"),
        F.sum(F.expr("bit_count(coalesce(__wb, 0L) & ~coalesce(__wa, 0L))"))
        .alias("only_b"),
    )
