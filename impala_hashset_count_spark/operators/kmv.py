"""KMV (k-minimum-values) distinct-count sketch — deterministic and mergeable.

The reference's whole reason to exist is exact grouped distinct counting
(`/root/reference/README.md:1`), and its README concedes the approximate
alternative for "very large numbers" (`README.md:10`). Spark's built-in
answer is HyperLogLog++ (`approx_count_distinct`) and the storable
Datasketches-HLL tier (`operators/hashset_count.py`), but an HLL estimate
is not SQL-recomputable, so those rows can only ever get the driver's
rows-only check. KMV closes that gap: it is the OTHER classical distinct
sketch (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream") and every step of it is plain deterministic SQL —

    1. hash each value to a uniform integer      (md5-derived, content-fixed)
    2. keep the k smallest DISTINCT hash values  (bottom-k, min-wise)
    3. if fewer than k survive, the count is EXACT (the sketch holds
       every distinct hash); otherwise estimate n ~= (k-1) * H / h_k
       where h_k is the k-th smallest hash and H the hash-space size.

Determinism: the hash is content-derived (no seed, no RNG state), the
bottom-k set is a pure function of the value set, and the estimate is a
single BIGINT floor-division — so the sketch AND the estimate are
bit-identical across partitionings, engines, and runs, and a DuckDB
oracle can recompute the entire pipeline term for term (the same
discipline as the md5 simhash/minhash tiers in `operators/dedup.py`).

Mergeability is exact, not approximate: bottom-k of a union equals
bottom-k of the concatenated per-part bottom-ks (min-wise sampling),
so stored sketches roll up to coarser grains with zero raw-data access
and ``combine(accumulate(A), accumulate(B)) == accumulate(A ∪ B)``
bit-for-bit — the same Init/Update/Serialize/Merge/Finalize shape as
the reference UDA (`hashset-count.h:30-34`), with an O(k) state instead
of the reference's O(n) hash table.

Hash width: 52 bits (13 hex chars of md5). Rationale: the estimate's
numerator ``(k-1) * 2**52`` must fit in an int64 (k=256 -> 1.15e18 <
9.2e18), and 52 bits keeps the collision probability negligible at any
group cardinality this sketch is honest for (at n=1e6 distincts,
P[any collision] ~= n^2/2^53 ~= 1e-4, and a collision only perturbs the
estimate by ~1/n). Error: standard error ~ 1/sqrt(k-2) (~6% at k=256);
the knob is k.

Scale (100 TB): the build is (a) one DISTINCT shuffle on
(group, hash) — partial map-side dedup applies, so the shuffle carries
at most the distinct set, (b) a rank-<=k window that Spark's
``WindowGroupLimit`` bounds map-side at k rows per group per partition,
reusing the same hash partitioning (one exchange total), (c) an O(k)
collect per group. State per group is <=k int64s (2 KB at k=256) —
versus the reference's 300k-bucket table this is the sketch you can
store per cell of a dashboard cube.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 52
HASH_SPACE = 1 << HASH_BITS  # 4503599627370496


def kmv_hash(col: Column) -> Column:
    """52-bit uniform content hash: the first 13 hex chars of
    ``md5(cast(value as string))`` parsed as an integer. Every engine
    with md5 mirrors this verbatim (DuckDB:
    ``CAST('0x' || substr(md5(v), 1, 13) AS BIGINT)``); NULL in, NULL
    out (NULLs never enter the sketch, matching the reference's
    NULL-skipping update, `hashset-count.cc:106`)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast(
        "bigint"
    )


def kmv_accumulate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
) -> DataFrame:
    """Build one KMV sketch per group: a sorted ``array<bigint>`` of the
    k smallest distinct value hashes (``kmv_sketch`` column). Groups
    whose every value is NULL get an empty array (finalize renders them
    NULL-not-0, matching the reference's empty-state Finalize,
    `hashset-count.cc:507-510`).

    Plan shape: DISTINCT on (group, hash) -> WindowGroupLimit rank cut
    (map-side bounded at k) -> O(k) collect. The window and the final
    aggregate hash on the group columns the distinct already
    partitioned by, so there is one exchange — and ONE scan: all-NULL
    groups ride the same pipeline as a (group, NULL) row ordered
    nulls-LAST (never displacing a real hash from the bottom-k;
    ``collect_list`` then drops the NULL, leaving the empty sketch the
    reference's empty-state Finalize needs). r9: this replaced a
    second full scan (``df.select(groups).distinct()``) plus a join
    whose only job was re-attaching those groups — one pass instead of
    two over a 100 TB fact table, one fewer exchange (measured at
    sf0.1: kmv arm 2.37 -> 1.66 s, kmv_setops 1.67 -> 1.32 s
    min-of-4)."""
    h = kmv_hash(F.col(value_col))
    hashed = df.select(*group_cols, h.alias("__h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h").asc_nulls_last())
    cut = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    # collect_list skips NULLs, so the nulls-last placeholder row of an
    # all-NULL group aggregates to array() — the empty sketch.
    sketch = F.slice(F.array_sort(F.collect_list("__h")), 1, k)
    return cut.groupBy(*group_cols).agg(sketch.alias("kmv_sketch"))


def kmv_combine(
    sketches: DataFrame,
    group_cols: list[str],
    k: int,
    sketch_col: str = "kmv_sketch",
) -> DataFrame:
    """Roll stored sketches up to a coarser grain: concatenate,
    re-distinct (the same value may appear in several part sketches),
    re-sort, keep k. Exactly equal to the sketch built directly over
    the unioned raw data (min-wise mergeability) —
    ``tests/test_kmv.py`` asserts this bit-for-bit. This is the
    reference's Merge step (`hashset-count.cc:269-461`, a
    sort-merge-union-dedup of two serialized states) at O(k) state."""
    merged = F.slice(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(F.col(sketch_col))))
        ),
        1,
        k,
    )
    return sketches.groupBy(*group_cols).agg(merged.alias(sketch_col))


def kmv_estimate(
    sketches: DataFrame,
    k: int,
    sketch_col: str = "kmv_sketch",
    out_col: str = "kmv_distinct",
) -> DataFrame:
    """Finalize: distinct-count estimate as a BIGINT column.

    Under capacity (sketch holds fewer than k hashes) the sketch has
    seen EVERY distinct hash, so the answer is exact: ``size(sketch)``.
    At capacity the classical unbiased KMV estimator applies:
    ``(k-1) * HASH_SPACE / h_k`` with h_k the k-th (largest kept) hash
    — computed as a single int64 floor-division, so the emitted value
    is engine- and partitioning-bit-stable (no float arithmetic
    anywhere). Empty sketch (all-NULL group) -> NULL, not 0
    (`hashset-count.cc:507-510`)."""
    n = F.size(F.col(sketch_col))
    # try_element_at: under capacity there IS no k-th element and the
    # n<k branch answers exactly — must not throw under ANSI mode
    h_k = F.try_element_at(F.col(sketch_col), F.lit(k))
    # int64 floor division via SQL `div` on staged columns keeps the
    # arithmetic integer end-to-end (both operands positive, so `div`
    # == floor division in Spark and `//` matches it in DuckDB).
    staged = sketches.withColumn("__hk", h_k).withColumn("__n", n)
    out = staged.withColumn(
        out_col,
        F.when(F.col("__n") == 0, F.lit(None).cast("bigint")).otherwise(
            F.when(F.col("__n") < k, F.col("__n").cast("bigint")).otherwise(
                F.expr(f"CAST({(k - 1) * HASH_SPACE} AS BIGINT) div __hk")
            )
        ),
    )
    return out.drop("__hk", "__n")


def kmv_set_estimates(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    k: int,
    sketch_col: str = "kmv_sketch",
) -> DataFrame:
    """Distinct-set ALGEBRA from stored sketches — |A ∪ B|, Jaccard,
    and |A ∩ B| estimates per group, touching no raw data.

    This is the capability that separates a sketch from a counter:
    distinct counts are not additive, and the reference's exact state
    (`hashset-count.cc`) can only union. KMV composes: the bottom-k of
    A ∪ B is exactly computable from the two sketches (min-wise merge),
    and because every sketch draws from the SAME content-fixed hash
    permutation, the merged sketch is a uniform sample of the union —
    so the fraction of its entries present in BOTH input sketches is
    the standard KMV Jaccard estimator (Bar-Yossef et al.; the same
    estimator family MinHash uses, `operators/dedup.py`).

    All arithmetic is integer (membership counts, one floor-division
    per estimate): deterministic across engines and partitionings.
    Returns (group, union_est, jaccard_k, jaccard_n, inter_est) where
    jaccard ≈ jaccard_n / jaccard_k (exact integers; jaccard_k =
    |merged sketch| <= k) and inter_est = union_est * jaccard_n div
    jaccard_k. Groups must be present in both inputs (inner join —
    semantics of "compare these two slices")."""
    sa = a.select(*group_cols, F.col(sketch_col).alias("__ska"))
    sb = b.select(*group_cols, F.col(sketch_col).alias("__skb"))
    both = sa.join(sb, on=group_cols, how="inner")
    merged = F.slice(
        F.array_sort(
            F.array_distinct(F.concat(F.col("__ska"), F.col("__skb")))
        ),
        1,
        k,
    )
    staged = both.withColumn("__m", merged).withColumn(
        "__jn",
        F.size(
            F.filter(
                F.col("__m"),
                lambda h: F.array_contains(F.col("__ska"), h)
                & F.array_contains(F.col("__skb"), h),
            )
        ).cast("long"),
    ).withColumn("__jk", F.size(F.col("__m")).cast("long"))
    est = kmv_estimate(
        staged.withColumnRenamed("__m", "u_sketch"),
        k,
        sketch_col="u_sketch",
        out_col="union_est",
    )
    return est.select(
        *group_cols,
        "union_est",
        F.col("__jk").alias("jaccard_k"),
        F.col("__jn").alias("jaccard_n"),
        F.when(F.col("__jk") == 0, F.lit(None).cast("bigint")).otherwise(
            F.expr("union_est * __jn div __jk")
        ).alias("inter_est"),
    )
