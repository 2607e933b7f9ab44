"""Z-order (Morton) clustering for multi-column data skipping.

Parquet readers prune files and row groups by min/max statistics, but
the statistics only help if the layout is clustered: sorting by ONE
column gives perfect skipping on that column and none on the others.
Interleaving the bits of several rank-normalized columns (the Z-order
curve) gives every participating column a narrow min/max range in
every file — the standard layout optimization (Delta/Iceberg
``OPTIMIZE ZORDER BY``) re-expressed as a plain Spark plan:

    normalize each column to a ``bits``-wide integer (min/max scaling)
    -> interleave bits into one Morton key
    -> ``repartitionByRange`` on the key (range shards = files)
    -> ``sortWithinPartitions`` on the key
    -> write.

Scale (100 TB): one pass — a tiny min/max stats aggregate (broadcast
back, no driver collect), then exactly one range shuffle of the data;
the sampling-based range partitioner keeps shards balanced regardless
of value skew. Every term of the key is integer shift/mask arithmetic
inside whole-stage codegen. ``tests/test_zorder.py`` proves the
payoff mechanically: per-file footer min/max bounding boxes shrink and
a point-range predicate intersects a small fraction of files, vs
~all files under the natural row order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(v: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Rank-normalize a value into [0, 2^bits): floor((v - min) * s)
    with s = (2^bits - 1)/(max - min), clamped. Pure IEEE arithmetic —
    any engine evaluating the same expression gets the same integer."""
    top = F.lit((1 << bits) - 1).cast("long")
    span = (vmax - vmin).cast("double")
    scaled = F.floor(
        (v - vmin).cast("double") * (top.cast("double") / span)
    ).cast("long")
    # span == 0 (constant column) -> everything at 0; clamp both ends.
    return F.when(span <= 0, F.lit(0).cast("long")).otherwise(
        F.least(F.greatest(scaled, F.lit(0).cast("long")), top)
    )


def interleave_bits(norms: list[Column], bits: int) -> Column:
    """Morton key: bit i of column j lands at position i*d + j. For
    d columns of ``bits`` bits the key spans d*bits bits (keep
    d*bits <= 63)."""
    d = len(norms)
    if d * bits > 63:
        raise ValueError(f"{d} cols x {bits} bits exceeds a signed long")
    terms: list[Column] = []
    for j, n in enumerate(norms):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(n, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_sql(cols: list[str], mins: list[str], maxs: list[str], bits: int) -> str:
    """The identical Morton-key computation as ANSI SQL text (for
    engine mirrors / pushdown into other systems). ``cols``/``mins``/
    ``maxs`` are SQL expressions; emitted arithmetic matches
    ``normalize_to_bits`` + ``interleave_bits`` term for term."""
    d = len(cols)
    top = (1 << bits) - 1
    norms = []
    for c, lo, hi in zip(cols, mins, maxs):
        scaled = (
            f"CAST(FLOOR(CAST(({c}) - ({lo}) AS DOUBLE) * "
            f"(CAST({top} AS DOUBLE) / CAST(({hi}) - ({lo}) AS DOUBLE))) AS BIGINT)"
        )
        norms.append(
            f"(CASE WHEN CAST(({hi}) - ({lo}) AS DOUBLE) <= 0 THEN 0 "
            f"ELSE LEAST(GREATEST({scaled}, 0), {top}) END)"
        )
    terms = [
        f"((({n} >> {i}) & 1) << {i * d + j})"
        for j, n in enumerate(norms)
        for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, Column]:
    """Attach the stats row (one tiny aggregate, broadcast cross join —
    no driver action) and return (df_with_stats, morton_key_column)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    stats = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(stats))
    norms = [
        normalize_to_bits(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in cols
    ]
    return joined, interleave_bits(norms, bits)


def cluster_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` Z-clustered on ``cols`` into ``n_files`` range
    shards. Files carry only the original columns; the Morton key is
    computed, range-partitioned and sorted on, then projected away
    (projection preserves within-partition order)."""
    joined, z = zorder_key(df, cols, bits)
    out = (
        joined.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .select(*df.columns)
    )
    out.write.format(fmt).mode("overwrite").save(path)
