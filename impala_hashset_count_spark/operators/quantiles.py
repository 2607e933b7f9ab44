"""Deterministic mergeable quantile sketch: bottom-k by content hash.

``percentile`` is exact but needs the whole group's values;
``percentile_approx`` (t-digest) is bounded-state but its estimate
depends on merge order — re-runs on a different partitioning can give
different answers, which breaks the repo-wide engine-reproducibility
contract (every sampler here is hash-deterministic, see
``operators/sampling.py``).

Bottom-k by hash gives both properties at once: the k rows whose
``md5(key)`` is smallest form a uniform random sample of the group
(the hash order is a random permutation, fixed by content), and the
sample is MERGEABLE — bottom-k of a union is the bottom-k of the
concatenated per-part bottom-ks, exactly (min-wise sampling). Quantile
estimates are then discrete order statistics of the sample: value at
rank ``ceil(q * n)`` — pure selection, no interpolation arithmetic, so
the result is an actual data value and bit-identical on every engine.

Scale (100 TB): ``bottomk_sample`` is a rank-limited window — Spark's
``WindowGroupLimit`` pushes the ``row_number <= k`` filter to the map
side, so each input partition forwards at most k rows per group into
the one shuffle. The sketch-table faces (``bottomk_accumulate`` /
``bottomk_combine``) store one ≤k-element array per fine-grain group
and roll up to coarser grains WITHOUT touching raw data — the same
stored-sketch pattern as the Datasketches-HLL tier
(`operators/hashset_count.py`) and the frequent-items sketch
(`operators/corpus_stats.py`).

Error: a k-sample's q-quantile estimate has standard error
~sqrt(q(1-q)/k) in rank space (k=256 => ~3 percentile points at the
median) — the knob is k, and the estimate never leaves the data's
value domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_rank(key: Column) -> Column:
    """Deterministic uniform ORDER for a key: the md5 hex digest.

    Fixed-width lowercase hex compares lexicographically exactly as the
    underlying 128-bit integer, so ordering by the digest string IS
    ordering by a content-derived uniform — no numeric conversion, and
    any engine with md5 mirrors it verbatim."""
    return F.md5(key.cast("string"))


def bottomk_sample(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
) -> DataFrame:
    """Per group, the k rows with smallest ``md5(key)`` — a
    deterministic uniform sample. One shuffle; the rank-limit is pushed
    map-side by ``WindowGroupLimit``, bounding shuffle volume at
    k rows per group per input partition."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash_rank(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def quantiles_disc(
    sample: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: dict[str, float],
) -> DataFrame:
    """Discrete quantiles (value at rank ``ceil(q*n)``) per group from
    a (small) sample — emits ``n_sample`` plus one column per entry of
    ``qs`` (name -> q). Selection, not interpolation: every output is
    an actual input value (engine-portable: DuckDB's
    ``PERCENTILE_DISC`` computes the same rank)."""
    arr = F.array_sort(F.collect_list(F.col(value_col)))
    agg = sample.groupBy(*group_cols).agg(
        arr.alias("__vals"), F.count(F.lit(1)).alias("n_sample")
    )
    cols: list[Column] = [F.col(c) for c in group_cols] + [F.col("n_sample")]
    for name, q in qs.items():
        idx = F.ceil(F.lit(float(q)) * F.col("n_sample")).cast("int")
        cols.append(F.element_at(F.col("__vals"), idx).alias(name))
    return agg.select(*cols)


def quantile_disc_full(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    q: float,
    out_col: str,
) -> DataFrame:
    """EXACT discrete quantile over the full data, without buffering a
    group in memory: rank every row with a window (one shuffle on the
    group key) and select the row at rank ``ceil(q*n)`` — standard
    ``PERCENTILE_DISC`` semantics, emitting an actual data value
    (engine-bit-stable; ``0.5*n`` and its ceil are exact IEEE for any
    int n). Ties in ``value_col`` order arbitrarily but the SELECTED
    value is the same whichever tied row wins."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col))
    d = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    return d.filter(
        F.col("__rn") == F.ceil(F.lit(float(q)) * F.col("__n")).cast("int")
    ).select(*group_cols, F.col(value_col).alias(out_col))


def mad_disc(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Robust center/scale per group: discrete median and the median
    absolute deviation around it (both PERCENTILE_DISC semantics, so
    every output is a data value or a single exact ``abs``-of-difference
    — the engine-stable robust-z building block for outlier gating,
    where mean/stddev would be dragged by the outliers being hunted).
    Two window shuffles on the same group key (Catalyst reuses the
    partitioning); the per-group medians join back broadcast."""
    med = quantile_disc_full(df, group_cols, value_col, 0.5, "median_value")
    dev = df.join(F.broadcast(med), on=group_cols).withColumn(
        "__absdev", F.abs(F.col(value_col) - F.col("median_value"))
    )
    mad = quantile_disc_full(dev, group_cols, "__absdev", 0.5, "mad")
    return med.join(mad, on=group_cols)


def bottomk_accumulate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Sketch-table face: one row per (fine-grain) group holding the
    bottom-k as a sorted ``array<struct<h,t,v>>`` — store this next to
    the grain and never rescan raw data for quantiles again.

    The input is pre-cut with ``bottomk_sample`` so the aggregation
    buffer never holds more than k rows per group (a bare
    ``collect_list`` would buffer the whole group before the slice —
    an OOM hazard on giant cells). The window and the aggregate hash
    on the same keys, so Catalyst reuses the partitioning: one
    exchange total."""
    cut = bottomk_sample(df, group_cols, key_col, k)
    entry = F.struct(
        hash_rank(F.col(key_col)).alias("h"),
        F.col(key_col).cast("string").alias("t"),
        F.col(value_col).cast("double").alias("v"),
    )
    sketch = F.slice(F.array_sort(F.collect_list(entry)), 1, k)
    return cut.groupBy(*group_cols).agg(sketch.alias("bk_sketch"))


def bottomk_combine(
    sketches: DataFrame,
    group_cols: list[str],
    k: int,
    sketch_col: str = "bk_sketch",
) -> DataFrame:
    """Roll stored bottom-k sketches up to a coarser grain: concatenate
    the per-part arrays, re-sort, keep k. Exactly equal to the sketch
    of the unioned raw data (min-wise sampling is mergeable), which
    ``tests/test_quantiles.py`` asserts bit-for-bit."""
    merged = F.slice(
        F.array_sort(F.flatten(F.collect_list(F.col(sketch_col)))), 1, k
    )
    return sketches.groupBy(*group_cols).agg(merged.alias(sketch_col))


def quantiles_from_sketch(
    sketches: DataFrame,
    group_cols: list[str],
    qs: dict[str, float],
    sketch_col: str = "bk_sketch",
) -> DataFrame:
    """Quantile estimates straight from stored sketches (no raw-data
    access): explode the ≤k sample values and select order
    statistics."""
    sample = sketches.select(
        *group_cols, F.explode(F.col(sketch_col)).alias("e")
    ).select(*group_cols, F.col("e.v").alias("v"))
    return quantiles_disc(sample, group_cols, "v", qs)
