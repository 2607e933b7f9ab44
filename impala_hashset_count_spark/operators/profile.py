"""Single-pass table profiler: per-column quality statistics.

The first step of any ingestion pipeline is knowing what landed:
row counts, null fractions, cardinalities, value ranges. This operator
computes all of it for every requested column in ONE aggregate over
ONE scan and returns a long-form (one row per column) DataFrame.

The cardinality column is EXACT multi-column distinct counting — N
``count_distinct`` instances in a single aggregate, which Catalyst
plans as one scan + one Expand (N-fold row replication) + partial/
final agg. That is precisely the workload the reference UDA was built
to serve on Impala (`/root/reference/README.md:1-10`: many exact
distinct counts per query without per-distinct subqueries), so the
profiler doubles as the reference-operator family's most natural
application. At 100 TB, the Expand multiplies scan output by the
column count: profile in column batches, or pass
``approx=True`` to swap in ``approx_count_distinct`` (HLL, no Expand,
~2% error) — the same exact/approx tier choice the registry's
``hashset_count``/``approx_distinct`` pair documents.

Output typing: numeric min/max land in ``min_num``/``max_num`` (raw
data values, no arithmetic — engine-bit-stable); string and date
min/max land in ``min_str``/``max_str`` (dates as ISO strings;
timestamps are cast to date per the repo's hashing convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def _is_temporal(dt: T.DataType) -> bool:
    return isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType))


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Profile ``cols`` (default: all columns of atomic type) in one
    aggregate. Returns one row per column:
    (column, n_rows, n_null, n_distinct, min_num, max_num,
    min_str, max_str)."""
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = [
            c
            for c, dt in dtypes.items()
            if _is_numeric(dt) or _is_temporal(dt) or isinstance(dt, T.StringType)
        ]

    distinct = F.approx_count_distinct if approx else F.count_distinct
    exprs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        exprs.append(F.count(F.when(col.isNull(), F.lit(1))).alias(f"{c}__nn"))
        exprs.append(distinct(col).cast("long").alias(f"{c}__nd"))
        if _is_temporal(dtypes[c]):
            col = col.cast("date").cast("string")
        if _is_numeric(dtypes[c]):
            exprs.append(F.min(col).cast("double").alias(f"{c}__mn"))
            exprs.append(F.max(col).cast("double").alias(f"{c}__mx"))
        else:
            exprs.append(F.min(col).cast("string").alias(f"{c}__mn"))
            exprs.append(F.max(col).cast("string").alias(f"{c}__mx"))
    one = df.agg(*exprs)

    def _entry(c: str) -> Column:
        numeric = _is_numeric(dtypes[c])
        return F.struct(
            F.lit(c).alias("column"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col(f"{c}__nn").cast("long").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (F.col(f"{c}__mn") if numeric else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (F.col(f"{c}__mx") if numeric else F.lit(None).cast("double")).alias(
                "max_num"
            ),
            (F.lit(None).cast("string") if numeric else F.col(f"{c}__mn")).alias(
                "min_str"
            ),
            (F.lit(None).cast("string") if numeric else F.col(f"{c}__mx")).alias(
                "max_str"
            ),
        )

    return one.select(
        F.explode(F.array(*[_entry(c) for c in cols])).alias("p")
    ).select("p.*")
