"""Vector column functions over ``array<float>`` embeddings.

All JVM-side higher-order functions (zip_with/aggregate) — dot products
and norms run inside codegen, no Python, no UDF. At 100 TB the dominant
cost is the pairing strategy (see operators/similarity.py), never these
per-row expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    """Sum of elementwise products, accumulated in double.
    DuckDB mirror: LIST_SUM(LIST_TRANSFORM(LIST_ZIP(CAST(a AS DOUBLE[]),
    CAST(b AS DOUBLE[])), x -> x[1] * x[2]))."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def squared_norm(a: str | Column) -> Column:
    """Mirror: LIST_SUM(LIST_TRANSFORM(CAST(a AS DOUBLE[]), x -> x*x))."""
    return F.aggregate(
        _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(squared_norm(a))


def cosine(a: str | Column, b: str | Column) -> Column:
    """cos = dot / (||a|| * ||b||) — the oracle mirrors this exact
    association (sqrt(ss_a)*sqrt(ss_b), NOT sqrt(ss_a*ss_b), so the
    floating-point result is bit-comparable).

    A zero vector yields a 0/0 division (engine-defined NULL/NaN,
    identical on Spark and DuckDB since both mirror the expression);
    filter zero vectors upstream if they can occur — no silent guard
    here, because a guard would have to be mirrored in every oracle."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_normalize(a: str | Column) -> Column:
    """Unit-length copy of the vector (as array<double>). Pre-normalizing
    once turns every later cosine into a plain dot product — the right
    trade at scale (one pass now, cheaper pairwise math forever)."""
    n = l2_norm(a)
    return F.transform(_c(a), lambda x: x.cast("double") / n)
