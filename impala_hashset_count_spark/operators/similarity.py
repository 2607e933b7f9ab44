"""Similarity search (ANN) over an embedding column.

Two tiers:

- ``brute_force_topk`` — exact top-k by cosine: broadcast the (small)
  query set against the (huge) corpus, one narrow projection + a
  per-query top-k window. The corpus is never shuffled: the only
  shuffle carries candidate rows already cut down by the rank limit.
  This is the exactness baseline and the oracle-checkable tier.

- ``lsh_topk`` — random-hyperplane LSH: each vector gets a b-bit sign
  signature; candidates are corpus vectors sharing a signature band
  with the query (equi-join on (band_id, band_val)), exact cosine is
  computed for candidates only, then per-query top-k. Sub-linear
  candidate sets at the cost of probabilistic recall — the scale tier
  (tests measure recall against brute force; no SQL oracle by nature).

The hyperplanes are generated from a fixed seed => deterministic plans,
reproducible runs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    Returns (query_id, neighbor_id, cos_sim, rank) with rank 1..k by
    (round(cos,6) desc, neighbor_id) — rounding before ranking keeps
    order ties engine-deterministic."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine("cv", "qv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _signature_bands(df: DataFrame, vec_col: str, planes, bands: int, rows: int):
    """Sign-bit signature split into bands: one (band_id, band_val) row
    per band, band_val packing `rows` sign bits."""
    n_planes = bands * rows
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(v) for v in planes[i]])) > 0, 1)
        .otherwise(0)
        .cast("long")
        for i in range(n_planes)
    ]
    band_vals = []
    for b in range(bands):
        val = F.lit(0).cast("long")
        for r in range(rows):
            val = val.bitwiseOR(F.shiftleft(bits[b * rows + r], r))
        band_vals.append(F.struct(F.lit(b).alias("band_id"), val.alias("band_val")))
    return df.select("*", F.explode(F.array(*band_vals)).alias("band")).select(
        "*", "band.band_id", "band.band_val"
    ).drop("band")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    bands: int = 8,
    rows: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing >= 1
    signature band with the query; exact cosine on candidates only.

    bands x rows hyperplanes; recall rises with bands (OR over bands),
    precision of the candidate set with rows (AND within a band)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bands * rows, seed)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cb = _signature_bands(c, "cv", planes, bands, rows)
    qb = _signature_bands(q, "qv", planes, bands, rows)
    candidates = (
        cb.join(F.broadcast(qb), ["band_id", "band_val"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        candidates.withColumn("cos_sim", F.round(cosine("cv", "qv"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
