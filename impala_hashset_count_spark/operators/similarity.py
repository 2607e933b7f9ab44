"""Similarity search (ANN) over an embedding column.

Three tiers:

- ``brute_force_topk`` — exact top-k by cosine: broadcast the (small)
  query set against the (huge) corpus, one narrow projection + a
  per-query top-k window. The corpus is never shuffled: the only
  shuffle carries candidate rows already cut down by the rank limit.
  This is the exactness baseline and the oracle-checkable tier.

- ``lsh_topk`` — random-hyperplane LSH: each vector gets a b-bit sign
  signature; candidates are corpus vectors sharing a signature band
  with the query (equi-join on (band_id, band_val)), exact cosine is
  computed for candidates only, then per-query top-k. Sub-linear
  candidate sets at the cost of probabilistic recall — a scale tier
  (tests measure recall against brute force; no SQL oracle by nature).

- ``ivf_topk`` — inverted-file index (IVF-flat): a seeded k-means
  coarse quantizer partitions the corpus into cells; each query probes
  only its ``nprobe`` nearest cells. Candidate count ~ corpus *
  nprobe / n_cells, and the cell assignment doubles as the PHYSICAL
  partitioning key at scale (write the corpus bucketed by cell and a
  probe reads only matching partitions).

The hyperplanes / k-means seed are fixed => deterministic plans,
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
    per band, band_val packing `rows` sign bits.

    All hyperplane dots are computed in ONE two-level HOF pass over a
    single constant-folded literal array holding every plane
    (``P[j*dim + i]``), with the vector staged through a materialized
    double-cast column: per-plane ``zip_with``+``aggregate`` pairs
    (32 separate folds with per-element struct allocation) measured
    2.5s for 2000 signatures at sf0.1, and fully-expanded literal
    multiply-add chains (2048 arithmetic nodes) fell out of
    whole-stage codegen entirely and were slower still; this
    formulation runs the same 32x64 multiply-adds in ~0.1s. The inner
    fold is left-to-right — the same summation order as the previous
    form and as LIST_SUM — so values and the oracle mirror are
    unchanged."""
    n_planes = bands * rows
    dim = len(planes[0])
    flat = [float(v) for row in planes for v in row]
    lits = ", ".join(f"{v!r}D" for v in flat)
    dots_expr = (
        f"transform(sequence(0, {n_planes - 1}), j -> "
        f"aggregate(sequence(1, {dim}), CAST(0.0 AS DOUBLE), (acc, i) -> "
        f"acc + CAST(element_at({vec_col}, i) AS DOUBLE) "
        f"* element_at(array({lits}), j * {dim} + i)))"
    )
    # Stage the dot array as an ATTRIBUTE before the 32 bit tests
    # reference it — an inline expression would be re-evaluated per
    # reference (the HOF-inlining hazard documented at
    # text.winnowing_fingerprint). The element cast stays INSIDE the
    # fold on purpose: a staged whole-array cast alias is single-use,
    # so CollapseProject inlines it into the lambda and the entire
    # array would be re-cast per element step (measured 2x slower).
    staged = df.withColumn("__dots", F.expr(dots_expr))
    bits = [
        F.when(F.element_at(F.col("__dots"), i + 1) > 0, 1).otherwise(0).cast("long")
        for i in range(n_planes)
    ]
    band_vals = []
    for b in range(bands):
        val = F.lit(0).cast("long")
        for r in range(rows):
            val = val.bitwiseOR(F.shiftleft(bits[b * rows + r], r))
        band_vals.append(F.struct(F.lit(b).alias("band_id"), val.alias("band_val")))
    return (
        staged.select("*", F.explode(F.array(*band_vals)).alias("band"))
        .select("*", "band.band_id", "band.band_val")
        .drop("band", "__dots", "__vd")
    )


def assign_ivf_cells(
    corpus: DataFrame,
    vec_col: str,
    n_cells: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """Fit the seeded k-means coarse quantizer and attach each row's
    ``cell`` id. Training and assignment are JVM-side (``pyspark.ml``
    KMeans over Vector columns); at 100 TB, fit on a sample
    (``df.sample``) — the quantizer only needs the coarse geometry.

    Returns (corpus_with_cell, centroids) — centroids are tiny
    (n_cells x dim floats) and intended for driver-side probe planning.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="__v", predictionCol="cell").fit(
        vecs.select("__v")
    )
    assigned = model.transform(vecs).drop("__v")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-flat ANN: search only the ``nprobe`` k-means cells nearest
    each query. Probe planning is DISTRIBUTED: the tiny centroid table
    (n_cells x dim floats) is broadcast against the query set and each
    query's nprobe nearest cells come from a rank-limited window — no
    driver ``collect()`` of the queries, so the query side may itself be
    a full table (the former driver loop died silently at scale; now the
    probe plan is just another Spark stage). The corpus side is filtered
    to probed cells before any distance math. Returns
    (query_id, neighbor_id, cos_sim, rank)."""
    assigned, centroids = assign_ivf_cells(corpus, vec_col, n_cells, seed)
    spark = corpus.sparkSession
    cent_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    cent = spark.createDataFrame(cent_rows, "cell int, cent_v array<double>")

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cell_sim").desc(), F.col("cell")
    )
    probe_q = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cell_sim", cosine("qv", "cent_v"))
        .withColumn("__cr", F.row_number().over(wq))
        .filter(F.col("__cr") <= nprobe)
        .select("query_id", "qv", "cell")
    )

    c = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell"
    )
    candidates = (
        c.join(probe_q, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
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
    precision of the candidate set with rows (AND within a band).

    ``dim`` (the embedding dimensionality) is required — array columns
    do not carry their length in the schema, and inferring it with
    ``corpus.first()`` would run an avoidable extra job per call."""
    if dim is None:
        raise ValueError(
            "lsh_topk requires dim= (embedding dimensionality); array "
            "columns do not carry a length in the schema and a "
            "first()-probe would cost an extra job per call"
        )
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
