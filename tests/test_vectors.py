"""Vector column functions: int8 quantization round-trip bounds,
scale-cancellation cosine, and agreement with numpy on real
embeddings."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.functions.vectors import (
    cosine,
    cosine_int8,
    dequantize_int8,
    l2_normalize,
    quantize_int8,
)
from impala_hashset_count_spark.sources.tables import load_table


def test_quantize_roundtrip_error_bound(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings").limit(100)
    out = emb.select(
        "embedding",
        dequantize_int8(quantize_int8("embedding")).alias("back"),
        quantize_int8("embedding")["scale"].alias("scale"),
    ).collect()
    assert len(out) == 100
    for r in out:
        orig = np.array(r["embedding"], dtype=np.float64)
        back = np.array(r["back"])
        assert back.shape == orig.shape
        # symmetric quantization: per-component error <= scale/2
        assert np.max(np.abs(orig - back)) <= r["scale"] / 2 + 1e-12


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "id int, v array<float>")
    r = df.select(
        quantize_int8("v").alias("qs"), dequantize_int8(quantize_int8("v")).alias("back")
    ).first()
    assert r["qs"]["scale"] == 0.0
    assert list(r["qs"]["q"]) == [0, 0, 0]
    assert list(r["back"]) == [0.0, 0.0, 0.0]


def test_quantized_cosine_close_to_exact(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va")).limit(20)
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb")).limit(20)
    pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
    out = pairs.select(
        cosine("va", "vb").alias("exact"),
        cosine_int8(quantize_int8("va"), quantize_int8("vb")).alias("approx"),
    ).collect()
    assert out
    for r in out:
        assert abs(r["exact"] - r["approx"]) < 0.01


def test_l2_normalize_unit_norm(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings").limit(50)
    norms = emb.select(
        F.aggregate(
            l2_normalize("embedding"), F.lit(0.0), lambda acc, x: acc + x * x
        ).alias("ss")
    ).collect()
    for r in norms:
        assert abs(r["ss"] - 1.0) < 1e-9


def test_jl_sign_projection_deterministic_and_distance_correlated(spark):
    """Sign projections are deterministic (literal matrix, no RNG
    state) and JL-style: projections of identical vectors coincide,
    and the projection is linear (proj(a+b) = proj(a)+proj(b))."""
    import random

    from pyspark.sql import functions as F

    from impala_hashset_count_spark.functions.vectors import (
        jl_sign_matrix,
        sign_project,
    )

    signs = jl_sign_matrix(8, 3)
    assert signs == jl_sign_matrix(8, 3)  # seed-stable
    assert {s for row in signs for s in row} <= {-1, 1}

    rng = random.Random(7)
    a = [rng.uniform(-1, 1) for _ in range(8)]
    b = [rng.uniform(-1, 1) for _ in range(8)]
    rows = [(1, a), (2, b), (3, [x + y for x, y in zip(a, b)]), (4, list(a))]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    got = {
        r.vec_id: (r.proj0, r.proj1, r.proj2)
        for r in df.select("vec_id", *sign_project("embedding", signs)).collect()
    }
    # exact expected value: plain python dot with the same signs
    for j in range(3):
        expect = sum(x * s for x, s in zip(a, signs[j]))
        assert got[1][j] == pytest.approx(expect, abs=1e-12)
    # identical vectors -> identical projections (bit-exact)
    assert got[1] == got[4]
    # linearity
    for j in range(3):
        assert got[3][j] == pytest.approx(got[1][j] + got[2][j], abs=1e-9)
