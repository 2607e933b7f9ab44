"""KMV distinct sketch: exactness under capacity, estimator accuracy,
exact mergeability, determinism under partitioning, NULL semantics."""

import hashlib

import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.kmv import (
    HASH_SPACE,
    kmv_accumulate,
    kmv_combine,
    kmv_estimate,
)


def _py_kmv(values, k):
    """Pure-Python model of the whole pipeline."""
    hashes = sorted(
        {
            int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16)
            for v in values
            if v is not None
        }
    )[:k]
    if not hashes:
        return None
    if len(hashes) < k:
        return len(hashes)
    return (k - 1) * HASH_SPACE // hashes[k - 1]


def _estimates(spark, rows, k, parts=8):
    df = spark.createDataFrame(rows, "g string, v string").repartition(parts)
    sk = kmv_accumulate(df, ["g"], "v", k)
    out = kmv_estimate(sk, k)
    return {r["g"]: r["kmv_distinct"] for r in out.collect()}


def test_exact_under_capacity(spark):
    rows = [("a", f"v{i}") for i in range(37)] * 3 + [("b", "x")]
    got = _estimates(spark, rows, k=64)
    assert got == {"a": 37, "b": 1}


def test_matches_python_model_at_capacity(spark):
    rows = [("a", f"val-{i}") for i in range(5000)]
    got = _estimates(spark, rows, k=128)
    assert got["a"] == _py_kmv([f"val-{i}" for i in range(5000)], 128)


def test_estimator_accuracy(spark):
    n = 20000
    rows = [("a", f"u{i}") for i in range(n)]
    est = _estimates(spark, rows, k=256)["a"]
    # standard error ~ 1/sqrt(k-2) ~= 6.3%; 4 sigma
    assert abs(est - n) / n < 0.25


def test_all_null_group_is_null_not_zero(spark):
    rows = [("a", "x"), ("b", None), ("b", None)]
    got = _estimates(spark, rows, k=16)
    assert got == {"a": 1, "b": None}


def test_empty_string_counts(spark):
    got = _estimates(spark, [("a", ""), ("a", ""), ("a", "x")], k=16)
    assert got["a"] == 2


def test_merge_equals_direct(spark):
    """combine(accumulate(A), accumulate(B)) == accumulate(A ∪ B),
    bit-for-bit at the sketch level (overlapping value sets included)."""
    k = 32
    all_rows = [("g1", f"v{i}") for i in range(300)] + [
        ("g2", f"w{i}") for i in range(10)
    ]
    a = spark.createDataFrame(all_rows[:200], "g string, v string")
    b = spark.createDataFrame(all_rows[120:], "g string, v string")  # overlap
    parts = kmv_accumulate(a, ["g"], "v", k).unionByName(
        kmv_accumulate(b, ["g"], "v", k)
    )
    merged = kmv_combine(parts, ["g"], k)
    direct = kmv_accumulate(
        spark.createDataFrame(all_rows, "g string, v string"), ["g"], "v", k
    )
    assert sorted(merged.collect()) == sorted(direct.collect())


def test_rollup_to_coarser_grain(spark):
    """Fine-grain sketches answer the coarse grain without raw data."""
    k = 64
    rows = [(f"c{i % 3}", f"f{i % 6}", f"v{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "c string, f string, v string")
    fine = kmv_accumulate(df, ["c", "f"], "v", k)
    coarse_from_sketch = kmv_estimate(kmv_combine(fine, ["c"], k), k)
    coarse_direct = kmv_estimate(kmv_accumulate(df, ["c"], "v", k), k)
    assert sorted(coarse_from_sketch.collect()) == sorted(
        coarse_direct.collect()
    )


@pytest.mark.parametrize("parts", [2, 32])
def test_partition_sweep_stability(spark, parts):
    rows = [(f"g{i % 4}", f"v{i % 700}") for i in range(3000)]
    got = _estimates(spark, rows, k=128, parts=parts)
    expect = {
        g: _py_kmv([f"v{i % 700}" for i in range(3000) if f"g{i % 4}" == g], 128)
        for g in {f"g{i % 4}" for i in range(3000)}
    }
    assert got == expect


def test_window_group_limit_bounds_shuffle(spark):
    """The rank cut must reach the map side (WindowGroupLimit) so each
    partition forwards at most k rows per group into the shuffle."""
    df = spark.range(1000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    sk = kmv_accumulate(df, ["g"], "v", 16)
    from tests.test_plans import explain_str

    assert "WindowGroupLimit" in explain_str(sk)


def test_set_estimates_exact_under_capacity(spark):
    from impala_hashset_count_spark.operators.kmv import kmv_set_estimates

    k = 256
    a_rows = [("g", f"v{i}") for i in range(40)]          # A = v0..v39
    b_rows = [("g", f"v{i}") for i in range(30, 70)]      # B = v30..v69
    a = kmv_accumulate(spark.createDataFrame(a_rows, "g string, v string"), ["g"], "v", k)
    b = kmv_accumulate(spark.createDataFrame(b_rows, "g string, v string"), ["g"], "v", k)
    r = kmv_set_estimates(a, b, ["g"], k).collect()[0]
    # under capacity everything is exact: union 70, intersection 10
    assert r["union_est"] == 70
    assert r["jaccard_k"] == 70 and r["jaccard_n"] == 10
    assert r["inter_est"] == 10


def test_set_estimates_accuracy_at_capacity(spark):
    from impala_hashset_count_spark.operators.kmv import kmv_set_estimates

    k = 256
    n = 4000
    overlap = 2000
    a_rows = [("g", f"x{i}") for i in range(n)]
    b_rows = [("g", f"x{i}") for i in range(n - overlap, 2 * n - overlap)]
    a = kmv_accumulate(spark.createDataFrame(a_rows, "g string, v string"), ["g"], "v", k)
    b = kmv_accumulate(spark.createDataFrame(b_rows, "g string, v string"), ["g"], "v", k)
    r = kmv_set_estimates(a, b, ["g"], k).collect()[0]
    true_union = 2 * n - overlap
    true_inter = overlap
    assert abs(r["union_est"] - true_union) / true_union < 0.25
    assert abs(r["inter_est"] - true_inter) / true_inter < 0.45
    # determinism: second invocation bit-identical
    r2 = kmv_set_estimates(a, b, ["g"], k).collect()[0]
    assert tuple(r) == tuple(r2)


def test_set_estimates_disjoint_sets(spark):
    from impala_hashset_count_spark.operators.kmv import kmv_set_estimates

    k = 64
    a = kmv_accumulate(
        spark.createDataFrame([("g", f"a{i}") for i in range(500)], "g string, v string"),
        ["g"], "v", k)
    b = kmv_accumulate(
        spark.createDataFrame([("g", f"b{i}") for i in range(500)], "g string, v string"),
        ["g"], "v", k)
    r = kmv_set_estimates(a, b, ["g"], k).collect()[0]
    assert r["jaccard_n"] == 0 and r["inter_est"] == 0
