"""Count-Min Sketch: declarative cell-table build/merge/estimate
(`operators/cms.py`)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.cms import (
    cms_accumulate,
    cms_estimate,
    cms_merge,
    cms_oracle_ctes,
)


def _model_cells(keys, width, depth):
    cells = {}
    for k in keys:
        for r in range(depth):
            c = int(hashlib.md5(f"{r}:{k}".encode()).hexdigest()[:15], 16) % width
            cells[(r, c)] = cells.get((r, c), 0) + 1
    return cells


def test_cms_matches_python_model_and_never_undercounts(spark):
    data = [f"k{i % 30}" for i in range(300)] + ["hot"] * 50
    df = spark.createDataFrame([(k,) for k in data] + [(None,)], "key string")
    width, depth = 64, 4  # deliberately tight: collisions occur
    sk = cms_accumulate(df, "key", width=width, depth=depth, hash_fn="md5")
    assert {(r.r, r.c): r.cnt for r in sk.collect()} == _model_cells(
        data, width, depth
    )
    truth = {k: data.count(k) for k in set(data)}
    qs = spark.createDataFrame([(k,) for k in truth] + [("absent",)], "key string")
    est = {r.key: r.est for r in cms_estimate(
        sk, qs, "key", width=width, depth=depth, hash_fn="md5").collect()}
    assert all(est[k] >= v for k, v in truth.items())        # never undercounts
    assert est["hot"] >= 50
    # the total overestimate is bounded by collision mass; on this data
    # the heavy key is still clearly separable from the tail
    assert est["hot"] > max(v for k, v in est.items() if k != "hot") / 2


def test_cms_merge_equals_direct(spark):
    a = spark.createDataFrame([(f"a{i % 7}",) for i in range(40)], "key string")
    b = spark.createDataFrame([(f"a{i % 5}",) for i in range(30)], "key string")
    kw = dict(width=32, depth=3, hash_fn="md5")
    merged = cms_merge([cms_accumulate(a, "key", **kw), cms_accumulate(b, "key", **kw)])
    direct = cms_accumulate(a.unionByName(b), "key", **kw)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_cms_oracle_ctes_match_spark(spark, tmp_path):
    import duckdb

    rows = [(i, f"u{i % 9}") for i in range(120)]
    df = spark.createDataFrame(rows, "i bigint, key string")
    p = str(tmp_path / "cms.parquet")
    df.coalesce(1).write.parquet(p)
    sk = cms_accumulate(df, "key", width=32, depth=4, hash_fn="md5")
    est = cms_estimate(sk, df.select("key"), "key", width=32, depth=4, hash_fn="md5")
    srow = sorted((r.key, r.est) for r in est.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}/*.parquet')")
    sql = ("WITH " + cms_oracle_ctes(
        "SELECT key FROM t", "SELECT DISTINCT key FROM t", width=32, depth=4)
        + " SELECT key, est FROM cmsest")
    drow = sorted(map(tuple, con.execute(sql).fetchall()))
    con.close()
    assert srow == drow


def test_cms_partition_sweep_bit_identical(spark):
    df = spark.createDataFrame([(f"k{i % 11}",) for i in range(200)], "key string")
    outs = []
    for parts in ("2", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            sk = cms_accumulate(df, "key", width=64, depth=4, hash_fn="md5")
            outs.append(sorted(map(tuple, sk.collect())))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert outs[0] == outs[1]


def test_cms_hypothesis_model_and_merge(spark):
    """Property-based: for arbitrary key multisets and arbitrary 2-way
    splits, (a) accumulate == Python cell model, (b) merge of split
    sketches == direct sketch, (c) estimates never undercount."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys_strategy = st.lists(
        st.text(alphabet="abcxyz", min_size=1, max_size=4),
        min_size=1, max_size=30,
    )

    @given(keys=keys_strategy, split=st.integers(min_value=1, max_value=3))
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def check(keys, split):
        width, depth = 16, 3
        df = spark.createDataFrame([(k, i) for i, k in enumerate(keys)],
                                   "key string, i bigint")
        direct = cms_accumulate(df, "key", width=width, depth=depth,
                                hash_fn="md5")
        assert {(r.r, r.c): r.cnt for r in direct.collect()} == _model_cells(
            keys, width, depth)
        merged = cms_merge([
            cms_accumulate(df.filter(F.col("i") % split == j), "key",
                           width=width, depth=depth, hash_fn="md5")
            for j in range(split)
        ])
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect()))
        truth = {k: keys.count(k) for k in set(keys)}
        qdf = spark.createDataFrame([(k,) for k in truth], "key string")
        est = {r.key: r.est for r in cms_estimate(
            direct, qdf, "key", width=width, depth=depth,
            hash_fn="md5").collect()}
        assert all(est[k] >= v for k, v in truth.items())

    check()
