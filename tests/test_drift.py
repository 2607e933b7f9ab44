"""Distribution drift between corpus slices: exact-integer TV numerator
and quantized-addend JS divergence (`operators/drift.py`)."""

import math

import pytest

from impala_hashset_count_spark.operators.drift import (
    distribution_drift,
    drift_oracle_select,
)


def _py_drift(texts_a, texts_b, alpha=0.5, q_scale=1e9):
    def counts(texts):
        c = {}
        for t in texts:
            for tok in t.split():
                c[tok] = c.get(tok, 0) + 1
        return c

    ca, cb = counts(texts_a), counts(texts_b)
    vocab = sorted(set(ca) | set(cb))
    n_a, n_b, v = sum(ca.values()), sum(cb.values()), len(vocab)
    tv_num = sum(abs(ca.get(t, 0) * n_b - cb.get(t, 0) * n_a) for t in vocab)
    kl_ab = kl_ba = 0
    for t in vocab:
        p = (ca.get(t, 0) + alpha) / (n_a + alpha * v)
        q = (cb.get(t, 0) + alpha) / (n_b + alpha * v)
        m = (p + q) / 2.0
        kl_ab += math.floor(p * math.log(p / m) * q_scale + 0.5)
        kl_ba += math.floor(q * math.log(q / m) * q_scale + 0.5)
    return dict(n_a=n_a, n_b=n_b, v=v, tv_num=tv_num,
                kl_ab_q=kl_ab, kl_ba_q=kl_ba,
                js_q=int((kl_ab + kl_ba) / 2))


def test_drift_matches_python_model(spark):
    texts_a = ["the cat sat", "the dog ran fast", "cat cat dog"]
    texts_b = ["the cat sat", "a bird flew", "bird bird bird song"]
    da = spark.createDataFrame([(t,) for t in texts_a], "text string")
    db = spark.createDataFrame([(t,) for t in texts_b], "text string")
    row = distribution_drift(da, db).collect()[0].asDict()
    assert row == _py_drift(texts_a, texts_b)


def test_drift_identical_slices_is_zero(spark):
    texts = ["alpha beta gamma", "beta beta delta"]
    d = spark.createDataFrame([(t,) for t in texts], "text string")
    row = distribution_drift(d, d).collect()[0]
    assert row.tv_num == 0 and row.kl_ab_q == 0 and row.js_q == 0


def test_drift_disjoint_slices_hits_ln2_ceiling(spark):
    """Fully disjoint vocabularies approach JS = ln 2 nats (smoothing
    keeps it just under)."""
    da = spark.createDataFrame([("aa bb cc dd " * 20,)], "text string")
    db = spark.createDataFrame([("xx yy zz ww " * 20,)], "text string")
    row = distribution_drift(da, db).collect()[0]
    js = row.js_q / 1e9
    assert 0.5 < js <= math.log(2) + 1e-9


def test_drift_oracle_select_matches_spark(spark, tmp_path):
    """The generated DuckDB mirror reproduces every value bit-for-bit
    over a real parquet slice pair."""
    import duckdb

    texts = [
        (1, "the cat sat on the mat"),
        (2, "dogs chase the cat"),
        (3, "completely different tokens here"),
        (4, "the mat sat still"),
        (5, None),
        (6, "   "),
    ]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    p = str(tmp_path / "slice.parquet")
    df.coalesce(1).write.parquet(p)
    a = df.filter("doc_id % 2 = 0")
    b = df.filter("doc_id % 2 = 1")
    srow = distribution_drift(a, b).collect()[0].asDict()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW sl AS SELECT * FROM read_parquet('{p}/*.parquet')")
    sql = drift_oracle_select(
        "SELECT text FROM sl WHERE doc_id % 2 = 0",
        "SELECT text FROM sl WHERE doc_id % 2 = 1",
    )
    res = con.execute(sql)
    drow = dict(zip([c[0] for c in res.description], res.fetchone()))
    con.close()
    assert srow == drow


def test_drift_partition_sweep_bit_identical(spark, sf_small):
    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    a = d.filter("doc_id % 2 = 0")
    b = d.filter("doc_id % 2 = 1")
    outs = []
    for parts in ("2", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            outs.append(distribution_drift(a, b).collect()[0].asDict())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert outs[0] == outs[1]
