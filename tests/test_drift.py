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


def test_stream_corpus_drift_equals_batch_and_replays_safely(spark, tmp_path):
    """LIVE drift maintenance: two real micro-batches of documents fold
    into the running token-count table; the maintained drift metrics
    equal the batch distribution_drift over the union of everything
    streamed — and a replayed run (fresh checkpoint, same files)
    produces identical metrics, not doubled counts."""
    from pyspark.sql import functions as F

    from impala_hashset_count_spark.streaming.windows import (
        read_snapshot,
        stream_corpus_drift,
    )

    batch1 = [(1, "the cat sat on the mat"), (2, "dogs chase the cat")]
    batch2 = [(3, "a bird flew over"), (4, "the mat sat still")]
    ref_rows = [(9, "the reference corpus talks about cats and mats")]
    src = str(tmp_path / "dr_src")
    snap = str(tmp_path / "dr_snap")
    schema = "doc_id bigint, text string"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    reference = spark.createDataFrame(ref_rows, schema)

    def drain(ck):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = stream_corpus_drift(stream, reference, snap, ck)
        q.processAllAvailable()
        q.stop()

    drain(str(tmp_path / "dr_ck1"))
    got = {
        r.tok: r.n1
        for r in read_snapshot(spark, snap).filter("kind = 'drift'").collect()
    }
    expect = distribution_drift(
        spark.createDataFrame(batch1 + batch2, schema), reference
    ).collect()[0].asDict()
    assert got == expect

    # running counts equal the batch token counts over the union
    toks = {
        r.tok: r.n1
        for r in read_snapshot(spark, snap).filter("kind = 'tok'").collect()
    }
    allc = {}
    for _i, t in batch1 + batch2:
        for tok in t.split():
            allc[tok] = allc.get(tok, 0) + 1
    assert toks == allc

    # replay into the same snapshot dir with a fresh checkpoint: same
    # metrics, nothing double-folded
    drain(str(tmp_path / "dr_ck2"))
    replay = {
        r.tok: r.n1
        for r in read_snapshot(spark, snap).filter("kind = 'drift'").collect()
    }
    assert replay == expect
