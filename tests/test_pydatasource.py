"""Spark 4 Python DataSource API connectors: deterministic synthetic
event source (batch + micro-batch stream) and the jsonl sink's
executor-write/driver-commit protocol."""

import json
import os
import time

from pyspark.sql import functions as F

from impala_hashset_count_spark.sources.pydatasource import (
    register_python_datasources,
    synth_event,
)


def test_synthetic_events_batch_deterministic_and_partitioned(spark):
    register_python_datasources(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 257)
        .option("numPartitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    got = sorted(map(tuple, df.collect()))
    expect = sorted(synth_event(42, i) for i in range(257))
    assert got == expect
    # re-read is identical (no RNG state anywhere)
    assert sorted(map(tuple, df.collect())) == got


def test_synthetic_events_feeds_engine_operators(spark):
    """The custom source is a first-class DataFrame: groupBy/agg over
    it must match the same aggregation over the Python reference."""
    register_python_datasources(spark)
    df = spark.read.format("synthetic_events").option("rows", 1000).load()
    got = {
        (r.event_type, r.n, r.users)
        for r in df.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("users"),
        )
        .collect()
    }
    ref = {}
    for i in range(1000):
        _, user, et, _, _ = synth_event(42, i)
        ref.setdefault(et, [0, set()])
        ref[et][0] += 1
        ref[et][1].add(user)
    expect = {(et, n, len(users)) for et, (n, users) in ref.items()}
    assert got == expect


def test_synthetic_events_stream_microbatches(spark, tmp_path):
    """The streaming face delivers the SAME rows as the batch face for
    the covered index range, across several real micro-batches."""
    register_python_datasources(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 50)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.table("synth_stream").count()
            if n >= 150:  # at least 3 micro-batches
                break
            time.sleep(0.5)
        rows = sorted(map(tuple, spark.table("synth_stream").collect()))
    finally:
        q.stop()
    assert len(rows) >= 150
    expect = sorted(synth_event(42, i) for i in range(len(rows)))
    assert rows == expect


def test_jsonl_writer_commit_protocol(spark, tmp_path):
    register_python_datasources(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 100)
        .option("numPartitions", 3)
        .load()
    )
    out = str(tmp_path / "out")
    df.write.format("jsonl").mode("append").option("path", out).save()
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 100
    # every manifest file exists; no unlisted data files
    data_files = {f for f in os.listdir(out) if f != "_SUCCESS"}
    assert set(manifest["files"]) == data_files
    # values round-trip through a plain JSONL reader
    back = spark.read.json(out)
    assert back.count() == 100
    ids = sorted(r.event_id for r in back.select("event_id").collect())
    assert ids == list(range(100))
