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


def test_synthetic_stream_feeds_windowed_aggregation(spark, tmp_path):
    """Integration: the custom Python streaming source drives the
    engine's tumbling-window operator, and the drained result equals
    the same aggregation computed in batch from the Python reference
    generator — a custom connector is a first-class streaming input.
    maxRows bounds the source so processAllAvailable() converges."""
    from impala_hashset_count_spark.streaming.windows import stream_tumbling_counts

    register_python_datasources(spark)
    n_rows = 200
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 100)
        .option("maxRows", n_rows)
        .load()
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        stream_tumbling_counts(stream.select("ts", "event_type", "user_id"))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("synth_win")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode appends one snapshot per batch; keep the latest
        # per (window, type)
        got = {
            (r.window_start, r.event_type): (r.n_events, r.distinct_users)
            for r in spark.table("synth_win").collect()
        }
    finally:
        q.stop()

    ref = (
        spark.createDataFrame(
            [synth_event(42, i) for i in range(n_rows)],
            "event_id long, user_id long, event_type string, amount double, ts timestamp",
        )
        .groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("u"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
            "n",
            "u",
        )
    )
    expect = {(r.ws, r.event_type): (r.n, r.u) for r in ref.collect()}
    assert sum(n for n, _ in got.values()) == n_rows
    assert got == expect


def test_jsonl_writer_overwrite_removes_stale_parts(spark, tmp_path):
    """mode('overwrite') must clear previous part files — a plain
    JSONL reader ignores the manifest, so stale parts would silently
    double-count."""
    register_python_datasources(spark)
    out = str(tmp_path / "ow")

    def write(n):
        (
            spark.read.format("synthetic_events")
            .option("rows", n)
            .option("numPartitions", 2)
            .load()
            .write.format("jsonl")
            .mode("overwrite")
            .option("path", out)
            .save()
        )

    write(100)
    write(40)
    back = spark.read.json(out)
    assert back.count() == 40
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 40


def test_jsonl_stream_writer_per_batch_manifests(spark, tmp_path):
    """Streaming sink face of the jsonl connector: a bounded synthetic
    stream drains through writeStream into per-batch manifested part
    files; the manifested union equals the exact generated rows, and a
    restart from the same checkpoint adds nothing (exactly-once:
    durable source offsets x idempotent manifest commit)."""
    import os

    from impala_hashset_count_spark.sources.pydatasource import (
        read_jsonl_manifested,
        synth_event,
    )

    register_python_datasources(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.format("synthetic_events")
            .option("rowsPerBatch", 50)
            .option("maxRows", 120)
            .load()
        )
        q = (
            stream.writeStream.format("jsonl")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    rows = read_jsonl_manifested(out)
    assert len(rows) == 120
    got = sorted((r["event_id"], r["user_id"], r["event_type"]) for r in rows)
    expect = sorted(
        (e[0], e[1], e[2])  # (event_id, user_id, event_type)
        for e in (synth_event(42, i) for i in range(120))
    )
    assert got == expect
    manifests = [f for f in os.listdir(out) if f.startswith("_SUCCESS-")]
    assert len(manifests) >= 3  # 50 + 50 + 20

    # fresh query, same checkpoint: offsets are durable, nothing re-emits
    run_once()
    assert len(read_jsonl_manifested(out)) == 120


def test_pushdown_reader_bounds_and_residuals_unit():
    """pushFilters unit contract: event_id range/equality filters are
    consumed and narrow the index bounds; unsupported filters come
    back BY REFERENCE for Spark to evaluate."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        IsNotNull,
        LessThan,
        StringStartsWith,
    )

    from impala_hashset_count_spark.sources.pydatasource import (
        _SyntheticPushdownReader,
    )

    r = _SyntheticPushdownReader({"rows": "1000"})
    keep_type = StringStartsWith(("event_type",), "v")
    residual = list(
        r.pushFilters([
            GreaterThanOrEqual(("event_id",), 100),
            LessThan(("event_id",), 200),
            IsNotNull(("event_id",)),
            keep_type,
        ])
    )
    assert residual == [keep_type] and residual[0] is keep_type
    assert (r.lo_bound, r.hi_bound) == (100, 200)
    parts = r.partitions()
    covered = sorted(p.value for p in parts)
    assert covered[0][0] == 100 and covered[-1][1] == 200
    # equality narrows to one row
    r2 = _SyntheticPushdownReader({"rows": "1000"})
    list(r2.pushFilters([EqualTo(("event_id",), 7)]))
    assert (r2.lo_bound, r2.hi_bound) == (7, 8)


def test_pushdown_prunes_generation_end_to_end(spark):
    """With pushdown on, a 200M-row logical source answers a 20-row
    event_id range instantly (generating 200M Python rows would blow
    the test timeout — the wall clock IS the pruning proof), with a
    non-pushable residual filter still applied by Spark."""
    from impala_hashset_count_spark.sources.pydatasource import (
        SyntheticEventsDataSource,
        synth_event,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (
            spark.read.format("synthetic_events")
            .option("rows", 200_000_000)
            .option("pushdown", "true")
            .load()
            .filter("event_id >= 5000 and event_id < 5020")
            .filter("event_type = 'view'")      # residual, Spark-side
        )
        got = sorted(
            (r.event_id, r.user_id, r.event_type, r.amount, r.ts)
            for r in df.collect()
        )
        expect = sorted(
            e for e in (synth_event(42, i) for i in range(5000, 5020))
            if e[2] == "view"
        )
        assert got == expect and 0 < len(got) < 20
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
