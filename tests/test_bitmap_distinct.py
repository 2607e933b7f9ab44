"""Bitmap exact-distinct tier (`operators/bitmap_distinct.py`):
exactness vs Python sets, the reference's NULL-not-0 contract, merge
losslessness across batches, negative/sparse values, and exact set
algebra from stored states alone."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.bitmap_distinct import (
    bitmap_accumulate,
    bitmap_count,
    bitmap_distinct_count,
    bitmap_merge,
    bitmap_set_counts,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_one_shot_matches_python_sets(spark):
    data = [("a", i % 37) for i in range(500)] + [
        ("b", i * 13) for i in range(100)
    ] + [("b", i * 13) for i in range(100)]
    df = spark.createDataFrame(data, ["g", "v"])
    got = _rows(bitmap_distinct_count(df, ["g"], "v"))
    want = {}
    for g, v in data:
        want.setdefault(g, set()).add(v)
    assert got == sorted((g, str(len(s))) for g, s in want.items())


def test_null_values_skipped_and_empty_group_is_null_not_zero(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 1), ("empty", None), ("empty", None)],
        "g string, v int",
    )
    got = dict(_rows(bitmap_distinct_count(df, ["g"], "v")))
    assert got == {"a": "1", "empty": None}


def test_negative_and_sparse_values_exact(spark):
    vals = [-1, -64, -65, 0, 63, 64, 2**40, 2**40 + 1, -(2**40)]
    df = spark.createDataFrame(
        [("g", v) for v in vals] * 3, "g string, v long"
    )
    got = _rows(bitmap_distinct_count(df, ["g"], "v"))
    assert got == [("g", str(len(set(vals))))]


def test_merge_across_batches_is_lossless(spark):
    data = [("g%d" % (i % 5), i % 211) for i in range(2000)]
    df = spark.createDataFrame(data, ["g", "v"])
    s1 = bitmap_accumulate(df.filter(F.col("v") % 2 == 0), ["g"], "v")
    s2 = bitmap_accumulate(df.filter(F.col("v") % 2 == 1), ["g"], "v")
    merged = bitmap_merge(s1.unionByName(s2), ["g"])
    got = _rows(bitmap_count(merged, ["g"]))
    direct = _rows(
        df.groupBy("g").agg(F.countDistinct("v").alias("distinct_count"))
    )
    assert got == direct


def test_set_counts_match_python_set_algebra(spark):
    a_vals = {("g1", v) for v in range(0, 130, 2)} | {("g2", 7)}
    b_vals = {("g1", v) for v in range(0, 130, 3)} | {("g3", 9)}
    sa = bitmap_accumulate(
        spark.createDataFrame(sorted(a_vals), ["g", "v"]), ["g"], "v"
    )
    sb = bitmap_accumulate(
        spark.createDataFrame(sorted(b_vals), ["g", "v"]), ["g"], "v"
    )
    got = {
        r["g"]: (r["inter_count"], r["union_count"], r["only_a"], r["only_b"])
        for r in bitmap_set_counts(sa, sb, ["g"]).collect()
    }
    for g in ("g1", "g2", "g3"):
        A = {v for gg, v in a_vals if gg == g}
        B = {v for gg, v in b_vals if gg == g}
        assert got[g] == (
            len(A & B), len(A | B), len(A - B), len(B - A)
        ), g


def test_state_rows_are_one_word_per_occupied_bucket(spark):
    df = spark.createDataFrame(
        [("g", v) for v in (0, 1, 63, 64, 127, 128, 6400)], ["g", "v"]
    )
    state = bitmap_accumulate(df, ["g"], "v").collect()
    buckets = {r["__bd_bucket"]: r["__bd_word"] for r in state}
    # 0,1,63 share bucket 0; 64,127 bucket 1; 128 bucket 2; 6400 bucket 100
    def signed64(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    assert set(buckets) == {0, 1, 2, 100}
    # bit 63 sets the sign bit of the Java long
    assert buckets[0] == signed64((1 << 0) | (1 << 1) | (1 << 63))
    assert buckets[1] == signed64((1 << 0) | (1 << 63))


def test_plan_is_two_codegen_hash_aggregates_no_python(spark):
    df = spark.createDataFrame([("g", 1)], ["g", "v"])
    plan = bitmap_distinct_count(df, ["g"], "v")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "HashAggregate" in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_stream_bitmap_maintenance_equals_direct(spark, sf_small, tmp_path):
    """LIVE incremental exact-distinct maintenance: two real
    micro-batches folded into the stored bitmap state; the maintained
    count equals the direct batch distinct over everything, and a
    replayed run (fresh checkpoint, same files) yields the same counts
    — BIT_OR idempotence makes double-folds structurally harmless."""
    from impala_hashset_count_spark.sources.tables import load_table
    from impala_hashset_count_spark.streaming.windows import (
        read_snapshot,
        stream_bitmap_distinct_maintenance,
    )

    ev = load_table(spark, sf_small, "events").select(
        "event_id", "event_type", "user_id"
    ).limit(400).cache()
    schema = "event_id bigint, event_type string, user_id bigint"
    src = str(tmp_path / "bm_src")
    snap = str(tmp_path / "bm_snap")
    for half in ("event_id % 2 = 0", "event_id % 2 = 1"):
        ev.filter(half).coalesce(1).write.mode("append").parquet(src)

    def drain(ck):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = stream_bitmap_distinct_maintenance(
            stream, snap, ck, ["event_type"], "user_id"
        )
        q.processAllAvailable()
        q.stop()

    drain(str(tmp_path / "bm_ckpt"))
    got = sorted(
        map(
            tuple,
            bitmap_count(
                read_snapshot(spark, snap), ["event_type"]
            ).collect(),
        )
    )
    expect = sorted(
        map(
            tuple,
            ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("distinct_count"))
            .collect(),
        )
    )
    assert got == expect

    drain(str(tmp_path / "bm_ckpt2"))
    replay = sorted(
        map(
            tuple,
            bitmap_count(
                read_snapshot(spark, snap), ["event_type"]
            ).collect(),
        )
    )
    assert replay == expect
    ev.unpersist()
