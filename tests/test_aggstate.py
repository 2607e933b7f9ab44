"""Incremental summary-table maintenance (`operators/aggstate.py`)."""

import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.aggstate import (
    agg_state_accumulate,
    agg_state_finalize,
    agg_state_merge,
)


def _events(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/events.parquet").select(
        "event_id", "event_type", "user_id", "value", "ts"
    )


def test_batch_merge_equals_direct_bitwise(spark, sf_small):
    """The core property: accumulate per ingestion batch, merge state
    rows == accumulate over the union — for EVERY component, including
    the lossy sketches (all deterministic given content)."""
    ev = _events(spark, sf_small)
    batches = [ev.filter(f"event_id % 3 = {r}") for r in range(3)]
    per_batch = batches[0].transform(
        lambda d: agg_state_accumulate(d, ["event_type"], "value", "user_id")
    )
    for b in batches[1:]:
        per_batch = per_batch.unionByName(
            agg_state_accumulate(b, ["event_type"], "value", "user_id")
        )
    merged = agg_state_merge(per_batch, ["event_type"])
    direct = agg_state_accumulate(ev, ["event_type"], "value", "user_id")

    got = sorted(
        map(tuple, agg_state_finalize(merged, ["event_type"]).collect())
    )
    expect = sorted(
        map(tuple, agg_state_finalize(direct, ["event_type"]).collect())
    )
    assert got == expect


def test_rollup_to_coarser_grain(spark, sf_small):
    """Summary for a coarser grain comes from merging fine-grain state
    rows — zero raw-data access — and matches direct accumulation."""
    ev = _events(spark, sf_small).withColumn(
        "day", F.to_date(F.col("ts").cast("timestamp"))
    )
    fine = agg_state_accumulate(ev, ["event_type", "day"], "value", "user_id")
    coarse = agg_state_merge(fine, ["event_type"])
    direct = agg_state_accumulate(ev, ["event_type"], "value", "user_id")
    assert sorted(
        map(tuple, agg_state_finalize(coarse, ["event_type"]).collect())
    ) == sorted(map(tuple, agg_state_finalize(direct, ["event_type"]).collect()))


def test_finalize_values_against_direct_sql(spark, sf_small):
    """Moments and distinct: finalize output vs directly computed
    aggregates (HLL estimate within its error band; integer-quantized
    sums exact)."""
    ev = _events(spark, sf_small)
    state = agg_state_accumulate(ev, ["event_type"], "value", "user_id")
    out = {r.event_type: r for r in agg_state_finalize(state, ["event_type"]).collect()}
    direct = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("value").alias("n_vals"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.count_distinct("user_id").alias("nd"),
            F.sum(
                F.floor(F.col("value").cast("double") * 1_000_000 + 0.5).cast(
                    "long"
                )
            ).alias("sum_q"),
        )
        .collect()
    }
    for g, r in out.items():
        d = direct[g]
        assert (r.n_rows, r.n_vals, r.vmin, r.vmax) == (
            d.n_rows,
            d.n_vals,
            d.vmin,
            d.vmax,
        )
        assert r.sum_v == d.sum_q / 1_000_000
        assert abs(r.approx_distinct - d.nd) <= 0.05 * d.nd
        assert r.top_keys.count(",") == 4  # top 5, comma-joined
        assert r.median_sample is not None


@pytest.mark.parametrize("parts", [2, 32])
def test_partitioning_invariance(spark, sf_small, parts):
    ev = _events(spark, sf_small).repartition(parts)
    out = sorted(
        map(
            tuple,
            agg_state_finalize(
                agg_state_accumulate(ev, ["event_type"], "value", "user_id"),
                ["event_type"],
            ).collect(),
        )
    )
    base = sorted(
        map(
            tuple,
            agg_state_finalize(
                agg_state_accumulate(
                    _events(spark, sf_small), ["event_type"], "value", "user_id"
                ),
                ["event_type"],
            ).collect(),
        )
    )
    assert out == base


def test_null_values_and_empty_groups(spark):
    df = spark.createDataFrame(
        [
            (1, "g1", None, 10),
            (2, "g1", 2.5, 11),
            (3, "g2", None, 12),
        ],
        "event_id long, event_type string, value double, user_id long",
    )
    state = agg_state_accumulate(df, ["event_type"], "value", "event_id")
    out = {r.event_type: r for r in agg_state_finalize(state, ["event_type"]).collect()}
    assert out["g1"].n_rows == 2 and out["g1"].n_vals == 1
    assert out["g1"].mean_v == 2.5
    # all-NULL group: moments NULL, counts present
    g2 = out["g2"]
    assert g2.n_vals == 0 and g2.mean_v is None and g2.vmin is None


def test_stream_summary_maintenance_equals_direct(spark, sf_small, tmp_path):
    """LIVE incremental rollup maintenance: two real micro-batches of
    events folded into the stored summary by state-row merge; the final
    finalized table equals the direct batch accumulate over everything
    — and a replayed run (fresh checkpoint, same files) produces the
    same summary, not doubled sums."""
    from impala_hashset_count_spark.streaming.windows import (
        read_snapshot,
        stream_summary_maintenance,
    )

    ev = _events(spark, sf_small).limit(400).cache()
    a = ev.filter("event_id % 2 = 0")
    b = ev.filter("event_id % 2 = 1")
    schema = (
        "event_id bigint, event_type string, user_id bigint, "
        "value double, ts timestamp"
    )
    src = str(tmp_path / "sm_src")
    snap = str(tmp_path / "sm_snap")
    ckpt = str(tmp_path / "sm_ckpt")
    a.select("event_id", "event_type", "user_id", "value",
             F.col("ts").cast("timestamp").alias("ts")).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    b.select("event_id", "event_type", "user_id", "value",
             F.col("ts").cast("timestamp").alias("ts")).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain(ck):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = stream_summary_maintenance(
            stream, snap, ck, ["event_type"], "value", "user_id"
        )
        q.processAllAvailable()
        q.stop()

    drain(ckpt)
    got = sorted(
        map(
            tuple,
            agg_state_finalize(
                read_snapshot(spark, snap), ["event_type"]
            ).collect(),
        )
    )
    expect = sorted(
        map(
            tuple,
            agg_state_finalize(
                agg_state_accumulate(
                    ev.limit(400), ["event_type"], "value", "user_id"
                ),
                ["event_type"],
            ).collect(),
        )
    )
    assert got == expect

    # replay with a fresh checkpoint into the SAME snapshot dir: the
    # versions are rebuilt from scratch predecessors, sums not doubled
    drain(str(tmp_path / "sm_ckpt2"))
    replay = sorted(
        map(
            tuple,
            agg_state_finalize(
                read_snapshot(spark, snap), ["event_type"]
            ).collect(),
        )
    )
    assert replay == expect
    ev.unpersist()
