"""Binned range join: exact equality with the naive non-equi join
(boundaries, overlaps, invalid/NULL intervals, wide-interval guard) and
the plan guarantee that motivates it (shuffle join, not nested loop)."""

import random

import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.range_join import binned_range_join
from tests.test_plans import explain_str


def _naive(points, intervals, p, s, e):
    return points.join(
        intervals, (F.col(p) >= F.col(s)) & (F.col(p) <= F.col(e))
    )


def _rows(df):
    return sorted(map(tuple, df.select("pid", "iid").collect()))


def _mk(spark, pts, ivs):
    points = spark.createDataFrame(pts, "pid long, v long")
    intervals = spark.createDataFrame(ivs, "iid long, s long, e long")
    return points, intervals


def test_equals_naive_random(spark):
    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 1000)) for i in range(300)]
    ivs = []
    for i in range(120):
        s = rng.randrange(0, 1000)
        ivs.append((i, s, s + rng.randrange(0, 40)))
    points, intervals = _mk(spark, pts, ivs)
    got = binned_range_join(points, intervals, "v", "s", "e", bin_width=16)
    assert _rows(got) == _rows(_naive(points, intervals, "v", "s", "e"))


def test_boundaries_inclusive_and_bin_edges(spark):
    # points exactly at interval endpoints and at bin multiples
    pts = [(1, 0), (2, 16), (3, 31), (4, 32), (5, 48), (6, 49)]
    ivs = [(10, 0, 16), (11, 16, 32), (12, 32, 48), (13, 49, 49)]
    points, intervals = _mk(spark, pts, ivs)
    got = binned_range_join(points, intervals, "v", "s", "e", bin_width=16)
    assert _rows(got) == _rows(_naive(points, intervals, "v", "s", "e"))


def test_invalid_and_null_intervals_match_nothing(spark):
    pts = [(1, 5)]
    ivs = [(10, 8, 3), (11, None, 9), (12, 1, None), (13, 1, 9)]
    points, intervals = _mk(spark, pts, ivs)
    got = binned_range_join(points, intervals, "v", "s", "e", bin_width=4)
    assert _rows(got) == [(1, 13)]


def test_wide_interval_guard_path(spark):
    # one interval spans ~200 bins -> routed through the broadcast arm
    pts = [(i, i * 7) for i in range(100)]
    ivs = [(1, 0, 650), (2, 100, 120), (3, 690, 693)]
    points, intervals = _mk(spark, pts, ivs)
    got = binned_range_join(
        points, intervals, "v", "s", "e", bin_width=4,
        max_bins_per_interval=8,
    )
    assert _rows(got) == _rows(_naive(points, intervals, "v", "s", "e"))


def test_negative_and_float_domains(spark):
    pts = [(1, -33), (2, -1), (3, 0), (4, 17)]
    ivs = [(10, -40, -30), (11, -2, 2), (12, 15, 40)]
    points, intervals = _mk(spark, pts, ivs)
    got = binned_range_join(points, intervals, "v", "s", "e", bin_width=7)
    assert _rows(got) == _rows(_naive(points, intervals, "v", "s", "e"))


def test_plan_is_shuffle_join_not_nested_loop(spark):
    pts = [(i, i) for i in range(50)]
    ivs = [(i, i, i + 5) for i in range(50)]
    points, intervals = _mk(spark, pts, ivs)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        naive_plan = explain_str(_naive(points, intervals, "v", "s", "e"))
        assert (
            "BroadcastNestedLoopJoin" in naive_plan
            or "CartesianProduct" in naive_plan
        )
        binned_plan = explain_str(
            binned_range_join(
                points, intervals, "v", "s", "e", bin_width=8,
                max_bins_per_interval=None,
            )
        )
        assert "CartesianProduct" not in binned_plan
        assert "BroadcastNestedLoopJoin" not in binned_plan
        assert (
            "SortMergeJoin" in binned_plan
            or "ShuffledHashJoin" in binned_plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
