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


# ---------------------------------------------------------------------
# Interval x interval overlap join
# ---------------------------------------------------------------------

from impala_hashset_count_spark.operators.range_join import (  # noqa: E402
    binned_interval_join,
)


def _naive_overlap(left, right):
    return left.join(
        right,
        (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")),
    )


def _mk_iv(spark, lrows, rrows):
    left = spark.createDataFrame(lrows, "lid long, ls long, le long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long")
    return left, right


def _pair_rows(df):
    return sorted(map(tuple, df.select("lid", "rid").collect()))


def test_interval_join_equals_naive_random(spark):
    rng = random.Random(13)
    lrows, rrows = [], []
    for i in range(150):
        s = rng.randrange(0, 800)
        lrows.append((i, s, s + rng.randrange(0, 50)))
    for i in range(130):
        s = rng.randrange(0, 800)
        rrows.append((i, s, s + rng.randrange(0, 50)))
    left, right = _mk_iv(spark, lrows, rrows)
    got = binned_interval_join(
        left, right, "ls", "le", "rs", "re", bin_width=16
    )
    assert _pair_rows(got) == _pair_rows(_naive_overlap(left, right))
    # exactly-once: no dedup pass hides double counting
    assert got.count() == len(_pair_rows(got))


def test_interval_join_touching_endpoints_and_containment(spark):
    lrows = [(1, 0, 10), (2, 20, 30), (3, 5, 50)]
    rrows = [(10, 10, 20), (11, 31, 40), (12, 0, 100), (13, 51, 60)]
    left, right = _mk_iv(spark, lrows, rrows)
    got = binned_interval_join(
        left, right, "ls", "le", "rs", "re", bin_width=8
    )
    assert _pair_rows(got) == _pair_rows(_naive_overlap(left, right))
    # touching at a single shared point counts as overlap (inclusive)
    assert (1, 10) in _pair_rows(got)


def test_interval_join_wide_guard_both_sides(spark):
    rng = random.Random(29)
    lrows = [(i, s := rng.randrange(0, 500), s + rng.randrange(0, 20))
             for i in range(80)]
    rrows = [(i, s := rng.randrange(0, 500), s + rng.randrange(0, 20))
             for i in range(80)]
    # one giant interval on EACH side: routed to the broadcast legs
    lrows.append((900, 0, 10_000))
    rrows.append((901, 0, 10_000))
    left, right = _mk_iv(spark, lrows, rrows)
    got = binned_interval_join(
        left, right, "ls", "le", "rs", "re",
        bin_width=16, max_bins_per_interval=8,
    )
    assert _pair_rows(got) == _pair_rows(_naive_overlap(left, right))
    # the wide-wide pair surfaced exactly once (no double counting
    # between the two broadcast legs)
    assert _pair_rows(got).count((900, 901)) == 1


def test_interval_join_invalid_and_null_match_nothing(spark):
    lrows = [(1, 5, 4), (2, None, 10), (3, 0, 100)]
    rrows = [(10, 8, None), (11, 50, 40), (12, 1, 2)]
    left, right = _mk_iv(spark, lrows, rrows)
    got = binned_interval_join(
        left, right, "ls", "le", "rs", "re", bin_width=16
    )
    assert _pair_rows(got) == [(3, 12)]


def test_interval_join_plan_is_shuffle_join_not_nested_loop(spark):
    left, right = _mk_iv(
        spark, [(1, 0, 10)], [(2, 5, 15)]
    )
    got = binned_interval_join(
        left, right, "ls", "le", "rs", "re",
        bin_width=16, max_bins_per_interval=None,
    )
    plan = explain_str(got)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan  # tiny fixtures may auto-broadcast
    )


def test_interval_join_hypothesis_equals_python_model(spark):
    """Property check: for arbitrary small interval sets and bin
    widths, the binned overlap join equals a pure-python O(n*m) model
    — endpoints, degenerate single-point intervals, duplicates, and
    bin-edge alignments are all explored by shrinking rather than
    hand-picked."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    iv = st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=0, max_value=30),
    )
    ivs_strategy = st.lists(iv, min_size=0, max_size=12)

    @given(
        livs=ivs_strategy,
        rivs=ivs_strategy,
        width=st.sampled_from([1, 3, 8, 64]),
    )
    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def run(livs, rivs, width):
        lrows = [(i, s, s + d) for i, (s, d) in enumerate(livs)]
        rrows = [(i, s, s + d) for i, (s, d) in enumerate(rivs)]
        model = sorted(
            (li, ri)
            for li, ls, le in lrows
            for ri, rs, re in rrows
            if ls <= re and rs <= le
        )
        left = spark.createDataFrame(
            lrows or [(None, None, None)], "lid long, ls long, le long"
        )
        right = spark.createDataFrame(
            rrows or [(None, None, None)], "rid long, rs long, re long"
        )
        got = binned_interval_join(
            left, right, "ls", "le", "rs", "re",
            bin_width=width, max_bins_per_interval=4,
        )
        assert _pair_rows(got) == model

    run()
