"""Deterministic bottom-k quantile sketch (`operators/quantiles.py`)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.quantiles import (
    bottomk_accumulate,
    bottomk_combine,
    bottomk_sample,
    quantiles_disc,
    quantiles_from_sketch,
)


def _events(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/events.parquet").select(
        "event_id", "event_type", "value"
    )


def _py_bottomk(rows, k):
    """Independent Python reference: k smallest md5(key) per group."""
    by_group = {}
    for key, group, value in rows:
        h = hashlib.md5(str(key).encode()).hexdigest()
        by_group.setdefault(group, []).append((h, key, value))
    return {
        g: sorted(v)[:k] for g, v in by_group.items()
    }


def test_bottomk_matches_python_reference(spark, sf_small):
    k = 16
    ev = _events(spark, sf_small)
    got = {
        g: sorted(
            (hashlib.md5(str(r.event_id).encode()).hexdigest(), r.event_id, r.value)
            for r in rows
        )
        for g, rows in _group_rows(
            bottomk_sample(ev, ["event_type"], "event_id", k).collect()
        ).items()
    }
    ref = _py_bottomk(
        [(r.event_id, r.event_type, r.value) for r in ev.collect()], k
    )
    assert got == ref


def _group_rows(rows):
    out = {}
    for r in rows:
        out.setdefault(r.event_type, []).append(r)
    return out


@pytest.mark.parametrize("parts", [2, 32])
def test_bottomk_partitioning_invariant(spark, sf_small, parts):
    ev = _events(spark, sf_small).repartition(parts)
    a = sorted(
        map(tuple, bottomk_sample(ev, ["event_type"], "event_id", 32).collect())
    )
    b = sorted(
        map(
            tuple,
            bottomk_sample(
                _events(spark, sf_small), ["event_type"], "event_id", 32
            ).collect(),
        )
    )
    assert a == b


def test_bottomk_rank_limit_pushed_mapside(spark, sf_small):
    """WindowGroupLimit bounds the shuffle at k rows/group/partition —
    the property that makes the sample scan-dominated at 100 TB."""
    plan = (
        bottomk_sample(_events(spark, sf_small), ["event_type"], "event_id", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_sketch_merge_equals_global(spark, sf_small):
    """Mergeability, bit-for-bit: accumulate per fine grain (event_type
    x user bucket), combine to event_type, == accumulate directly at
    event_type grain."""
    k = 24
    ev = _events(spark, sf_small).withColumn(
        "bucket", (F.col("event_id") % 7).cast("int")
    )
    fine = bottomk_accumulate(ev, ["event_type", "bucket"], "value", "event_id", k)
    rolled = bottomk_combine(fine, ["event_type"], k)
    direct = bottomk_accumulate(ev, ["event_type"], "value", "event_id", k)
    a = sorted(map(tuple, rolled.select("event_type", "bk_sketch").collect()))
    b = sorted(map(tuple, direct.select("event_type", "bk_sketch").collect()))
    assert a == b


def test_quantiles_disc_selection_and_accuracy(spark, sf_small):
    """Estimates are actual data values and land within the rank-error
    band of the exact quantile."""
    k = 256
    ev = _events(spark, sf_small)
    sample = bottomk_sample(ev, ["event_type"], "event_id", k)
    est = {
        r.event_type: (r.n_sample, r.q25, r.q50, r.q75)
        for r in quantiles_disc(
            sample, ["event_type"], "value", {"q25": 0.25, "q50": 0.5, "q75": 0.75}
        ).collect()
    }
    exact = _group_rows(ev.collect())
    for g, rows in exact.items():
        vals = sorted(r.value for r in rows)
        n_sample, q25, q50, q75 = est[g]
        assert n_sample == min(k, len(vals))
        for q, e in ((0.25, q25), (0.5, q50), (0.75, q75)):
            assert e in vals  # selection, never interpolation
            # rank of the estimate within the full data is close to q
            rank = vals.index(e) / max(1, len(vals) - 1)
            tol = 4 * math.sqrt(q * (1 - q) / n_sample)
            assert abs(rank - q) <= tol, (g, q, rank, tol)


def test_quantiles_from_sketch_equals_sample_path(spark, sf_small):
    k = 64
    ev = _events(spark, sf_small)
    qs = {"q50": 0.5, "q90": 0.9}
    via_sample = quantiles_disc(
        bottomk_sample(ev, ["event_type"], "event_id", k),
        ["event_type"],
        "value",
        qs,
    )
    via_sketch = quantiles_from_sketch(
        bottomk_accumulate(ev, ["event_type"], "value", "event_id", k),
        ["event_type"],
        qs,
    )
    assert sorted(map(tuple, via_sample.collect())) == sorted(
        map(tuple, via_sketch.collect())
    )


def test_bottomk_empty_input(spark):
    ev = spark.createDataFrame([], "event_id long, event_type string, value double")
    assert bottomk_sample(ev, ["event_type"], "event_id", 8).count() == 0
    assert (
        quantiles_disc(ev, ["event_type"], "value", {"q50": 0.5}).count() == 0
    )


def test_property_bottomk_merge_and_determinism(spark):
    """Property check (hypothesis): for arbitrary keyed value sets and
    arbitrary 2-way splits, bottom-k of the whole == combine of the
    parts' sketches, and equals the Python min-k model."""
    import hashlib as _hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),  # unique-ish keys
            st.sampled_from(["g1", "g2"]),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )

    @given(rows=rows_strategy, split=st.integers(min_value=0, max_value=2))
    @settings(
        max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
    )
    def check(rows, split):
        k = 5
        df = spark.createDataFrame(rows, "key long, g string, v double")
        part_a = df.filter(F.col("key") % 3 <= split)
        part_b = df.filter(F.col("key") % 3 > split)
        fine = bottomk_accumulate(part_a, ["g"], "v", "key", k).unionByName(
            bottomk_accumulate(part_b, ["g"], "v", "key", k)
        )
        rolled = sorted(
            map(tuple, bottomk_combine(fine, ["g"], k).collect())
        )
        direct = sorted(
            map(tuple, bottomk_accumulate(df, ["g"], "v", "key", k).collect())
        )
        assert rolled == direct
        model = {}
        for key, g, v in rows:
            h = _hashlib.md5(str(key).encode()).hexdigest()
            model.setdefault(g, []).append((h, str(key), v))
        expect = sorted(
            (g, [tuple(e) for e in sorted(entries)[:k]])
            for g, entries in model.items()
        )
        got = [
            (g, [tuple(e) for e in sk])
            for g, sk in direct
        ]
        assert sorted(got) == expect

    check()


def test_quantile_disc_full_and_mad(spark):
    import statistics

    from impala_hashset_count_spark.operators.quantiles import (
        mad_disc,
        quantile_disc_full,
    )

    rows = [("a", float(v)) for v in [9, 1, 5, 3, 7]] + [
        ("b", float(v)) for v in [10, 20, 30, 40]
    ]
    df = spark.createDataFrame(rows, "g string, v double").repartition(8)
    med = {
        r["g"]: r["m"]
        for r in quantile_disc_full(df, ["g"], "v", 0.5, "m").collect()
    }
    # PERCENTILE_DISC: rank ceil(0.5*5)=3 -> 5; ceil(0.5*4)=2 -> 20
    assert med == {"a": 5.0, "b": 20.0}
    got = {r["g"]: (r["median_value"], r["mad"]) for r in mad_disc(df, ["g"], "v").collect()}
    # a: |v-5| = [4,4,0,2,2] sorted [0,2,2,4,4], rank 3 -> 2
    # b: |v-20| = [10,0,10,20] sorted [0,10,10,20], rank 2 -> 10
    assert got == {"a": (5.0, 2.0), "b": (20.0, 10.0)}
    # sanity vs statistics.median_low-ish on odd group
    assert med["a"] == statistics.median([9, 1, 5, 3, 7])


def test_histogram_fixed_clamps_and_counts(spark):
    from impala_hashset_count_spark.operators.analytics import histogram_fixed

    rows = [
        ("a", -5.0),   # clamps to bucket 0
        ("a", 0.0),    # bucket 0
        ("a", 49.999), # bucket 0
        ("a", 50.0),   # bucket 1 (edge goes up)
        ("a", 499.0),  # bucket 9
        ("a", 730.0),  # clamps to bucket 9
        ("a", None),   # excluded
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["bucket"]): r["n_bucket"]
        for r in histogram_fixed(df, ["g"], "v", 0.0, 500.0, 10).collect()
    }
    assert got == {("a", 0): 3, ("a", 1): 1, ("a", 9): 2}
