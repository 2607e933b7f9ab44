"""Cohort retention: hand-computable fixture + invariants on the
driver events table."""

import datetime as dt

from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.analytics import cohort_retention
from impala_hashset_count_spark.sources.tables import load_table


def test_cohort_retention_known_answer(spark):
    """Two weekly cohorts with known retention. Week periods truncate to
    Mondays; 2024-01-01 is a Monday."""
    t = lambda d, h=12: dt.datetime(2024, 1, d, h)  # noqa: E731
    rows = [
        # users 1,2: first active week of Jan 1; user 1 returns week of
        # Jan 8 and Jan 15, user 2 only week of Jan 15
        (1, t(1)), (1, t(3)), (1, t(9)), (1, t(16)),
        (2, t(2)), (2, t(17)),
        # user 3: cohort week of Jan 8, never returns
        (3, t(10)),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {
        (str(r["cohort"]), r["period_offset"]): (r["n_active"], r["n_cohort"], r["retention"])
        for r in cohort_retention(ev, period="week").collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)   # only user 1
    assert out[("2024-01-01", 2)] == (2, 2, 1.0)   # both return
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)
    assert ("2024-01-08", 1) not in out


def test_cohort_retention_invariants_on_events(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    out = cohort_retention(ev, period="day")
    rows = out.collect()
    assert rows, "events table must produce cohorts"
    # offset 0 is the cohort itself
    for r in rows:
        if r["period_offset"] == 0:
            assert r["n_active"] == r["n_cohort"] and r["retention"] == 1.0
        assert 0 < r["n_active"] <= r["n_cohort"]
        assert r["period_offset"] >= 0
    # total distinct users == sum of cohort sizes
    n_users = ev.select("user_id").distinct().count()
    cohort_sizes = {
        r["cohort"]: r["n_cohort"] for r in rows if r["period_offset"] == 0
    }
    assert sum(cohort_sizes.values()) == n_users
    # retention at any offset never exceeds cohort size (already checked
    # per-row); monotone decrease is NOT asserted — retention can rebound


def test_gap_fill_known_answer(spark):
    import datetime as dt

    from impala_hashset_count_spark.operators.analytics import gap_fill

    t = lambda h: dt.datetime(2024, 3, 1, h, 15)  # noqa: E731
    rows = [
        (1, "a", t(0)), (2, "a", t(0)), (3, "a", t(3)),   # a: gap at 1,2
        (4, "b", t(1)),                                    # b: active hour 1 only
    ]
    ev = spark.createDataFrame(rows, "event_id bigint, event_type string, ts timestamp")
    out = {
        (r["key"], r["bucket"].hour): r["n_events"]
        for r in gap_fill(ev, unit="hour").collect()
    }
    # dense spine: hours 0..3 for BOTH keys (global bounds), zeros filled
    assert len(out) == 8
    assert out[("a", 0)] == 2 and out[("a", 1)] == 0 and out[("a", 2)] == 0
    assert out[("a", 3)] == 1
    assert out[("b", 1)] == 1 and out[("b", 0)] == 0
    assert out[("b", 2)] == 0 and out[("b", 3)] == 0


def test_gap_fill_dense_and_consistent_on_events(spark, sf_small):
    from impala_hashset_count_spark.operators.analytics import gap_fill

    ev = load_table(spark, sf_small, "events")
    out = gap_fill(ev, unit="day")
    agg = out.groupBy("key").count().collect()
    # every key has the SAME number of buckets (dense global spine)
    counts = {r["key"]: r["count"] for r in agg}
    assert len(set(counts.values())) == 1
    # totals are preserved: sum of filled counts == raw event count
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == ev.count()


def test_gap_fill_plan_broadcasts_counts_for_fill_join(spark, sf_small):
    """The fill join must broadcast the aggregated counts (post-agg
    they are at most spine-sized); the spine side is the preserved side
    of the outer join, so it cannot be the build side."""
    from impala_hashset_count_spark.operators.analytics import gap_fill
    from impala_hashset_count_spark.sources.tables import load_table

    from .test_plans import explain_str

    ev = load_table(spark, sf_small, "events")
    plan = explain_str(gap_fill(ev, "ts", "event_type", unit="hour"))
    assert "BroadcastHashJoin" in plan


def test_gap_fill_guard_degrades_to_shuffle_join_above_threshold(spark, sf_small):
    """The broadcast-fill guard: when the auto probe finds
    keys*periods above ``max_broadcast_rows``, the fill join must NOT
    broadcast the counts (a high-cardinality key would OOM the
    executors) — and the degraded plan returns identical rows."""
    from impala_hashset_count_spark.operators.analytics import gap_fill
    from impala_hashset_count_spark.sources.tables import load_table

    from .test_plans import explain_str

    ev = load_table(spark, sf_small, "events")
    fast = gap_fill(ev, "ts", "event_type", unit="day", broadcast_counts=True)
    # threshold 0 forces the guard: every spine is "too big"
    safe = gap_fill(
        ev, "ts", "event_type", unit="day", max_broadcast_rows=0
    )
    plan_fast = explain_str(fast)
    plan_safe = explain_str(safe)
    # the fill join itself degrades (the tiny bounds/keys spine joins
    # may still broadcast — count the joins instead of greping absence)
    assert plan_fast.count("BroadcastHashJoin") > plan_safe.count(
        "BroadcastHashJoin"
    )
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, safe.collect())
    )


def test_gap_fill_auto_probe_picks_broadcast_for_small_spine(spark):
    """Low-cardinality key + short span: the auto probe must keep the
    broadcast fill."""
    import datetime as dt

    from impala_hashset_count_spark.operators.analytics import gap_fill

    from .test_plans import explain_str

    rows = [(i, "k", dt.datetime(2024, 3, 1, i % 4)) for i in range(16)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, event_type string, ts timestamp"
    )
    plan = explain_str(gap_fill(ev, "ts", "event_type", unit="hour"))
    assert "BroadcastHashJoin" in plan


def test_event_transitions_matches_python_model(spark):
    """Transition counts equal a Python model over tie-broken
    sequences; users with one event contribute nothing."""
    from impala_hashset_count_spark.operators.analytics import event_transitions

    rows = [
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        (2, 1, "view"), (2, 1, "view"),          # simultaneous: tie-break by id
        (2, 2, "click"),
        (3, 5, "refund"),                         # singleton: no transition
    ]
    data = [(u, i, float(t), f"2026-01-01 00:00:0{t}", et)
            for i, (u, t, et) in enumerate(rows)]
    df = spark.createDataFrame(
        [(u, eid, ts, et) for u, eid, _v, ts, et in data],
        "user_id bigint, event_id bigint, ts string, event_type string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["col"]).col("ts").cast("timestamp"))
    got = {(r.from_type, r.to_type): r.n_trans
           for r in event_transitions(df, order_tiebreak="event_id").collect()}
    # user 1: view->click, click->purchase; user 2: view->view, view->click
    assert got == {("view", "click"): 2, ("click", "purchase"): 1,
                   ("view", "view"): 1}
