"""Event-analytics operators beyond the funnel: cohort retention and
time-spine gap fill.

Spark-first shape: one scan to stamp each user's cohort (first-activity
period, a per-user min), one join back (broadcast-able — the cohort
table is one row per user, and at 100 TB you'd pre-materialize it), one
grouped count. No window over the raw event stream, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Classic retention triangle: users grouped by their FIRST-activity
    period (the cohort), then for each later period the count of
    cohort members still active.

    Returns (cohort, period_offset, n_active, n_cohort, retention):
    one row per (cohort period, integer offset >= 0); ``retention`` =
    n_active / n_cohort rounded to 4dp; offset 0 is the cohort size by
    construction (retention 1.0).

    ``period`` is any ``date_trunc`` unit ('day', 'week', 'month').
    Offsets are computed on truncated period START dates, so uneven
    month lengths still yield integer offsets."""
    ev = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc(period, F.col(ts_col)).cast("date").alias("p"),
    ).distinct()  # one row per (user, active period)
    cohorts = ev.groupBy("u").agg(F.min("p").alias("cohort"))
    n_per_cohort = cohorts.groupBy("cohort").agg(F.count("*").alias("n_cohort"))

    if period == "month":
        offset = (F.months_between(F.col("p"), F.col("cohort"))).cast("int")
    elif period == "week":
        offset = (F.datediff(F.col("p"), F.col("cohort")) / 7).cast("int")
    else:
        offset = F.datediff(F.col("p"), F.col("cohort"))

    active = (
        ev.join(cohorts, "u")
        .select("cohort", offset.alias("period_offset"))
        .groupBy("cohort", "period_offset")
        .agg(F.count("*").alias("n_active"))
    )
    return (
        active.join(n_per_cohort, "cohort")
        .withColumn(
            "retention", F.round(F.col("n_active") / F.col("n_cohort"), 4)
        )
        .select("cohort", "period_offset", "n_active", "n_cohort", "retention")
    )


def gap_fill(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    unit: str = "hour",
    broadcast_counts: bool | None = None,
    max_broadcast_rows: int = 4_000_000,
) -> DataFrame:
    """Complete time series per key: bucket counts resampled onto a
    dense (key x period) spine between the GLOBAL min and max period,
    with zero-filled gaps — the resample/asfreq step a metrics pipeline
    needs before rate math or anomaly scoring (a missing bucket and a
    zero bucket must be distinguishable from one another).

    Returns (key, bucket: timestamp, n_events) sorted-stable by content
    only. Fully declarative — bounds/spine/fill are all DataFrame ops:
    one scan -> grouped counts (one shuffle); the 1-row min/max agg
    cross-joins the distinct keys to EXPLODE the spine (spine size =
    periods x keys, trivially small next to the events). The final fill
    joins spine LEFT counts — and the preserved side of an outer join
    cannot be the broadcast build side, so the counts are the build
    side when broadcast.

    Broadcasting the counts is only right while (keys x periods) fits
    an executor: for a low-cardinality key (event_type) it always
    does; for a high-cardinality key (user_id over a year of hours) a
    broadcast would OOM every executor. ``broadcast_counts=None``
    (default) AUTO-DECIDES with one tiny extra aggregate (distinct
    keys + global bounds — counts-sized input, 1-row output): the
    spine cardinality keys*periods is compared against
    ``max_broadcast_rows`` and the fill join degrades to a shuffle
    join above it. Pass True/False to skip the probe job when the
    cardinality is known."""
    bucket = F.date_trunc(unit, F.col(ts_col))
    counts = (
        events.select(F.col(key_col).alias("key"), bucket.alias("bucket"))
        .groupBy("key", "bucket")
        .agg(F.count("*").alias("n_events"))
    )
    step = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY"}[unit]
    if broadcast_counts is None:
        import datetime

        lo, hi, nk = counts.agg(
            F.min("bucket"), F.max("bucket"), F.count_distinct("key")
        ).first()
        if lo is None:
            broadcast_counts = True
        else:
            delta = datetime.timedelta(
                hours=1 if unit == "hour" else 24
            )
            n_periods = int((hi - lo) / delta) + 1
            broadcast_counts = nk * n_periods <= max_broadcast_rows
    bounds = counts.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = (
        bounds.select(
            F.explode(F.expr(f"sequence(lo, hi, {step})")).alias("bucket")
        )
        .crossJoin(counts.select("key").distinct())
    )
    # above the threshold, PIN the sort-merge strategy: Catalyst's own
    # size estimate for an aggregate can undershoot badly enough to
    # re-pick a broadcast on its own, and this is exactly the case
    # where that OOMs — the hint makes the degraded path deterministic
    fill_side = (
        F.broadcast(counts) if broadcast_counts else counts.hint("merge")
    )
    return (
        spine.join(fill_side, ["key", "bucket"], "left")
        .fillna(0, ["n_events"])
        .select("key", "bucket", "n_events")
    )


def histogram_fixed(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
) -> DataFrame:
    """Fixed-bound equi-width histogram per group: (group, bucket, n)
    with ``bucket = clamp(floor((v - lo) / w), 0, n_buckets-1)`` and
    NULL values excluded. Fixed bounds (vs data-derived) keep the
    bucketing a pure per-row projection — zero extra pass, zero
    driver-side state, and bucket ids comparable ACROSS datasets and
    days (the property drift monitoring needs). Every step is a single
    IEEE op mirrored exactly by any engine; the counts are integers —
    the whole histogram sits under a value-hash oracle. One shuffle
    (the count aggregate)."""
    w = (hi - lo) / n_buckets
    bucket = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w)).cast("long"),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_bucket"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Markov transition counts over per-user event sequences:
    (from_type, to_type, n_trans) for every consecutive pair — the
    path-analysis aggregate behind "what do users do after X" and
    first-order behavior models (transition probabilities = n_trans
    over its from_type row-sum, left to the caller so the hashed
    surface stays integer).

    Sequence order is (ts, tiebreak): pass a unique ``order_tiebreak``
    column (e.g. event_id) so simultaneous events order
    deterministically — without it, equal timestamps make the sequence
    engine/partitioning-ambiguous. One window shuffle on the user key
    + one count aggregate; no per-user buffering beyond the window
    sort."""
    from pyspark.sql import Window

    order = [F.col(ts_col)]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(user_col).orderBy(*order)
    return (
        events.select(user_col, ts_col, type_col,
                      *([order_tiebreak] if order_tiebreak else []))
        .withColumn("__to", F.lead(type_col).over(w))
        .filter(F.col("__to").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"), F.col("__to").alias("to_type")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
