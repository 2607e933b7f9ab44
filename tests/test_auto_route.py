"""Adaptive tier routing (`operators/auto_route.py`): the decision is a
pure function of exact deterministic statistics, every route returns the
identical faithful answer, and the DuckDB mirror of the decision
arithmetic reproduces the route bit-for-bit (the property the `auto` arm
of `hashset_count_tiers` puts under the driver hash)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.auto_route import (
    ROUTE_BITMAP,
    ROUTE_FAITHFUL,
    ROUTE_SPILLABLE,
    auto_route_stats,
    choose_route,
    hashset_count_auto,
)
from impala_hashset_count_spark.operators.kmv import HASH_SPACE


def _counts(df):
    return {
        tuple(r)[:-1]: r[-1]
        for r in df.orderBy(df.columns[0]).collect()
    }


def _direct(spark_df, g, v):
    return _counts(
        spark_df.groupBy(g).agg(
            F.when(F.count(v) == 0, F.lit(None).cast("string"))
            .otherwise(F.count_distinct(F.col(v)).cast("string"))
            .alias("hashset_count")
        )
    )


def test_bitmap_route_small_range_integers(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 977).alias("v"),
    )
    out, route = hashset_count_auto(df, ["g"], "v")
    assert route == ROUTE_BITMAP
    assert _counts(out) == _direct(df, "g", "v")


def test_spillable_route_high_ndv_strings(spark):
    df = spark.range(20_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("u"), F.col("id")).alias("v"),
    )
    # 10k distinct per group; threshold 100 forces the high-NDV branch
    out, route = hashset_count_auto(df, ["g"], "v", ndv_threshold=100)
    assert route == ROUTE_SPILLABLE
    assert _counts(out) == _direct(df, "g", "v")


def test_faithful_route_moderate_strings(spark):
    df = spark.range(5_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("u"), F.col("id") % 50).alias("v"),
    )
    out, route = hashset_count_auto(df, ["g"], "v")
    assert route == ROUTE_FAITHFUL
    assert _counts(out) == _direct(df, "g", "v")


def test_wide_range_integers_skip_bitmap(spark):
    # integral but range >= bitmap_max_range -> falls through to the
    # NDV branches instead of building a range-sized bitmap
    df = spark.range(10_000).select(
        F.lit("a").alias("g"),
        (F.col("id") * F.lit(1 << 20)).alias("v"),
    )
    out, route = hashset_count_auto(
        df, ["g"], "v", bitmap_max_range=1 << 26, ndv_threshold=100
    )
    assert route == ROUTE_SPILLABLE
    assert _counts(out) == _direct(df, "g", "v")


def test_empty_and_all_null_inputs_take_faithful(spark):
    empty = spark.range(0).select(
        F.col("id").cast("string").alias("g"), F.col("id").alias("v")
    )
    out, route = hashset_count_auto(empty, ["g"], "v")
    assert route == ROUTE_FAITHFUL
    assert out.count() == 0

    all_null = spark.range(100).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.lit(None).cast("bigint").alias("v"),
    )
    out, route = hashset_count_auto(all_null, ["g"], "v")
    assert route == ROUTE_FAITHFUL
    rows = {r["g"]: r["hashset_count"] for r in out.collect()}
    # reference contract: NULL, not "0", for never-updated groups
    # (hashset-count.cc:507-510)
    assert rows == {"0": None, "1": None}


def test_stats_are_exact_and_deterministic(spark):
    df = spark.range(8_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") % 1000).alias("v"),
    )
    s1 = auto_route_stats(df, ["g"], "v")
    s2 = auto_route_stats(df.repartition(13), ["g"], "v")
    assert s1 == s2  # partitioning-independent
    assert s1.nnz == 8_000
    assert (s1.vmin, s1.vmax) == (0, 999)
    assert s1.integral


def test_route_decision_mirrored_by_duckdb(spark, tmp_path):
    """The guarantee the `auto` arm's oracle rests on: DuckDB recomputes
    the same stats from the same parquet bytes and lands on the same
    route — sampled-NDV hash arithmetic included."""
    df = spark.range(30_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("doc_"), F.col("id") % 7000).alias("v"),
    )
    path = str(tmp_path / "t.parquet")
    df.write.parquet(path)
    back = spark.read.parquet(path)

    shift, threshold = 6, 3_000
    stats = auto_route_stats(back, ["g"], "v", sample_shift=shift)
    route = choose_route(stats, ndv_threshold=threshold)

    t = HASH_SPACE >> shift
    con = duckdb.connect()
    smax, nnz = con.execute(
        f"""
        SELECT COALESCE(MAX(s), 0), COALESCE(SUM(nn), 0) FROM (
            SELECT g, COUNT(v) AS nn,
                   COUNT(DISTINCT CASE WHEN CAST('0x' ||
                         substr(md5(v), 1, 13) AS BIGINT) < {t}
                         THEN v END) AS s
            FROM read_parquet('{path}/*.parquet') GROUP BY g)
        """
    ).fetchone()
    assert (int(smax), int(nnz)) == (stats.smax, stats.nnz)
    sql_route = (
        "faithful_udaf"
        if nnz == 0
        else ("spillable_distinct" if smax * (1 << shift) > threshold
              else "faithful_udaf")
    )
    assert sql_route == route


def test_precomputed_stats_skip_the_stats_pass(spark):
    """The catalog path: a cached RouteStats routes without touching
    the data, and a STALE row mis-routes but never mis-counts."""
    from impala_hashset_count_spark.operators.auto_route import RouteStats

    df = spark.range(4_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 500).alias("v"),
    )
    fresh = auto_route_stats(df, ["g"], "v")
    out, route = hashset_count_auto(df, ["g"], "v", stats=fresh)
    assert route == ROUTE_BITMAP
    assert _counts(out) == _direct(df, "g", "v")

    # a stale/cross-table stats row forcing the spillable tier still
    # returns the identical exact answer
    stale = RouteStats(
        nnz=10**9, smax=10**7, vmin=None, vmax=None,
        integral=False, sample_shift=6,
    )
    out2, route2 = hashset_count_auto(df, ["g"], "v", stats=stale)
    assert route2 == ROUTE_SPILLABLE
    assert _counts(out2) == _direct(df, "g", "v")


@pytest.mark.parametrize("shift", [4, 6, 10])
def test_sample_shift_changes_estimate_not_counts(spark, shift):
    df = spark.range(6_000).select(
        F.lit("g").alias("g"), (F.col("id") % 2500).alias("v")
    )
    out, _ = hashset_count_auto(df, ["g"], "v", sample_shift=shift)
    assert _counts(out) == _direct(df, "g", "v")


def test_auto_given_stats_arm_matches_auto_values(spark, sf_small):
    """The bench arm that routes from catalog-served RouteStats
    (`plans/parity._hct_auto_given_stats`) must produce the same
    grouped counts as the live-stats `auto` arm — routes may differ
    (the catalog literals are sized for the bench SFs, and a stale or
    off-SF row can only mis-route, never mis-count) — and must pick
    the full {bitmap, spillable, faithful} decision space from its
    given stats."""
    from impala_hashset_count_spark.plans.parity import (
        _hct_auto,
        _hct_auto_given_stats,
    )

    def values(df):
        return sorted(
            (
                r.tier.split("]_", 1)[1],  # strip the route tag
                r.group_key,
                r.hashset_count,
            )
            for r in df.collect()
        )

    given = _hct_auto_given_stats(spark, sf_small)
    assert values(given) == values(_hct_auto(spark, sf_small))
    routes = {
        r.tier.split("[", 1)[1].split("]", 1)[0] for r in given.collect()
    }
    assert routes == {"bitmap", "spillable_distinct", "faithful_udaf"}
