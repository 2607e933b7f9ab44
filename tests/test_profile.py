"""Single-pass column profiler (`operators/profile.py`)."""

import duckdb
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.profile import profile_table


def test_profile_orders_matches_duckdb(spark, sf_small):
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderstatus",
        "o_orderpriority",
        "o_orderdate",
    ]
    df = spark.read.parquet(f"{sf_small}/orders.parquet")
    got = sorted(map(tuple, profile_table(df, cols).collect()))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_small}/orders.parquet')"
    )
    pieces = []
    for c in cols:
        if c in ("o_orderkey", "o_custkey", "o_totalprice"):
            mn = f"CAST(MIN({c}) AS DOUBLE)"
            mx = f"CAST(MAX({c}) AS DOUBLE)"
            ms = "CAST(NULL AS VARCHAR)"
            xs = "CAST(NULL AS VARCHAR)"
        else:
            src = f"CAST({c} AS DATE)" if c == "o_orderdate" else c
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
            ms = f"CAST(MIN({src}) AS VARCHAR)"
            xs = f"CAST(MAX({src}) AS VARCHAR)"
        pieces.append(
            f"""SELECT '{c}' AS column, COUNT(*) AS n_rows,
                COUNT(*) - COUNT({c}) AS n_null,
                COUNT(DISTINCT {c}) AS n_distinct,
                {mn} AS min_num, {mx} AS max_num,
                {ms} AS min_str, {xs} AS max_str FROM orders"""
        )
    oracle = sorted(tuple(r) for r in con.execute(" UNION ALL ".join(pieces)).fetchall())
    assert got == oracle


def test_profile_nulls_and_default_columns(spark):
    df = spark.createDataFrame(
        [(1, None, 2.5), (2, "x", None), (None, "x", 2.5), (4, "y", 0.0)],
        "k int, s string, v double",
    )
    rows = {r.column: r for r in profile_table(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    assert (rows["k"].n_null, rows["k"].n_distinct) == (1, 3)
    assert (rows["s"].n_null, rows["s"].n_distinct) == (1, 2)
    assert rows["s"].min_str == "x" and rows["s"].max_str == "y"
    assert rows["v"].min_num == 0.0 and rows["v"].max_num == 2.5
    assert rows["k"].n_rows == 4


def test_profile_single_scan_with_expand(spark, sf_small):
    """All columns profile in ONE scan; the exact tier plans the
    multi-distinct as the reference's Expand shape."""
    df = spark.read.parquet(f"{sf_small}/orders.parquet")
    plan = (
        profile_table(df, ["o_orderkey", "o_orderstatus"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan


def test_profile_approx_tier_no_expand(spark, sf_small):
    df = spark.read.parquet(f"{sf_small}/orders.parquet")
    prof = profile_table(df, ["o_orderkey", "o_orderstatus"], approx=True)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    rows = {r.column: r for r in prof.collect()}
    exact = {
        r.column: r
        for r in profile_table(df, ["o_orderkey", "o_orderstatus"]).collect()
    }
    for c, r in rows.items():
        assert abs(r.n_distinct - exact[c].n_distinct) <= 0.1 * exact[c].n_distinct


def test_profile_empty_table(spark):
    df = spark.createDataFrame([], "k int, s string")
    rows = {r.column: r for r in profile_table(df).collect()}
    assert rows["k"].n_rows == 0 and rows["k"].n_distinct == 0
    assert rows["s"].min_str is None
