"""Physical-design operators: bucketed co-located joins (zero exchange)
and salted skew joins (same results as the plain join)."""

import contextlib
import io
import os
import uuid

from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.skew import bucketed_table, salted_join
from impala_hashset_count_spark.sources.tables import load_table


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark, sf_small, tmp_path):
    tag = uuid.uuid4().hex[:8]
    orders = load_table(spark, sf_small, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    bo = bucketed_table(
        orders, spark, f"orders_b_{tag}", os.path.join(str(tmp_path), "o"), "o_orderkey"
    )
    bl = bucketed_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        spark,
        f"lineitem_b_{tag}",
        os.path.join(str(tmp_path), "l"),
        "o_orderkey",
    )
    # disable auto-broadcast so a small side can't hide the exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey")
        plan = _explain(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # co-located result equals the plain shuffled join
        plain = orders.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS orders_b_{tag}")
        spark.sql(f"DROP TABLE IF EXISTS lineitem_b_{tag}")


def test_salted_join_matches_plain_join(spark, sf_small):
    orders = load_table(spark, sf_small, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_small, "customer").select("c_custkey", "c_mktsegment")
    r = cust.withColumnRenamed("c_custkey", "o_custkey")
    plain = (
        orders.join(r, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(orders, r, "o_custkey", salt=4)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (99, "orphan")], "k int, v string"
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y")], "k int, w string")
    out = salted_join(left, right, "k", how="left", salt=3).collect()
    assert len(out) == 4
    orphan = [r for r in out if r.v == "orphan"][0]
    assert orphan.w is None


def test_aqe_splits_skewed_join_partition(spark):
    """The third leg of the skew story (beside salting and bucketing):
    AQE's runtime skew-join splitting. One hot key dominates the left
    side of a sort-merge join; with skew-join enabled and thresholds
    scaled to the fixture, the FINAL adaptive plan marks the join
    skew=true (the hot partition was split into parallel subtasks)
    while results stay identical to the plain join."""
    conf = spark.conf
    keys = [
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
    ]
    saved = {}
    for k, _v in keys:
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
    try:
        for k, v in keys:
            conf.set(k, v)
        # incompressible per-row payload: 108k identical 8-byte keys
        # alone compress below any realistic skew threshold in the
        # shuffle files, hiding the skew from AQE's size stats
        left = (
            spark.range(120_000)
            .select(
                F.when(F.col("id") % 10 != 0, F.lit(0))
                .otherwise(F.col("id"))
                .alias("k"),
                F.md5(F.col("id").cast("string")).alias("pad"),
            )
        )
        right = spark.range(2_000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        # a global aggregate imposes no output-partitioning requirement,
        # so AQE is free to split the hot partition (a groupBy on the
        # join key would pin hashpartitioning(k) and suppress the
        # optimization — splitting there would add a shuffle); summing
        # over pad keeps the payload flowing through the shuffle
        joined = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("pad")).alias("pad_len"),
        )
        (row,) = joined.collect()
        # hot key 0 contributes its 108k rows plus id=0 itself; the
        # other matched keys (10..1990 step 10) one row each
        assert row["n"] == 108_001 + 199
        assert row["pad_len"] == 32 * row["n"]
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not split the hot partition — check the "
            "skew-join thresholds against the fixture size:\n" + plan
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
