"""Incremental join-view maintenance: multi-batch equivalence with full
recompute (updates, deletes, inserts, join-key changes, one-sided and
both-sided batches) and the no-full-shuffle plan property."""

import random

from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.ivm import maintain_join_view
from impala_hashset_count_spark.operators.merge import apply_changes
from tests.test_plans import explain_str

A_SCHEMA = "a_id long, seg string"
B_SCHEMA = "b_id long, a_ref long, amt long"
DA_SCHEMA = A_SCHEMA + ", op string"
DB_SCHEMA = B_SCHEMA + ", op string"
ON = [("a_id", "a_ref")]


def _join(a, b):
    return a.join(b, a["a_id"] == b["a_ref"], "inner")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _step(view, a, b, da_rows, db_rows, spark):
    da = spark.createDataFrame(da_rows, DA_SCHEMA)
    db = spark.createDataFrame(db_rows, DB_SCHEMA)
    a2 = apply_changes(a, da, ["a_id"])
    b2 = apply_changes(b, db, ["b_id"])
    v2 = maintain_join_view(
        view, a2, b2, da, db, ["a_id"], ["b_id"], ON
    )
    return a2, b2, v2


def test_multi_batch_equals_recompute(spark):
    rng = random.Random(11)
    a = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(40)], A_SCHEMA
    )
    b = spark.createDataFrame(
        [(j, rng.randrange(0, 50), j * 10) for j in range(120)], B_SCHEMA
    )
    view = _join(a, b)
    next_b_id = 1000
    for batch in range(3):
        da_rows = []
        db_rows = []
        for i in range(40):
            r = rng.random()
            if r < 0.1:
                da_rows.append((i, f"moved{batch}", "U"))
            elif r < 0.15:
                da_rows.append((i, None, "D"))
        for j in range(120):
            r = rng.random()
            if r < 0.1:
                # join-key change: repoint the order at another customer
                db_rows.append((j, rng.randrange(0, 50), j * 10 + batch, "U"))
            elif r < 0.15:
                db_rows.append((j, None, None, "D"))
        for _ in range(6):
            db_rows.append((next_b_id, rng.randrange(0, 50), 7, "U"))
            next_b_id += 1
        a, b, view = _step(view, a, b, da_rows, db_rows, spark)
        # checkpoint rows to concrete values so lineage stays small
        assert _rows(view) == _rows(_join(a, b)), f"batch {batch}"


def test_one_sided_and_empty_batches(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], A_SCHEMA)
    b = spark.createDataFrame([(10, 1, 5), (11, 2, 6)], B_SCHEMA)
    view = _join(a, b)
    # B-only batch (A delta empty)
    a, b, view = _step(
        view, a, b, [], [(10, 2, 50, "U"), (12, 1, 7, "U")], spark
    )
    assert _rows(view) == _rows(_join(a, b))
    # A-only batch: delete a joined key
    a, b, view = _step(view, a, b, [(1, None, "D")], [], spark)
    assert _rows(view) == _rows(_join(a, b))
    # empty-empty is a no-op
    a, b, view = _step(view, a, b, [], [], spark)
    assert _rows(view) == _rows(_join(a, b))


def test_no_duplicate_pairs_when_both_sides_change(spark):
    a = spark.createDataFrame([(1, "x")], A_SCHEMA)
    b = spark.createDataFrame([(10, 1, 5)], B_SCHEMA)
    view = _join(a, b)
    # update BOTH the customer and its order in one batch
    a, b, view = _step(
        view, a, b, [(1, "x2", "U")], [(10, 1, 6, "U")], spark
    )
    rows = _rows(view)
    assert rows == [(1, "x2", 10, 1, 6)]


def test_view_and_bases_not_shuffled(spark):
    a = spark.createDataFrame([(i, "s") for i in range(100)], A_SCHEMA)
    b = spark.createDataFrame([(j, j % 100, 1) for j in range(200)], B_SCHEMA)
    # materialize the view, as a stored view would be (otherwise the
    # survivors' lineage re-executes the original join)
    view = _join(a, b).localCheckpoint(eager=True)
    da = spark.createDataFrame([(1, "t", "U")], DA_SCHEMA)
    db = spark.createDataFrame([(5, 5, 9, "U")], DB_SCHEMA)
    v2 = maintain_join_view(
        view, a, b, da, db, ["a_id"], ["b_id"], ON
    )
    plan = explain_str(v2)
    # all five joins (2 anti removals, 2 delta terms, 1 unchanged-A
    # anti) run broadcast — no sort-merge/shuffle join of the big sides
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 5


def test_ivm_arm_clone_keys_never_collide(spark, sf_small):
    """The registry entry's CDC recipe clones orders as inserts with a
    synthetic key offset. A FIXED offset (10M) collided with real
    orderkeys at the sf10 sweep — the volume generator's key-shifting
    pushes max(o_orderkey) past any constant eventually, at which
    point the oracle's UNION ALL (two rows, duplicate key) and the
    keyed upsert (one row replaced) are both right about two DIFFERENT
    inputs. The offset must therefore derive from the data: strictly
    above max(o_orderkey) at every SF."""
    from impala_hashset_count_spark.plans import all_queries

    fn = all_queries()["join_left_customer_orders"].fn
    src = open(
        "impala_hashset_count_spark/plans/parity.py"
    ).read()
    assert "MAX(o_orderkey) + 1" in src  # the oracle side
    assert "_max_orderkey(orders) + 1" in src  # the Spark side
    # behavioral check at suite SF: the maintained view's synthetic
    # keys are disjoint from every real key
    df = fn(spark, sf_small)
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    mx = orders.agg(F.max("o_orderkey")).first()[0]
    clones = orders.filter(F.col("o_orderkey") % 7 == 3).count()
    assert clones > 0  # the recipe actually exercises the insert path
    # the ivm tier's order count must include every clone exactly once
    ivm_orders = (
        df.filter(F.col("tier") == "ivm")
        .agg(F.sum("n_orders"))
        .first()[0]
    )
    kept = orders.filter(F.col("o_orderkey") % 7 != 2).count()
    # deleted customers (%10==7) remove their orders from the join; so
    # upper-bound check plus the structural disjointness assertion:
    assert ivm_orders <= kept + clones
    # and the data-derived offset really clears every real key, even
    # if the table were re-keyed the way the volume generator does
    shifted = orders.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(20_000_000)
    )
    from impala_hashset_count_spark.plans.parity import _max_orderkey

    assert _max_orderkey(shifted) >= 20_000_000
    assert _max_orderkey(shifted) + 1 > mx + 20_000_000
