"""CDC apply / MERGE INTO semantics (`operators/merge.py`)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.merge import (
    apply_changes,
    latest_changes,
    merge_scd2,
)

TARGET = [
    (1, "alice", 10.0),
    (2, "bob", 20.0),
    (3, "carol", 30.0),
    (4, "dave", 40.0),
]
# op: U = upsert, D = delete
CHANGES = [
    (2, "bobby", 25.0, "U"),   # update existing
    (3, None, None, "D"),      # delete existing
    (5, "eve", 50.0, "U"),     # insert new
    (9, None, None, "D"),      # delete of absent key: no-op
]


def _frames(spark):
    t = spark.createDataFrame(TARGET, ["id", "name", "score"])
    c = spark.createDataFrame(CHANGES, ["id", "name", "score", "op"])
    return t, c


def test_apply_changes_semantics(spark):
    t, c = _frames(spark)
    out = sorted(map(tuple, apply_changes(t, c, ["id"]).collect()))
    assert out == [
        (1, "alice", 10.0),
        (2, "bobby", 25.0),
        (4, "dave", 40.0),
        (5, "eve", 50.0),
    ]


def test_apply_changes_matches_sql_merge_semantics(spark):
    """The DataFrame merge equals the standard SQL formulation
    (anti-join survivors UNION non-delete changes) run on DuckDB."""
    t, c = _frames(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, name VARCHAR, score DOUBLE)")
    con.execute("CREATE TABLE c(id BIGINT, name VARCHAR, score DOUBLE, op VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", TARGET)
    con.executemany("INSERT INTO c VALUES (?,?,?,?)", CHANGES)
    oracle = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT id, name, score FROM t
            WHERE id NOT IN (SELECT id FROM c)
            UNION ALL
            SELECT id, name, score FROM c WHERE op <> 'D'
            """
        ).fetchall()
    )
    out = sorted(map(tuple, apply_changes(t, c, ["id"]).collect()))
    assert out == oracle


def test_apply_changes_rejects_nothing_but_is_idempotent(spark):
    """Applying the same collapsed batch twice yields the same
    snapshot — the property a foreachBatch retry relies on."""
    t, c = _frames(spark)
    once = apply_changes(t, c, ["id"])
    twice = apply_changes(once, c, ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_apply_changes_broadcasts_antijoin(spark):
    t, c = _frames(spark)
    plan = apply_changes(t, c, ["id"])._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_latest_changes_collapses_log(spark):
    log = spark.createDataFrame(
        [
            (7, "v1", 1.0, "U", 1),
            (7, "v2", 2.0, "U", 2),
            (7, None, None, "D", 3),
            (8, "w1", 1.0, "U", 5),
            (8, "w2", 9.0, "U", 4),  # out-of-order arrival; seq wins
        ],
        ["id", "name", "score", "op", "seq"],
    )
    out = {r.id: (r.op, r.name) for r in latest_changes(log, ["id"], "seq").collect()}
    assert out == {7: ("D", None), 8: ("U", "w1")}


@pytest.mark.parametrize("parts", [2, 8])
def test_merge_scd2_two_batches(spark, parts):
    """Two sequential SCD2 batches: history rows accumulate, exactly
    one current version per live key, closed rows carry the closing
    sequence."""
    empty = spark.createDataFrame(
        [], "id long, name string, score double, valid_from long, "
        "valid_to long, is_current boolean"
    )
    b1 = spark.createDataFrame(
        [(1, "a0", 1.0, "U", 10), (2, "b0", 2.0, "U", 10)],
        ["id", "name", "score", "op", "seq"],
    ).repartition(parts)
    b2 = spark.createDataFrame(
        [(1, "a1", 1.5, "U", 20), (2, None, None, "D", 20), (3, "c0", 3.0, "U", 20)],
        ["id", "name", "score", "op", "seq"],
    ).repartition(parts)

    s1 = merge_scd2(empty, b1, ["id"], "seq")
    s2 = merge_scd2(s1, b2, ["id"], "seq")
    rows = sorted(map(tuple, s2.collect()))
    assert rows == [
        (1, "a0", 1.0, 10, 20, False),
        (1, "a1", 1.5, 20, None, True),
        (2, "b0", 2.0, 10, 20, False),
        (3, "c0", 3.0, 20, None, True),
    ]
    # current view of SCD2 == apply_changes over the same batches
    flat0 = spark.createDataFrame([], "id long, name string, score double")
    flat = apply_changes(
        apply_changes(flat0, b1.drop("seq"), ["id"]), b2.drop("seq"), ["id"]
    )
    current = s2.filter(F.col("is_current")).select("id", "name", "score")
    assert sorted(map(tuple, current.collect())) == sorted(
        map(tuple, flat.collect())
    )


def test_merge_empty_sides(spark):
    t, c = _frames(spark)
    none = c.filter(F.lit(False))
    assert sorted(map(tuple, apply_changes(t, none, ["id"]).collect())) == sorted(
        TARGET
    )
    empty_t = t.filter(F.lit(False))
    out = sorted(map(tuple, apply_changes(empty_t, c, ["id"]).collect()))
    assert out == [(2, "bobby", 25.0), (5, "eve", 50.0)]


def test_property_apply_changes_matches_dict_model(spark):
    """Property check (hypothesis): for arbitrary snapshots and change
    logs — duplicate keys in the log, deletes of absent keys, NULL
    payloads — collapsing then applying equals the obvious Python dict
    model."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys = st.integers(min_value=0, max_value=9)
    target_strategy = st.dictionaries(keys, st.text(max_size=4), max_size=8)
    log_strategy = st.lists(
        st.tuples(
            keys,
            st.one_of(st.none(), st.text(max_size=4)),
            st.sampled_from(["U", "D"]),
        ),
        max_size=15,
    )

    @given(target=target_strategy, log=log_strategy)
    @settings(
        max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
    )
    def check(target, log):
        model = dict(target)
        for key, name, op in log:  # seq = position in the log
            if op == "D":
                model.pop(key, None)
            else:
                model[key] = name
        t = spark.createDataFrame(
            [(k, v) for k, v in target.items()] or [], "id long, name string"
        )
        c = spark.createDataFrame(
            [(k, n, op, i) for i, (k, n, op) in enumerate(log)] or [],
            "id long, name string, op string, seq long",
        )
        out = apply_changes(t, latest_changes(c, ["id"], "seq"), ["id"])
        assert sorted(map(tuple, out.collect())) == sorted(model.items())

    check()


def test_apply_changes_composite_key(spark):
    """Multi-column keys: the membership test is on the key TUPLE."""
    t = spark.createDataFrame(
        [(1, "x", "a"), (1, "y", "b"), (2, "x", "c")],
        "k1 long, k2 string, payload string",
    )
    c = spark.createDataFrame(
        [(1, "x", "a2", "U"), (2, "x", None, "D"), (3, "z", "d", "U")],
        "k1 long, k2 string, payload string, op string",
    )
    out = sorted(map(tuple, apply_changes(t, c, ["k1", "k2"]).collect()))
    assert out == [(1, "x", "a2"), (1, "y", "b"), (3, "z", "d")]


def test_diff_snapshots_roundtrip_law(spark):
    """apply_changes(old, diff_snapshots(old, new)) == new, on random
    snapshots including NULL values and key-only changes."""
    import random

    from impala_hashset_count_spark.operators.merge import (
        apply_changes,
        diff_snapshots,
    )

    rng = random.Random(11)
    old_rows = [(k, rng.choice(["a", "b", None]), rng.randint(0, 5))
                for k in range(40)]
    new_rows = []
    for k, s, v in old_rows:
        r = rng.random()
        if r < 0.25:
            continue                       # deleted
        if r < 0.5:
            new_rows.append((k, rng.choice(["a", "z", None]), v + 1))  # updated
        else:
            new_rows.append((k, s, v))     # unchanged
    new_rows += [(k, "new", 0) for k in range(100, 110)]  # inserts
    schema = "k bigint, s string, v bigint"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    diff = diff_snapshots(old, new, ["k"])
    rebuilt = apply_changes(old, diff, ["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(new_rows)
    # minimality: value-identical keys emit no change row
    unchanged = {k for (k, s, v) in old_rows
                 if (k, s, v) in set(new_rows)}
    assert not any(r.k in unchanged for r in diff.collect())
    # ops are exactly I/U/D and deletes carry the old values
    ops = {r.k: r.op for r in diff.collect()}
    assert set(ops.values()) <= {"I", "U", "D"}
    old_by_k = {k: (s, v) for k, s, v in old_rows}
    for r in diff.collect():
        if r.op == "D":
            assert (r.s, r.v) == old_by_k[r.k]


def test_diff_snapshots_null_value_transitions(spark):
    """NULL -> value and value -> NULL are UPDATES (null-safe compare);
    NULL == NULL is unchanged."""
    from impala_hashset_count_spark.operators.merge import diff_snapshots

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "k bigint, s string"
    )
    new = spark.createDataFrame(
        [(1, "now"), (2, None), (3, None)], "k bigint, s string"
    )
    diff = {r.k: (r.op, r.s) for r in diff_snapshots(old, new, ["k"]).collect()}
    assert diff == {1: ("U", "now"), 2: ("U", None)}


def test_diff_snapshots_null_keys_roundtrip(spark):
    """NULL KEYS (not just NULL values): the full-outer join matches
    null-safely and presence is detected via marker columns, so a
    NULL-keyed row diffs and round-trips like any other key — old-only
    NULL key emits 'D', new-only emits 'I', changed emits 'U', and
    apply_changes (null-safe anti join) replays all three."""
    from impala_hashset_count_spark.operators.merge import (
        apply_changes,
        diff_snapshots,
    )

    schema = "k bigint, s string"
    cases = [
        # (old rows, new rows, expected op for the NULL key)
        ([(None, "gone"), (1, "a")], [(1, "a")], "D"),
        ([(1, "a")], [(None, "born"), (1, "a")], "I"),
        ([(None, "v1"), (1, "a")], [(None, "v2"), (1, "a")], "U"),
        ([(None, "same"), (1, "a")], [(None, "same"), (1, "a")], None),
    ]
    for old_rows, new_rows, want_op in cases:
        old = spark.createDataFrame(old_rows, schema)
        new = spark.createDataFrame(new_rows, schema)
        diff = diff_snapshots(old, new, ["k"])
        null_ops = [r.op for r in diff.collect() if r.k is None]
        if want_op is None:
            assert null_ops == [], (old_rows, new_rows, null_ops)
        else:
            assert null_ops == [want_op], (old_rows, new_rows, null_ops)
        rebuilt = apply_changes(old, diff, ["k"])
        assert sorted(map(tuple, rebuilt.collect()), key=str) == sorted(
            new_rows, key=str
        ), (old_rows, new_rows)
