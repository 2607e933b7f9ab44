"""Constraint-check suite: per-constraint semantics (NULL handling,
boundaries, duplicate surplus, FK orphans), single-aggregate plan
shape, and empty-input behavior."""

from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.checks import (
    check_constraints,
    check_foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    satisfies,
    unique,
)
from tests.test_plans import explain_str

SCHEMA = "id long, v double, status string"


def _suite(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = check_constraints(
        df,
        [
            not_null("v"),
            in_range("v", 0.0, 10.0),
            in_set("status", ["A", "B"]),
            matches("status", "^[A-Z]$"),
            unique(["id"]),
            satisfies("pos_id", F.col("id") > 0),
        ],
    )
    return {r["constraint"]: (r["n_rows"], r["n_violations"], r["passed"]) for r in out.collect()}


def test_constraint_semantics(spark):
    rows = [
        (1, 5.0, "A"),     # clean
        (2, None, "B"),    # null v: violates not_null only
        (3, -1.0, "ab"),   # range + matches + set violations
        (3, 11.0, "A"),    # dup id + range violation
        (-4, 0.0, None),   # boundary ok; NULL status never violates set/matches
    ]
    got = _suite(spark, rows)
    assert got["not_null:v"] == (5, 1, False)
    assert got["in_range:v"] == (5, 2, False)      # -1 and 11; NULL exempt
    assert got["in_set:status"] == (5, 1, False)   # 'ab'; NULL exempt
    assert got["matches:status"] == (5, 1, False)
    assert got["unique:id"] == (5, 1, False)       # one surplus row for id=3
    assert got["satisfies:pos_id"] == (5, 1, False)


def test_all_pass_and_empty_input(spark):
    got = _suite(spark, [(1, 1.0, "A"), (2, 2.0, "B")])
    assert all(v[1] == 0 and v[2] for v in got.values())
    got_empty = _suite(spark, [])
    assert all(v == (0, 0, True) for v in got_empty.values())


def test_multi_column_unique_counts_null_keys(spark):
    df = spark.createDataFrame(
        [(1, None, "A"), (1, None, "B"), (1, 2.0, "C")], SCHEMA
    )
    out = check_constraints(df, [unique(["id", "v"])]).collect()[0]
    # (1, NULL) appears twice -> one surplus, GROUP BY semantics
    assert out["n_violations"] == 1


def test_single_aggregate_single_scan(spark):
    df = spark.createDataFrame([(1, 1.0, "A")], SCHEMA)
    out = check_constraints(
        df,
        [
            not_null("v"),
            in_range("v", 0, 1),
            unique(["id"]),
            unique(["status"]),
            in_set("status", ["A"]),
        ],
    )
    plan = explain_str(out)
    import re

    assert len(re.findall(r"^\(\d+\) Scan", plan, flags=re.M)) == 1
    # two distinct keys ride ONE aggregate via the multi-distinct
    # Expand rewrite (a single unique() gets the cheaper
    # group-by-key rewrite with no Expand at all)
    assert "Expand" in plan


def test_foreign_key_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, ref long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = check_foreign_key(child, parent, ["ref"], ["pk"]).collect()[0]
    # 99 is an orphan; NULL ref never violates
    assert (out["n_rows"], out["n_violations"], out["passed"]) == (4, 1, False)
    plan = explain_str(
        check_foreign_key(child, parent, ["ref"], ["pk"])
    )
    assert "BroadcastHashJoin LeftAnti" in plan or "BroadcastHashJoin" in plan


def test_observe_constraints_piggybacks_on_the_action(spark):
    """The observed metrics equal the standalone one-aggregate suite,
    collected during an unrelated action (no second scan job)."""
    from impala_hashset_count_spark.operators.checks import (
        check_constraints,
        in_range,
        not_null,
        observe_constraints,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (None, 3.0)],
        "id bigint, v double",
    )
    checks = [not_null("id"), in_range("v", 0.0, 100.0)]
    observed, obs = observe_constraints(df, checks)
    # the "action the caller was going to run anyway"
    written = observed.filter("1 = 1").count()
    assert written == 4
    got = obs.get
    standalone = {
        r.constraint: r.n_violations
        for r in check_constraints(df, checks).collect()
    }
    assert got["n_rows"] == 4
    assert {k: v for k, v in got.items() if k != "n_rows"} == standalone


def test_sf100_cert_arg_parsing(tmp_path):
    """r8 ADVICE regression: an entry/arm target (contains os.sep) must
    NOT be consumed as the sf_dir, and the scale multiple must derive
    from the dir name instead of a hardcoded 1000x."""
    from tools.sf100_cert import parse_args

    sf10 = tmp_path / "sf10"
    sf10.mkdir()

    # no explicit sf_dir: the entry/arm target stays a target
    out, sf_dir, targets, mult = parse_args(
        ["OUT.json", "dedup_exact_stats/xsub", "dedup_minhash_lsh"]
    )
    assert targets == ["dedup_exact_stats/xsub", "dedup_minhash_lsh"]
    assert sf_dir.endswith("sf100") and mult == 1000.0

    # explicit non-sf100 dir: mult derives from the name
    out, sf_dir, targets, mult = parse_args(
        ["OUT.json", str(sf10), "corpus_stats_documents"]
    )
    assert sf_dir == str(sf10) and mult == 100.0
    assert targets == ["corpus_stats_documents"]
