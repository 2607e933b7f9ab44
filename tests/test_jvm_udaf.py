"""JVM partial/merge tier of the faithful UDAF
(`operators/jvm_udaf.py` + `jvm/src/ihc/*.java`).

This is the 1:1 twin of the reference's partial-aggregate lifecycle
(`hashset-count.h:30-34`): zero/reduce == Init/Update, the buffer
encoder crossing the Exchange == Serialize, merge == Merge, finish ==
Finalize — asserted on the PHYSICAL PLAN (partial ObjectHashAggregate
below the exchange, final above), not just on values."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from impala_hashset_count_spark.operators.jvm_udaf import (
    ensure_jvm_jar,
    hashset_count_jvm_agg,
    register_jvm_udaf,
    try_register_jvm_udaf,
)

pytestmark = pytest.mark.skipif(
    shutil.which("javac") is None
    and not os.path.exists(
        os.path.join(os.path.dirname(__file__), "..", "jvm", "ihc-udaf.jar")
    ),
    reason="no javac and no prebuilt ihc-udaf.jar",
)


def test_jar_builds_and_registration_is_idempotent(spark):
    jar = ensure_jvm_jar()
    assert os.path.exists(jar)
    register_jvm_udaf(spark)
    register_jvm_udaf(spark)  # second call is a no-op
    assert try_register_jvm_udaf(spark) is True


def test_reference_contract_null_empty_and_nul_bytes(spark):
    """The reference's edge semantics through the JVM tier: NULL
    skipped, all-NULL group -> SQL NULL (not '0'), '' counts, embedded
    NUL bytes are ordinary characters (the trap the reference's
    \\0-terminated layout documents, README.md:9)."""
    register_jvm_udaf(spark)
    rows = [
        ("a", "x"), ("a", "y"), ("a", "x"), ("a", None),
        ("b", None),
        ("c", ""),
        ("d", "p\x00q"), ("d", "p"), ("d", "q"), ("d", "p\x00q"),
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        r.g: r.c
        for r in df.groupBy("g")
        .agg(hashset_count_jvm_agg("v").alias("c"))
        .collect()
    }
    assert got == {"a": "2", "b": None, "c": "1", "d": "3"}


def test_physical_plan_has_partial_merge_split(spark):
    """The point of the tier: a real partial aggregate below the
    exchange and a final merge above it — the structure the pandas
    UDAF cannot express (it ships whole groups to one worker)."""
    register_jvm_udaf(spark)
    df = spark.createDataFrame(
        [("g%d" % (i % 5), str(i % 97)) for i in range(1000)],
        "g string, v string",
    )
    out = df.groupBy("g").agg(hashset_count_jvm_agg("v").alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_hashset_count_jvm" in plan
    assert plan.count("ObjectHashAggregate") >= 2
    assert "Exchange" in plan
    # and the partial really sits BELOW the exchange
    assert plan.index("Exchange") < plan.index("partial_hashset_count_jvm")


def test_matches_count_distinct_on_lineitem(spark, sf_small):
    register_jvm_udaf(spark)
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
        "l_linestatus", F.col("l_partkey").cast("string").alias("v")
    )
    got = {
        r.l_linestatus: r.c
        for r in li.groupBy("l_linestatus")
        .agg(hashset_count_jvm_agg("v").alias("c"))
        .collect()
    }
    want = {
        r.l_linestatus: str(r.d)
        for r in li.groupBy("l_linestatus")
        .agg(F.count_distinct("v").alias("d"))
        .collect()
    }
    assert got == want


def test_survives_repartitioning_and_reuse_in_sql(spark):
    """Merge correctness is partitioning-independent, and the SQL name
    works in a second query in the same session."""
    register_jvm_udaf(spark)
    df = spark.createDataFrame(
        [("k", str(i % 13)) for i in range(500)], "g string, v string"
    )
    for parts in (1, 7, 32):
        got = (
            df.repartition(parts)
            .groupBy("g")
            .agg(hashset_count_jvm_agg("v").alias("c"))
            .collect()
        )
        assert got[0].c == "13"
    df.createOrReplaceTempView("jvm_t")
    assert (
        spark.sql(
            "SELECT hashset_count_jvm(v) AS c FROM jvm_t GROUP BY g"
        ).first().c
        == "13"
    )


def test_accepts_complex_column_expression(spark):
    """Column inputs route through F.call_udf, never through SQL-text
    reconstruction of Column._jc.toString() (a debug string that is
    not round-trippable for aliased/complex expressions)."""
    from pyspark.sql import functions as F

    from impala_hashset_count_spark.operators.jvm_udaf import (
        hashset_count_jvm_agg,
        try_register_jvm_udaf,
    )

    if not try_register_jvm_udaf(spark):
        import pytest

        pytest.skip("JVM tier unavailable")
    df = spark.createDataFrame(
        [("a", "x"), ("A", "x"), ("b", "x"), (None, "x")], "s string, g string"
    )
    # aliased + nested expression — the _jc.toString() path rendered
    # these as non-parseable SQL inside F.expr
    got = df.groupBy("g").agg(
        hashset_count_jvm_agg(F.upper(F.col("s")).alias("u")).alias("n")
    ).collect()
    assert got[0]["n"] == "2"


def test_front_coded_buffer_wire_format(spark):
    """The Serialize-boundary wire format (StringSetBuffer, r6): the
    front-coded sorted block must (a) round-trip byte-exactly through
    kryo for adversarial strings (empty, embedded NUL, non-BMP, long,
    shared prefixes), and (b) beat the stock kryo HashSet encoding on
    id-shaped keys — the 300k-cardinality fidelity scale the JVM tier
    exists for (reference README.md:11)."""
    ensure_jvm_jar()
    register_jvm_udaf(spark)  # loads the jar into the driver classloader
    jvm = spark._jvm
    kryo = jvm.com.esotericsoftware.kryo.Kryo()
    kryo.setRegistrationRequired(False)

    def serialize(obj):
        out = jvm.com.esotericsoftware.kryo.io.Output(1024, -1)
        kryo.writeObject(out, obj)
        return out.position(), out.toBytes()

    adv = [
        "", "a\x00b", "\x00", "\U0001f600\U0001f600",
        "user_1", "user_10", "user_100", "u" * 50, "a" * 1000,
    ]
    buf = jvm.ihc.StringSetBuffer()
    for s in adv:
        buf.add(s)
    _, data = serialize(buf)
    back = kryo.readObject(
        jvm.com.esotericsoftware.kryo.io.Input(data), buf.getClass()
    )
    assert back.size() == len(set(adv))
    # element-level equality: union with the original adds nothing
    assert back.union(buf).size() == len(set(adv))

    n = 5000
    hs = jvm.java.util.HashSet()
    fc = jvm.ihc.StringSetBuffer()
    for i in range(n):
        s = f"user_{i:09d}"
        hs.add(s)
        fc.add(s)
    sz_hs, _ = serialize(hs)
    sz_fc, _ = serialize(fc)
    # measured ~0.19x at n=30k; assert a conservative bound
    assert sz_fc < 0.5 * sz_hs, (sz_fc, sz_hs)


def test_jvm_guarded_routes_by_group_ndv_and_stays_exact(spark):
    """The JVM tier's production guard routes by per-group DISTINCT
    cardinality (the reference's own degradation axis — README.md:10-11
    — not group size, which the partial/merge split already handles):
    one high-NDV group must take the tier-a codegen route, the
    moderate-NDV groups the JVM lifecycle, and the merged output must
    equal exact distinct counts under the reference's string/NULL
    contract. A NULL group key rides the hot route (eqNullSafe)."""
    from impala_hashset_count_spark.operators.jvm_udaf import (
        hashset_count_jvm_guarded,
    )

    register_jvm_udaf(spark)
    rows = (
        [("hot", str(i)) for i in range(5000)]          # NDV 5000
        + [("warm", str(i % 40)) for i in range(400)]   # NDV 40
        + [(None, str(i)) for i in range(3000)]         # NULL key, NDV 3000
        + [("allnull", None)] * 10                      # all-NULL -> NULL
    )
    df = spark.createDataFrame(rows, "g string, v string").repartition(8)
    out = hashset_count_jvm_guarded(
        df, ["g"], "v", max_group_ndv=1000, rsd=0.02
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both routes in one plan: the JVM Aggregator leg and the
    # codegen'd count(distinct) leg
    assert "partial_hashset_count_jvm" in plan
    assert "count(distinct" in plan or "count(DISTINCT" in plan
    got = {r.g: r.hashset_count for r in out.collect()}
    assert got == {"hot": "5000", "warm": "40", None: "3000",
                   "allnull": None}
    # the routing had work on both sides: hot+NULL groups exceeded the
    # threshold, warm/allnull stayed under it
    ndv = {
        r.g: r.d
        for r in df.groupBy("g")
        .agg(F.count_distinct("v").alias("d"))
        .collect()
    }
    assert sum(1 for v in ndv.values() if v > 1000) == 2
    assert sum(1 for v in ndv.values() if v <= 1000) == 2
