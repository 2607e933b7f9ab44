"""The one-call session-init hook (`register.register_all`) — the
deployment-parity answer to the reference's catalog-persistent
``CREATE AGGREGATE FUNCTION`` (`/root/reference/README.md:25-33`):
Impala installs the aggregate once into its catalog; Spark's
programmatic UDAF registry is session-scoped, so the parity story is
one idempotent call wired where sessions are born. Proven here in a
genuinely FRESH subprocess session (not the suite's shared fixture,
which other tests have already registered functions into)."""

import subprocess
import sys

from pyspark.sql import functions as F

from impala_hashset_count_spark.register import register_all

_FRESH_SESSION_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from impala_hashset_count_spark.register import register_all

live = register_all(spark)
assert live["hashset_count"] and live["split_sentences"], live

spark.createDataFrame(
    [("a", "x"), ("a", "y"), ("a", None), ("b", "")],
    "k string, v string",
).createOrReplaceTempView("t")

# the full SQL surface after ONE call: the UDAF with the reference's
# string/NULL contract, and the UDTF in a LATERAL position
rows = sorted(
    tuple(r)
    for r in spark.sql(
        "SELECT k, hashset_count(v) AS c FROM t GROUP BY k"
    ).collect()
)
assert rows == [("a", "2"), ("b", "1")], rows

udtf = spark.sql(
    "SELECT s.sentence FROM VALUES ('One. Two.') AS v(txt), "
    "LATERAL split_sentences(v.txt) s"
).collect()
assert len(udtf) == 2, udtf

# idempotent re-init: second call must not error or change results
live2 = register_all(spark)
assert live2["hashset_count"]
rows2 = sorted(
    tuple(r)
    for r in spark.sql(
        "SELECT k, hashset_count(v) AS c FROM t GROUP BY k"
    ).collect()
)
assert rows2 == rows
print("FRESH_SESSION_OK", live.get("hashset_count_jvm"))
spark.stop()
"""


def test_register_all_in_fresh_session(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _FRESH_SESSION_SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FRESH_SESSION_OK" in proc.stdout


def test_register_all_idempotent_on_shared_session(spark):
    """On the suite's shared (already-initialized) session the call is
    a no-op that still reports every surface live — the property that
    lets session factories call it unconditionally."""
    live = register_all(spark, jvm=False)
    assert live["hashset_count"] and live["split_sentences"]
    df = spark.createDataFrame([("k", "v1"), ("k", "v1")], "k string, v string")
    df.createOrReplaceTempView("__reg_t")
    out = spark.sql(
        "SELECT hashset_count(v) AS c FROM __reg_t GROUP BY k"
    ).collect()
    assert [r["c"] for r in out] == ["1"]
