"""SparkSession factory tuned for this engine.

Local mode is a correctness/dev harness; every knob here is chosen so the
same logical plans scale to a real cluster:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  dynamic broadcast) — the 100 TB safety net.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster
  AQE coalescing makes the static number mostly irrelevant.
- Session timezone pinned to UTC so results are comparable with the
  DuckDB oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled: every pandas UDF / applyInPandas / mapInPandas hop is
  Arrow-batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(app_name: str = "impala-hashset-count-spark") -> SparkSession:
    """Build (or reuse) the tuned local SparkSession."""
    cores = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an externally-created session.

    The driver hands ``entry(spark)`` a session we did not build; only
    runtime-mutable SQL confs can be set on it (not JVM-startup ones).
    """
    for key, value in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        # Static 200 is wrong for local mode; AQE coalesces upward-sized
        # partitions at runtime, so matching core count is the right floor.
        ("spark.sql.shuffle.partitions", str(default_parallelism())),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf may be static
            pass
    return spark
