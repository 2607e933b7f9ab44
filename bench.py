#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <float>}

Each query is materialized with the noop sink (full execution, no
driver-side collect cost). A tiny warm-up query first amortizes JVM/
codegen startup out of the per-query numbers; each query then runs
twice and reports the min — the first run pays one-off Janino
compilation of its generated code (seconds for the wide signature
expressions), which is plan-compile cost, not per-byte execution cost,
and would dominate tiny-SF timings while being irrelevant at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("ihc-spark-bench")

    queries = {n: q for n, q in all_queries().items() if q.headline}

    # Warm-up: session, codegen, parquet footer caches.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    materialize(queries["multi_distinct_lineitem"].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(q.fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            # Builders that persist intermediates (e.g. minhash doc
            # arrays) would otherwise accumulate a live cached copy per
            # iteration, pressuring memory and skewing later queries.
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
