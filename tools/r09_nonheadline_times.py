#!/usr/bin/env python
"""One-shot sf0.1 timing sweep of the NON-headline registry entries
(noop sink, min-of-2) — the optimization round's examination evidence
for the entries the headline bench does not time."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("r09-nonheadline")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name, q in sorted(all_queries().items()):
        if q.headline:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            q.fn(spark, SF).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
