#!/usr/bin/env python
"""Round-10 interleaved timing probe (not part of the product).

Times a named set of registry entries and/or arms (``entry`` or
``entry/arm``) with the noop sink, INTERLEAVED round-robin across reps
so box-load spikes hit every candidate equally (the r9 methodology:
accept/reject on interleaved min-of-N, never on two separate absolute
runs).

Usage:
  python tools/r10_ab.py name[,name...] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = [s for s in sys.argv[1].split(",") if s]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    qs = all_queries()
    builders = {}
    for n in names:
        if "/" in n:
            entry, arm = n.split("/", 1)
            builders[n] = qs[entry].arms[arm]
        else:
            builders[n] = qs[n].fn
    spark = get_spark("r10-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    times: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"r10_ab {n} rep{rep}")
            t0 = time.perf_counter()
            noop(builders[n](spark, SF))
            times[n].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    out = {
        n: {"min": min(v), "med": sorted(v)[len(v) // 2], "all": v}
        for n, v in times.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
