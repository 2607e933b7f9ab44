#!/usr/bin/env python
"""Capture `.explain("formatted")` for headline queries (and optionally
named arms) into plans/<tag>/<name>_<suffix>.txt — the optimization
round's before/after plan evidence.

Usage:
  python tools/capture_plans.py plans/r09 before [query[,query...]]
(default: every headline query; 'all' adds non-headline entries too)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    want = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    for name, q in sorted(all_queries().items()):
        if want is not None:
            if name not in want and "all" not in want:
                continue
        elif not q.headline:
            continue
        df = q.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
