#!/usr/bin/env python
"""Record every registry entry's physical-plan node counts into
`tests/plan_budgets.json` — the baseline `tests/test_plan_budget.py`
gates against (fail on GROWTH, pass on improvement).

Run after any DELIBERATE plan change (new arm, rewritten operator),
review the diff — an unexplained +1 shuffle in an entry you did not
touch is exactly the regression class this gate exists for — and
commit the JSON alongside the change.

Usage: python tools/record_plan_budgets.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001 — the suite's sf_small).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.plans.plan_stats import plan_counts  # noqa: E402
from impala_hashset_count_spark.session import get_spark  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "plan_budgets.json",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-budgets")
    budgets: dict[str, dict[str, int]] = {}
    for name, q in sorted(all_queries().items()):
        budgets[name] = plan_counts(q.fn(spark, sf_dir))
        print(name, budgets[name], flush=True)
    with open(OUT, "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT} ({len(budgets)} entries)")
    spark.stop()


if __name__ == "__main__":
    main()
