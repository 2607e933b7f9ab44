"""Plan-shape regression gate: every registry entry's physical plan
must not GROW its shuffle / broadcast / Python-stage / sort counts
past the recorded baseline (`plan_budgets.json`, written by
`tools/record_plan_budgets.py`).

This is the institutional form of two past findings: the round-5
decontamination arm regression (Catalyst inlined a tokenization UDF
under an explode — +2 Python evaluations, 15x slower, value-identical)
and the general fact that at 100 TB an extra exchange is the cost
model, not a detail. Value tests cannot see these; the plan can.

On a DELIBERATE plan change: re-run the recorder, eyeball the diff,
commit the JSON with the change. A count DECREASE also fails — not
because faster is bad, but because an unexplained structural change in
either direction means the recorded intent is stale; re-record it.
"""

import json
import os

import pytest

from impala_hashset_count_spark.plans import all_queries
from impala_hashset_count_spark.plans.plan_stats import plan_counts

QUERIES = all_queries()
_BUDGET_PATH = os.path.join(os.path.dirname(__file__), "plan_budgets.json")
with open(_BUDGET_PATH) as _f:
    BUDGETS = json.load(_f)


def test_budget_file_covers_registry():
    missing = sorted(set(QUERIES) - set(BUDGETS))
    stale = sorted(set(BUDGETS) - set(QUERIES))
    assert not missing and not stale, (
        f"plan_budgets.json out of sync (missing={missing}, "
        f"stale={stale}) — run tools/record_plan_budgets.py"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_entry_plan_within_budget(spark, sf_small, name):
    # Budgets are recorded against a clean CacheManager (the recorder
    # uses a fresh session). A leaked intra-query cache from an earlier
    # test (e.g. ngram_jaccard_pairs' shingle-stream cache) substitutes
    # InMemoryRelation fragments into this entry's plan and shifts the
    # counts (observed: dedup_ngram_jaccard 25 -> 33 shuffles when run
    # right after test_dedup_similarity) — clear it so the assertion is
    # order-independent.
    spark.catalog.clearCache()
    actual = plan_counts(QUERIES[name].fn(spark, sf_small))
    budget = BUDGETS[name]
    assert actual == budget, (
        f"{name}: plan shape changed vs recorded budget "
        f"(actual={actual}, recorded={budget}). If deliberate, "
        f"re-run tools/record_plan_budgets.py and commit the diff; "
        f"if not, a rewrite or optimizer interaction just added "
        f"real cost at scale."
    )
