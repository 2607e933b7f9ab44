#!/usr/bin/env python
"""Reproduce the order-dependent ngram_jaccard plan: count fresh,
then run a minhash pipeline once, then count again; dump both plans."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.plans.plan_stats import plan_counts  # noqa: E402
from impala_hashset_count_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("r09-order-repro")
    q = all_queries()["dedup_ngram_jaccard"]

    df1 = q.fn(spark, SF)
    print("fresh:", plan_counts(df1), flush=True)
    with open("/tmp/ngram_fresh.txt", "w") as f:
        f.write(df1._jdf.queryExecution().executedPlan().toString())

    # one minhash pipeline execution, as the dedup test does
    from impala_hashset_count_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " + ("x" * (i % 3)))
         for i in range(40)],
        "doc_id long, text string",
    )
    minhash_lsh_pairs(docs, "doc_id", "text").collect()

    df2 = q.fn(spark, SF)
    print("after:", plan_counts(df2), flush=True)
    with open("/tmp/ngram_after.txt", "w") as f:
        f.write(df2._jdf.queryExecution().executedPlan().toString())
    spark.stop()


if __name__ == "__main__":
    main()
