#!/usr/bin/env python
"""Round-9 measurement probe (not part of the product):
1. Run dedup_minhash_lsh once and dump the AQE-final executed plan --
   does runtime stage reuse already collapse the 4 hot_h aggregates
   and 2 sizes aggregates, or do they re-execute?
2. Interleaved A/B of the corpus bigram branch: scored side widened
   vs not.
"""
from __future__ import annotations

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
    spark = get_spark("r09-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    q = all_queries()["dedup_minhash_lsh"]
    df = q.fn(spark, SF)
    t0 = time.perf_counter()
    noop(df)
    print(f"minhash full run: {time.perf_counter() - t0:.3f}s", flush=True)
    ep = df._jdf.queryExecution().executedPlan().toString()
    n_reuse = ep.count("ReusedExchange") + ep.count("ReusedQueryStage")
    n_aggdf = ep.count("__df")
    print(f"executedPlan: {len(ep)} chars, reuse nodes={n_reuse}, __df refs={n_aggdf}")
    with open("/tmp/minhash_executed_plan.txt", "w") as f:
        f.write(ep)
    spark.catalog.clearCache()

    # --- bigram A/B -------------------------------------------------
    from impala_hashset_count_spark.operators.corpus_stats import (
        bigram_logprob_scores,
        tfidf_top_terms,
        unigram_logprob_scores,
    )
    from impala_hashset_count_spark.sources.tables import (
        load_table,
        widen_small_scan,
    )
    from pyspark.sql import functions as F

    d = load_table(spark, SF, "documents")
    w = widen_small_scan(d, SF, "documents")
    train = d.filter(F.col("doc_id") % 20 == 0)

    cases = {
        "bigram/base": lambda: bigram_logprob_scores(d, train, component_scores=True),
        "bigram/wide": lambda: bigram_logprob_scores(w, train, component_scores=True),
        "tfidf/base": lambda: tfidf_top_terms(d, k=3, component_scores=True),
        "tfidf/wide": lambda: tfidf_top_terms(w, k=3, component_scores=True),
        "unigram/base": lambda: unigram_logprob_scores(d, component_scores=True),
        "unigram/wide": lambda: unigram_logprob_scores(w, component_scores=True),
    }
    for fn in cases.values():
        noop(fn())  # warm codegen for both shapes
    times = {k: [] for k in cases}
    for rep in range(5):
        for name, fn in cases.items():
            t0 = time.perf_counter()
            noop(fn())
            times[name].append(round(time.perf_counter() - t0, 3))
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
