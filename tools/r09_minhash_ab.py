#!/usr/bin/env python
"""A/B the round-9 minhash single-pass verification stats: base
(stats subtrees re-embedded per consumer — monkeypatched identity)
vs ckpt (_ckpt_verify_stats live). Interleaved min-of-N at sf0.1,
equality check at sf0.001/sf0.01."""
from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from impala_hashset_count_spark.operators import dedup  # noqa: E402
from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.session import get_spark  # noqa: E402

REAL = dedup._ckpt_verify_stats
FAKE = lambda hot_h, sizes, mode: (hot_h, sizes)  # noqa: E731


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def canon_md5(df) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> None:
    spark = get_spark("r09-minhash-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    q = all_queries()["dedup_minhash_lsh"]

    for sf in ("sf0.001", "sf0.01"):
        sfd = f"/root/testdata/{sf}"
        dedup._ckpt_verify_stats = FAKE
        h_base = canon_md5(q.fn(spark, sfd))
        dedup._ckpt_verify_stats = REAL
        h_ckpt = canon_md5(q.fn(spark, sfd))
        print(f"{sf}: base={h_base} ckpt={h_ckpt} "
              f"{'MATCH' if h_base == h_ckpt else 'MISMATCH'}", flush=True)
        spark.catalog.clearCache()

    sfd = "/root/testdata/sf0.1"
    for impl in (FAKE, REAL):  # warm both shapes
        dedup._ckpt_verify_stats = impl
        noop(q.fn(spark, sfd))
        spark.catalog.clearCache()
    times = {"base": [], "ckpt": []}
    for rep in range(5):
        for name, impl in (("base", FAKE), ("ckpt", REAL)):
            dedup._ckpt_verify_stats = impl
            t0 = time.perf_counter()
            noop(q.fn(spark, sfd))
            times[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    for name, ts in times.items():
        print(f"minhash {name}: min={min(ts):.3f} all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
