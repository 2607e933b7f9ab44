#!/usr/bin/env python
"""Third-decade ground truth for PAIR-LOCAL dedup entries whose exact
all-pairs oracle cannot fit one box at 5M docs: run the SPARK side on
the FULL sf100 corpus, then hash-compare its output restricted to a
deterministic doc-id slice against the entry's own UNMODIFIED oracle
SQL evaluated over the sliced corpus.

Soundness (why full-run-restricted == slice-run ground truth for
`dedup_minhash_lsh`): every stage of that entry is a PAIRWISE property
of the two docs involved —
  - shingle sets and minhash signatures are per-doc (no corpus term);
  - a pair is an LSH candidate iff >= 1 of its 32 band hashes agree,
    a predicate of the two signatures alone (max_bucket_docs is None
    in the registered entry, so no bucket-population effect);
  - the hot/cold verification split is exact-preserving at every cap
    (bit-identical counts, tested), and exact Jaccard >= t is again a
    two-doc predicate.
So pairs(full corpus) ∩ slice x slice == pairs(slice corpus), exactly
— the identity tests/test_dedup_similarity.py asserts end-to-end at
sf0.01. The compare therefore certifies the REAL 5M-doc Spark
execution against true DuckDB ground truth on the slice. This is NOT
sound for corpus-global entries (boilerplate thresholds, corpus gram
duplication) — those go through tools/make_doc_slice.py + the
standard sweep on a genuinely smaller corpus instead.

Usage:
    python tools/sf100_slice_cert.py OUT.json [sf_dir] [k]
(k defaults to 10: a 500k-doc slice — the volume the sf10 sweep
proved fits the oracle's 80GB budget.)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.session import get_spark  # noqa: E402

import tests.oracle_harness as oh  # noqa: E402

ENTRIES = ["dedup_minhash_lsh"]


def _sliced_connection(sf_dir: str, k: int) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "SET memory_limit='"
        + os.environ.get("SPARK_GRAFT_SWEEP_DUCK_MEM", "48GB")
        + "'"
    )
    con.execute("SET temp_directory='/tmp/duckdb_sweep_tmp'")
    glob = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(glob):
        glob = os.path.join(glob, "*.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}') "
        f"WHERE doc_id % {k} = 0"
    )
    return con


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2 and os.path.isdir(sys.argv[2])
        else os.path.join(REPO, ".localdata", "sf100")
    )
    k = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 10

    queries = all_queries()
    spark = get_spark("sf100-slice-cert")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    oh.duckdb_connection = lambda _sf, _k=k: _sliced_connection(sf_dir, _k)

    results: dict[str, dict] = {}
    for name in ENTRIES:
        q = queries[name]

        def sliced_fn(s, d, _fn=q.fn, _k=k):
            full = _fn(s, d)
            return full.filter(
                (F.col("id_1") % _k == 0) & (F.col("id_2") % _k == 0)
            )

        t0 = time.perf_counter()
        phases: dict = {}
        try:
            oh.compare_query_folded(
                spark, sf_dir, name, sliced_fn, q.oracle, timings=phases
            )
            status = {"status": "MATCH", "mode": f"folded+doc-slice-k{k}"}
        except AssertionError as e:
            status = {"status": "MISMATCH", "reason": str(e)[:500]}
        except Exception as e:  # noqa: BLE001 - report
            status = {"status": "ERROR", "reason": f"{type(e).__name__}: {e}"[:500]}
        status["sec"] = round(time.perf_counter() - t0, 1)
        status.update(phases)
        results[name] = status
        print(json.dumps({"entry": name, **status}), flush=True)

    artifact = {
        "sf_dir": sf_dir,
        "slice_k": k,
        "comment": (
            "full-corpus Spark run, output restricted to the doc_id % k "
            "slice and hash-compared against the entry's own oracle SQL "
            "over the sliced corpus — sound for pair-local entries only "
            "(see module docstring); spark_sec covers the FULL-corpus "
            "execution"
        ),
        "entries": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
