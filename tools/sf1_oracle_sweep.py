#!/usr/bin/env python
"""Full-registry oracle sweep at sf1 (10x the driver's bench SF):
run every registered query on Spark AND its DuckDB oracle over the
`tools/gen_sf1.py` data and compare with the driver-gate replica
(`tests/oracle_harness.compare_query` — row count, column names,
order-insensitive exact values).

The per-round driver gate runs at sf0.01; this sweep exists to verify
the correctness conventions are genuinely SF-insensitive at volume —
quantized surfaces stay engine-bit-stable, threshold booleans
(sketch-accuracy bounds, ANN recall floors) hold on 10x data, guards
fire without changing answers. Entries are compared independently;
failures are REPORTED with their reason, not raised, because two
classes are expected to be SF-sensitive by construction and are
documented as such:

- plain-SQL float SUMs (tpch_q1's sum_disc_price) are summation-order
  dependent at millions of rows — exactly the effect the repo's
  quantized-addend convention avoids on its own hashed surfaces;
- threshold booleans are calibrated as properties of the driver SFs.

Usage:
    python tools/sf1_oracle_sweep.py [sf1_dir] [name_filter ...]
Writes one JSON line per entry to stdout and a summary line at the
end."""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.session import get_spark  # noqa: E402
from impala_hashset_count_spark.sources.tables import TABLES  # noqa: E402

import tests.oracle_harness as oh  # noqa: E402


def _duckdb_connection_dirs(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """gen_sf1.py writes Spark directory tables; register views over
    the part files (the sf0.x harness reads single-file tables)."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet/*.parquet')"
        )
    return con


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    name_filter = sys.argv[2:]
    oh.duckdb_connection = _duckdb_connection_dirs

    spark = get_spark("sf1-oracle-sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = all_queries()
    names = [
        n
        for n in sorted(queries)
        if not name_filter or any(f in n for f in name_filter)
    ]
    results: dict[str, dict] = {}
    for name in names:
        q = queries[name]
        t0 = time.perf_counter()
        try:
            oh.compare_query(spark, sf_dir, name, q.fn, q.oracle)
            status = {"status": "MATCH"}
        except AssertionError as e:
            status = {"status": "MISMATCH", "reason": str(e)[:500]}
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            status = {
                "status": "ERROR",
                "reason": f"{type(e).__name__}: {e}"[:500],
                "trace": traceback.format_exc()[-800:],
            }
        status["sec"] = round(time.perf_counter() - t0, 1)
        results[name] = status
        print(json.dumps({"entry": name, **status}), flush=True)
        spark.catalog.clearCache()

    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    print(
        json.dumps(
            {
                "summary": f"{n_match}/{len(results)} MATCH",
                "mismatches": [
                    n for n, r in results.items() if r["status"] != "MATCH"
                ],
                "total_sec": round(sum(r["sec"] for r in results.values()), 1),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
