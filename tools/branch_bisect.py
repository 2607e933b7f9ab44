#!/usr/bin/env python
"""Per-branch cost bisect for a BRANCH_SPLIT oracle at a volume SF:
run each top-level UNION ALL branch of an entry's oracle on its own
fresh DuckDB connection (no Spark side at all) and report wall time,
row count, and the peak size of the DuckDB temp directory — ground
truth for WHICH branch of a multi-branch oracle out-spills the box,
instead of inferring it from where the sweep's cursor died.

Usage:
    python tools/branch_bisect.py <sf_dir> <entry> [branch_idx ...]
Env:
    SPARK_GRAFT_SWEEP_DUCK_MEM  memory_limit per branch (default 80GB)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TMP = "/tmp/duckdb_sweep_tmp"


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


class _PeakSampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.peak = 0
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, _du(TMP))
            self._stop.wait(2.0)

    def stop(self):
        self._stop.set()


def main() -> None:
    sf_dir, entry = sys.argv[1], sys.argv[2]
    picks = [int(x) for x in sys.argv[3:]]

    from impala_hashset_count_spark.plans import all_queries
    from tools.sf1_oracle_sweep import (
        _SequentialBranches,
        _duckdb_connection_dirs,
    )

    pre, brs = _SequentialBranches._split(all_queries()[entry].oracle)
    idxs = picks or list(range(len(brs)))
    for i in idxs:
        first = brs[i].strip().splitlines()[0][:70]
        con = _duckdb_connection_dirs(sf_dir)
        sampler = _PeakSampler()
        sampler.start()
        t0 = time.perf_counter()
        try:
            res = con.execute(pre + brs[i])
            n = 0
            while True:
                chunk = res.fetchmany(8192)
                if not chunk:
                    break
                n += len(chunk)
            status = {"rows": n}
        except Exception as e:  # noqa: BLE001 - report and continue
            status = {"error": f"{type(e).__name__}: {e}"[:200]}
        finally:
            sampler.stop()
            con.close()
        print(
            json.dumps(
                {
                    "branch": i,
                    "head": first,
                    "sec": round(time.perf_counter() - t0, 1),
                    "peak_temp_gb": round(sampler.peak / 1e9, 1),
                    **status,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
