#!/usr/bin/env python
"""Third-decade (sf100) certification of named registry entries/arms:
time each target's Spark plan end-to-end (noop sink, full execution)
at a 1000x dataset and compare against 1000x-linear of its recorded
sf0.1 floor — the r7 verdict's #1 ask (the LLM-pipeline stack's
deepest certified decade was sf10 while TPC-H reached sf100).

Correctness at sf100 is certified separately by the oracle sweep
(tools/sf1_oracle_sweep.py .localdata/sf100 <names>) — this tool is
the TIMING half, scoped to named targets because bench.py's subset
mode times every arm of a selected entry (at sf100 that is minutes
per arm the certification doesn't need).

Usage:
    python tools/sf100_cert.py OUT.json [sf_dir] target [target ...]
where target is an entry name or entry/arm (e.g. dedup_exact_stats/xsub).
Floors are read from the newest BASELINE_LOCAL_r*.json; entries with no
floor line (non-headline) fall back to their arm line or are reported
without a budget.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from impala_hashset_count_spark.plans import all_queries  # noqa: E402
from impala_hashset_count_spark.session import get_spark  # noqa: E402


def _newest_floors() -> dict:
    files = glob.glob(os.path.join(REPO, "BASELINE_LOCAL_r*.json"))
    if not files:
        return {}
    newest = max(files, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    with open(newest) as f:
        art = json.load(f)
    return {**art.get("floors", {}), **art.get("arms", {})}


def parse_args(argv: list[str]) -> tuple[str, str, list[str], float]:
    """(out_path, sf_dir, targets, mult). An sf_dir is an existing
    directory; targets (entry or entry/arm) never are — so isdir, not
    os.sep, disambiguates (the entry/arm target syntax contains
    os.sep). The scale multiple vs the sf0.1 floor surface is derived
    from the dir name (sf100 -> 1000x), never hardcoded."""
    out_path = argv[0]
    rest = list(argv[1:])
    sf_dir = (
        rest.pop(0)
        if rest and os.path.isdir(rest[0])
        else os.path.join(REPO, ".localdata", "sf100")
    )
    targets = rest
    assert targets, "no targets given"
    m = re.search(r"sf(\d+(?:\.\d+)?)", os.path.basename(os.path.normpath(sf_dir)))
    assert m, f"cannot derive scale factor from sf_dir name: {sf_dir}"
    mult = float(m.group(1)) / 0.1
    return out_path, sf_dir, targets, mult


def main() -> None:
    out_path, sf_dir, targets, mult = parse_args(sys.argv[1:])

    floors = _newest_floors()
    queries = all_queries()
    spark = get_spark("sf100-cert")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict] = {}
    for t in targets:
        name, _, arm = t.partition("/")
        q = queries[name]
        build = q.arms[arm] if arm else q.fn
        t0 = time.perf_counter()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 1)
        floor = floors.get(t) or floors.get(name)
        budget = round(mult * floor, 1) if floor else None
        row = {"sec": sec, "floor_sf0_1": floor, "linear_budget": budget}
        if budget:
            row["ratio_vs_linear"] = round(sec / budget, 3)
        results[t] = row
        print(json.dumps({"target": t, **row}), flush=True)
        spark.catalog.clearCache()

    artifact = {
        "sf_dir": sf_dir,
        "comment": (
            "single-run sf100 Spark-side timings (noop sink) vs "
            "1000x-linear of the newest recorded sf0.1 floor; "
            "correctness at this scale is certified by the oracle "
            "sweep run separately"
        ),
        "targets": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
