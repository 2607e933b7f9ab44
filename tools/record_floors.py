#!/usr/bin/env python
"""Record per-query comparison floors: run ``bench.py`` N times on an
idle box (each invocation is itself min-of-SPARK_GRAFT_REPS per
query), take the min per query and per arm across invocations, and
write a ``BASELINE_LOCAL_r{N}.json``-shaped artifact.

This institutionalizes the floors protocol the round-5/6 verdicts
asked for (one floor file per bench surface, recorded AFTER the
round's final query definitions, so driver-to-floor ratios compare a
query against ITS OWN definition, never a faster predecessor's).

Usage: python tools/record_floors.py OUT.json [invocations=3] [--comment "..."]
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_path = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 3
    comment = ""
    if "--comment" in sys.argv:
        comment = sys.argv[sys.argv.index("--comment") + 1]

    runs = []
    for i in range(n):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, check=True,
        )
        line = proc.stdout.strip().splitlines()[-1]
        run = json.loads(line)
        runs.append(run)
        print(f"run {i + 1}/{n}: total {run['value']}s", flush=True)

    floors = {
        q: min(r["queries"][q] for r in runs) for q in runs[0]["queries"]
    }
    arms = {}
    if "arms" in runs[0]:
        arms = {
            a: min(r["arms"][a] for r in runs) for a in runs[0]["arms"]
        }
    artifact = {
        "comment": comment,
        "sf": runs[0]["sf"],
        "unit": "sec",
        "runs": runs,
        "floors": floors,
        "floor_total": round(sum(floors.values()), 3),
        "arms": arms,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"wrote {out_path}: floor_total {artifact['floor_total']}s")


if __name__ == "__main__":
    main()
