"""Fold N bench sweep JSONs into the committed per-key MEDIAN baseline
(round-11 methodology, BASELINE.md): each input is one full `python
bench.py` artifact (BENCH_last.json shape); the output's per-key time
is the median across sweeps, total is the sum of medians.

Usage: python tools/bench_median.py sweep1.json sweep2.json sweep3.json \
           > BENCH_local.json
"""

from __future__ import annotations

import json
import statistics
import sys


def main(paths: list[str]) -> int:
    if len(paths) < 2:
        raise SystemExit("need >=2 sweep artifacts")
    sweeps = []
    for p in paths:
        with open(p) as f:
            sweeps.append(json.load(f))
    keys = set(sweeps[0]["queries"])
    for s in sweeps[1:]:
        if set(s["queries"]) != keys:
            raise SystemExit("sweeps cover different key sets — rerun")
    med = {
        k: round(statistics.median(s["queries"][k] for s in sweeps), 3)
        for k in sorted(keys)
    }
    out = {
        "metric": sweeps[0].get("metric", "bench_full_suite"),
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "sf": sweeps[0].get("sf"),
        "n_queries": len(med),
        "stat": f"per-key median of {len(paths)} idle sweeps",
        "queries": med,
    }
    json.dump(out, sys.stdout, indent=1)
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
