"""Fold N bench sweep JSONs into the committed per-key MEDIAN baseline
(round-11 methodology, BASELINE.md): each input is one full `python
bench.py` artifact (BENCH_last.json shape); the output's per-key time
is the median across sweeps, total is the sum of medians.

Usage:
  python tools/bench_median.py sweep1.json sweep2.json sweep3.json \
      > BENCH_local.json                      # median to stdout (legacy)
  python tools/bench_median.py sweep*.json --commit
      # round-close mode (ADVICE r12): writes BENCH_local.json (median
      # baseline), BENCH_committed.json and BENCH_last.json (the LAST
      # sweep) from the SAME sweep dicts, cross-tied by content hash:
      #   BENCH_local.json  carries sweep_hashes = [sha256(queries)]
      #                     of every input sweep;
      #   BENCH_committed/  carries sweep_sha256 = the hash of its own
      #   BENCH_last        queries dict, which must be a MEMBER of
      #                     the baseline's sweep_hashes.
      # tests/test_bench_contract.py verifies both properties, so a
      # hand-curated committed artifact can no longer masquerade as a
      # measured sweep — forging it would require faking the baseline
      # it is gated against.
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sweep_hash(sweep: dict) -> str:
    """Canonical content hash of one sweep's per-key timings — the
    provenance token tying BENCH_committed.json to the exact sweep
    that fed the median baseline."""
    canon = json.dumps(sweep["queries"], sort_keys=True)
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


def fold(sweeps: list[dict]) -> dict:
    keys = set(sweeps[0]["queries"])
    for s in sweeps[1:]:
        if set(s["queries"]) != keys:
            raise SystemExit("sweeps cover different key sets — rerun")
    med = {
        k: round(statistics.median(s["queries"][k] for s in sweeps), 3)
        for k in sorted(keys)
    }
    return {
        "metric": sweeps[0].get("metric", "bench_full_suite"),
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "sf": sweeps[0].get("sf"),
        "n_queries": len(med),
        "stat": f"per-key median of {len(sweeps)} idle sweeps",
        "sweep_hashes": [sweep_hash(s) for s in sweeps],
        "queries": med,
    }


def main(argv: list[str]) -> int:
    commit = "--commit" in argv
    paths = [a for a in argv if a != "--commit"]
    if len(paths) < 2:
        raise SystemExit("need >=2 sweep artifacts")
    sweeps = []
    for p in paths:
        with open(p) as f:
            sweeps.append(json.load(f))
    out = fold(sweeps)
    if not commit:
        json.dump(out, sys.stdout, indent=1)
        print()
        return 0
    # round-close mode: all three artifacts from the same sweep dicts
    last = dict(sweeps[-1])
    last["sweep_sha256"] = sweep_hash(sweeps[-1])
    with open(os.path.join(REPO, "BENCH_local.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    for name in ("BENCH_committed.json", "BENCH_last.json"):
        with open(os.path.join(REPO, name), "w") as f:
            json.dump(last, f, indent=1)
            f.write("\n")
    print(f"wrote BENCH_local.json (median of {len(sweeps)}), "
          f"BENCH_committed.json + BENCH_last.json "
          f"(sweep {last['sweep_sha256']})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
