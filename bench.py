"""Benchmark runner — times every registered query at the bench scale
factor and prints ONE JSON line.

Env:
  SPARK_GRAFT_SF_DIR   fixture dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_BENCH_REPEAT  timing repeats per query (default 3)
  SPARK_GRAFT_BENCH_STAT    per-query statistic over the repeats:
                            "median" (default — robust to one GC pause
                            or noisy-neighbor spike per key, the round-5
                            adjudication problem) or "best"
  SPARK_GRAFT_BENCH_KEYS    comma-separated key subset (default: all) —
                            for fast artifact-contract tests/smokes
  SPARK_GRAFT_BENCH_BASELINE  per-key baseline JSON for in-sweep outlier
                            adjudication (default: BENCH_local.json if
                            present; set to "" to disable). A key whose
                            median lands >2x its baseline AND >0.25s
                            absolutely slower (the bench_gate rule) is
                            immediately re-measured ONCE — repeat more
                            samples — and the better median stands. A
                            transient noisy-neighbor spike self-heals
                            inside the sweep instead of disqualifying
                            it (VERDICT r14 #2: two rounds closed in a
                            degrading-noise window because one spiked
                            sub-second key voided whole sweeps); a real
                            regression survives the retry and still
                            trips the gate. Retried keys are recorded
                            in the artifact's `retried` dict (first +
                            retry medians), and the 1-min load average
                            is recorded per key in `load_per_key`, so
                            a noisy PHASE is attributable key-by-key.

Timing = full query wall clock: plan + execute + collect to the driver
(the driver's own verify collects too). Session startup is excluded;
a warm-up query primes the JVM/codegen caches first. The cache is
cleared after EVERY timed run, so each repeat measures the same
cold-cache shape as the historical single-pass numbers. The host's
1-minute load average before and after the sweep is recorded in the
artifact so a noisy pass is identifiable without re-running.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import flink_realtime_edu_demo_spark.queries  # noqa: F401 — populate registry
from flink_realtime_edu_demo_spark.registry import QUERIES
from flink_realtime_edu_demo_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    stat = os.environ.get("SPARK_GRAFT_BENCH_STAT", "median")
    if stat not in ("median", "best"):
        raise SystemExit(f"SPARK_GRAFT_BENCH_STAT must be median|best, got {stat}")
    load_start = os.getloadavg()[0]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer caches + codegen
    QUERIES["q_agg_basic"](spark, sf_dir).collect()
    # warm the Arrow/pandas python workers too — first-spawn costs ~1s+
    # and would otherwise be billed to whichever UDF query runs first
    from pyspark.sql import functions as F

    _noop = F.pandas_udf(lambda s: s, "long")
    spark.range(32).repartition(32).select(_noop("id")).collect()

    subset = os.environ.get("SPARK_GRAFT_BENCH_KEYS")
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # per-key outlier adjudication baseline (gate rule: ratio + floor)
    base_path = os.environ.get(
        "SPARK_GRAFT_BENCH_BASELINE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_local.json"))
    baseline: dict[str, float] = {}
    if base_path and os.path.exists(base_path):
        with open(base_path) as f:
            baseline = {k: float(v)
                        for k, v in json.load(f).get("queries", {}).items()}
    retried: dict[str, dict[str, float]] = {}
    load_per_key: dict[str, float] = {}
    # gate-rule knobs — overridable so the contract test can force a
    # deterministic retry; production defaults mirror tools/bench_gate.py
    retry_ratio = float(os.environ.get("SPARK_GRAFT_BENCH_RETRY_RATIO", "2.0"))
    retry_floor = float(os.environ.get("SPARK_GRAFT_BENCH_RETRY_FLOOR", "0.25"))
    if subset:
        requested = [k for k in subset.split(",") if k]
        keys = [k for k in requested if k in QUERIES]
        for k in requested:  # a typo'd key must not silently shrink the run
            if k not in QUERIES:
                errors[k] = "unknown key (not in QUERIES)"
                print(f"# {k}: UNKNOWN KEY", file=sys.stderr, flush=True)
    else:
        keys = sorted(QUERIES)
    import statistics

    def _time_once(key: str) -> float:
        samples: list[float] = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            QUERIES[key](spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
            # a few queries persist() intermediates they reuse
            # within the plan; drop leftover cached blocks AFTER
            # each timed run so every repeat measures the same
            # cold-cache shape and later keys aren't taxed
            spark.catalog.clearCache()
        return statistics.median(samples) if stat == "median" else min(samples)

    for key in keys:
        load_per_key[key] = round(os.getloadavg()[0], 2)
        try:
            val = _time_once(key)
            b = baseline.get(key)
            if (b is not None and val > retry_ratio * b
                    and (val - b) > retry_floor):
                # gate-rule outlier: one immediate isolated retry; the
                # better median stands (a transient spike self-heals, a
                # real regression survives and still trips the gate).
                # A retry failure must not void the key's already-valid
                # first measurement (ADVICE r15).
                try:
                    val2 = _time_once(key)
                except Exception as e:
                    retried[key] = {"first": round(val, 4),
                                    "retry_error": str(e)
                                    .split("\n")[0][:200]}
                    print(f"# {key}: OUTLIER retry failed, keeping "
                          f"first {val:.3f}s", file=sys.stderr,
                          flush=True)
                    spark.catalog.clearCache()
                else:
                    retried[key] = {"first": round(val, 4),
                                    "retry": round(val2, 4)}
                    print(f"# {key}: OUTLIER {val:.3f}s vs baseline "
                          f"{b:.3f}s — retry {val2:.3f}s",
                          file=sys.stderr, flush=True)
                    val = min(val, val2)
        except Exception as e:  # one broken query must not void the artifact
            errors[key] = str(e).split("\n")[0][:200]
            print(f"# {key}: ERROR {errors[key]}", file=sys.stderr, flush=True)
            spark.catalog.clearCache()
            continue
        timings[key] = round(val, 4)
        print(f"# {key}: {timings[key]:.3f}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    # `queries` is deliberately LAST (VERDICT r15 wrong #4): the
    # driver's stdout capture sometimes keeps only the TAIL of the
    # JSON line, so the per-query timings — the payload's point —
    # must be what survives tail truncation, not load_per_key.
    payload = {
        "metric": "total_wall_clock_all_queries",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "n_queries": len(timings),
        "repeat": repeat,
        "stat": stat,
        "load_avg_start": round(load_start, 2),
        "load_avg_end": round(os.getloadavg()[0], 2),
        "load_per_key": load_per_key,
        **({"retried": retried} if retried else {}),
        **({"errors": errors} if errors else {}),
        "queries": timings,
    }
    print(json.dumps(payload), flush=True)
    # Also persist the full JSON next to bench.py (VERDICT r8 "what's
    # wrong" #4: the driver's stdout capture truncates, so BENCH_r{N}
    # artifacts carried only a tail — this file rides the end-of-round
    # snapshot commit instead). SPARK_GRAFT_BENCH_OUT overrides the
    # path; full sweeps only, so a SPARK_GRAFT_BENCH_KEYS smoke can't
    # clobber the recorded sweep.
    out = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out is None and not subset:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_last.json")
    if out:
        with open(out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
