"""Round-17 optimization profiler: per-key timing + formatted plans.

Usage: python tools/profile_r17.py [--plans-only] [--tag before|after]
                                   [--repeat N] [--sf DIR] KEY [KEY...]

For each key: writes plans/r16/<key>_<tag>.txt (explain formatted) and,
unless --plans-only, times `collect()` (the bench methodology) REPEAT
times and prints the median, plus a noop-sink timing (guide §1.4) so the
computation is separable from the collect/driver transfer.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flink_realtime_edu_demo_spark.queries  # noqa: F401 — populate registry
from flink_realtime_edu_demo_spark.registry import QUERIES
from flink_realtime_edu_demo_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    tag = "before"
    repeat = 3
    plans_only = False
    if "--plans-only" in args:
        plans_only = True
        args.remove("--plans-only")
    for flag, setter in (("--sf", "sf"), ("--tag", "tag"), ("--repeat", "repeat")):
        if flag in args:
            i = args.index(flag)
            val = args[i + 1]
            if setter == "sf":
                sf = val
            elif setter == "tag":
                tag = val
            else:
                repeat = int(val)
            args = args[:i] + args[i + 2:]
    keys = args or sorted(QUERIES)
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r16"))
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark(app_name="profile_r17",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up identical to bench.py
    if not plans_only:
        QUERIES["q_agg_basic"](spark, sf).collect()
        from pyspark.sql import functions as F
        _noop = F.pandas_udf(lambda s: s, "long")
        spark.range(32).repartition(32).select(_noop("id")).collect()

    for k in keys:
        if k not in QUERIES:
            print(f"{k}: UNKNOWN", flush=True)
            continue
        df = QUERIES[k](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(plans_dir, f"{k}_{tag}.txt"), "w") as f:
            f.write(plan)
        if plans_only:
            nex = plan.count("Exchange")
            print(f"{k}: plan written ({nex} Exchange)", flush=True)
            continue
        coll, noop = [], []
        for _ in range(repeat):
            spark.sparkContext.setJobDescription(f"{k} collect")
            t0 = time.perf_counter()
            QUERIES[k](spark, sf).collect()
            coll.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{k} noop")
            t0 = time.perf_counter()
            (QUERIES[k](spark, sf).write.format("noop")
             .mode("overwrite").save())
            noop.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{k}: collect={statistics.median(coll):.3f}s "
              f"noop={statistics.median(noop):.3f}s "
              f"(coll {'/'.join(f'{x:.2f}' for x in coll)})", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
