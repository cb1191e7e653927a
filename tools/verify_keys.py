"""Targeted oracle check for a subset of query keys — fast iteration
loop while adding operators (the full mirror is tools/driver_sim.py).

Usage: python tools/verify_keys.py KEY [KEY...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flink_realtime_edu_demo_spark.queries  # noqa: F401 — populate registry
from flink_realtime_edu_demo_spark.registry import ORACLE, QUERIES
from flink_realtime_edu_demo_spark.session import get_spark
from flink_realtime_edu_demo_spark.testing.compare import compare, duckdb_connect


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2:]
    keys = args or sorted(QUERIES)
    spark = get_spark(app_name="verify_keys", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(sf)
    rc = 0
    for k in keys:
        t0 = time.perf_counter()
        try:
            df = QUERIES[k](spark, sf)
            if k in ORACLE:
                compare(df, con, ORACLE[k], k)
                verdict = "MATCH"
            else:
                n = len(df.collect())
                verdict = f"rows-only ({n})"
        except Exception as e:
            verdict = f"FAIL: {type(e).__name__}: {str(e)[:400]}"
            rc = 1
        print(f"{k}: {verdict}  [{time.perf_counter()-t0:.2f}s]", flush=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
