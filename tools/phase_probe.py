"""Phase-split probe for r16 optimization: per key, separate
 - build: Python DataFrame construction (registry call)
 - plan:  Catalyst analysis+optimization+physical planning (explain)
 - exec:  noop-sink execution (guide §1.4)
 - coll:  full collect (the bench methodology)

Usage: python tools/phase_probe.py KEY [KEY...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flink_realtime_edu_demo_spark.queries  # noqa: F401
from flink_realtime_edu_demo_spark.registry import QUERIES
from flink_realtime_edu_demo_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    keys = sys.argv[1:]
    spark = get_spark(app_name="phase_probe",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q_agg_basic"](spark, SF).collect()
    from pyspark.sql import functions as F
    _noop = F.pandas_udf(lambda s: s, "long")
    spark.range(32).repartition(32).select(_noop("id")).collect()
    print(f"{'key':38s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'coll':>7s}")
    for k in keys:
        t0 = time.perf_counter()
        df = QUERIES[k](spark, SF)
        t1 = time.perf_counter()
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        t2 = time.perf_counter()
        spark.catalog.clearCache()
        df2 = QUERIES[k](spark, SF)
        t3 = time.perf_counter()
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        spark.catalog.clearCache()
        t5 = time.perf_counter()
        QUERIES[k](spark, SF).collect()
        t6 = time.perf_counter()
        spark.catalog.clearCache()
        print(f"{k:38s} {t1-t0:7.3f} {t2-t1:7.3f} {t4-t3:7.3f} {t6-t5:7.3f}",
              flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
