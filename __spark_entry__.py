"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over flink_realtime_edu_demo_spark: the registry holds every
implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame
plus its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import flink_realtime_edu_demo_spark.queries  # noqa: E402,F401 — populates registry
from flink_realtime_edu_demo_spark.registry import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return QUERIES["q_agg_basic"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
