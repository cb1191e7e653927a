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


# Keys the round-1 driver already verified green (CORRECTNESS_r01.json) and
# that are unchanged since. The driver checks the FIRST 50 keys of queries()
# per round, so these rotate to the back and the unverified / newly-changed
# keys surface first. Refresh this list each round from CORRECTNESS_r{N}.json.
_VERIFIED_GREEN = (
    "q_agg_basic", "q_agg_count_distinct", "q_agg_approx_uv", "q_agg_filtered",
    "q_agg_stats", "q_agg_collect", "q_agg_rollup", "q_agg_cube",
    "q_agg_having", "q_agg_percentile", "q_upsert_latest", "q_project_arith",
    "q_filter_pred", "q_explode_array", "q_distinct", "q_case_when",
    "q_json_extract", "q_side_output", "q_fn_string", "q_fn_datetime",
    "q_fn_math", "q_fn_string2", "q_fn_bitwise", "q_fn_hash", "q_fn_map",
    "q_join_inner", "q_join_left", "q_join_full", "q_join_semi", "q_join_anti",
    "q_join_theta", "q_join_cross_topk", "q_join_interval", "q_join_window",
    "q_join_asof", "q_win_rank", "q_topn_per_key", "q_win_laglead",
    "q_win_moving_avg", "q_sort_limit", "q_set_union", "q_set_union_all",
    "q_set_intersect", "q_set_except", "q_stream_tumble", "q_stream_hop",
    "q_stream_session",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    back = [k for k in _VERIFIED_GREEN if k in QUERIES]
    front = [k for k in QUERIES if k not in _VERIFIED_GREEN]
    return {k: QUERIES[k] for k in front + back}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
