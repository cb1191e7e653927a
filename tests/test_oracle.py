"""Differential oracle tests — local mirror of the driver's t2 gate.

Every registered query with an oracle is run on Spark and DuckDB over the
same fixtures (sf0.001 by default; set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 for the full pre-commit check) and compared exactly.
Queries without an oracle get a rows-and-schema smoke check.
"""

from __future__ import annotations

import pytest

import flink_realtime_edu_demo_spark.queries  # noqa: F401 — populates registry
from flink_realtime_edu_demo_spark.registry import ORACLE, QUERIES
from flink_realtime_edu_demo_spark.testing.compare import compare, duckdb_connect


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connect(sf_dir)
    yield c
    c.close()


# Keys legitimately empty at the tiny sf0.001 smoke fixture ONLY (their
# selective TPC-H predicates find no qualifying rows among ~150
# customers / 200 parts); every one of them returns rows at the
# driver's verification SF (0.01) and the bench SF (0.1), where the
# vacuous-match guard stays armed.
_EMPTY_OK_AT_SF0001 = {"q_tpch_q2", "q_tpch_q7", "q_tpch_q11", "q_tpch_q20"}


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_query(key, spark, sf_dir, con):
    df = QUERIES[key](spark, sf_dir)
    if key in ORACLE:
        tiny = sf_dir.rstrip("/").endswith("sf0.001")
        compare(df, con, ORACLE[key], key,
                allow_empty=tiny and key in _EMPTY_OK_AT_SF0001)
    else:
        rows = df.collect()  # rows-only smoke: runs, stable schema
        assert df.columns
        assert rows is not None
