"""Unit coverage for tools/plan_audit.py's SinglePartition-ancestry
check (ADVICE r12): the audit that justified shrinking the
single-partition allowlist must itself be tested against the two
silent-false-negative shapes the advisor found — subquery-hosted
trees (the old parse stopped at the first blank line) and Exchange
detail blocks whose Input line carries a parenthesized attribute
name (the old intermediate-line regex broke on `sum(x)#12`). Pure
string fixtures — no SparkSession — plus one real-plan test that
hosts a global-sort window inside a scalar subquery.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from plan_audit import (  # noqa: E402
    _single_partition_feeds_winsort,
    _single_partition_ids,
)

# A formatted-mode plan whose MAIN tree is hazard-free but whose
# subquery tree sorts a SinglePartition exchange's output — the shape
# the first-section-only parse never saw.
SUBQUERY_HOSTED = """== Physical Plan ==
* Filter (3)
+- * ColumnarToRow (2)
   +- Scan parquet  (1)

(1) Scan parquet
Output [2]: [a#1, b#2]
ReadSchema: struct<a:bigint,b:double>

(2) ColumnarToRow [codegen id : 1]
Input [2]: [a#1, b#2]

(3) Filter [codegen id : 1]
Input [2]: [a#1, b#2]
Condition : (b#2 > scalar-subquery#9)

===== Subqueries =====

Subquery:1 Hosting operator id = 3 Hosting Expression = scalar-subquery#9
* Sort (7)
+- Exchange (6)
   +- * HashAggregate (5)
      +- Scan parquet  (4)

(4) Scan parquet
Output [1]: [v#5]
ReadSchema: struct<v:double>

(5) HashAggregate [codegen id : 1]
Input [1]: [v#5]
Functions [1]: [partial_sum(v#5)]

(6) Exchange
Input [1]: [sum(v#5)#12]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=42]

(7) Sort [codegen id : 2]
Input [1]: [sum(v#5)#12]
Arguments: [sum(v#5)#12 ASC NULLS FIRST], true, 0
"""

# The same detail-block shape in the MAIN tree: the Exchange's Input
# line carries a parenthesized attribute (`sum(x#5)#12`), which broke
# the old `[^\n(]+` intermediate-line pattern.
PAREN_INPUT_LINE = """== Physical Plan ==
* Window (4)
+- * Sort (3)
   +- Exchange (2)
      +- * HashAggregate (1)

(1) HashAggregate [codegen id : 1]
Functions [1]: [partial_sum(x#5)]

(2) Exchange
Input [1]: [sum(x#5)#12]
Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=7]

(3) Sort [codegen id : 2]
Input [1]: [sum(x#5)#12]
Arguments: [sum(x#5)#12 ASC NULLS FIRST], false, 0

(4) Window
Input [1]: [sum(x#5)#12]
"""

# Hazard-free control: the only Sort is partition-local under a
# hash-partitioned exchange (sort-merge-join shape).
PARTITION_LOCAL = """== Physical Plan ==
* Project (4)
+- * Sort (3)
   +- Exchange (2)
      +- Scan parquet  (1)

(1) Scan parquet
Output [2]: [k#1, v#2]

(2) Exchange
Input [2]: [k#1, v#2]
Arguments: hashpartitioning(k#1, 32), ENSURE_REQUIREMENTS, [plan_id=3]

(3) Sort [codegen id : 1]
Input [2]: [k#1, v#2]
Arguments: [k#1 ASC NULLS FIRST], false, 0

(4) Project [codegen id : 1]
Input [2]: [k#1, v#2]
"""


def test_subquery_hosted_global_sort_is_flagged():
    assert _single_partition_ids(SUBQUERY_HOSTED) == {"6"}
    assert _single_partition_feeds_winsort(SUBQUERY_HOSTED)


def test_paren_bearing_input_line_still_extracts_id():
    assert _single_partition_ids(PAREN_INPUT_LINE) == {"2"}
    assert _single_partition_feeds_winsort(PAREN_INPUT_LINE)


def test_partition_local_sort_not_flagged():
    assert _single_partition_ids(PARTITION_LOCAL) == set()
    assert not _single_partition_feeds_winsort(PARTITION_LOCAL)


def test_real_subquery_hosted_window(spark):
    """End-to-end: a scalar subquery hosting an UNPARTITIONED window
    (ORDER BY with no PARTITION BY -> Window over Exchange
    SinglePartition in the Subqueries section) must be flagged, and
    removing the hazard (partitioned window) must not be."""
    spark.range(100).selectExpr(
        "id % 7 AS k", "CAST(id AS DOUBLE) AS v"
    ).createOrReplaceTempView("pa_t")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    hazard = spark.sql("""
        SELECT k, v FROM pa_t
        WHERE v > (SELECT max(rs) FROM
                   (SELECT sum(v) OVER (ORDER BY v) AS rs FROM pa_t))
    """)
    plan = hazard._jdf.queryExecution().explainString(mode)
    assert "Subqueries" in plan and "SinglePartition" in plan, plan[:800]
    assert _single_partition_feeds_winsort(plan)

    clean = spark.sql("""
        SELECT k, v FROM pa_t
        WHERE v > (SELECT max(rs) FROM
                   (SELECT sum(v) OVER (PARTITION BY k ORDER BY v)
                           AS rs FROM pa_t))
    """)
    plan2 = clean._jdf.queryExecution().explainString(mode)
    assert not _single_partition_feeds_winsort(plan2)
