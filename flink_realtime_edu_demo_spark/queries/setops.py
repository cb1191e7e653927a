"""Set operations (SURVEY.md §2.7): UNION / UNION ALL / INTERSECT / EXCEPT.

Flink UNION is by position; we use unionByName (schema-safe — a column
reorder upstream can't silently mispair columns at 100 TB).
INTERSECT/EXCEPT are distinct-semantics (hash aggregate + join under
the hood), intersectAll/exceptAll preserve multiplicity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import load


@query(
    "q_set_union",
    oracle="""
    SELECT 'cust' AS side, c_nationkey AS nationkey FROM customer
    UNION
    SELECT 'supp' AS side, s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): tagged union of customer and supplier nations."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    return (
        c.select(F.lit("cust").alias("side"), F.col("c_nationkey").alias("nationkey"))
        .unionByName(
            s.select(F.lit("supp").alias("side"), F.col("s_nationkey").alias("nationkey"))
        )
        .distinct()
    )


@query(
    "q_set_union_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL: duplicates preserved (a customer matching both branches
    appears twice) — pure concatenation, no shuffle."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("custkey"))
    return a.unionByName(b)


@query(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers active in both 1996 and 1997."""
    o = load(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    y97 = o.filter(F.year("o_orderdate") == 1997).select(F.col("o_custkey").alias("custkey"))
    return y96.intersect(y97)


@query(
    "q_set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority LIKE '1-%'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / MINUS (distinct): customers who never placed an urgent
    order (dual of q_join_semi)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority").like("1-%")).select(
        F.col("o_custkey").alias("custkey")
    )
    return c.select(F.col("c_custkey").alias("custkey")).subtract(urgent)


@query(
    "q_set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 0
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each nation key appears
    min(count_left, count_right) times (the distinct-free variant the
    plain INTERSECT query can't express)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@query(
    "q_set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: a customer with 5 open and 2
    finished orders survives 3 times."""
    o = load(spark, sf_dir, "orders")
    open_o = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    fin_o = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_o.exceptAll(fin_o)
