"""Composite analytical queries (TPC-H-shaped) — multi-join pipelines
that exercise the optimizer end to end: join reordering, broadcast
selection for dims, partial aggregation under multi-way joins, top-k
pushdown. These are the workloads a Flink-SQL analytics user actually
runs, as opposed to the single-operator probes elsewhere in queries/.

Scale notes: dims (region/nation/customer at their natural sizes)
broadcast; the fact⋈fact join (orders⋈lineitem) is the one real
shuffle, removable by bucketing both tables on the order key at write
(demonstrated Exchange-free in tests/test_scale_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import dsum, query, sql_dsum
from ..tables import load


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 6)},
           o.o_orderpriority,
           COUNT(*) AS n_lines
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped shipping-priority query: segment-filtered customer
    dim (broadcast) ⋈ orders ⋈ lineitem, revenue per order, top 10.
    The segment filter reaches the customer parquet scan; the only
    shuffle joining facts is orders⋈lineitem; the final ORDER BY+LIMIT
    is TakeOrderedAndProject (k rows per partition, no global sort)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(dsum(revenue, "revenue", 6), F.count(F.lit(1)).alias("n_lines"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderpriority", "n_lines")
    )


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', 6)},
           COUNT(*) AS n_lines
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped local-supplier-volume query: a 5-table join chain
    (region→nation→customer→orders→lineitem) with revenue per nation.
    region/nation/customer all broadcast (each orders-of-magnitude
    smaller than the facts), so the whole chain costs one fact⋈fact
    shuffle plus one tiny agg shuffle. Honest scale note: the broadcast
    of the filtered customer dim assumes it fits the broadcast budget
    (true to ~10⁸ customers); past that, drop the hint and the
    customer⋈orders edge becomes the plan's second shuffle join —
    the rest of the shape is unchanged."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue", 6), F.count(F.lit(1)).alias("n_lines"))
    )
