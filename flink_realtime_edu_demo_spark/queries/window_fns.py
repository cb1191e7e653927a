"""OVER-window functions (SURVEY.md §2.5) and sort/limit (§2.6).

Flink OVER windows / Top-N / dedup patterns → Spark Window specs. Every
ordering includes a unique tie-break column so results are
deterministic (oracle-parity rule §5.3).

Scale: each window is one shuffle on its partition key. The global
sort in q_sort_limit is a range-partitioned TakeOrderedAndProject —
limit k pushes into each partition, so no full global sort materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load


@query(
    "q_win_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER w AS rn,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: row_number / rank / dense_rank / ntile. rank and
    dense_rank run over a genuinely tying order (o_orderstatus) to
    exercise gap semantics; row_number/ntile get a unique tiebreak."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    ws = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        # cast to long: Spark rank fns return INT, DuckDB returns BIGINT —
        # keep the output schema identical for type-aware comparators
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(ws).cast("long").alias("rnk"),
        F.dense_rank().over(ws).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "q_topn_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def q_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink Top-N pattern: top-3 orders per customer. Catalyst rewrites
    rank<=k filters into per-partition top-k (WindowGroupLimit) — no full
    sort per key at scale."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q_win_laglead",
    oracle="""
    SELECT event_id, user_id, ts,
           lag(ts)  OVER w AS prev_ts,
           lead(ts) OVER w AS next_ts,
           CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS gap_s,
           first_value(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS first_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_laglead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic family: lag/lead/first_value — per-user session gap
    analysis (the Flink edu-demo dwell-time metric)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        prev_ts.alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        (
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.unix_timestamp(prev_ts.cast("timestamp"))
        ).alias("gap_s"),
        F.first("event_type").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "first_type"
        ),
    )


@query(
    "q_win_running_sum",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           SUM(l_quantity) OVER w AS running_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w
                AS DOUBLE) AS running_price
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice, l_quantity,
                          l_partkey, l_suppkey, l_discount, l_tax
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate with an explicit frame. Quantity sums are exact
    (integral doubles); the price running-sum goes through decimal so the
    prefix accumulation is order-exact in both engines. (l_orderkey,
    l_linenumber) is NOT unique in the fixtures, so the ordering extends
    over every sum-contributing column — rows that still tie are fully
    identical and permute without changing the output multiset.

    The l_orderkey filter is written AFTER the window in the plan but
    Catalyst pushes it below the Window (it's the partition key) and
    into the parquet scan — only 1/10 of orders ever compute a frame."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(
            "l_linenumber", "l_extendedprice", "l_quantity",
            "l_partkey", "l_suppkey", "l_discount", "l_tax",
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum("l_quantity").over(w).alias("running_qty"),
        # accumulate in decimal (order-exact), surface as double: the
        # driver's pandas canonicalizer renders decimal trailing zeros
        # differently per engine (round-1 red), so DECIMAL never appears
        # in output schemas.
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_price"),
    )


@query(
    "q_win_moving_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS moving_avg3
    FROM events
    """,
)
def q_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame average (3-row moving avg per user) — decimal-exact
    numerator, then one double division on identical operands."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg3"),
    )


@query(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → TakeOrderedAndProject (per-partition
    top-k then merge; never a full global sort). Unique tiebreak on
    o_orderkey makes the cut deterministic."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@query(
    "q_win_dist",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution + navigation window family: percent_rank, cume_dist,
    first_value/last_value/nth_value over an explicit running frame.
    percent_rank/cume_dist are (rank-1)/(n-1)-style double divisions on
    identical operands in both engines; the ordering is unique
    (totalprice desc, orderkey) so frames are deterministic."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wo = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(wo), 6).alias("pr"),
        F.round(F.cume_dist().over(wo), 6).alias("cd"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@query(
    "q_win_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frame (Flink's OVER ... RANGE BETWEEN INTERVAL '1' HOUR
    PRECEDING): per-user trailing-hour count and exact decimal sum.
    Spark's rangeBetween needs a numeric ordering, so the frame runs on
    epoch MICROseconds — whole-second epoch would truncate and disagree
    with DuckDB's μs-precise interval frame for events straddling a
    second boundary (caught by the sf0.1 sweep). RANGE includes all
    ts-peers, so ties don't affect determinism; the sum accumulates in
    decimal, surfaces as double."""
    ev = load(spark, sf_dir, "events")
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("sum_1h"),
    )


@query(
    "q_win_ntile",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(ntile(4) OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice, o_orderkey) AS INTEGER)
             AS quartile
    FROM orders
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing (Flink's ntile() ranking window fn family): price
    quartiles within each order status. Deterministic: the order-by ends
    in the unique o_orderkey, so tile assignment is a pure function of
    the data on both engines (SQL-standard ntile remainder rule: the
    first n_rows % 4 tiles get the extra row). One hash exchange on the
    partition key, per-partition sort — the same shape at any scale."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("quartile"),
    )
