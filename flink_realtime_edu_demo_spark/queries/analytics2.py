"""Composite analytical queries, wave 2 — the remaining TPC-H query
shapes re-expressed over the fixture star schema (which lacks
``partsupp`` and lineitem's commit/receipt/shipmode columns, so Q2/Q9/
Q11/Q12/Q16/Q20/Q21 are *shaped* adaptations: same plan skeleton —
min-per-group join-back, scalar-in-HAVING, multi-EXISTS — over the
columns that exist; each docstring states the substitution).

Determinism rules (SURVEY.md §5.3): float sums via exact decimal
(``dsum``); averages as exact-sum / count; rank/limit ties broken on a
unique key; every computed column aliased identically in both engines.

Scale notes mirror analytics.py: region/nation/supplier/part broadcast
at fixture proportions (each docstring flags where a dim outgrows the
broadcast budget and the plan degrades gracefully to a shuffle join);
orders⋈lineitem is the one fact⋈fact shuffle, bucket-removable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import dsum, query, sql_dsum
from ..tables import load


@query(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price', 6)},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge', 6)},
           SUM(l_quantity) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 at full fidelity (q_agg_basic is the flagship subset;
    this adds the three averages and keeps all eight aggregates in ONE
    grouping pass — Catalyst shares the scan and the partial aggregates,
    so the extra columns are free at the shuffle).

    Averages are exact-sum / count: sum_qty is integral-valued (exact
    double in any accumulation order), price/discount sums go through
    decimal — so the divisions are bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price", 6),
            dsum(charge, "sum_charge", 6),
            (F.sum("l_quantity") / n).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / n
             ).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double") / n
             ).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q_tpch_q13",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT join with an
    extra non-key predicate in the ON clause (the original's
    ``o_comment NOT LIKE`` becomes a priority exclusion — same plan
    shape: the filter must run join-side, NOT as a WHERE, or zero-order
    customers vanish). Two shuffles: custkey join+count, then the tiny
    distribution re-agg on c_count. COUNT(o_orderkey) — not COUNT(*) —
    so unmatched customers count 0. At 100 TB both sides shuffle on
    custkey (customer is a fact here, no broadcast)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue', 6)}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarter revenue per supplier, keep the
    max. The ``= (SELECT MAX(...))`` scalar subquery is lowered to a
    1-row max aggregate broadcast-crossJoined back onto the revenue
    rows — the revenue CTE is computed ONCE and reused for both the
    scalar and the probe (persist() marks the reuse; at 100 TB this is
    a ~#suppliers-row intermediate, trivially cacheable). Equality on a
    double is safe here because total_revenue is decimal-exact, so both
    engines agree bit-for-bit on the max AND the matches."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "total_revenue", 6))
    ).persist()
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q_tpch_q17",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey, SUM(l_quantity) / COUNT(*) AS part_avg_qty
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN per_part a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND p.p_type = 'SMALL'
      AND l.l_quantity < 0.2 * a.part_avg_qty
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): the correlated
    ``l_quantity < 0.2 * (SELECT AVG ... WHERE p_partkey = ...)``
    decorrelates into a per-partkey average joined back on partkey —
    one extra agg over lineitem instead of a per-row nested query.
    ``p_container`` doesn't exist in the fixture part table; p_type
    stands in. part_avg_qty is exact (integral quantities), so the
    0.2× boundary can't drift between engines. The filtered part dim
    broadcasts; the avg join is partkey⋈partkey — co-partitioned with
    a bucketed-by-partkey lineitem at scale."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("part_avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
             / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q22",
    oracle="""
    WITH eligible AS (
        SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_custkey, c_acctbal
        FROM customer
        WHERE SUBSTRING(c_name, 17, 2)
              IN ('13', '31', '23', '29', '30', '18', '17')
    ),
    avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS ab
        FROM eligible WHERE c_acctbal > 0.0
    )
    SELECT e.cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(e.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM eligible e CROSS JOIN avg_bal
    WHERE e.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                      AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    GROUP BY e.cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): scalar-average subquery +
    NOT EXISTS anti-join + group. The fixture customer has no phone, so
    cntrycode = the custkey's last two digits via c_name (same
    substring-classifier shape as the original's phone prefix), and the
    "never ordered" predicate is scoped to orders placed in 1995 — on
    this fixture every customer has SOME order, so the unscoped
    anti-join would be vacuously empty and prove nothing. Plan: the
    eligible slice is scanned once (persist) for both the scalar
    average and the probe; the scalar broadcasts; NOT EXISTS with the
    pushed date predicate lowers to a LEFT ANTI join against the
    filtered orders on custkey — at 100 TB that is the one real shuffle
    (both sides hashed on custkey); the final agg is a handful of
    groups."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    eligible = (
        c.withColumn("cntrycode", F.substring("c_name", 17, 2))
        .filter(F.col("cntrycode").isin("13", "31", "23", "29", "30", "18", "17"))
        .select("cntrycode", "c_custkey", "c_acctbal")
    ).persist()
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal", "s", 2) / F.count(F.lit(1))).alias("ab")
    )
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(
                (F.col("o_orderdate")
                 >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate")
                   < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            ),
            eligible.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal", 2),
        )
    )


@query(
    "q_tpch_q8",
    oracle=f"""
    WITH all_volume AS (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'AMERICA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share,
           {sql_dsum('volume', 'total_volume', 6)}
    FROM all_volume
    GROUP BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): an 8-table join tree — the
    widest plan in the suite. Every dim (part-filtered, supplier,
    customer, both nation roles, region) broadcasts; lineitem⋈orders is
    the single fact⋈fact shuffle; the share division runs over
    decimal-exact numerator/denominator so both engines agree
    bit-for-bit. The same nation table joins TWICE under different
    roles (customer's vs supplier's) — alias-disambiguated, one
    broadcast reused by Catalyst's exchange reuse."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    dec6 = "decimal(18,6)"
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(0.0).cast(dec6)
            ).cast("double")
            / F.sum(F.col("volume").cast(dec6)).cast("double")
        ).alias("mkt_share"),
        dsum("volume", "total_volume", 6),
    )


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           {sql_dsum(
               'l.l_extendedprice * (1 - l.l_discount) '
               '- p.p_retailprice * l.l_quantity', 'sum_profit', 6)}
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped product-type profit (the fixture has no partsupp,
    so ``p_retailprice * l_quantity`` stands in for the original's
    ``ps_supplycost * l_quantity`` — identical plan skeleton: a
    part-name LIKE filter driving a 5-table join, profit re-keyed by
    supplier nation and order year). The LIKE-filtered part dim
    broadcasts and prunes lineitem FIRST (the selective join), then
    orders joins on the surviving lines — Catalyst/AQE orders it that
    way from stats; profit sums are decimal-exact."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit, "sum_profit", 6))
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT CASE WHEN CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                    CAST(l.l_shipdate AS DATE)) AS INT) > 60
                THEN 'SLOW' ELSE 'FAST' END AS ship_speed,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped shipping-priority split (no l_shipmode /
    commit/receipt dates in the fixture, so the mode key becomes a
    ship-latency bucket — days from order to ship — and the
    high/low-priority conditional counts are verbatim Q12). One
    fact⋈fact shuffle + a 2-group agg; the ship-date range filter is
    pushed to the lineitem scan."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    lag_days = F.datediff(F.col("l_shipdate").cast("date"),
                          F.col("o_orderdate").cast("date"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.when(lag_days > 60, "SLOW").otherwise("FAST").alias("ship_speed"),
            F.when(high, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("ship_speed")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE n.n_name = 'NATION_3'
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped waiting-supplier query (no receipt/commit dates:
    "kept waiting" = shipped >60 days after the order date). The
    EXISTS / NOT EXISTS pair decorrelates into per-order supplier
    counts — the classic rewrite that turns a doubly-nested correlated
    query into two aggregates:

      EXISTS(other supplier in order)        ⇔  #distinct suppliers ≥ 2
      NOT EXISTS(other LATE supplier)        ⇔  #distinct late suppliers = 1

    ONE aggregate carries everything: per order, the distinct-supplier
    count, the distinct-LATE-supplier count, AND the late supplier's id
    — when exactly one supplier is late, max(late suppkey) IS that
    supplier, so the qualifying orders need no join back to the late
    pairs at all. Plan: li⋈o (the one fact⋈fact shuffle), a per-order
    agg that REUSES the join's orderkey partitioning (no exchange),
    then the tiny s_name agg — 3 exchanges where the textbook
    late-pair-join lowering costs 5; supplier/nation broadcast. Ties
    on numwait break on the unique s_name; the final top-20 is
    TakeOrderedAndProject."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")

    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate")
         > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    late_supp = F.when(F.col("late"), F.col("l_suppkey"))
    per_order = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(late_supp).alias("n_late"),
        F.max(late_supp).alias("waiting_supp"),
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s.join(F.broadcast(n),
                                 s.s_nationkey == n.n_nationkey)),
              F.col("waiting_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q_tpch_q2",
    oracle="""
    WITH supplies AS (
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
        FROM lineitem
    ),
    offers AS (
        SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
               n.n_name
        FROM part p
        JOIN supplies sp ON sp.partkey = p.p_partkey
        JOIN supplier s  ON s.s_suppkey = sp.suppkey
        JOIN nation n    ON n.n_nationkey = s.s_nationkey
        JOIN region r    ON r.r_regionkey = n.n_regionkey
        WHERE p.p_size = 15 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
    ),
    best AS (
        SELECT p_partkey, MIN(s_acctbal) AS min_bal FROM offers GROUP BY p_partkey
    )
    SELECT o.s_acctbal, o.s_name, o.n_name, o.p_partkey, o.p_name
    FROM offers o JOIN best b
      ON o.p_partkey = b.p_partkey AND o.s_acctbal = b.min_bal
    ORDER BY o.s_acctbal DESC, o.n_name, o.s_name, o.p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped minimum-cost supplier (no partsupp in the
    fixture: the part↔supplier relation is the DISTINCT
    (l_partkey, l_suppkey) pairs observed in lineitem, and the original
    ``MIN(ps_supplycost)`` becomes MIN(s_acctbal) over those offers).
    Same skeleton: correlated MIN subquery decorrelated into a
    min-per-partkey aggregate joined back on (partkey, exact-equal
    min). s_acctbal is a raw parquet double compared for EQUALITY, not
    summed — bit-identical in both engines. The distinct pair-set is
    the one big shuffle (keyed by partkey, same key as the min-agg and
    join-back → one exchange reused three times); dims broadcast.
    Tie ordering is fully determined: (s_acctbal, n_name, s_name,
    p_partkey) — (s_name, p_partkey) alone is a unique pair."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supplies = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    offers = (
        supplies.join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    ).persist()
    best = offers.groupBy(F.col("p_partkey").alias("bk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        offers.join(best, (offers.p_partkey == best.bk)
                    & (offers.s_acctbal == best.min_bal))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
    )


@query(
    "q_tpch_q11",
    oracle="""
    WITH german AS (
        SELECT l.l_partkey,
               CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6)) AS val
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7'
    ),
    per_part AS (
        SELECT l_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
        FROM german GROUP BY l_partkey
    ),
    total AS (SELECT CAST(SUM(val) AS DOUBLE) AS tot FROM german)
    SELECT p.l_partkey AS partkey, p.part_value
    FROM per_part p CROSS JOIN total t
    WHERE p.part_value > 0.001 * t.tot
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped important-stock query (no partsupp: the "value"
    of a part held by NATION_7 suppliers is its discounted lineitem
    revenue instead of ``ps_supplycost * ps_availqty`` — identical
    skeleton: per-part aggregate HAVING > fraction × global scalar of
    the SAME measure). The nation-filtered slice is computed once
    (persist) and feeds both the per-part agg and the 1-row global sum;
    the scalar broadcasts into the filter. Both sums decimal-exact, so
    the 0.1% threshold boundary is bit-identical. The fraction shrinks
    with scale in real Q11 (1/SF) — at 100 TB the constant would be
    configuration, not code."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    german = (
        li.join(F.broadcast(s.join(F.broadcast(n),
                                   s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == F.col("s_suppkey"))
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)").alias("val"),
        )
    ).persist()
    per_part = german.groupBy("l_partkey").agg(
        F.sum("val").cast("double").alias("part_value")
    )
    total = german.agg(F.sum("val").cast("double").alias("tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.001 * F.col("tot"))
        .select(F.col("l_partkey").alias("partkey"), "part_value")
    )


@query(
    "q_tpch_q16",
    oracle="""
    WITH supplies AS (
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
        FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT sp.suppkey) AS supplier_cnt
    FROM supplies sp
    JOIN part p ON p.p_partkey = sp.partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND sp.suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped parts/supplier relationship (partsupp → the
    observed DISTINCT lineitem pairs; the original's
    ``s_comment LIKE '%Complaints%'`` blacklist → suppliers with
    negative balance). NOT IN lowers to a broadcast LEFT ANTI join —
    with the guarantee the blacklist key is non-null, NOT IN ≡ ANTI
    (null-poisoned NOT IN is the classic trap; s_suppkey is the PK so
    it can't fire). COUNT(DISTINCT suppkey) per (brand, type, size):
    one expand-free distinct-agg shuffle; the part dim broadcasts its
    three filter predicates down to the scan."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    supplies = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    return (
        supplies.join(F.broadcast(bad), supplies.suppkey == bad.s_suppkey,
                      "left_anti")
        .join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q20",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty_1996
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    ),
    part_total AS (
        SELECT l_partkey, SUM(l_quantity) AS qty_all
        FROM lineitem GROUP BY l_partkey
    ),
    excess AS (
        SELECT DISTINCT sh.l_suppkey
        FROM shipped sh
        JOIN part_total pt ON pt.l_partkey = sh.l_partkey
        JOIN part p ON p.p_partkey = sh.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND sh.qty_1996 > 0.05 * pt.qty_all
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (SELECT l_suppkey FROM excess)
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped excess-inventory suppliers (no partsupp /
    ps_availqty: "excess" = the supplier shipped >5% of a small-part's
    whole-corpus quantity in 1996 alone — tuned to the fixture's flat
    supplier distribution, where the classic 30% bar never fires and
    would make the key vacuously empty). The nested IN-chain lowers to a
    LEFT SEMI join onto the deduped excess-supplier set. Quantity sums
    are integral-valued doubles (exact in any order), so the 0.3×
    threshold can't drift. Two lineitem aggregates share the partkey
    shuffle key; the semi-join probe side (supplier⋈nation) broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty_1996"))
    )
    part_total = li.groupBy(F.col("l_partkey").alias("ptk")).agg(
        F.sum("l_quantity").alias("qty_all")
    )
    excess = (
        shipped.join(part_total, shipped.l_partkey == part_total.ptk)
        .join(F.broadcast(p), shipped.l_partkey == p.p_partkey)
        .filter(F.col("qty_1996") > 0.05 * F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "q_join_lateral",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) t
    WHERE c.c_custkey < 300
    """,
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join through the SQL surface (Flink SQL's
    LATERAL TABLE / top-N-per-correlation idiom), run as an actual
    ``spark.sql`` LATERAL subquery — exercising the SQL-string entry
    path end to end (views + parser + decorrelation), not the
    DataFrame builder. Catalyst rewrites the per-customer ORDER BY ...
    LIMIT 2 into a ranked window join (DomainJoin → window), so the
    execution plan is the same scalable shape as q_topn_per_key — no
    per-row re-execution of the subquery. Ties are impossible:
    o_orderkey is unique."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_lat")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_lat")
    return spark.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM v_customer_lat c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM v_orders_lat o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) t
        WHERE c.c_custkey < 300
    """)
