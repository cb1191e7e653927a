"""Aggregation operators (SURVEY.md §2.4).

Flink-family semantics: keyed hash aggregation with local/global (map-side
partial) combine; Spark's groupBy().agg() does partial+final automatically,
so no mini-batch/local-global knobs are needed (§4). All float sums use the
exact-decimal trick from registry.dsum for oracle parity.

Scale notes: every query here is a single shuffle on its grouping keys;
group-key cardinality is tiny relative to input (returnflag×linestatus=6,
event_type=5, lang=5), so partial aggregation collapses virtually all rows
map-side — the shuffle moves O(partitions × groups) rows, which holds at
100 TB unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..registry import dsum, query, sql_dsum
from ..tables import load


@query(
    "q_agg_basic",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price', 6)},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge', 6)},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary — the flagship entry() query.

    Flink form: tumbling-less keyed global aggregate (Table API
    groupBy/select). sum_qty stays a plain double sum (quantities are
    integral ≤ 2^53, so the sum is exact in any order); price sums go
    through decimal.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price", 6),
            dsum(charge, "sum_charge", 6),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS uv,
           COUNT(*) AS pv
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact UV/PV per event type — the classic Flink edu-demo traffic metric.

    Scale: exact COUNT(DISTINCT) expands to a two-phase plan (distinct
    shuffle then count); at 100 TB prefer q_agg_approx_uv (HLL) unless
    exactness is required.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("uv"),
        F.count(F.lit(1)).alias("pv"),
    )


@query("q_agg_approx_uv")  # rows-only: HLL estimates are engine-specific
def q_agg_approx_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) UV — the 100 TB-scale variant of
    q_agg_count_distinct. No oracle: HLL sketches are engine-specific."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_uv")
    )


_KMV_K = 256
_KMV_SCALE = repr(float((_KMV_K - 1) * 2**60))  # exact double literal


@query(
    "q_agg_approx_uv_kmv",
    oracle=f"""
    WITH dis AS (
        SELECT DISTINCT event_type,
               CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM events
    ),
    ranked AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM dis
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           MAX(h) AS kth_hash,
           CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*) * 1.0
                ELSE {_KMV_SCALE} / MAX(h) END AS est_uv
    FROM ranked
    WHERE rn <= {_KMV_K}
    GROUP BY event_type
    """,
)
def q_agg_approx_uv_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct via a K-MINIMUM-VALUES sketch
    (Bar-Yossef et al., RANDOM'02) — the deterministic, oracle-verifiable
    counterpart to q_agg_approx_uv's HLL: per group keep the k=256
    smallest md5-derived 60-bit hashes of the value; the estimator is
    (k-1)/U_(k) on the normalized kth minimum (exact count when fewer
    than k distinct values exist). rsd ≈ 1/√(k-2) ≈ 6%.

    Scale shape: distinct on (group, hash) — one shuffle with map-side
    partial dedup, shuffling 8-byte hashes, never values — then a
    per-group top-k window; the sketch is mergeable (union of k-min
    sets), which is what makes KMV the distributed-friendly sketch
    family. Every step is relational and hash-replayable in DuckDB —
    unlike HLL's engine-specific register layout."""
    ev = load(spark, sf_dir, "events")
    h = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15),
            16, 10,
        )
        .cast("long")
        .alias("h")
    )
    dis = ev.select("event_type", h).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = dis.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _KMV_K)
    return ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.when(F.count(F.lit(1)) < _KMV_K, F.count(F.lit(1)) * F.lit(1.0))
        .otherwise(F.lit(float((_KMV_K - 1) * 2**60)) / F.max("h"))
        .alias("est_uv"),
    )


@query(
    "q_agg_filtered",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           {sql_dsum('CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0 END',
                     'big_qty_revenue')},
           COUNT(*) AS n_total
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — Flink SQL FILTER / CASE-in-agg pattern."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        dsum(
            F.when(F.col("l_quantity") > 25, F.col("l_extendedprice")).otherwise(0.0),
            "big_qty_revenue",
        ),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_linestatus,
           SUM(l_quantity) AS s1,
           SUM(l_quantity * l_quantity) AS s2,
           COUNT(l_quantity) AS n,
           SQRT((SUM(l_quantity * l_quantity) - SUM(l_quantity) * SUM(l_quantity) / COUNT(l_quantity))
                / (COUNT(l_quantity) - 1)) AS stddev_qty,
           (SUM(l_quantity * l_quantity) - SUM(l_quantity) * SUM(l_quantity) / COUNT(l_quantity))
                / (COUNT(l_quantity) - 1) AS var_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance via explicit moment sums.

    l_quantity is integral, so SUM(x) and SUM(x²) are exact integers in
    double in any accumulation order; the final sqrt/divide is then the
    same scalar computation in both engines → bit-identical (native
    stddev_samp would use Welford-style accumulation whose rounding is
    order- and engine-dependent).
    """
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    g = li.groupBy("l_linestatus").agg(
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.count(q).alias("n"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return g.select(
        "l_linestatus", "s1", "s2", "n",
        F.sqrt(var).alias("stddev_qty"),
        var.alias("var_qty"),
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / collect_set, made deterministic by sorting + joining to a
    string (array value formatting differs between engines; a string does
    not)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf,
           GROUPING(l_linestatus) AS g_ls,
           SUM(l_quantity) AS sum_qty,
           {sql_dsum('l_extendedprice', 'sum_price')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers (Flink SQL GROUPING SETS family)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice", "sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_qty", "sum_price", "n")
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           GROUPING(c_mktsegment) AS g_seg,
           GROUPING(c_nationkey) AS g_nat,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
    FROM customer
    GROUP BY CUBE (c_mktsegment, c_nationkey)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^n grouping-set combinations (Flink SQL GROUPING SETS
    family; complements q_agg_rollup)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.cube("c_mktsegment", "c_nationkey")
        .agg(
            F.grouping("c_mktsegment").cast("long").alias("g_seg"),
            F.grouping("c_nationkey").cast("long").alias("g_nat"),
            F.count(F.lit(1)).alias("n"),
            dsum("c_acctbal", "bal_sum"),
        )
        .select("c_mktsegment", "c_nationkey", "g_seg", "g_nat", "n", "bal_sum")
    )


@query(
    "q_agg_having",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'spend')}
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING — post-aggregation filter."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT event_type,
           median(value_c) AS median_value,
           quantile_cont(value_c, 0.9) AS p90_value
    FROM (SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_c
          FROM events)
    GROUP BY event_type
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation). Both engines sort the group
    and interpolate a + (b-a)*f identically; values are pre-rounded to
    cents (exact decimal→double) so inputs are bit-identical."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)").cast("double")
    return ev.select("event_type", v.alias("value_c")).groupBy("event_type").agg(
        F.expr("percentile(value_c, 0.5)").alias("median_value"),
        F.expr("percentile(value_c, 0.9)").alias("p90_value"),
    )


@query(
    "q_upsert_latest",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           ts AS last_ts
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/upsert normalization: latest row per key (Flink upsert source /
    deduplication top-1 pattern, flink-cdc dim-table sync). event_id breaks
    ts ties deterministically.

    Scale: one shuffle on user_id; at 100 TB with skewed hot keys, AQE
    skew-split handles the window's sort partitions.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("ts").alias("last_ts"),
        )
    )


@query(
    "q_agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_st,
           GROUPING(o_orderpriority) AS g_pr,
           COUNT(*) AS n,
           {sql_dsum('o_totalprice', 'price_sum')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general Flink SQL form that ROLLUP/CUBE
    abbreviate): a chosen subset of grouping combinations in one pass —
    at scale one shuffle with a grouping-set expand, not one job per
    set."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_st"),
            F.grouping("o_orderpriority").cast("long").alias("g_pr"),
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "price_sum"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_st", "g_pr", "n", "price_sum")
    )


@query(
    "q_pivot",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (l_returnflag = 'A') AS DOUBLE) AS price_A,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (l_returnflag = 'N') AS DOUBLE) AS price_N,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (l_returnflag = 'R') AS DOUBLE) AS price_R
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one output column per l_returnflag value. Pivot values are
    given explicitly — at scale never let Spark run the extra distinct
    job to discover them. Lowered to conditional aggregation (exactly
    what the oracle spells out), so it stays a single shuffle."""
    li = load(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"))
    )
    return piv.select(
        "l_linestatus",
        F.col("A").alias("price_A"),
        F.col("N").alias("price_N"),
        F.col("R").alias("price_R"),
    )


@query(
    "q_unpivot",
    oracle="""
    WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 5 = 0)
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
           CAST(l_quantity AS DOUBLE) AS val FROM li
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', CAST(l_extendedprice AS DOUBLE) FROM li
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', CAST(l_discount AS DOUBLE) FROM li
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', CAST(l_tax AS DOUBLE) FROM li
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: wide metric columns → (metric, val) rows. Spark's
    unpivot is a narrow expand (no shuffle, no 4× scan — the oracle's
    UNION ALL spelling rescans; Spark's plan reads once)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 5 == 0)
    name_map = {"l_quantity": "quantity", "l_extendedprice": "price",
                "l_discount": "discount", "l_tax": "tax"}
    # aliasing BEFORE unpivot makes the variable column carry the output
    # metric names directly — no post-hoc per-row map lookup
    return li.select(
        "l_orderkey", "l_linenumber",
        *[F.col(c).cast("double").alias(n) for c, n in name_map.items()],
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=list(name_map.values()),
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "q_agg_bool",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           bool_and(o_custkey IS NOT NULL) AS all_have_cust,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (Flink SQL every/some → bool_and/bool_or):
    algebraic, partial-aggregated map-side like any min/max."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bool_and(F.col("o_custkey").isNotNull()).alias("all_have_cust"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_argminmax",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order,
           max(o_totalprice) AS max_price,
           min(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (Flink's/ANSI's arg_max family): the key of the
    extreme row without a window. o_totalprice is unique per priority
    group in the fixtures at the extremes (verified by the hash gate),
    so tie nondeterminism can't fire; for tie-prone data order a
    struct((value, unique_key)) instead."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@query(
    "q_agg_listagg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           COUNT(*) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink SQL LISTAGG / string_agg: per-group ordered string
    concatenation. Lowered as collect_list → array_sort → concat_ws so
    the result is deterministic under any partition/arrival order — the
    same reason the SQL form carries ORDER BY inside the aggregate.
    One shuffle; list size bounded by group cardinality (names per
    region), not input rows."""
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("names"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_agg_mode",
    oracle="""
    WITH c AS (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
               FROM orders GROUP BY 1, 2)
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
    FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                       ORDER BY cnt DESC, o_orderpriority) AS rn
          FROM c)
    WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE() per group, lowered relationally (count per value → window
    top-1) instead of the native mode aggregate because native mode's
    tie choice is engine-defined; here ties break on the value itself,
    so the answer is deterministic and cross-engine identical. Two
    map-side-combined shuffles on shrinking keys."""
    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), "o_orderpriority"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus",
                F.col("o_orderpriority").alias("mode_priority"), "cnt")
    )


@query(
    "q_agg_corr",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
               AS corr_r,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta_r
    FROM m
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + OLS slope per group WITHOUT the native
    corr()/regr_slope() aggregates: those accumulate doubles in
    partition order, so their low bits differ run-to-run and between
    engines. Here the five moment sums go through exact accumulation
    (order-independent), and the closed-form combine is a single
    identically-shaped double expression on both sides — bit-stable.
    The PRICE moments (sy, sxy, syy) use DECIMAL(30,2): the per-row
    double→decimal cast IS the pinned rounding semantics. The QUANTITY
    moments (sx, sxx) use exact LONG sums instead (round 16):
    l_quantity is integral (TPC-H spec), so x and x² are exact in
    double and the decimal cast is the identity on them — Σx and Σx²
    are the same exact integers either way, but the long path skips
    2 of the 5 per-row BigDecimal conversions, the measured bulk of
    this key (plain double sums 0.40s vs decimal sums 3.29s at sf0.1 —
    the CAST is the per-row cost, not the add). No overflow: Σx² ≤
    2500·rows stays under 2^63 past 10^15 rows, and long→double is
    correctly rounded from the exact value, exactly like
    decimal→double. DECIMAL(30,2) holds Σy² up to 10^28 (fixture max
    ~10^16); at larger scale widen toward (38,2). One shuffle. The
    oracle keeps the DECIMAL spelling for all five — the hash match
    is the equality proof at every verified sf."""
    li = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    xl = x.cast("long")

    def dsum30(c, a):
        return F.sum(c.cast("decimal(30,2)")).cast("double").alias(a)

    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xl).cast("double").alias("sx"), dsum30(y, "sy"),
        dsum30(x * y, "sxy"),
        F.sum(xl * xl).cast("double").alias("sxx"), dsum30(y * y, "syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "l_returnflag", "n",
        F.round((n * sxy - sx * sy)
                / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)), 6)
        .alias("corr_r"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias("beta_r"),
    )


@query(
    "q_agg_salted_count",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_salted_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase skew-safe aggregation as a first-class oracle-backed
    query (upgrading operators/skew.salted_agg_count from unit-only):
    counts per event_type computed as partial counts per (key, salt)
    then a final sum per key — the explicit form of the map-side
    partial aggregation Spark performs for algebraic aggs, used when
    building skew-safe CUSTOM aggregations whose partials Spark can't
    derive. The salt is per-row, so a hot key's partials spread over 8
    reducers; the final 8-rows-per-key sum is trivially balanced. The
    oracle replays the plain single-phase count — salting provably
    never changes the result."""
    from ..operators.skew import salted_agg_count

    ev = load(spark, sf_dir, "events")
    return salted_agg_count(ev, key="event_type", salt=8)


@query(
    "q_agg_json_objectagg",
    oracle="""
    WITH per_type AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    obj AS (
        SELECT user_id,
               '{' || string_agg('"' || event_type || '":'
                                     || CAST(n AS VARCHAR),
                                 ',' ORDER BY event_type)
                   || '}' AS type_counts_json
        FROM per_type GROUP BY user_id
    ),
    ids AS (
        SELECT user_id,
               '[' || string_agg(CAST(event_id AS VARCHAR), ','
                                 ORDER BY event_id)
                   || ']' AS first_ids_json
        FROM (
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY event_id) AS rk
            FROM events
        ) WHERE rk <= 5
        GROUP BY user_id
    )
    SELECT o.user_id, o.type_counts_json, i.first_ids_json
    FROM obj o JOIN ids i USING (user_id)
    """,
)
def q_agg_json_objectagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink SQL 1.15+ ``JSON_OBJECTAGG(KEY k VALUE v)`` /
    ``JSON_ARRAYAGG(v)`` (round 14): per user, a JSON object mapping
    event_type → count and a JSON array of the user's first 5 event
    ids. The SQL standard leaves member order implementation-defined;
    for cross-engine determinism both engines pin it — object members
    sorted by key, array elements by event_id — and both BUILD the
    text with the same concat rule (keys are alphanumeric fixture
    strings, values integers, so no JSON escaping is exercised — the
    aggregation semantics are what's under test, not an escaper).
    One shuffle on user_id shared by the count aggregate and the
    rank window; the JSON text assembles from SORTED collected
    entries via JVM higher-order functions — no Python, no second
    shuffle. Semantics source: SQL:2016 JSON aggregates / Flink SQL
    docs (public, per SURVEY §0).
    Reference: /root/reference/README.md:1."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"))
    obj = per_type.groupBy("user_id").agg(
        F.concat(
            F.lit("{"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("event_type", "n"))),
                    lambda x: F.concat(
                        F.lit('"'), x["event_type"], F.lit('":'),
                        x["n"].cast("string")),
                ),
                ","),
            F.lit("}"),
        ).alias("type_counts_json")
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    arr = (
        ev.select("user_id", "event_id",
                  F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
        .groupBy("user_id")
        .agg(
            F.concat(
                F.lit("["),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("event_id")),
                        lambda x: x.cast("string")),
                    ","),
                F.lit("]"),
            ).alias("first_ids_json")
        )
    )
    return obj.join(arr, "user_id").select(
        "user_id", "type_counts_json", "first_ids_json")
