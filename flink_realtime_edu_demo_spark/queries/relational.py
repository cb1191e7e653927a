"""Row-level operators: project / filter / explode / distinct / case
(SURVEY.md §2.2) and source-edge JSON decoding (§2.1).

Flink mapping: DataStream map/filter/flatMap and Table API
select/where; JSON decode is the Kafka-source deserialization step.
All are narrow (no shuffle) except distinct — these scale linearly and
whole-stage-codegen fuses them into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import load


@query(
    "q_project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           l_quantity * 2 + 1 AS qty2
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    """,
)
def q_project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed-column projection (Flink map / Table select). Per-row double
    arithmetic on identical inputs is bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(F.col("l_orderkey") % 10 == 0).select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charged"),
        (F.col("l_quantity") * 2 + 1).alias("qty2"),
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('F', 'O'))
      AND o_totalprice BETWEEN 1000 AND 200000
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND o_orderdate IS NOT NULL
      AND NOT (o_custkey = 0)
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate filter: IN / BETWEEN / LIKE / IS NULL / NOT.
    All predicates push down to the parquet scan (PushedFilters)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(1000, 200000)
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & F.col("o_orderdate").isNotNull()
        & ~(F.col("o_custkey") == 0)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "q_explode_array",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos, embedding[i] AS component
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    WHERE vec_id < 50
    """,
)
def q_explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap/UDTF: posexplode of the embedding array (Flink TableFunction
    / CROSS JOIN UNNEST)."""
    e = load(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") < 50).select(
        "vec_id", F.posexplode("embedding").alias("pos", "component")
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), "component")


@query(
    "q_distinct",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    """,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash-aggregate shuffle on the projected keys only
    (column pruning keeps the shuffle narrow at scale)."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 150000 THEN 'high'
                WHEN o_totalprice >= 50000  THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END AS urgent
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional row logic: CASE WHEN / coalesce / nullif."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 150000, "high")
        .when(F.col("o_totalprice") >= 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.when(F.col("o_orderpriority").like("1-%"), 1).otherwise(0).alias("urgent"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-payload JSON decode (Flink JSON format deserializer):
    get_json_object at the source edge, then relational ops on the
    extracted column."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_id", k.alias("k"))
        .filter(F.col("k") > 50)
        .withColumn("k_mod", F.col("k") % 10)
    )


@query(
    "q_side_output",
    oracle="""
    SELECT 'ok' AS branch, event_id, event_type, value FROM events
    WHERE event_type <> 'error' AND value >= 1.0
    UNION ALL
    SELECT 'err' AS branch, event_id, event_type, value FROM events
    WHERE NOT (event_type <> 'error' AND value >= 1.0)
    """,
)
def q_side_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink side-output emulation (SURVEY.md §2.2): one upstream, two
    predicate branches, re-unioned here with a branch tag so the split is
    observable. In streaming each branch is its own sink; Spark has no
    native side-output so the split is two filters over one cached scan."""
    ev = load(spark, sf_dir, "events")
    main_pred = (F.col("event_type") != "error") & (F.col("value") >= 1.0)
    cols = ["event_id", "event_type", "value"]
    ok = ev.filter(main_pred).select(F.lit("ok").alias("branch"), *cols)
    err = ev.filter(~main_pred).select(F.lit("err").alias("branch"), *cols)
    return ok.unionByName(err)


@query(
    "q_sort_nulls",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_totalprice > 250000
    ORDER BY o.o_totalprice DESC NULLS LAST, c.c_custkey, o.o_orderkey
    LIMIT 50
    """,
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering over a nullable join output — a
    classic cross-engine pitfall: Spark's default for DESC is nulls
    LAST while DuckDB's is nulls FIRST, so portable queries must spell
    the null position. Unique tie-break keeps the LIMIT deterministic."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (F.col("o_custkey") == F.col("c_custkey")) & (F.col("o_totalprice") > 250000),
        "left",
    )
    return (
        joined.select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("c_custkey"),
                 F.col("o_orderkey"))
        .limit(50)
    )


@query(
    "q_agg_null_group",
    oracle="""
    SELECT o.o_orderpriority AS prio,
           COUNT(*) AS n_customers,
           COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON o.o_custkey = c.c_custkey
    GROUP BY o.o_orderpriority
    """,
)
def q_agg_null_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a NULLABLE group key: customers without a
    qualifying order land in the NULL group (one group, not dropped —
    ANSI GROUP BY treats all NULLs as equal), and COUNT(col) vs
    COUNT(*) differ exactly on those rows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    joined = c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
    return joined.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count("o_orderkey").alias("n_orders"),
    )


@query(
    "q_explode_outer",
    oracle="""
    WITH arr AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN NULL
                    WHEN o_orderpriority = '4-NOT SPECIFIED' THEN []
                    ELSE string_split(o_orderpriority, '-') END AS parts
        FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey, t.part
    FROM arr, unnest(CASE WHEN parts IS NULL OR len(parts) = 0
                          THEN [CAST(NULL AS VARCHAR)] ELSE parts END)
                 AS t(part)
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer / LEFT JOIN LATERAL UNNEST semantics (Flink's
    ``LEFT JOIN LATERAL TABLE(...) ON TRUE``): rows with NULL or empty
    arrays survive with a NULL element instead of vanishing — the
    difference that silently drops records in a plain CROSS JOIN
    UNNEST pipeline. DuckDB has no explode_outer, so the oracle
    spells out the exact lowering: substitute ``[NULL]`` for
    NULL/empty before unnesting. Narrow op, zero shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    parts = (
        F.when(F.col("o_orderstatus") == "P", F.lit(None).cast("array<string>"))
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED",
              F.array().cast("array<string>"))
        .otherwise(F.split("o_orderpriority", "-"))
    )
    return o.select(
        "o_orderkey", F.explode_outer(parts).alias("part")
    )
