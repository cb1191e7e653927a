"""User-defined function surface (SURVEY.md §2.10): Flink ScalarFunction /
AggregateFunction / TableFunction mapped to vectorized Pandas UDFs,
applyInPandas, and Python UDTFs.

Perf rule (BASELINE.md): Arrow-batched pandas_udf only — never
row-at-a-time Python UDFs; each Arrow transfer is the only per-row
Python boundary in the engine (SURVEY.md §3.4).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import query
from ..tables import load


# NOTE: every function shipped to Python workers below is defined INSIDE
# its query function (a closure) so cloudpickle serializes it BY VALUE.
# A module-level function would be pickled by reference and the worker
# would need this package importable on ITS sys.path — only true when
# the driver's cwd happens to be the repo root, which the harness does
# not guarantee.


@query(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS net_revenue,
           CASE WHEN l_extendedprice >= 150000 THEN 'high'
                WHEN l_extendedprice >= 50000 THEN 'mid'
                ELSE 'low' END AS band
    FROM lineitem
    WHERE l_orderkey % 20 = 0
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDFs (Arrow-batched) — the Flink ScalarFunction
    path. The oracle is the equivalent pure-SQL expression: identical
    element-wise double ops, so results match bitwise."""

    @pandas_udf(DoubleType())
    def net_revenue(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - discount) * (1.0 + tax)

    @pandas_udf(StringType())
    def price_band(price: pd.Series) -> pd.Series:
        out = pd.Series("low", index=price.index)
        out[price >= 50000] = "mid"
        out[price >= 150000] = "high"
        return out

    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 20 == 0).select(
        "l_orderkey",
        "l_linenumber",
        net_revenue("l_extendedprice", "l_discount", "l_tax").alias("net_revenue"),
        price_band("l_extendedprice").alias("band"),
    )


_UDAF_SCHEMA = StructType(
    [
        StructField("l_returnflag", StringType()),
        StructField("n", LongType()),
        StructField("qty_sum", DoubleType()),
        StructField("price_range", DoubleType()),
    ]
)


@query(
    "q_udaf_groupagg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           SUM(l_quantity) AS qty_sum,
           max(l_extendedprice) - min(l_extendedprice) AS price_range
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_groupagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via applyInPandas (Flink AggregateFunction /
    TableAggregateFunction): one Arrow batch per group, exact-valued
    outputs so the SQL oracle matches.

    Scale note: applyInPandas materializes each group in one worker —
    fine for bounded per-key cardinality; unbounded keys should use
    built-in partial aggregation instead (q_agg_basic)."""

    def group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # per-group fold: qty is integral (sum exact in any association);
        # price_range is max-min (exact)
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n": [len(pdf)],
                "qty_sum": [float(pdf["l_quantity"].sum())],
                "price_range": [
                    float(pdf["l_extendedprice"].max() - pdf["l_extendedprice"].min())
                ],
            }
        )

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").applyInPandas(group_stats, schema=_UDAF_SCHEMA)


@query(
    "q_udtf_split",
    oracle="""
    SELECT doc_id, t.tok AS token
    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
    WHERE doc_id < 20 AND length(t.tok) > 0
    """,
)
def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Flink TableFunction): one input row → N output rows.
    Registered via Spark's @udtf API (the arrow-optimized table-function
    boundary added in Spark 3.5/4.x)."""
    from pyspark.sql.functions import udtf

    # Arrow-batched UDTF evaluation (runtime-settable): without it the
    # UDTF runs row-at-a-time BatchEvalPython — forbidden by the perf
    # budget (plan audit enforces this).
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="doc_id bigint, token string")
    class SplitWords:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            for tok in (text or "").split(" "):
                if tok:
                    yield doc_id, tok

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    spark.udtf.register("split_words", SplitWords)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT s.doc_id, s.token FROM docs_for_udtf d, "
        "LATERAL split_words(d.doc_id, d.text) s"
    )
