"""Schema registry + loader for the driver fixture tables (FIXTURES.md).

Schemas are declared explicitly — never inferred (SURVEY.md §1.4):
inference is nondeterministic at 100 TB (footer-sampling order) and the
DuckDB hash-match needs stable column types.

Timestamp handling (SURVEY.md §5.3):
- ``orders.o_orderdate`` / ``lineitem.l_shipdate`` are parquet
  timestamp[ms], isAdjustedToUTC=false → read as TIMESTAMP_NTZ.
- ``events.ts`` has shipped as both parquet timestamp[ns] (rounds 1-2)
  and timestamp[us] (round 3+). load() sniffs the footer: the μs shape
  reads directly as TIMESTAMP_NTZ; the ns shape (which Spark's parquet
  reader rejects outright, PARQUET_TYPE_ILLEGAL) is read as raw int64
  nanos via the runtime-settable ``spark.sql.legacy.parquet.nanosAsLong``
  conf and rebuilt at μs precision (fixture data is exactly μs-aligned,
  verified; DuckDB's ns→μs cast agrees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at every fixture sf
# (region 5, nation 25, supplier ≤1k, customer ≤15k, part ≤20k rows at
# sf0.1). At 100 TB, customer/part stop being broadcastable — drop them
# from this set and let sort-merge + AQE take over.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "customer", "part"})


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, StructType] = {
    "region": _s(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _s(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "supplier": _s(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "customer": _s(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "part": _s(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampNTZType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampNTZType()),
    ),
    # events.ts public schema (post-load) is ts: timestamp_ntz. The raw
    # fixture has shipped as both timestamp[ns] and timestamp[us] across
    # driver rounds; load() sniffs the footer and normalizes (see below).
    "events": _s(
        ("event_id", LongType()),
        ("ts", TimestampNTZType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _s(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _s(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}


# Sniffed events.ts physical unit per fixture file ("ns" | "us"); one
# driver-side footer read per (path, mtime, size) per process —
# negligible even at 100 TB, where it would be one footer out of many.
# Keyed on the stat triple, not the bare path: the round driver rewrites
# fixtures in place between rounds and the encoding has flipped ns<->us
# at the same path before — a path-keyed cache would serve the stale unit.
_EVENTS_TS_UNIT: dict[tuple, str] = {}


def _events_ts_unit(path: str) -> str:
    import os

    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = (path, None, None)
    unit = _EVENTS_TS_UNIT.get(key)
    if unit is None:
        import pyarrow.parquet as pq

        try:
            unit = pq.read_schema(path).field("ts").type.unit
        except Exception:
            # Missing/odd/corrupt file (incl. pyarrow ArrowInvalid on a
            # truncated footer): take the direct-read path so Spark raises
            # its usual PATH_NOT_FOUND / schema error, not a sniff error.
            unit = "us"
        _EVENTS_TS_UNIT[key] = unit
    return unit


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a batch DataFrame with its declared schema."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and _events_ts_unit(path) == "ns":
        # Legacy fixture shape: TIMESTAMP(NANOS), which the parquet reader
        # rejects outright (PARQUET_TYPE_ILLEGAL). Read as raw int64 nanos
        # via the runtime-settable conf and rebuild a μs-precision NTZ
        # (fixture data is exactly μs-aligned; DuckDB's ns→μs cast agrees).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ns_schema = _s(*[
            (f.name, LongType() if f.name == "ts" else f.dataType)
            for f in SCHEMAS[name].fields
        ])
        df = spark.read.schema(ns_schema).parquet(path)
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a dimension table with a broadcast hint when it qualifies."""
    df = load(spark, sf_dir, name)
    return F.broadcast(df) if name in BROADCAST_DIMS else df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so users run plain
    ``spark.sql(...)`` — the migration path for a Flink-SQL user: same
    table names, ANSI SQL, window TVF semantics via ``window()``/
    ``session_window()``. Views are lazy: each query still gets full
    pushdown/pruning against the parquet scan."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def load_spread(spark: SparkSession, sf_dir: str, name: str,
                key: str | None = None) -> DataFrame:
    """load() + hash-repartition to the session's default parallelism —
    the local-mode equalizer for single-file fixtures: a heavy narrow
    pipeline downstream (shingle explode, sketching, GEMM scoring)
    otherwise runs on ONE core because one parquet file is one input
    split. The extra shuffle moves only the raw table (tiny next to its
    expansion); on a real cluster the many input splits already provide
    this width, and the repartition simply becomes the explicit
    contract. Used by the shingle/embedding-heavy queries."""
    df = load(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism, key or df.columns[0])
