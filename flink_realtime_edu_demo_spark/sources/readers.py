"""Source connectors (SURVEY.md §2.1) — the Flink connector surface
mapped to Spark readers.

The driver harness only verifies parquet (tables.load). The rest of the
Flink-demo connector family is provided as thin, tested adapters:

- stream_table(): file-based Structured Streaming read of a fixture
  table — the stand-in for the Kafka behavior-log topic. Every batch
  query in queries/ is a pure DataFrame→DataFrame function, so feeding
  it this streaming frame instead of the batch one is the whole
  batch→stream switch (SIGMOD'18 Structured Streaming model).
- kafka_stream(): the real Kafka source wiring (format("kafka") +
  from_json over the value bytes). No broker exists in this harness;
  constructing the reader requires the kafka connector jar, so this is
  exercised only as plan-construction in environments that have it.
- rate_stream(): Flink's datagen/rate source equivalent for smoke tests.
- jdbc_dim(): CDC-lite dimension snapshot via JDBC (lookup-join source);
  at runtime replaced by broadcast of the snapshot (SURVEY §2.3 lookup
  join note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from ..tables import SCHEMAS

# Post-load public schema for the events stream (ts already μs TIMESTAMP_NTZ).
_EVENTS_STREAM_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Structured-Streaming read of a fixture table (file source).

    For ``events`` the raw fixture is ns-precision parquet that Spark's
    reader rejects; the streaming path therefore expects a μs-normalized
    copy produced by ``materialize_stream_input`` (tests do this) — the
    transformation under test is identical either way.
    """
    if name == "events":
        schema = StructType.fromDDL(_EVENTS_STREAM_SCHEMA)
    else:
        schema = SCHEMAS[name]
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(f"{sf_dir}/{name}_stream")
    )


def materialize_stream_input(
    spark: SparkSession, sf_dir: str, name: str, out_dir: str, n_splits: int = 4
) -> str:
    """Write a fixture table as ``n_splits`` parquet files under
    ``out_dir/{name}_stream`` so the file stream delivers multiple
    micro-batches (ordered by event time → realistic watermark advance)."""
    import os
    import time

    from ..tables import load

    df = load(spark, sf_dir, name)
    order = "ts" if name == "events" else df.columns[0]
    path = f"{out_dir}/{name}_stream"
    df.repartitionByRange(n_splits, F.col(order)).write.mode("overwrite").parquet(path)
    # The file stream source picks files up in modification-time order;
    # stamp strictly increasing mtimes in range (= event-time) order so
    # micro-batches arrive in order and the watermark never jumps ahead
    # of unread earlier data.
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = time.time() - len(parts) * 10
    for i, f in enumerate(parts):
        os.utime(os.path.join(path, f), (base + i * 10, base + i * 10))
    return out_dir


# Kafka wire schema: what format("kafka") delivers per record.
_KAFKA_WIRE_SCHEMA = (
    "key BINARY, value BINARY, topic STRING, partition INT, offset BIGINT, "
    "timestamp TIMESTAMP, timestampType INT"
)


def decode_kafka_value(raw: DataFrame,
                       value_schema_ddl: str = _EVENTS_STREAM_SCHEMA) -> DataFrame:
    """The Kafka deserialization step (Flink's JsonDeserializationSchema):
    value bytes → JSON → typed columns. Shared by the real kafka source
    and the file-backed stand-in so the schema path is testable without
    a broker."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), value_schema_ddl).alias("v")
    ).select("v.*")


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    value_schema_ddl: str = _EVENTS_STREAM_SCHEMA,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka source → parsed event columns (Flink KafkaSource + JSON
    deserialization). Requires the spark-sql-kafka package on the
    classpath; no broker exists in this harness, so the reader wiring is
    production-only — the decode stage it shares with
    ``kafka_topic_stand_in`` is what the tests drive."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_kafka_value(raw, value_schema_ddl)


def materialize_kafka_topic(
    spark: SparkSession, sf_dir: str, name: str, out_dir: str, n_splits: int = 4
) -> str:
    """Encode a fixture table as a Kafka-wire-shaped parquet 'topic dump':
    one row per record with (key, value BINARY, topic, partition, offset,
    timestamp) where value = JSON bytes of the payload — the same bytes a
    producer would put on the wire."""
    import os
    import time

    from ..tables import load

    df = load(spark, sf_dir, name)
    # μs-precision serialization (default to_json truncates to millis)
    payload = F.to_json(
        F.struct(*df.columns),
        {"timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"},
    )
    key_col = df.columns[0]
    path = f"{out_dir}/{name}_topic"
    wire = df.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit(name).alias("topic"),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_splits)).cast("int").alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    wire.repartition(n_splits).write.mode("overwrite").parquet(path)
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = time.time() - len(parts) * 10
    for i, f in enumerate(parts):
        os.utime(os.path.join(path, f), (base + i * 10, base + i * 10))
    return path


def kafka_topic_stand_in(
    spark: SparkSession,
    topic_path: str,
    value_schema_ddl: str = _EVENTS_STREAM_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-backed stand-in for ``kafka_stream``: streams a
    ``materialize_kafka_topic`` dump with the Kafka wire schema and runs
    the SAME ``decode_kafka_value`` stage — everything after the source
    format is identical to the broker path."""
    raw = (
        spark.readStream.schema(StructType.fromDDL(_KAFKA_WIRE_SCHEMA))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(topic_path)
    )
    return decode_kafka_value(raw, value_schema_ddl)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Flink datagen-connector equivalent: synthetic keyed event stream."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 100).alias("user_id"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
                (F.col("value") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.col("value") % 1000 / 10.0).alias("value"),
        )
    )


def jdbc_dim(spark: SparkSession, url: str, table: str, **options: str) -> DataFrame:
    """Dimension snapshot over JDBC (the flink-cdc MySQL dim sync stand-in).
    Use with F.broadcast() for lookup joins — idiomatic Spark replaces
    Flink's per-record RPC lookup with a broadcast snapshot."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def csv_table(spark: SparkSession, path: str, schema_ddl: str,
              header: bool = True, streaming: bool = False) -> DataFrame:
    """CSV file source (Flink filesystem connector, format=csv). Always
    pass an explicit schema: at 100 TB schema inference is a full extra
    scan, and a drifting inferred type breaks downstream plans."""
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(StructType.fromDDL(schema_ddl))
        .option("header", str(header).lower())
        .option("mode", "FAILFAST")
        .csv(path)
    )


def json_table(spark: SparkSession, path: str, schema_ddl: str,
               streaming: bool = False) -> DataFrame:
    """JSON-lines file source (Flink filesystem connector, format=json).
    Explicit schema for the same reasons as csv_table; timestamps use the
    μs format round-trip (see materialize_kafka_topic)."""
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(StructType.fromDDL(schema_ddl))
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .option("mode", "FAILFAST")
        .json(path)
    )


def orc_table(spark: SparkSession, path: str, schema_ddl: str,
              streaming: bool = False) -> DataFrame:
    """ORC file source (Flink filesystem connector, format=orc — the
    other columnar format the Flink ecosystem reads besides parquet).
    Spark's native ORC reader gives the same pushdown/pruning surface
    as parquet (PushedFilters in the scan node); explicit schema for
    the same reasons as csv_table."""
    reader = spark.readStream if streaming else spark.read
    return reader.schema(StructType.fromDDL(schema_ddl)).orc(path)
