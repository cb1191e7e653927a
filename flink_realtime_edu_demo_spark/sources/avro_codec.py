"""Avro wire-format decode (SURVEY.md §2.1; VERDICT r14 missing #2) —
the OTHER common Kafka payload in the Flink demo genre besides JSON:
Flink's ``avro`` / ``avro-confluent`` formats mapped to Spark's
``from_avro``/``to_avro`` (the external ``spark-avro`` module).

Gate pattern (same as the Kafka broker gate in readers.py): the
``spark-avro`` connector jar (org.apache.spark:spark-avro_2.13) is NOT
part of the pyspark wheel — only the core Apache Avro jars ship — so
this module probes for it LIVE (:func:`avro_available`) and the decode
surface either works end-to-end (jar present: tests round-trip
synthesized ``to_avro`` bytes) or raises the documented
:class:`AvroUnavailable` (jar absent: tests pin the gate message).
Everything up to the JVM function call — framing arithmetic, schema
strings, column plumbing — is exercised either way.

Scale note: ``from_avro`` is a JVM catalyst expression (whole-stage
codegen, no Python), so the decode stage costs the same as the JSON
``from_json`` path at 100 TB: one narrow projection, no shuffle. The
Confluent wire framing strip is two ``substring`` calls on BINARY —
also codegen'd.

Reference: /root/reference/README.md:1 (the reference publishes no
code; semantics from the public Flink avro/avro-confluent format docs
and the Confluent wire-format spec: 1 magic byte 0x00 + 4-byte
big-endian schema id + avro body).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# Avro record schema for the events payload — the same fields the JSON
# path (readers._EVENTS_STREAM_SCHEMA) carries. Timestamps ride as
# micros (timestamp-micros logical type), Flink's avro convention.
AVRO_EVENTS_SCHEMA = json.dumps({
    "type": "record",
    "name": "Event",
    "namespace": "edu.demo",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "user_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
        {"name": "props", "type": ["null", "string"], "default": None},
    ],
})


class AvroUnavailable(RuntimeError):
    """The spark-avro connector jar is not on the classpath. Add
    org.apache.spark:spark-avro_<scala>:<spark-version> via
    ``spark.jars.packages`` — the pyspark wheel does not bundle it."""


_GATE_MSG = (
    "spark-avro connector jar not on the classpath (the pyspark wheel "
    "ships only core avro jars) — add "
    "org.apache.spark:spark-avro_2.13:<spark-version> via "
    "spark.jars.packages to enable from_avro/to_avro"
)


def avro_available(spark: SparkSession) -> bool:
    """Live probe for the spark-avro module: constructing a from_avro
    expression reaches the JVM class, so jar absence surfaces here
    without running a job. Mirrors the Kafka broker probe — re-run per
    environment, never cached in code.

    Only the ABSENT-MODULE failure reports False (ADVICE r15: a broken
    schema string or an unrelated JVM error must surface as itself,
    not masquerade as 'jar absent' behind the gate message): Spark
    raises a specific guidance message / missing-class error for the
    unshipped avro module, matched here; anything else propagates."""
    try:
        from pyspark.sql.avro.functions import from_avro

        schema = json.dumps({"type": "record", "name": "P",
                             "fields": [{"name": "x", "type": "long"}]})
        df = spark.range(1).select(F.lit(b"\x00").alias("v"))
        df.select(from_avro("v", schema).alias("r"))  # expression build only
        return True
    except Exception as e:
        msg = str(e)
        absent_markers = (
            # Spark's dedicated guidance for the unshipped module
            "Failed to find data source: avro",
            "AVRO data source",
            "spark-avro",
            # raw JVM missing-class spellings
            "ClassNotFoundException",
            "NoClassDefFoundError",
            "org.apache.spark.sql.avro",
        )
        if any(m in msg for m in absent_markers):
            return False
        raise


def _require_avro(spark: SparkSession) -> None:
    if not avro_available(spark):
        raise AvroUnavailable(_GATE_MSG)


def strip_confluent_framing(value: Column) -> Column:
    """Remove the Confluent schema-registry wire framing from a BINARY
    Kafka value: byte 1 is the magic 0x00, bytes 2-5 the big-endian
    schema id, the avro body starts at byte 6. Pure substring on
    binary — codegen'd, no Python. (substring on BINARY returns the
    byte slice; the max-int length means "to the end".)"""
    return F.substring(value, 6, 2147483647)


def confluent_schema_id(value: Column) -> Column:
    """The 4-byte big-endian SIGNED int32 schema id from a
    Confluent-framed value — what a registry-aware decoder would
    dispatch on. Exposed so a multi-schema topic can route rows to
    per-schema decode branches (filter on id, then from_avro per
    branch). The wire format declares the id a signed int32 (ADVICE
    r15): an unsigned decode >= 2^31 wraps to the negative value the
    spec means, done branchlessly via the two's-complement identity
    ((u + 2^31) mod 2^32) - 2^31."""
    b = lambda i: F.conv(F.hex(F.substring(value, i, 1)), 16, 10).cast("long")  # noqa: E731
    unsigned = b(2) * 16777216 + b(3) * 65536 + b(4) * 256 + b(5)
    signed = (unsigned + 2147483648) % 4294967296 - 2147483648
    return signed.alias("schema_id")


def decode_kafka_avro(
    raw: DataFrame,
    avro_schema_json: str = AVRO_EVENTS_SCHEMA,
    confluent_wire: bool = False,
) -> DataFrame:
    """The Avro deserialization step (Flink's ``avro`` /
    ``avro-confluent`` value format): Kafka wire rows → typed columns.
    Shared by the real kafka source and the file-backed stand-in,
    exactly like readers.decode_kafka_value for JSON. Raises
    :class:`AvroUnavailable` when the connector jar is absent."""
    _require_avro(raw.sparkSession)
    from pyspark.sql.avro.functions import from_avro

    body = (strip_confluent_framing(F.col("value")) if confluent_wire
            else F.col("value"))
    return raw.select(
        from_avro(body, avro_schema_json).alias("v")
    ).select("v.*")


def encode_avro_value(
    df: DataFrame,
    avro_schema_json: str = AVRO_EVENTS_SCHEMA,
    confluent_wire: bool = False,
    schema_id: int = 1,
) -> DataFrame:
    """Producer-side twin for the synthesized-bytes oracle: pack the
    frame's columns into one avro BINARY ``value`` column (optionally
    Confluent-framed) — the same bytes a registry-backed producer puts
    on the wire. Used by tests to round-trip decode_kafka_avro."""
    _require_avro(df.sparkSession)
    from pyspark.sql.avro.functions import to_avro

    body = to_avro(F.struct(*df.columns), avro_schema_json)
    if confluent_wire:
        sid = schema_id.to_bytes(4, "big")
        body = F.concat(F.lit(bytes([0]) + sid).cast("binary"), body)
    return df.select(body.alias("value"))
