"""Multimodal column plumbing tests (SURVEY.md §2.11): the codec is
stubbed, the Spark-side schema/Arrow/partitioning is real."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_realtime_edu_demo_spark.multimodal import (
    decode_media,
    dedup_by_payload,
    media_from_documents,
)
from flink_realtime_edu_demo_spark.tables import load


def test_media_schema_shape(spark, sf_dir):
    m = media_from_documents(load(spark, sf_dir, "documents"))
    assert [f.name for f in m.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert m.schema["payload"].dataType.typeName() == "binary"
    meta_fields = [f.name for f in m.schema["meta"].dataType.fields]
    assert meta_fields == ["mime", "width", "height", "duration_ms"]


def test_decode_stub_deterministic_fixed_shape(spark, sf_dir):
    m = media_from_documents(load(spark, sf_dir, "documents")).limit(50)
    f1 = decode_media(m, fake=True).collect()
    f2 = decode_media(m, fake=True).collect()
    assert sorted(map(repr, f1)) == sorted(map(repr, f2))
    assert all(len(r.features) == 8 for r in f1)


def test_decode_real_codec_is_explicit_stub(spark, sf_dir):
    m = media_from_documents(load(spark, sf_dir, "documents")).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_media(m, fake=False).collect()


def test_payload_dedup_groups_identical_payloads(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    m = media_from_documents(docs)
    deduped = dedup_by_payload(m)
    assert deduped.count() == docs.select("text").distinct().count()
    assert deduped.agg(F.sum("n_copies")).collect()[0][0] == docs.count()
