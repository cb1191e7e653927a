"""Custom Python DataSource (sources/datagen.py) — the datagen
connector: partition planning, deterministic replay, filter pushdown
observable in the physical plan, and micro-batch streaming that drains
to exactly the batch content.
"""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from flink_realtime_edu_demo_spark.sources.datagen import (
    _gen_row,
    register_edu_events,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_edu_events(spark)


def _batch(spark, **opts):
    r = spark.read.format("edu_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_rows_partitions_schema(spark):
    df = _batch(spark, rows=1000, partitions=5)
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 5
    assert df.schema.simpleString() == (
        "struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint,"
        "event_type:string,value:double,course_id:bigint>"
    )


def test_deterministic_replay_across_partitionings(spark):
    """Same (seed, rows) must yield identical content no matter how the
    range is split — the property that makes task retries and
    speculative execution safe."""
    a = sorted(map(tuple, _batch(spark, rows=800, partitions=7).collect()))
    b = sorted(map(tuple, _batch(spark, rows=800, partitions=2).collect()))
    assert a == b and len(a) == 800


def test_filter_pushdown_values_and_plan(spark):
    df = _batch(spark, rows=1000, partitions=4)
    f = df.filter(
        (F.col("event_id") >= 100) & (F.col("event_id") < 200)
        & (F.col("event_type") == "click")
    )
    expected = [
        r for r in (_gen_row(42, i, 100) for i in range(100, 200))
        if r[3] == "click"
    ]
    got = sorted(map(tuple, f.collect()))
    assert got == sorted(expected)
    # the pushed predicates must leave only null-guards behind: the
    # residual Filter may reference isnotnull but NOT the literals
    plan = f._jdf.queryExecution().executedPlan().toString()
    filter_lines = [ln for ln in plan.splitlines() if "Filter" in ln]
    assert filter_lines, plan
    assert all("100" not in ln and "click" not in ln for ln in filter_lines), plan


def test_unsupported_filters_stay_with_spark(spark):
    """A predicate the source can't evaluate (on `value`) must still be
    applied by Spark — pushFilters returning it as unhandled."""
    df = _batch(spark, rows=500, partitions=3)
    got = df.filter(F.col("value") > 50.0).count()
    expected = sum(
        1 for i in range(500) if _gen_row(42, i, 100)[4] > 50.0
    )
    assert got == expected


def test_stream_drains_to_batch_content(spark):
    sdf = (
        spark.readStream.format("edu_events")
        .option("rows", 600).option("rowsPerBatch", 250)
        .option("partitions", 3).load()
    )
    name = "pyds_mem_drain"
    q = (
        sdf.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql(f"SELECT count(*) c FROM {name}").collect()[0].c >= 600:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
    exp = sorted(map(tuple, _batch(spark, rows=600).collect()))
    assert got == exp  # multi-micro-batch replay == one batch read
