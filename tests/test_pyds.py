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
    # residual Filter may reference isnotnull but no comparison against
    # the pushed literals (match operators, not bare substrings —
    # expression IDs like #1003L would false-positive on "100")
    plan = f._jdf.queryExecution().executedPlan().toString()
    filter_lines = [ln for ln in plan.splitlines()
                    if "Filter (" in ln]  # operator lines, not "RuntimeFilters:"
    assert filter_lines, plan
    for ln in filter_lines:
        assert "isnotnull" in ln, ln
        for op in (">= 100", "< 200", "= click", "> 100", "<= 200"):
            assert op not in ln, ln


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


def test_stream_restart_resumes_without_duplicates(spark, tmp_path):
    """Kill-and-restart on the custom source: the committed offset is
    fed back into read(start), so the restarted query must resume at
    the checkpointed position — every event_id exactly once across
    both runs, nothing re-emitted, nothing skipped. Parquet sink (the
    memory sink cannot recover from a checkpoint); its file commit log
    plus the deterministic source give end-to-end exactly-once."""
    ckpt = str(tmp_path / "pyds_ckpt")
    out = str(tmp_path / "pyds_out")

    def start(trigger):
        sdf = (
            spark.readStream.format("edu_events")
            .option("rows", 1000).option("rowsPerBatch", 100).load()
        )
        return (
            sdf.writeStream.format("parquet").option("path", out)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(processingTime=trigger).start()
        )

    # slow trigger so phase 1 provably stops mid-stream
    q1 = start("3 seconds")
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            if len(list((tmp_path / "pyds_out").glob("part-*"))) >= 1:
                break
        except OSError:
            pass
        time.sleep(0.2)
    time.sleep(0.5)  # let the in-flight batch commit sink+log atomically
    q1.stop()
    q1.awaitTermination(30)
    ddl = ("event_id long, ts timestamp_ntz, user_id long, "
           "event_type string, value double, course_id long")
    n1 = spark.read.schema(ddl).parquet(out).count()
    assert 0 < n1 < 1000, n1

    q2 = start("200 milliseconds")
    deadline = time.time() + 90
    while time.time() < deadline:
        if spark.read.schema(ddl).parquet(out).count() >= 1000:
            break
        time.sleep(0.3)
    q2.stop()
    q2.awaitTermination(30)

    ids = sorted(r.event_id
                 for r in spark.read.schema(ddl).parquet(out).collect())
    assert len(ids) == len(set(ids)), "duplicate rows after restart"
    assert ids == list(range(1000)), (n1, len(ids))
