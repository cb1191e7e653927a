"""Tests for the explicit scale operators (salting, checkpoint recovery)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from flink_realtime_edu_demo_spark.operators.skew import salted_agg_count, salted_join
from flink_realtime_edu_demo_spark.sources.readers import stream_table
from flink_realtime_edu_demo_spark.streaming.jobs import tumbling_counts
from flink_realtime_edu_demo_spark.tables import load


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(li, o, key="l_orderkey", salt=8, salt_source="l_linenumber")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(repr, plain.collect())) == sorted(map(repr, salted.collect()))


def test_salted_agg_count_matches_plain(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    plain = {r.event_type: r.n for r in
             ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r.event_type: r.n for r in
              salted_agg_count(ev, "event_type", salt=8, salt_source="event_id").collect()}
    assert plain == salted


def test_checkpoint_recovery_no_duplicates(spark, sf_dir, tmp_path):
    """Kill a stream after the first micro-batches, restart from the same
    checkpoint, and verify the final windowed aggregate equals the batch
    answer — replayed batches must not double-count (exactly-once over
    the file source + checkpoint)."""
    from flink_realtime_edu_demo_spark.sources.readers import materialize_stream_input

    in_dir = str(tmp_path / "in")
    materialize_stream_input(spark, sf_dir, "events", in_dir, n_splits=4)
    ckpt = str(tmp_path / "ckpt")
    out_tbl = "recovery_test_out"

    def start():
        sdf = tumbling_counts(stream_table(spark, in_dir, "events"))
        return (
            sdf.writeStream.format("memory")
            .queryName(out_tbl)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )

    q = start()
    # let it commit at least one micro-batch, then kill mid-stream
    deadline = time.time() + 60
    while time.time() < deadline:
        if any(p.numInputRows > 0 for p in q.recentProgress):
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)

    # restart from the same checkpoint and drain the rest
    sdf = tumbling_counts(stream_table(spark, in_dir, "events"))
    q2 = (
        sdf.writeStream.format("memory")
        .queryName(out_tbl)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    got = spark.sql(f"SELECT * FROM {out_tbl}")
    want = tumbling_counts(load(spark, sf_dir, "events"))
    assert sorted(map(repr, got.collect())) == sorted(map(repr, want.collect()))


def test_salted_join_default_salt_and_how_guard(spark, sf_dir):
    import pytest

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    # default salt source (row-level id) must not change results, and must
    # actually spread a key concentrated in one input partition
    plain = li.join(o, "l_orderkey").count()
    assert salted_join(li.coalesce(1), o, key="l_orderkey", salt=4).count() == plain
    with pytest.raises(ValueError, match="inner"):
        salted_join(li, o, key="l_orderkey", how="full")


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """The SCALE.md claim 'bucket both fact tables by the join key at
    write -> zero join shuffle' — demonstrated: lineitem and orders
    written bucketed by orderkey, joined, and the physical plan contains
    NO Exchange (vs 2 exchanges unbucketed)."""
    from flink_realtime_edu_demo_spark.sources.sinks import write_bucketed
    from flink_realtime_edu_demo_spark.tables import load

    # warehouse dir is a static conf — managed tables land in the session
    # default and are dropped (files included) in the finally block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        write_bucketed(li, "li_b", "l_orderkey", n_buckets=8)
        write_bucketed(o, "o_b", "o_orderkey", n_buckets=8)

        joined = spark.table("li_b").join(
            spark.table("o_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        want = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
        )
        assert joined.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_partition_pruning_on_date_partitioned_write(spark, sf_dir, tmp_path):
    """The SCALE.md layout rule 'write facts date-partitioned -> partition
    pruning': events written partitioned by day, a one-day filter must
    scan exactly one partition (PartitionFilters in the scan node, and
    the non-matching files never read)."""
    from flink_realtime_edu_demo_spark.tables import load

    ev = load(spark, sf_dir, "events").withColumn(
        "dt", F.col("ts").cast("date").cast("string")
    )
    path = str(tmp_path / "events_parted")
    ev.write.partitionBy("dt").mode("overwrite").parquet(path)

    days = [r.dt for r in ev.select("dt").distinct().collect()]
    assert len(days) >= 2, "fixture spans multiple days"
    one = sorted(days)[0]
    q = spark.read.parquet(path).filter(F.col("dt") == one)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan or "PartitionFilters: [" in plan
    # pruning really happened: only the selected day's rows are read
    assert q.count() == ev.filter(F.col("dt") == one).count()
    scan_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "dt" in scan_line


def test_aqe_skew_join_splits_hot_partition(spark):
    """SCALE.md's skew story, demonstrated: with one hot key holding
    ~95% of the left side, AQE's OptimizeSkewedJoin must split the
    oversized shuffle partition (SortMergeJoin(skew=true) in the final
    adaptive plan) and the join result must be identical to the
    unsplit one. Thresholds are shrunk so fixture-scale data trips the
    same code path a 100 TB hot key would."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 95% of rows on hot key 0; the other 5% spread over keys 1-9
        # (id%20==0 -> (id div 20) % 9 + 1, never 0) so the skew-split
        # partition coexists with genuinely non-skewed ones.
        left = spark.range(0, 300_000).select(
            F.when(
                F.col("id") % 20 == 0,
                (F.col("id") / 20).cast("long") % 9 + 1,
            ).otherwise(F.lit(0)).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") * 100).alias("w")
        )
        j = left.join(right, "k")
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        # every left row has exactly one match; w == k*100 throughout;
        # both the hot key and the spread keys are present in the result
        assert len(rows) == 300_000
        assert all(r.w == r.k * 100 for r in rows[:1000])
        keys = {r.k for r in rows}
        assert keys == set(range(10))
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_tpch_q13_without_broadcast_matches_default(spark, sf_dir):
    """Broadcast-budget degradation: when a dim outgrows the broadcast
    threshold on a real cluster, hint-free joins fall back to
    sort-merge — the answer must not change. q_tpch_q13 is hint-free,
    so disabling autoBroadcast exercises the SMJ path end to end; the
    plan must actually change strategy, the rows must not."""
    import flink_realtime_edu_demo_spark.queries  # noqa: F401 — populate registry
    from flink_realtime_edu_demo_spark.registry import QUERIES

    q = QUERIES["q_tpch_q13"]
    default_rows = sorted(map(repr, q(spark, sf_dir).collect()))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = q(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:600]
        smj_rows = sorted(map(repr, df.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert smj_rows == default_rows
