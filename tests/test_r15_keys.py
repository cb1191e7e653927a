"""Dedicated unit tests for the three round-15 keys that previously
had only the parametrized oracle sweep (VERDICT r15 wrong #5):
q_stream_window_dedup, q_stream_tumble_grouping_sets,
q_llm_decontam_embed. Each test recomputes the key's defining
property INDEPENDENTLY of the key's own plan (different operators,
same semantics), so a shared-lowering bug can't self-confirm.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from flink_realtime_edu_demo_spark.queries.llm4 import q_llm_decontam_embed
from flink_realtime_edu_demo_spark.queries.streaming_batch import (
    q_stream_tumble_grouping_sets,
    q_stream_window_dedup,
)
from flink_realtime_edu_demo_spark.tables import load


def test_window_dedup_emits_first_row_per_window_key(spark, sf_dir):
    """Exactly one row per (hour window, user), and it is the
    (ts, event_id)-min row of the group — recomputed with min_by
    instead of the key's row_number() lowering."""
    got = {(r.window_start, r.user_id, r.event_id)
           for r in q_stream_window_dedup(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events")
    want_df = (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.min_by(
            "event_id",
            F.struct(F.col("ts"), F.col("event_id"))).alias("event_id"))
        .select(F.col("w.start").cast("timestamp_ntz")
                .alias("window_start"), "user_id", "event_id")
    )
    want = {(r.window_start, r.user_id, r.event_id)
            for r in want_df.collect()}
    assert got == want and got
    # one row per (window, key): the projection to pairs is lossless
    assert len(got) == len({(w, u) for w, u, _ in got})


def test_tumble_grouping_sets_subtotals_are_consistent(spark, sf_dir):
    """Per window: the g=1 subtotal row equals the SUM of that
    window's g=0 per-type rows (count and value alike); the window
    column is never rolled up (no NULL window_start anywhere); the
    window set equals the distinct tumbling hours of the fixture."""
    rows = q_stream_tumble_grouping_sets(spark, sf_dir).collect()
    assert rows
    sub = {r.window_start: (r.n, r.total_value)
           for r in rows if r.g == 1}
    per_type: dict = {}
    for r in rows:
        if r.g == 0:
            assert r.event_type is not None
            n, tv = per_type.get(r.window_start, (0, 0.0))
            per_type[r.window_start] = (n + r.n, tv + r.total_value)
        assert r.window_start is not None  # window never rolled up
    assert set(sub) == set(per_type)
    for w, (n, tv) in per_type.items():
        assert sub[w][0] == n
        assert abs(sub[w][1] - tv) < 1e-6
    ev = load(spark, sf_dir, "events")
    hours = {
        r.ws for r in ev.select(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("ws")
        ).distinct().collect()
    }
    assert set(sub) == hours


def test_decontam_embed_flags_exactly_the_planted_leaks(spark, sf_dir):
    """The synthesized benchmark plants positive controls (scaled
    copies of every 50th vector, capped at vec_id < 1000) and
    decorrelated negative controls: the contaminated set must be
    EXACTLY the positive-control sources, cosines must be bounded,
    and each leak source's max cosine must be ~1."""
    out = q_llm_decontam_embed(spark, sf_dir).collect()
    ids = {r.vec_id for r in out}
    n_vec = load(spark, sf_dir, "embeddings").count()
    assert len(out) == n_vec  # one decision per train row
    planted = {i for i in ids if i % 50 == 3 and i < 1000}
    assert planted  # fixture must exercise the positive controls
    flagged = {r.vec_id for r in out if r.contaminated == 1}
    assert flagged == planted
    for r in out:
        assert -1.000001 <= r.max_benchmark_cosine_r <= 1.000001
        if r.vec_id in planted:
            assert r.max_benchmark_cosine_r >= 0.999
