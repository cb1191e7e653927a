"""Contract guards: the registry, driver entry module, and docs stay
consistent as queries are added (cheap, no Spark needed)."""

from __future__ import annotations

import os

import flink_realtime_edu_demo_spark.queries  # noqa: F401
from flink_realtime_edu_demo_spark.registry import ORACLE, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# SURVEY.md §2 keys the driver's checklist names explicitly
SURVEY_CORE_KEYS = {
    "q_agg_basic", "q_agg_count_distinct", "q_agg_filtered", "q_agg_stats",
    "q_agg_collect", "q_agg_rollup", "q_agg_having", "q_agg_percentile",
    "q_upsert_latest", "q_project_arith", "q_filter_pred", "q_explode_array",
    "q_distinct", "q_case_when", "q_json_extract", "q_join_inner",
    "q_join_left", "q_join_full", "q_join_semi", "q_join_anti",
    "q_join_theta_scaled", "q_join_cross_topk", "q_join_interval", "q_join_asof",
    "q_join_window", "q_win_rank", "q_topn_per_key", "q_win_laglead",
    "q_win_running_sum", "q_win_moving_avg", "q_sort_limit", "q_set_union",
    "q_set_intersect", "q_set_except", "q_fn_string", "q_fn_datetime",
    "q_fn_math", "q_fn_cast", "q_fn_array", "q_fn_map", "q_stream_tumble",
    "q_stream_hop", "q_stream_session", "q_dedup_exact", "q_funnel",
    "q_udf_scalar", "q_udaf_groupagg", "q_llm_dedup_exact",
    "q_llm_dedup_fuzzy", "q_llm_knn", "q_llm_tfidf", "q_llm_quality",
}


def test_every_survey_key_is_implemented():
    missing = SURVEY_CORE_KEYS - set(QUERIES)
    assert not missing, f"SURVEY §2 keys not implemented: {sorted(missing)}"


def test_oracle_subset_of_queries():
    extra = set(ORACLE) - set(QUERIES)
    assert not extra, f"oracles without queries: {sorted(extra)}"


def test_rows_only_queries_are_documented():
    """Every query without an oracle must state its reason in COVERAGE.md."""
    coverage = open(os.path.join(REPO, "COVERAGE.md")).read()
    for key in set(QUERIES) - set(ORACLE):
        assert key in coverage, f"rows-only query {key} not documented in COVERAGE.md"


def test_every_query_documented_in_coverage():
    coverage = open(os.path.join(REPO, "COVERAGE.md")).read()
    undocumented = [k for k in QUERIES if k not in coverage]
    # families documented as ranges count via their prefix listing
    assert not undocumented, f"queries missing from COVERAGE.md: {undocumented}"


def test_entry_module_exports_registry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert set(m.queries()) == set(QUERIES)
    assert set(m.oracle_sql()) == set(ORACLE)


def test_csv_json_sources_roundtrip(spark, sf_dir, tmp_path):
    """CSV/JSON filesystem sources read back the events table exactly
    (explicit schema, FAILFAST, us-precision timestamps)."""
    from pyspark.sql import functions as F

    from flink_realtime_edu_demo_spark.sources.readers import csv_table, json_table
    from flink_realtime_edu_demo_spark.tables import load

    ev = load(spark, sf_dir, "events")
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in ev.schema.fields)
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    ev.write.option("timestampNTZFormat", fmt).json(jdir)
    ev.write.option("timestampNTZFormat", fmt).option("header", True).csv(cdir)

    want = sorted(map(repr, ev.collect()))
    got_j = json_table(spark, jdir, ddl).select(*ev.columns)
    assert sorted(map(repr, got_j.collect())) == want
    got_c = csv_table(spark, cdir, ddl).select(*ev.columns)
    # CSV has no NULL-vs-empty-string distinction for props; compare on a
    # normalized frame
    norm = lambda df: sorted(
        map(repr, df.withColumn("props", F.coalesce("props", F.lit(""))).collect())
    )
    assert norm(got_c) == norm(ev)


def test_missing_sf_dir_raises_clean_path_error(spark):
    from py4j.protocol import Py4JJavaError
    import pytest

    from flink_realtime_edu_demo_spark.tables import load

    with pytest.raises(Exception, match="PATH_NOT_FOUND|Path does not exist"):
        load(spark, "/root/testdata/sf-nope", "events").collect()


def test_events_loader_reads_us_fixture_regardless_of_nanos_conf(spark, sf_dir):
    """The us-encoded fixture path must not depend on the legacy nanos
    conf in either state (the driver uses a vanilla session)."""
    from flink_realtime_edu_demo_spark.tables import load

    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        assert load(spark, sf_dir, "events").count() > 0
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


def test_same_query_twice_one_session_is_stable(spark, sf_dir):
    from flink_realtime_edu_demo_spark.registry import QUERIES

    a = sorted(map(repr, QUERIES["q_agg_basic"](spark, sf_dir).collect()))
    b = sorted(map(repr, QUERIES["q_agg_basic"](spark, sf_dir).collect()))
    assert a == b


def test_spark_sql_surface_over_registered_views(spark, sf_dir):
    """A Flink-SQL user's migration path: register_views + spark.sql.
    A grouped agg and a TUMBLE-equivalent windowed agg both run as raw
    SQL and match their DataFrame twins."""
    from flink_realtime_edu_demo_spark.registry import QUERIES
    from flink_realtime_edu_demo_spark.tables import register_views

    register_views(spark, sf_dir)
    sql_agg = spark.sql("""
        SELECT event_type, COUNT(DISTINCT user_id) AS uv, COUNT(*) AS pv
        FROM events GROUP BY event_type
    """)
    df_agg = QUERIES["q_agg_count_distinct"](spark, sf_dir)
    assert sorted(map(repr, sql_agg.collect())) == sorted(map(repr, df_agg.collect()))

    sql_win = spark.sql("""
        SELECT window.start AS ws, event_type, COUNT(*) AS n
        FROM events GROUP BY window(ts, '1 hour'), event_type
    """)
    assert sql_win.count() > 0


def test_events_loader_handles_ns_and_us_fixtures(spark, sf_dir, tmp_path):
    """The driver has shipped events.ts as both timestamp[ns] (rounds
    1-2) and timestamp[us] (round-3 regen). load() sniffs the footer;
    both encodings must yield identical timestamp_ntz values — and the
    ns path must override a caller-preset nanosAsLong=false (the driver
    uses a vanilla session; load() owns that conf)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_realtime_edu_demo_spark.tables import load

    t = pq.read_table(f"{sf_dir}/events.parquet")
    idx = t.schema.get_field_index("ts")
    ns_t = t.set_column(
        idx, "ts", t.column("ts").cast(pa.timestamp("ns"))
    )
    ns_dir = tmp_path / "ns_fixture"
    ns_dir.mkdir()
    pq.write_table(ns_t, str(ns_dir / "events.parquet"),
                   store_schema=False, coerce_timestamps=None,
                   version="2.6")
    want = sorted(map(repr, load(spark, sf_dir, "events").collect()))
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        got = sorted(map(repr, load(spark, str(ns_dir), "events").collect()))
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    assert got == want


def test_orc_source_sink_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC filesystem source/sink: exact events round-trip with explicit
    schema, and the ORC scan keeps the predicate-pushdown surface
    (PushedFilters on the scan node) like parquet."""
    from flink_realtime_edu_demo_spark.sources.readers import orc_table
    from flink_realtime_edu_demo_spark.sources.sinks import write_orc
    from flink_realtime_edu_demo_spark.tables import load

    ev = load(spark, sf_dir, "events")
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in ev.schema.fields)
    odir = str(tmp_path / "o")
    write_orc(ev, odir)

    got = orc_table(spark, odir, ddl).select(*ev.columns)
    assert sorted(map(repr, got.collect())) == sorted(map(repr, ev.collect()))

    plan = (
        orc_table(spark, odir, ddl)
        .filter("event_type = 'click'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "event_type" in plan
