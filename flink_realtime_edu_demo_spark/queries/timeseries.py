"""Time-series and data-quality operators over the events stream table:
gap filling onto a dense calendar grid, last-observation-carried-forward
interpolation, OHLC bar rollups, a one-pass column profiler, and an
approximate quantile sketch.

These are the "hypertable" conveniences a realtime-analytics user
expects on top of the windowed aggregates in streaming_batch.py — all
expressed as compositions of built-in DataFrame ops (sequence/explode,
windows, conditional aggregation); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..registry import dsum, query, sql_dsum
from ..tables import load


@query(
    "q_ts_gapfill",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    spans AS (
        SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        FROM daily GROUP BY event_type
    ),
    grid AS (
        SELECT s.event_type, CAST(g.d AS DATE) AS day
        FROM spans s, unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                                             CAST(s.d1 AS TIMESTAMP),
                                             INTERVAL 1 DAY)) AS g(d)
    )
    SELECT g.event_type, g.day, COALESCE(d.n, 0) AS n
    FROM grid g
    LEFT JOIN daily d ON d.event_type = g.event_type AND d.day = g.day
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: per event type, the daily count series
    densified onto every day between that key's first and last
    observation, zeros where no events landed — the dense grid a
    dashboard or a seasonality model needs. Plan: one groupBy for the
    sparse counts, a per-key span aggregate, `sequence()` + explode to
    manufacture the grid (rows created ∝ span-days × keys — tiny next
    to the input), LEFT join back. At 100 TB the expensive side is the
    FIRST aggregate; the grid join touches only the already-reduced
    series, so gap-filling costs nothing extra at scale. The grid
    derives from each key's OWN span (no global scalar), so keys with
    different lifetimes don't inflate each other."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type",
                   F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spans = daily.groupBy(F.col("event_type").alias("et")).agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "et",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    return (
        grid.join(daily, (grid.et == daily.event_type) & (grid.day == daily.day),
                  "left")
        .select(
            F.col("et").alias("event_type"),
            grid.day.alias("day"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


@query(
    "q_ts_interp",
    oracle="""
    WITH obs AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'click' THEN value END AS val
        FROM events
        WHERE user_id < 100
    )
    SELECT user_id, ts, event_id, val,
           last_value(val IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS val_ffill
    FROM obs
    """,
)
def q_ts_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF interpolation (last observation carried forward): treat
    non-click events as sensor gaps (NULL val) and fill each gap with
    the key's most recent observed value — `last_value(... IGNORE
    NULLS)` over an unbounded-preceding frame, identical semantics in
    Spark and DuckDB. The window is partitioned by user (keys ≫
    cores); (ts, event_id) ordering makes same-timestamp rows
    deterministic. This is the batch analog of keyed streaming state
    "hold last reading"; at scale it is one shuffle on the partition
    key and a single sort within partitions."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    val = F.when(F.col("event_type") == "click", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "ts", "event_id", val.alias("val"),
        F.last(val, ignorenulls=True).over(w).alias("val_ffill"),
    )


@query(
    "q_ts_ohlc",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id, value,
               row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type, hour,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n,
           {sql_dsum('value', 'vol_sum')}
    FROM hourly
    GROUP BY event_type, hour
    """,
)
def q_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar rollup: per (event_type, hour) the opening/closing
    values (first/last by event time, event_id tiebreak) plus
    high/low/count/volume — the canonical downsample for any metric
    or price series. Open/close are picked with two row_number
    windows over the SAME partition (one shuffle; the second ordering
    is a partition-local re-sort) and folded in the following
    aggregate, which reuses that partitioning — Catalyst plans
    window+agg on one exchange. Raw-parquet doubles are compared and
    selected, never re-accumulated (only vol_sum sums, decimal-exact),
    so cross-engine hashes can't drift."""
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts")
    wa = Window.partitionBy("event_type", hour).orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", hour).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    hourly = ev.select(
        "event_type", hour.alias("hour"), "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return hourly.groupBy("event_type", "hour").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
        dsum("value", "vol_sum"),
    )


@query(
    "q_dq_profile",
    oracle="""
    WITH m AS (
        SELECT COUNT(*) AS n,
               COUNT(o_custkey) AS nn_custkey,
               COUNT(DISTINCT o_custkey) AS nd_custkey,
               CAST(MIN(o_custkey) AS VARCHAR) AS min_custkey,
               CAST(MAX(o_custkey) AS VARCHAR) AS max_custkey,
               COUNT(o_orderstatus) AS nn_status,
               COUNT(DISTINCT o_orderstatus) AS nd_status,
               MIN(o_orderstatus) AS min_status,
               MAX(o_orderstatus) AS max_status,
               COUNT(o_totalprice) AS nn_price,
               COUNT(DISTINCT o_totalprice) AS nd_price,
               CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS min_price,
               CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS max_price
        FROM orders
    )
    SELECT 'o_custkey' AS col_name, n, n - nn_custkey AS n_null,
           nd_custkey AS n_distinct, min_custkey AS min_s, max_custkey AS max_s
    FROM m
    UNION ALL
    SELECT 'o_orderstatus', n, n - nn_status, nd_status, min_status, max_status
    FROM m
    UNION ALL
    SELECT 'o_totalprice', n, n - nn_price, nd_price, min_price, max_price
    FROM m
    """,
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality profiler (ANALYZE-TABLE shape): row count,
    null count, distinct count, min/max per profiled column, emitted as
    one row per column. ALL metrics for all columns come from a SINGLE
    aggregate over a single scan (the oracle's UNION ALL reads the
    1-row metric set three times; Spark unpivots the same 1-row
    aggregate with stack()) — at 100 TB the profiler costs exactly one
    pass regardless of how many columns are profiled. Extremes are
    stringified (doubles through DECIMAL) so heterogeneous columns
    share one output schema."""
    o = load(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("nn_custkey"),
        F.count_distinct("o_custkey").alias("nd_custkey"),
        F.min("o_custkey").cast("string").alias("min_custkey"),
        F.max("o_custkey").cast("string").alias("max_custkey"),
        F.count("o_orderstatus").alias("nn_status"),
        F.count_distinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderstatus").alias("min_status"),
        F.max("o_orderstatus").alias("max_status"),
        F.count("o_totalprice").alias("nn_price"),
        F.count_distinct("o_totalprice").alias("nd_price"),
        F.min("o_totalprice").cast("decimal(18,2)").cast("string").alias("min_price"),
        F.max("o_totalprice").cast("decimal(18,2)").cast("string").alias("max_price"),
    )
    return m.selectExpr(
        """stack(3,
            'o_custkey', n, n - nn_custkey, nd_custkey, min_custkey, max_custkey,
            'o_orderstatus', n, n - nn_status, nd_status, min_status, max_status,
            'o_totalprice', n, n - nn_price, nd_price, min_price, max_price
        ) AS (col_name, n, n_null, n_distinct, min_s, max_s)"""
    ).select("col_name", "n", "n_null", "n_distinct", "min_s", "max_s")


@query("q_agg_approx_quantile")  # rows-only: sketch internals are engine-specific
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles per key via Spark's approx_percentile
    (Greenwald-Khanna sketch, accuracy 1/10000): p50/p90/p99 of the
    event value per event type. Like the HLL key (q_agg_approx_uv),
    the sketch's exact output is engine-specific, so the driver
    records rows-only; tests/test_operators.py bracket-asserts each
    estimate within the sketch's rank-error bound of the exact
    percentile computed side-by-side. This is the 100 TB quantile
    path: mergeable fixed-size sketches, one partial per partition —
    the exact percentile (q_agg_percentile) needs a full sort of the
    group, the sketch never materializes one."""
    ev = load(spark, sf_dir, "events")
    acc = 10_000
    return ev.groupBy("event_type").agg(
        F.expr(f"approx_percentile(value, 0.5, {acc})").alias("p50"),
        F.expr(f"approx_percentile(value, 0.9, {acc})").alias("p90"),
        F.expr(f"approx_percentile(value, 0.99, {acc})").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


def _scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared SCD2 interval construction — the single source of truth
    for BOTH the build query and the temporal-join consumer, so the
    change-event set, tie-break ordering, and interval-close rule can
    never silently diverge between them. Columns: user_id, version,
    state, valid_from, valid_to (NULL = current)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase") & (F.col("user_id") < 200)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.row_number().over(w).cast("int").alias("version"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )


@query(
    "q_scd2_build",
    oracle="""
    WITH changes AS (
        SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS version,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM events
        WHERE event_type IN ('signup', 'purchase') AND user_id < 200
    )
    SELECT user_id, CAST(version AS INT) AS version, event_type AS state,
           ts AS valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM changes
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from a change stream: each user's
    signup/purchase events become versioned validity intervals —
    valid_from = the change ts, valid_to = the NEXT change's ts (NULL
    = current row). This is the standard warehouse pattern for
    as-of-joinable dimensions (op/asof.py consumes exactly this
    shape). One window over (user_id) does both the version number and
    the interval close — single shuffle, no self-join; (ts, event_id)
    ordering removes same-timestamp ambiguity. At 100 TB the incoming
    CDC batch would be unioned with each key's current open row before
    the window — same plan, one extra narrow union."""
    return _scd2_dim(spark, sf_dir).withColumn(
        "is_current", F.col("valid_to").isNull()
    )


@query(
    "q_ts_interval_merge",
    oracle="""
    WITH iv AS (
        SELECT user_id, ts AS s, ts + INTERVAL 5 MINUTE AS e
        FROM events WHERE event_type = 'view'
    ),
    marked AS (
        SELECT user_id, s, e,
               CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING)
                    OR max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) IS NULL
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    grp AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS island
        FROM marked
    ),
    merged AS (
        SELECT user_id, island, MIN(s) AS m_start, MAX(e) AS m_end
        FROM grp GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM((epoch_us(m_end) - epoch_us(m_start)) // 1000000)
                AS BIGINT) AS watch_seconds
    FROM merged
    GROUP BY user_id
    """,
)
def q_ts_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval merge (the course-play watch-time metric a
    realtime education warehouse reports): each view event opens a
    5-minute viewing interval; per user, overlapping/adjacent-by-
    overlap intervals merge into sessions, and total covered seconds
    is summed WITHOUT double-counting overlap. Classic gaps-and-
    islands: an interval starts a new island iff its start exceeds the
    running max end of everything before it; the running SUM of those
    markers labels islands; min(start)/max(end) per island are the
    merged bounds. Two windows + two aggs, ALL partitioned by user_id
    — one shuffle, reused end-to-end. Durations are computed as exact
    epoch-microsecond integer differences floor-divided to seconds on
    BOTH engines — timestampdiff(SECOND) truncates the interval while
    DuckDB's date_diff counts second-boundary crossings, and the two
    disagree whenever the endpoints' fractional seconds straddle."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    iv = ev.select(
        "user_id", F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    prev = (
        Window.partitionBy("user_id").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("user_id").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max_e = F.max("e").over(prev)
    marked = iv.select(
        "user_id", "s", "e",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1)
        .otherwise(0).alias("new_island"),
    )
    grp = marked.select(
        "user_id", "s", "e", F.sum("new_island").over(run).alias("island")
    )
    merged = grp.groupBy("user_id", "island").agg(
        F.min("s").alias("m_start"), F.max("e").alias("m_end")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            # unix_micros rejects TIMESTAMP_NTZ; the cast shifts both
            # endpoints by the same session-tz offset, so diffs are exact
            F.expr(
                "(unix_micros(cast(m_end as timestamp))"
                " - unix_micros(cast(m_start as timestamp))) div 1000000"
            )
        ).cast("long").alias("watch_seconds"),
    )


@query(
    "q_agg_regression",
    oracle="""
    WITH pts AS (
        SELECT o_orderpriority,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
               o_totalprice AS y
        FROM orders
    ),
    sums AS (
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(28,2))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(y * y AS DECIMAL(30,4))) AS DOUBLE) AS syy
        FROM pts GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 9)
               AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS r2
    FROM sums
    """,
)
def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group linear regression (price trend over order date) — the
    Flink SQL REGR_SLOPE/REGR_INTERCEPT/R² family, computed from the
    five classical sufficient statistics in ONE grouping pass. The
    builtin regr_* aggregates accumulate floats in partition order
    (non-deterministic across engines), so both sides instead fold
    EXACT sums — integer x/x², decimal y/xy/y² — and derive
    slope/intercept/r² with identical double arithmetic on identical
    inputs: bit-stable. This is also the 100 TB shape: sufficient
    statistics are algebraic (map-side partials, constant size per
    group), where a two-pass covariance would re-scan."""
    o = load(spark, sf_dir, "orders")
    x = F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1995-01-01").cast("date")).cast("long")
    y = F.col("o_totalprice")
    sums = o.select("o_orderpriority", x.alias("x"), y.alias("y")).groupBy(
        "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # sx/sxx SUM exactly in int64 (safe to ~4e12 rows/group at this
        # x range), then convert to double BEFORE the slope algebra:
        # the 100x soak caught `n * sxx` overflowing int64 under ANSI
        # (DuckDB silently promotes its sums to HUGEINT, so only the
        # Spark side threw). Both engines now run the derived algebra
        # in double on identically-rounded inputs — at the sf0.01 gate
        # every sum is < 2^53, so the conversion is exact and the hash
        # unaffected.
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y").cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,2)"))
        .cast("double").alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(30,4)"))
        .cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    # derived stats rounded to 9 dp: the inputs are exact, but the final
    # double expression trees differ by ~2 ulp between engines (fused
    # evaluation order) — rounding pins the hash without losing signal
    return sums.select(
        "o_orderpriority", "n",
        F.round(slope, 9).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 9)
        .alias("intercept"),
        F.round(
            (num * num)
            / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            9,
        ).alias("r2"),
    )


@query(
    "q_scd2_asof_enrich",
    oracle="""
    WITH dim AS (
        SELECT user_id, ts AS valid_from, event_type AS state,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM events
        WHERE event_type IN ('signup', 'purchase') AND user_id < 200
    )
    SELECT e.event_id, e.user_id, e.ts, d.state, d.valid_from
    FROM events e
    JOIN dim d
      ON d.user_id = e.user_id
     AND e.ts >= d.valid_from
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    WHERE e.event_type = 'view' AND e.user_id < 200
    """,
)
def q_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-table join end to end (Flink's ``FOR SYSTEM_TIME AS
    OF``): view events enriched with the SCD2 state (q_scd2_build's
    interval shape) valid AT each event's timestamp. Lowered to an
    equi-join on the entity key plus the interval predicate — ONE
    shuffle on user_id; within a key the interval scan is bounded by
    that key's version count (tiny), so no range-join explosion. The
    non-overlapping-intervals invariant (by construction: valid_to =
    next valid_from) guarantees at most one match per event — exactly
    the as-of semantics, without needing the op/asof.py union trick
    because the dimension is already intervalized."""
    ev = load(spark, sf_dir, "events")
    dim = _scd2_dim(spark, sf_dir).select(
        F.col("user_id").alias("d_uid"), "valid_from", "state", "valid_to"
    )
    views = ev.filter((F.col("event_type") == "view") & (F.col("user_id") < 200))
    return (
        views.join(
            dim,
            (views.user_id == dim.d_uid)
            & (views.ts >= dim.valid_from)
            & (dim.valid_to.isNull() | (views.ts < dim.valid_to)),
        )
        .select("event_id", "user_id", "ts", "state", "valid_from")
    )
