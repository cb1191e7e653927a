"""Scalar function families (SURVEY.md §2.8) — Flink SQL built-ins mapped
to pyspark.sql.functions. All JVM-side expressions inside whole-stage
codegen; no Python UDFs.

Cross-engine parity notes (each encoded in the paired oracle SQL):
- Spark dayofweek() is 1=Sunday..7; DuckDB dayofweek() is 0=Sunday..6.
- Spark CAST(double AS BIGINT) truncates toward zero; DuckDB rounds —
  oracle uses trunc() explicitly.
- round() on positive doubles: Spark HALF_UP == DuckDB half-away-from-zero.
- ln/log10/exp may differ by 1 ulp between libm and the JVM intrinsic —
  outputs are rounded to 6 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query
from ..tables import load


@query(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_up,
           lower(c_mktsegment) AS seg_lo,
           substring(c_name, 1, 8) AS name_pre,
           length(c_name) AS name_len,
           trim(concat('  ', c_name, '  ')) AS name_trim,
           concat(c_name, '#', c_mktsegment) AS name_seg,
           replace(c_name, 'Customer', 'Cust') AS name_repl,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_novowel,
           instr(c_name, '0') AS pos0,
           split_part(c_name, '#', 1) AS name_part,
           (c_name LIKE '%1%') AS has1
    FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: case, substring, trim, concat, replace, pad,
    regex, search, split."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_up"),
        F.lower("c_mktsegment").alias("seg_lo"),
        F.substring("c_name", 1, 8).alias("name_pre"),
        F.length("c_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trim"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("name_seg"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_repl"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_mktsegment", "[AEIOU]", "_").alias("seg_novowel"),
        F.instr(F.col("c_name"), "0").cast("long").alias("pos0"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_part"),
        F.col("c_name").like("%1%").alias("has1"),
    )


@query(
    "q_fn_datetime",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_hour,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_day,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(dayofmonth(ts) AS INT) AS d,
           CAST(hour(ts) AS INT) AS h,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(quarter(ts) AS INT) AS q,
           strftime(ts, '%Y-%m') AS ym,
           ts + INTERVAL 90 MINUTE AS ts_plus,
           ts - INTERVAL 1 DAY AS ts_minus_day,
           CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS INT) AS days_since,
           CAST(trunc(epoch(ts)) AS BIGINT) AS unix_s,
           CAST(ts AS DATE) AS d_date
    FROM events
    """,
)
def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: EXTRACT, FLOOR(ts TO unit), format, interval
    arithmetic, TIMESTAMPDIFF (Flink SQL temporal built-ins)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("ts_hour"),
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("ts_day"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.dayofweek("ts").alias("dow"),
        F.quarter("ts").alias("q"),
        F.date_format("ts", "yyyy-MM").alias("ym"),
        (F.col("ts") + F.make_interval(mins=F.lit(90))).alias("ts_plus"),
        (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("ts_minus_day"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since"
        ),
        # timestampdiff on NTZ is timezone-independent, unlike
        # unix_timestamp(cast) which would shift under a non-UTC session
        F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").alias(
            "unix_s"
        ),
        F.col("ts").cast("date").alias("d_date"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT o_orderkey,
           abs(o_totalprice - 100000)       AS abs_diff,
           round(o_totalprice, 1)           AS p_round1,
           round(o_totalprice)              AS p_round0,
           CAST(ceil(o_totalprice) AS BIGINT)  AS p_ceil,
           CAST(floor(o_totalprice) AS BIGINT) AS p_floor,
           sqrt(o_totalprice)               AS p_sqrt,
           CAST(o_orderkey % 7 AS BIGINT)   AS key_mod,
           CAST(sign(o_totalprice - 100000) AS DOUBLE) AS diff_sign,
           greatest(o_totalprice, 50000.0)  AS p_hi,
           least(o_totalprice, 50000.0)     AS p_lo,
           o_totalprice * o_totalprice      AS p_sq,
           round(ln(o_totalprice), 6)       AS p_ln,
           round(log10(o_totalprice), 6)    AS p_log10,
           round(power(o_totalprice, 0.5) - sqrt(o_totalprice), 6) + 0.0 AS pow_chk
    FROM orders
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt/abs/ceil/floor/mod/sign/greatest/least are
    IEEE-exact; ln/log10/power rounded to 6 decimals (1-ulp libm vs JVM
    intrinsic divergence)."""
    o = load(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(p - 100000).alias("abs_diff"),
        F.round(p, 1).alias("p_round1"),
        F.round(p, 0).alias("p_round0"),
        F.ceil(p).alias("p_ceil"),
        F.floor(p).alias("p_floor"),
        F.sqrt(p).alias("p_sqrt"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.signum(p - 100000).alias("diff_sign"),
        F.greatest(p, F.lit(50000.0)).alias("p_hi"),
        F.least(p, F.lit(50000.0)).alias("p_lo"),
        (p * p).alias("p_sq"),
        F.round(F.log(p), 6).alias("p_ln"),
        F.round(F.log10(p), 6).alias("p_log10"),
        (F.round(F.pow(p, 0.5) - F.sqrt(p), 6) + 0.0).alias("pow_chk"),
    )


@query(
    "q_fn_string2",
    oracle="""
    SELECT c_custkey,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nat,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
           repeat(substring(c_mktsegment, 1, 2), 3) AS seg_rep,
           reverse(c_mktsegment) AS seg_rev,
           left(c_name, 4) AS name_l4,
           right(c_name, 4) AS name_r4,
           CAST(position('0' in c_name) AS BIGINT) AS pos_zero,
           CAST(ascii(c_mktsegment) AS INT) AS seg_ascii,
           chr(65 + CAST(c_custkey % 26 AS INT)) AS key_chr
    FROM customer
    """,
)
def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: concat_ws, translate, repeat, reverse,
    left/right, position, ascii, chr."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_nat"
        ),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_tr"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 3).alias("seg_rep"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.substring("c_name", 1, 4).alias("name_l4"),
        F.right(F.col("c_name"), F.lit(4)).alias("name_r4"),
        F.instr(F.col("c_name"), "0").cast("long").alias("pos_zero"),
        F.ascii("c_mktsegment").alias("seg_ascii"),
        F.chr(65 + (F.col("c_custkey") % 26)).alias("key_chr"),
    )


@query(
    "q_fn_bitwise",
    oracle="""
    SELECT event_id,
           user_id & 255 AS b_and,
           user_id | 8 AS b_or,
           xor(user_id, event_id) AS b_xor,
           user_id << 2 AS b_shl,
           event_id >> 3 AS b_shr,
           CAST(bit_count(user_id) AS INT) AS b_pop,
           ~user_id AS b_not
    FROM events
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount/complement — used for
    flag columns and hash mixing in pipeline code; all exact ints."""
    ev = load(spark, sf_dir, "events")
    uid, eid = F.col("user_id"), F.col("event_id")
    return ev.select(
        "event_id",
        uid.bitwiseAND(F.lit(255)).alias("b_and"),
        uid.bitwiseOR(F.lit(8)).alias("b_or"),
        uid.bitwiseXOR(eid).alias("b_xor"),
        F.shiftleft(uid, 2).alias("b_shl"),
        F.shiftright(eid, 3).alias("b_shr"),
        F.bit_count(uid).alias("b_pop"),
        F.bitwise_not(uid).alias("b_not"),
    )


@query(
    "q_fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           substring(md5(text), 1, 16) AS h_md5_16,
           length(md5(text)) AS md5_len
    FROM documents
    WHERE doc_id < 100
    """,
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family (the pipeline workhorses for dedup keys, bucketing,
    and fingerprints): md5 / sha2-256, hex-encoded identically by both
    engines."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text").cast("binary")
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.md5(t).alias("h_md5"),
        F.sha2(t, 256).alias("h_sha256"),
        F.substring(F.md5(t), 1, 16).alias("h_md5_16"),
        F.length(F.md5(t)).cast("long").alias("md5_len"),
    )


@query(
    "q_fn_cast",
    oracle="""
    SELECT e.event_id,
           CAST(trunc(e.value) AS BIGINT) AS value_int,
           CAST(e.user_id AS DOUBLE) AS uid_d,
           CAST(e.user_id AS VARCHAR) AS uid_s,
           CAST(CAST(e.user_id AS VARCHAR) AS BIGINT) AS uid_rt,
           CAST(e.ts AS DATE) AS ts_date,
           CAST(CAST(e.ts AS DATE) AS VARCHAR) AS ts_date_s,
           CAST(CAST(e.value AS DECIMAL(12,3)) AS DOUBLE) AS value_dec,
           CAST(e.user_id % 2 = 0 AS BOOLEAN) AS uid_even,
           CAST(CAST(e.user_id % 2 = 0 AS BOOLEAN) AS INT) AS uid_even_i
    FROM events e
    """,
)
def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST across every §1.3 type family. double→int goes through an
    explicit truncation contract (Spark cast truncates; DuckDB cast
    rounds, so the oracle uses trunc())."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("value").cast("long").alias("value_int"),
        F.col("user_id").cast("double").alias("uid_d"),
        F.col("user_id").cast("string").alias("uid_s"),
        F.col("user_id").cast("string").cast("long").alias("uid_rt"),
        F.col("ts").cast("date").alias("ts_date"),
        F.col("ts").cast("date").cast("string").alias("ts_date_s"),
        # decimal round-trip exercised, but surfaced as double: the driver's
        # pandas canonicalizer strips decimal trailing zeros inconsistently
        # across engines (round-1 red), so DECIMAL never appears in output.
        F.col("value").cast("decimal(12,3)").cast("double").alias("value_dec"),
        (F.col("user_id") % 2 == 0).alias("uid_even"),
        (F.col("user_id") % 2 == 0).cast("int").alias("uid_even_i"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_c,
           embedding[64] AS last_c,
           list_contains(list_transform(embedding, x -> x > 2.0), true) AS has_gt2,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       (a, b) -> a + b) AS norm_sq,
           array_to_string(list_transform(
               list_sort(list_transform(list_slice(embedding, 1, 4),
                         x -> round(CAST(x AS DOUBLE), 3) + 0.0)),
               x -> printf('%.3f', x)), ',') AS head4_sorted
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order functions: size, element_at, slice,
    transform, aggregate (the dot-product building block for §2.11
    similarity search). The fold order (left, 0-seeded) matches DuckDB's
    list_reduce left fold, so the double accumulation is bit-identical."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    xsq = F.transform(emb, lambda x: x.cast("double") * x.cast("double"))
    return e.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.element_at(emb, 1).alias("first_c"),
        F.element_at(emb, 64).alias("last_c"),
        F.array_contains(F.transform(emb, lambda x: x > 2.0), True).alias("has_gt2"),
        F.aggregate(xsq, F.lit(0.0), lambda a, x: a + x).alias("norm_sq"),
        # joined to a string: the driver's pandas canonicalizer cannot hash
        # list cells (round-1 ERROR), so arrays never appear in output.
        # %.3f of a round(x,3) double is exact in both engines' printf.
        F.array_join(
            F.transform(
                F.array_sort(
                    # +0.0 collapses -0.0 to 0.0 identically in both engines
                    F.transform(
                        F.slice(emb, 1, 4),
                        lambda x: F.round(x.cast("double"), 3) + 0.0,
                    )
                ),
                lambda x: F.format_string("%.3f", x),
            ),
            ",",
        ).alias("head4_sorted"),
    )


@query(
    "q_fn_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_array_length(json_keys(props)) AS BIGINT) AS n_keys,
           CAST(json_keys(props)[1] AS VARCHAR) AS first_key
    FROM events
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family over the JSON props column: from_json → MAP<STRING,BIGINT>,
    then element_at / map_keys / size (Flink MAP type + JSON format)."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


@query(
    "q_fn_trig",
    oracle="""
    SELECT o_orderkey,
           round(sin(o_totalprice / 100000.0), 6) + 0.0 AS v_sin,
           round(cos(o_totalprice / 100000.0), 6) + 0.0 AS v_cos,
           round(atan2(o_totalprice, 100000.0), 6) AS v_atan2,
           round(degrees(atan2(o_totalprice, 100000.0)), 6) AS v_deg,
           round(radians(45.0) * o_orderkey % 7, 6) AS v_rad,
           round(exp(o_totalprice / 1000000.0), 6) AS v_exp,
           round(tan(o_totalprice / 1000000.0), 6) + 0.0 AS v_tan
    FROM orders
    """,
)
def q_fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trig/exponential family — rounded to 6 decimals (libm vs JVM
    intrinsics differ in the last ulp), -0.0 collapsed with +0.0."""
    o = load(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        (F.round(F.sin(p / 100000.0), 6) + 0.0).alias("v_sin"),
        (F.round(F.cos(p / 100000.0), 6) + 0.0).alias("v_cos"),
        F.round(F.atan2(p, F.lit(100000.0)), 6).alias("v_atan2"),
        F.round(F.degrees(F.atan2(p, F.lit(100000.0))), 6).alias("v_deg"),
        F.round(F.radians(F.lit(45.0)) * F.col("o_orderkey") % 7, 6).alias("v_rad"),
        F.round(F.exp(p / 1000000.0), 6).alias("v_exp"),
        (F.round(F.tan(p / 1000000.0), 6) + 0.0).alias("v_tan"),
    )


@query(
    "q_fn_datetime2",
    oracle="""
    SELECT event_id,
           CAST(CAST(ts AS DATE) + INTERVAL 30 DAY AS DATE) AS d_plus,
           CAST(CAST(ts AS DATE) - INTERVAL 7 DAY AS DATE) AS d_minus,
           last_day(CAST(ts AS DATE)) AS d_lastday,
           CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS d_week,
           CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS d_month,
           CAST(date_part('doy', ts) AS INT) AS d_doy,
           CAST(date_part('week', ts) AS INT) AS d_weeknum,
           make_date(2024, CAST(month(ts) AS INT), 1) AS d_made,
           CAST(strptime('2024-03-15 12:30:45', '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)
               AS ts_parsed
    FROM events
    """,
)
def q_fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date/time family: date arithmetic, last_day, week/month
    truncation, day-of-year, ISO week number, make_date, string→timestamp
    parsing. DuckDB's date +/- INTERVAL widens to TIMESTAMP, so the
    oracle casts back to DATE (Spark date_add/date_sub stay DATE);
    'week' truncation is ISO-Monday in both engines."""
    ev = load(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    return ev.select(
        "event_id",
        F.date_add(d, 30).alias("d_plus"),
        F.date_sub(d, 7).alias("d_minus"),
        F.last_day(d).alias("d_lastday"),
        F.date_trunc("week", d).cast("date").alias("d_week"),
        F.date_trunc("month", d).cast("date").alias("d_month"),
        F.dayofyear("ts").alias("d_doy"),
        F.weekofyear("ts").alias("d_weeknum"),
        F.make_date(F.lit(2024), F.month("ts"), F.lit(1)).alias("d_made"),
        F.to_timestamp(F.lit("2024-03-15 12:30:45"), "yyyy-MM-dd HH:mm:ss")
        .cast("timestamp_ntz")
        .alias("ts_parsed"),
    )


@query(
    "q_fn_editdist",
    oracle="""
    WITH pairs AS (
        SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
               a.c_name AS name_a, b.c_name AS name_b
        FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
    )
    SELECT key_a, key_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist,
           CAST(levenshtein(name_a, reverse(name_b)) AS BIGINT) AS edit_dist_rev,
           (levenshtein(name_a, name_b) <= 2) AS near_name
    FROM pairs
    """,
)
def q_fn_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance family (levenshtein — the record-linkage workhorse
    for name/address dedup): exact integer distances over a bounded
    consecutive-key pairing, never an unbounded self-join. At scale the
    pairing side comes from a blocking key (phonetic bucket, n-gram
    LSH) exactly like the text-dedup candidates."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = c.select(F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"))
    b = c.select((F.col("c_custkey") - 1).alias("key_a"),
                 F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"))
    pairs = a.join(b, "key_a")
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return pairs.select(
        "key_a",
        "key_b",
        lev.cast("long").alias("edit_dist"),
        F.levenshtein(F.col("name_a"), F.reverse(F.col("name_b"))).cast("long").alias(
            "edit_dist_rev"
        ),
        (lev <= 2).alias("near_name"),
    )


@query(
    "q_fn_try",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber = 3 THEN NULL
                ELSE round(l_extendedprice / (l_linenumber - 3), 6) END
             AS safe_div_r,
           TRY_CAST(split_part(c_name, '#', 2) AS BIGINT) AS name_num,
           TRY_CAST(c_name AS BIGINT) AS name_as_num,
           CASE WHEN 9223372036854775707 + CAST(l_orderkey AS HUGEINT)
                     > 9223372036854775807
                THEN NULL
                ELSE CAST(9223372036854775707 + l_orderkey AS BIGINT) END
             AS near_max_add,
           list_extract(string_split(c_name, '#'), 3) AS part3
    FROM lineitem
    JOIN customer ON c_custkey = l_orderkey % 150
    WHERE l_orderkey < 500
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_* error-handling family (Flink/ANSI TRY_CAST and Spark's
    try_* twins — the functions that keep a 100 TB job alive when one
    malformed row would otherwise kill the stage under ANSI mode):
    try_divide (NULL on /0), try_cast (NULL on bad parse, both the
    numeric tail of c_name and the full non-numeric string), try_add
    (NULL on int64 overflow — the oracle reproduces the boundary in
    HUGEINT), try_element_at (NULL past the end of an array). Narrow
    map over a broadcast join, every expression JVM-side."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    c = load(spark, sf_dir, "customer")
    j = li.join(F.broadcast(c), c["c_custkey"] == li["l_orderkey"] % 150)
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - 3), 6
        ).alias("safe_div_r"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2))
        .try_cast("long").alias("name_num"),
        F.col("c_name").try_cast("long").alias("name_as_num"),
        F.try_add(
            F.lit(9223372036854775707), F.col("l_orderkey")
        ).alias("near_max_add"),
        F.try_element_at(F.split(F.col("c_name"), "#"), F.lit(3)).alias("part3"),
    )


@query(
    "q_fn_url",
    oracle=r"""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || doc_id
                   || '?lang=' || lang || '&n=' || n_chars AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+:', 0) AS protocol,
           regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\?([^#]*)', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param
    FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family — Flink SQL's PARSE_URL (Hive semantics),
    which Spark ships verbatim as `parse_url`: HOST / PROTOCOL / PATH /
    QUERY extraction plus keyed query-parameter lookup, over URLs
    synthesized from the documents columns (the fixtures carry no URL
    column). All JVM-side; the oracle replays each part with anchored
    regexes, exact for these well-formed URLs. PROTOCOL is emitted as
    'https:' (scheme + colon) so both spellings agree byte-for-byte."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        F.lit("&n="), F.col("n_chars").cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.concat(F.parse_url(F.col("url"), F.lit("PROTOCOL")), F.lit(":")).alias("protocol"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "q_fn_struct",
    oracle="""
    SELECT o_orderkey,
           {'p': o_orderpriority, 's': o_orderstatus}.p AS pri,
           ({'a': o_totalprice, 'k': o_orderkey}
            < {'a': 1000.0, 'k': CAST(0 AS BIGINT)}) AS under_1k_first,
           CASE WHEN o_orderstatus = 'F'
                THEN {'x': o_custkey, 'y': o_orderkey}.x
                ELSE {'x': o_custkey, 'y': o_orderkey}.y END AS picked
    FROM orders
    WHERE o_orderkey < 5000
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW/struct value functions (Flink SQL ROW(...) constructor, field
    access, and lexicographic row comparison): build nested structs
    inline, read fields back, and use whole-struct `<` ordering — the
    tuple-comparison idiom behind multi-key arg-min and as-of ties.
    Both engines compare structs field-by-field lexicographically.
    Output columns are scalars extracted FROM the structs (nested
    output types don't survive the driver's pandas canonicalization —
    same policy as the map/array keys). Narrow, zero shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    ps = F.struct(F.col("o_orderpriority").alias("p"),
                  F.col("o_orderstatus").alias("s"))
    cmp_l = F.struct(F.col("o_totalprice").alias("a"),
                     F.col("o_orderkey").alias("k"))
    cmp_r = F.struct(F.lit(1000.0).alias("a"),
                     F.lit(0).cast("long").alias("k"))
    xy = F.struct(F.col("o_custkey").alias("x"), F.col("o_orderkey").alias("y"))
    return o.select(
        "o_orderkey",
        ps.getField("p").alias("pri"),
        (cmp_l < cmp_r).alias("under_1k_first"),
        F.when(F.col("o_orderstatus") == "F", xy.getField("x"))
        .otherwise(xy.getField("y")).alias("picked"),
    )


@query(
    "q_fn_monthmath",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 1 MONTH AS plus1m,
           o_orderdate - INTERVAL 3 MONTH AS minus3m,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS am2,
           last_day(CAST(o_orderdate AS DATE)) AS eom,
           CAST((2001 - year(o_orderdate)) * 12
                + (6 - month(o_orderdate)) AS INT) AS months_to_mid01
    FROM orders
    WHERE o_orderkey < 4000
    """,
)
def q_fn_monthmath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month arithmetic — the end-of-month clamp family
    (Flink's TIMESTAMPADD(MONTH, ...) / LAST_DAY): Jan 31 + 1 month =
    Feb 29, probe-verified identical clamping in Spark and DuckDB for
    timestamp+INTERVAL, date+INTERVAL (add_months), and subtraction.
    Whole-month distance is computed as the explicit
    (Δyear·12 + Δmonth) formula in BOTH engines — months_between /
    date_diff('month') have engine-specific fraction/boundary rules
    and are deliberately avoided. Narrow, zero shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 1 MONTH")).alias("plus1m"),
        (F.col("o_orderdate") - F.expr("INTERVAL 3 MONTH")).alias("minus3m"),
        F.add_months(d, 2).alias("am2"),
        F.last_day(d).alias("eom"),
        ((2001 - F.year("o_orderdate")) * 12 + (6 - F.month("o_orderdate")))
        .cast("int").alias("months_to_mid01"),
    )
