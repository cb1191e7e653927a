"""MATCH_RECOGNIZE subset — contiguous row-pattern matching per key
(SURVEY.md §2.9 / §7 hard part #6, generalizing operators/funnel.py).

Scope (the useful core of Flink's MATCH_RECOGNIZE):
- PARTITION BY key, ORDER BY (ts, id) — total order per key;
- PATTERN = a SEQUENCE of variables, each defined by an event-type
  equality predicate or an ALTERNATION over several types
  (``("click", "error")`` ≡ ``C|E``), with quantifiers ``1`` (exactly
  one), ``?``, ``+``, ``*`` — contiguous rows, as in SQL row-pattern
  matching (a non-matching row breaks adjacency; Flink CEP's relaxed
  ``followedBy`` is the funnel operator instead);
- greedy quantifiers, ONE ROW PER MATCH, AFTER MATCH SKIP PAST LAST
  ROW — matches per key are enumerated left to right, non-overlapping.

Spark-first lowering — regex over an id-carrying token string:
each event becomes a token ``<type_char><event_id>;`` and each key's
ordered token concatenation is scanned with one
``regexp_extract_all`` (JVM regex, no Python in the loop). Because
tokens EMBED the event id, every measure — first/last event id, row
counts per variable — is recovered from the matched substring alone,
which is exactly what any engine's regexp_extract_all returns; no
match *positions* are needed, so a DuckDB oracle replays the whole
pipeline verbatim (string_agg + regexp_extract_all) and hash-matches.
One shuffle total (groupBy key); everything else is narrow.

At 100 TB: per-key strings are bounded by events-per-key (~KBs for
real user streams); for unbounded keys sessionize first (window the
key by time) so each group's string stays small — same pattern
semantics within a session, which is how MATCH_RECOGNIZE jobs are
deployed on streams anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_QUANTS = {"1": "", "?": "?", "+": "+", "*": "*"}


def _types_of(etype) -> tuple:
    """A variable's predicate: one event type, or an ALTERNATION over
    several (`("click", "error")` ≡ MATCH_RECOGNIZE's `C|E` variable)."""
    return tuple(etype) if isinstance(etype, (list, tuple)) else (etype,)


def _char_map(pattern: list[tuple[str, object, str]]) -> dict[str, str]:
    """One char per distinct event type in the pattern, in first-use
    order: 'a', 'b', ... ('z' is reserved for non-matching types)."""
    types: list[str] = []
    for _, etype, _ in pattern:
        for t in _types_of(etype):
            if t not in types:
                types.append(t)
    if len(types) > 25:
        raise ValueError("at most 25 distinct event types per pattern")
    return {t: chr(ord("a") + i) for i, t in enumerate(types)}


def _validate(pattern: list[tuple[str, object, str]]) -> None:
    if not pattern:
        raise ValueError("pattern needs at least one variable")
    seen = set()
    for var, etype, quant in pattern:
        if quant not in _QUANTS:
            raise ValueError(f"quantifier {quant!r} not in {sorted(_QUANTS)}")
        if var in seen:
            raise ValueError(f"duplicate pattern variable {var!r}")
        if not _types_of(etype):
            raise ValueError(f"variable {var!r} needs at least one event type")
        seen.add(var)


def _var_class(etype, chars: dict[str, str]) -> str:
    """The variable's token chars, first-use order, e.g. 'c' or 'ce'."""
    return "".join(chars[t] for t in _types_of(etype))


def _token_regex(pattern: list[tuple[str, object, str]],
                 chars: dict[str, str]) -> str:
    """The token-level regex: ``(?:<class>[0-9]+;)<quant>`` per variable
    (`<class>` is a single char or a [..] alternation class). Digits-only
    id class keeps the string free of backslash escapes in both Spark
    SQL and DuckDB literals."""
    pieces = []
    for _, etype, quant in pattern:
        cls = _var_class(etype, chars)
        atom = cls if len(cls) == 1 else f"[{cls}]"
        pieces.append(f"(?:{atom}[0-9]+;){_QUANTS[quant]}")
    return "".join(pieces)


def match_recognize(
    events: DataFrame,
    pattern: list[tuple[str, str, str]],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Contiguous row-pattern matching; ``pattern`` is a list of
    ``(variable, event_type_or_tuple, quantifier)`` with quantifier in
    ``{'1', '?', '+', '*'}`` — a tuple of types is an alternation
    (the variable matches any of them).

    ``key`` may be a single column name or a list (e.g. a composite
    (user, session) partition from :func:`sessionize`).

    Returns one row per match:
    ``key..., match_no (1-based per key, left to right), first_event_id,
    last_event_id, n_rows, n_<variable.lower()>...`` where n_<var> is
    the number of rows the variable's type-char absorbed inside the
    match (per TYPE: two variables sharing an event type share counts).
    """
    _validate(pattern)
    keys = [key] if isinstance(key, str) else list(key)
    chars = _char_map(pattern)
    regex = _token_regex(pattern, chars)

    tok_char: F.Column = F.lit("z")
    for etype, ch in reversed(chars.items()):
        tok_char = F.when(F.col(type_col) == etype, ch).otherwise(tok_char)
    toks = events.select(
        *[F.col(k) for k in keys],
        F.struct(
            F.col(ts).alias("ts"),
            F.col(id_col).alias("id"),
            F.concat(tok_char, F.col(id_col).cast("string"), F.lit(";")).alias("tok"),
        ).alias("t"),
    )
    seq = toks.groupBy(*keys).agg(
        F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list("t")), lambda s: s["tok"])
        ).alias("s")
    )
    matched = seq.select(
        *[F.col(k) for k in keys],
        F.posexplode(F.regexp_extract_all("s", F.lit(regex), F.lit(0))),
    ).select(
        *[F.col(k) for k in keys],
        (F.col("pos") + 1).cast("long").alias("match_no"),
        F.regexp_extract("col", "^[a-z]([0-9]+);", 1).cast("long").alias("first_event_id"),
        F.regexp_extract("col", "([0-9]+);$", 1).cast("long").alias("last_event_id"),
        (F.length("col") - F.length(F.translate("col", ";", ""))).cast("long").alias("n_rows"),
        *[
            (
                F.length("col")
                - F.length(F.translate("col", _var_class(etype, chars), ""))
            ).cast("long").alias(f"n_{var.lower()}")
            for var, etype, _ in pattern
        ],
    )
    return matched


def _oracle_core(
    pattern,
    keys: list[str],
    source_sql: str,
    ts: str,
    type_col: str,
    id_col: str,
) -> str:
    """Shared DuckDB replay of :func:`match_recognize` over an arbitrary
    event source subquery and (possibly composite) partition keys."""
    _validate(pattern)
    chars = _char_map(pattern)
    regex = _token_regex(pattern, chars)
    case = " ".join(f"WHEN '{t}' THEN '{c}'" for t, c in chars.items())
    ks = ", ".join(keys)

    def strip_class(expr: str, cls: str) -> str:
        for c in cls:
            expr = f"replace({expr}, '{c}', '')"
        return expr

    var_counts = ",\n           ".join(
        f"CAST(length(l[i]) - length({strip_class('l[i]', _var_class(etype, chars))})"
        f" AS BIGINT) AS n_{var.lower()}"
        for var, etype, _ in pattern
    )
    return f"""
    WITH src AS ({source_sql}),
    toks AS (
        SELECT {ks},
               CASE {type_col} {case} ELSE 'z' END || {id_col} || ';' AS tok,
               {ts}, {id_col}
        FROM src
    ),
    seq AS (SELECT {ks}, string_agg(tok, '' ORDER BY {ts}, {id_col}) AS s
            FROM toks GROUP BY {ks}),
    m AS (SELECT {ks}, regexp_extract_all(s, '{regex}') AS l FROM seq)
    SELECT {ks}, CAST(i AS BIGINT) AS match_no,
           CAST(regexp_extract(l[i], '^[a-z]([0-9]+);', 1) AS BIGINT) AS first_event_id,
           CAST(regexp_extract(l[i], '([0-9]+);$', 1) AS BIGINT) AS last_event_id,
           CAST(length(l[i]) - length(replace(l[i], ';', '')) AS BIGINT) AS n_rows,
           {var_counts}
    FROM m, unnest(generate_series(1, len(l))) AS t(i)
    """


def match_recognize_oracle_sql(
    pattern: list[tuple[str, str, str]],
    table: str = "events",
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB SQL replaying :func:`match_recognize` token-for-token."""
    return _oracle_core(pattern, [key], f"SELECT * FROM {table}",
                        ts, type_col, id_col)


def sessionize(
    events: DataFrame,
    gap_minutes: int,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign a per-key ``session_id`` (0-based, time order): a new
    session starts when the gap to the previous event exceeds
    ``gap_minutes``. Pure timestamp arithmetic (no epoch conversion, so
    TIMESTAMP_NTZ never passes through a session-timezone cast) — one
    sort-shuffle on the key, the same exchange the downstream
    per-session aggregation reuses."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(ts, id_col)
    prev = F.lag(ts).over(w)
    is_new = F.when(
        prev.isNull()
        | (F.col(ts) > prev + F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        (F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
        .cast("long"),
    )


def match_recognize_sessionized(
    events: DataFrame,
    pattern: list[tuple[str, object, str]],
    gap_minutes: int,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """The 100 TB deployment shape promised in SCALE.md: sessionize the
    key by ``gap_minutes``, then run :func:`match_recognize` within each
    (key, session) — matches cannot span a session gap, and per-group
    token strings are bounded by session length instead of a key's full
    history. Output adds ``session_id`` to the match columns."""
    s = sessionize(events, gap_minutes, key, ts, id_col)
    return match_recognize(s, pattern, key=[key, "session_id"],
                           ts=ts, type_col=type_col, id_col=id_col)


def match_recognize_sessionized_oracle_sql(
    pattern,
    gap_minutes: int,
    table: str = "events",
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB SQL replaying :func:`match_recognize_sessionized`."""
    source = f"""
        SELECT {key}, {ts}, {id_col}, {type_col},
               CAST(SUM(CASE WHEN prev_ts IS NULL
                              OR {ts} > prev_ts + INTERVAL {int(gap_minutes)} MINUTE
                         THEN 1 ELSE 0 END)
                    OVER (PARTITION BY {key} ORDER BY {ts}, {id_col}
                          ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
        FROM (SELECT {key}, {ts}, {id_col}, {type_col},
                     lag({ts}) OVER (PARTITION BY {key}
                                     ORDER BY {ts}, {id_col}) AS prev_ts
              FROM {table})"""
    return _oracle_core(pattern, [key, "session_id"], source,
                        ts, type_col, id_col)
