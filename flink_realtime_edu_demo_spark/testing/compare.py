"""Differential oracle harness — local mirror of the driver's t2 gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet fixtures and compares row count, sorted column names, and the
full order-insensitive multiset of canonicalized values. The local
comparison is *exact* (float repr, not tolerance): if this passes, any
sane driver-side value-hash passes too.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec

import duckdb

from ..tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, _dec.Decimal):
        # normalize 1.50 vs 1.5 and exponent forms
        return f"dec:{format(v.normalize(), 'f')}"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


#: Output-schema lint: types the DRIVER's pandas canonicalizer mishandles
#: even when our exact repr-based compare passes. DECIMAL: DuckDB's .df()
#: converts to float64 and drops trailing zeros while Spark keeps Decimal
#: objects (round-1 hash reds). ARRAY/MAP: pandas sort_values raises
#: "unhashable type: 'list'" (round-1 driver ERROR). Queries must surface
#: doubles / joined strings instead.
_DRIVER_UNSAFE_TYPES = ("DecimalType", "ArrayType", "MapType")


def assert_driver_safe_schema(spark_df, key: str = "?") -> None:
    for f in spark_df.schema.fields:
        tname = type(f.dataType).__name__
        assert tname not in _DRIVER_UNSAFE_TYPES, (
            f"{key}: output column {f.name!r} has driver-unsafe type {tname} "
            f"({f.dataType.simpleString()}); cast to double or array_join to "
            f"string before surfacing"
        )


def compare(
    spark_df,
    con: duckdb.DuckDBPyConnection,
    sql: str,
    key: str = "?",
    allow_empty: bool = False,
) -> None:
    """Raise AssertionError with a readable diff if Spark result != oracle.

    A 0-row result on both sides is rejected unless ``allow_empty``:
    empty==empty is a vacuous match that exercises none of the query's
    logic (the round-4 advisor found three keys silently green this way).
    """
    assert_driver_safe_schema(spark_df, key)
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"{key}: column mismatch spark={sorted(s_cols)} oracle={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{key}: row count spark={len(s_rows)} oracle={len(d_rows)}"
    )
    assert s_rows or allow_empty, (
        f"{key}: VACUOUS oracle match — both sides returned 0 rows; "
        f"tune the query's constants to the fixture or pass allow_empty"
    )
    cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        cols_sorted = sorted(s_cols)
        raise AssertionError(
            f"{key}: value mismatch; first diffs (cols={cols_sorted}):\n"
            + "\n".join(f"  spark={a}\n oracle={b}" for a, b in diffs)
        )
