"""Query + oracle registry.

Every operator from SURVEY.md §2 registers here via the ``@query``
decorator: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL.
``__spark_entry__.py`` simply re-exports these dicts to the driver.

Oracle-parity rules baked into every registered query (SURVEY.md §5.3):
- every computed column aliased identically in Spark and SQL;
- float-sensitive aggregates go through exact decimal sums (see
  ``dsum``) so results are bit-identical regardless of accumulation
  order in either engine;
- rank/limit queries break ties on a unique key;
- timestamps normalized to μs at load.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``key``; ``oracle`` is DuckDB-runnable ANSI SQL
    over the pre-registered fixture views, or None for rows-only checks."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE[key] = textwrap.dedent(oracle).strip()
        fn.query_key = key  # type: ignore[attr-defined]
        return fn

    return deco


def dsum(expr: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent float sum: cast to DECIMAL(18,scale), sum exactly,
    cast back to double. The double→decimal rounding is deterministic and
    engine-agnostic (an exact decimal half at scale≥1 is non-dyadic, so the
    rounding-mode difference between Spark HALF_UP and DuckDB can't fire),
    and decimal addition is exact, so Spark's partition-order accumulation
    and DuckDB's sequential sum agree bit-for-bit.

    Oracle-side mirror: CAST(SUM(CAST(e AS DECIMAL(18,s))) AS DOUBLE).
    """
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def sql_dsum(e: str, alias: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({e} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"
