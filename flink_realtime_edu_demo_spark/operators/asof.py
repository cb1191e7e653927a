"""As-of (temporal) join — Flink's ``FOR SYSTEM_TIME AS OF`` / versioned
temporal join (SURVEY.md §2.3, §7 hard part #2).

Spark has no native as-of join. Two implementations behind one API:

1. ``asof_join`` — the 100 TB scale path: union probe and reference
   rows, one shuffle on the key, and a running ``last(ignorenulls)``
   window fills each probe row with the most recent reference value at
   or before its timestamp. Cost: a single sort-shuffle on
   ``(keys, ts, side)`` — no range explosion, no per-row lookup, skew
   handled by AQE like any window. This is the same
   union-and-fill lowering DuckDB/kdb use for ASOF.

2. ``asof_join_pandas`` — clarity/reference path: cogroup the two
   sides per key and run ``pandas.merge_asof`` inside
   ``applyInPandas``. Arrow-batched; fine when each key's history fits
   in memory, used to cross-check the window implementation.

Semantics (both): for each probe row, the reference row with the
greatest ``ref_ts <= probe_ts`` per key; ties on ``ref_ts`` take the
reference row that sorts last on ``tie_break`` under NULLS-FIRST
ordering, so a reference row with a real tie_break value always beats
one with NULL (pass a unique non-null column to make results fully
deterministic). Probe rows with no earlier reference get NULL values
(left as-of join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def assert_tiebreak_unique(
    ref: DataFrame,
    keys: list[str],
    ref_ts: str,
    tie_break: str | None,
) -> None:
    """Probe the as-of determinism contract: ``(keys, ref_ts, tie_break)``
    must be unique in the reference (and tie_break non-null), otherwise
    ties resolve by partition-internal order and results are
    nondeterministic. One aggregation with ``limit(1)`` — a single
    cheap job over the reference side, independent of probe size.
    Raises ValueError on the first violation instead of letting
    NULLS-FIRST ordering resolve it silently."""
    group = [*keys, ref_ts, *( [tie_break] if tie_break else [] )]
    checks = F.col("n") > 1
    if tie_break:
        checks = checks | F.col(tie_break).isNull()
    dup = (
        ref.groupBy(*group)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(checks)
        .limit(1)
        .collect()
    )
    if dup:
        row = dup[0].asDict()
        raise ValueError(
            "as-of tie_break contract violated: reference rows are not "
            f"unique/non-null on {group} (first offender: {row})"
        )


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    keys: list[str],
    probe_ts: str,
    ref_ts: str,
    value_cols: list[str],
    tie_break: str | None = None,
    validate: bool = False,
) -> DataFrame:
    """Left as-of join, window lowering (scale path).

    Returns ``probe.* + value_cols`` where value_cols come from the most
    recent ``ref`` row with ``ref_ts <= probe_ts`` for the same keys.
    Equal timestamps match (the reference sorts before the probe).
    ``tie_break``: a ref column (pass a unique one) ordering reference
    rows that share ``ref_ts`` — the one sorting last wins; without it,
    equal-timestamp reference rows resolve nondeterministically.
    ``validate=True`` runs :func:`assert_tiebreak_unique` first (one
    extra small job) so a contract violation raises instead of being
    silently resolved by the NULLS-FIRST ordering.
    """
    if validate:
        assert_tiebreak_unique(ref, keys, ref_ts, tie_break)
    probe_cols = probe.columns
    # side=0 sorts reference rows before probe rows at equal ts, so a
    # reference at exactly probe_ts is visible to that probe.
    tb_ref = [F.col(tie_break).alias("__tb")] if tie_break else []
    tb_probe = (
        [F.lit(None).cast(ref.schema[tie_break].dataType).alias("__tb")]
        if tie_break
        else []
    )
    ref_tagged = ref.select(
        *[F.col(k) for k in keys],
        F.col(ref_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *tb_ref,
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols if c not in keys],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    probe_tagged = probe.select(
        *[F.col(k) for k in keys],
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *tb_probe,
        *[F.col(c) for c in probe_cols if c not in keys],
        *[F.lit(None).cast(ref.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    order = [F.col("__ts"), F.col("__side")]
    if tie_break:
        # among equal-ts reference rows the last in __tb order wins (the
        # running last() overwrites); probe rows carry NULL __tb, which is
        # irrelevant since __side already orders them after references.
        # nulls FIRST so a reference row with a NULL tie_break value can
        # never beat one carrying a real value (asc_nulls_last would let
        # the NULL row sort last and silently win the tie).
        order.append(F.col("__tb").asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = probe_tagged.unionByName(ref_tagged).select(
        *probe_tagged.columns[: len(probe_tagged.columns) - len(value_cols)],
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__f_{c}") for c in value_cols],
    )
    out = filled.filter(F.col("__side") == 1)
    return out.select(
        *[F.col(k) for k in keys],
        F.col("__ts").alias(probe_ts),
        *[F.col(c) for c in probe_cols if c not in keys and c != probe_ts],
        *[F.col(f"__f_{c}").alias(c) for c in value_cols],
    )


def asof_join_pandas(
    probe: DataFrame,
    ref: DataFrame,
    keys: list[str],
    probe_ts: str,
    ref_ts: str,
    value_cols: list[str],
    tie_break: str | None = None,
    validate: bool = False,
) -> DataFrame:
    """Left as-of join via cogrouped ``pandas.merge_asof`` (reference path).
    ``tie_break`` as in :func:`asof_join`: orders equal-``ref_ts``
    reference rows; merge_asof takes the last sorted row, so the row
    sorting last on tie_break wins in both implementations.
    ``validate`` as in :func:`asof_join`."""
    if validate:
        assert_tiebreak_unique(ref, keys, ref_ts, tie_break)
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    out_fields = [f for f in probe.schema.fields] + [
        StructField(c, ref.schema[c].dataType, True) for c in value_cols
    ]
    out_schema = StructType(out_fields)
    probe_cols = probe.columns

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        left = left.assign(__on=left[probe_ts]).sort_values("__on", kind="mergesort")
        # Rebuild the reference frame under collision-free names (ref_ts
        # may itself be one of value_cols).
        mf = pd.DataFrame({k: right[k] for k in keys})
        mf["__on"] = right[ref_ts]
        for c in value_cols:
            mf[f"__r_{c}"] = right[c]
        if tie_break is not None:
            mf["__tb"] = right[tie_break]
            # na_position="first" mirrors the window path's
            # asc_nulls_first: a NULL tie_break never wins a ts tie.
            mf = mf.sort_values(
                ["__on", "__tb"], kind="mergesort", na_position="first"
            ).drop(columns="__tb")
        else:
            mf = mf.sort_values("__on", kind="mergesort")
        merged = pd.merge_asof(
            left, mf, on="__on", by=keys, direction="backward", allow_exact_matches=True
        )
        for c in value_cols:
            merged[c] = merged[f"__r_{c}"]
        return merged[probe_cols + value_cols]

    return (
        probe.groupBy(*keys)
        .cogroup(ref.groupBy(*keys))
        .applyInPandas(merge, schema=out_schema)
    )
