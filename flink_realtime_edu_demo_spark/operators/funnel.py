"""Funnel / sequential-pattern matching — the Flink CEP / MATCH_RECOGNIZE
special case the edu-demo genre uses (view → click → purchase per user;
SURVEY.md §2.9, §7 hard part #6).

Semantics: for each key, find the earliest strictly-increasing-in-time
chain hitting the step types in order (step i+1 must occur strictly
after the matched step i). This greedy-earliest matching is exactly the
minimal MATCH_RECOGNIZE `A B C` with AFTER MATCH SKIP semantics on the
first match.

Implementation is pure DataFrame composition: one aggregate per step,
each constrained by the previous step's matched timestamp — N small
shuffles on the key for an N-step funnel, no per-row Python, no state.
Greedy-earliest is optimal here: if any chain exists, the chain built
from the earliest feasible step at each stage exists too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Return one row per key completing the whole funnel:
    ``key, step_1_ts, ..., step_n_ts`` (earliest valid chain)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    result: DataFrame | None = None
    prev_col: str | None = None
    for i, step in enumerate(steps):
        col = f"step_{i + 1}_ts"
        matched = events.filter(F.col(type_col) == step).select(
            F.col(key), F.col(ts).alias(col)
        )
        if result is None:
            result = matched.groupBy(key).agg(F.min(col).alias(col))
        else:
            result = (
                matched.join(result, on=key)
                .filter(F.col(col) > F.col(prev_col))
                .groupBy(key, *[f"step_{j + 1}_ts" for j in range(i)])
                .agg(F.min(col).alias(col))
            )
        prev_col = col
    return result
