"""Keyed stateful processing with timers (SURVEY.md §2.9/§2.10) — the
Spark equivalent of Flink's KeyedProcessFunction + ValueState + timers:
``applyInPandasWithState`` with GroupStateTimeout.

Shipped operator: per-user running session accumulator — counts events
and accumulated value per user, emitting a finalized record when the
user goes idle (processing-time timeout = Flink's registerProcessingTimeTimer
firing after inactivity; state TTL via timeout, SURVEY §4 state-TTL row).

The transform itself is also runnable in batch mode (applyInPandas over
groups with no timeout) so its core logic is unit-testable without a
stream — same function, both paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("status", StringType()),  # 'active' update or 'finalized'
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("total_value", DoubleType())]
)


def user_accumulator(events: DataFrame, idle_ms: int = 30_000) -> DataFrame:
    """Streaming: per-user state machine with idle-timeout finalization
    after ``idle_ms`` of processing-time inactivity.

    The handler is a local closure so cloudpickle ships it by value —
    workers never need this package on their sys.path (the driver's cwd
    is not guaranteed to be the repo root)."""

    def accumulate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "total_value": [total],
                 "status": ["finalized"]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(idle_ms)  # fire 'finalized' after idle_ms
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total],
             "status": ["active"]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            accumulate,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def user_accumulator_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the accumulator core (no timers): same per-key fold,
    used by unit tests and the oracle-checkable q_udaf_groupagg path."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "total_value": [float(pdf["value"].sum())],
                "status": ["finalized"],
            }
        )

    return events.groupBy("user_id").applyInPandas(fold, schema=OUTPUT_SCHEMA)
