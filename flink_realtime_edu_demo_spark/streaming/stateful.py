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


def tws_available() -> bool:
    """True iff the runtime can execute transformWithStateInPandas
    (its driver worker imports google.protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_accumulator_tws(events: DataFrame) -> DataFrame:
    """Same per-user accumulator on Spark 4.x ``transformWithStateInPandas``
    — the successor API to applyInPandasWithState and the closest Spark
    analog of Flink's KeyedProcessFunction: named state variables from a
    handle (getValueState/getListState/getMapState ≈ ValueState/
    ListState/MapState), explicit timers, per-key row iteration.
    Requires the RocksDB state store provider (callers/tests set
    spark.sql.streaming.stateStore.providerClass).

    Emits the running (n_events, total_value) per user on every update,
    status fixed 'active' (timer-based finalization stays demonstrated
    in user_accumulator; this twin demonstrates the state API itself).

    Environment gate: the transformWithState wire protocol needs the
    google.protobuf Python package, absent from this container (and
    installs are out of scope) — tws_available() reports whether the
    runtime can execute this; tests skip when it can't. The
    applyInPandasWithState path (user_accumulator) carries the verified
    stateful coverage either way.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Accumulate(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.acc = handle.getValueState("acc", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n, total = self.acc.get() if self.acc.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self.acc.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total],
                 "status": ["active"]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Accumulate(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
