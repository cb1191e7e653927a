"""Single-pass streaming funnel — the keyed-state CEP variant of
operators/funnel.py (SCALE.md flagged the N-shuffle batch funnel's
"applyInPandasWithState single-pass variant" as the streaming path;
this is that variant).

Per key the state holds, for each funnel step, the candidate event
timestamps seen so far (int64 micros, sorted). Each micro-batch merges
its events in and re-derives the greedy-earliest chain — the exact
semantics of operators/funnel.funnel — so out-of-order arrival across
micro-batches cannot lose a match (a late early event simply improves
the chain on its batch). Emission is update-mode: the current complete
chain (if any) per touched key; the LAST update per key is the final
answer once the source drains.

State bound: the candidate lists grow with the key's step-event count.
In production the watermark prunes them — once the watermark passes
chain[i], candidates at step i below chain[i] can never participate in
a better chain (every earlier-step timestamp is already final below
the watermark) and are dropped; the fixture-scale tests keep them all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

DEFAULT_STEPS = ("view", "click", "purchase")


def _greedy_chain(cands: list[list[int]]) -> list[int] | None:
    """Earliest strictly-increasing chain through per-step sorted
    candidate lists; None if incomplete. Mirrors operators/funnel."""
    import bisect

    chain: list[int] = []
    prev = -(1 << 62)
    for step_ts in cands:
        i = bisect.bisect_right(step_ts, prev)
        if i == len(step_ts):
            return None
        chain.append(step_ts[i])
        prev = step_ts[i]
    return chain


def funnel_stateful(
    events: DataFrame, steps: tuple[str, ...] = DEFAULT_STEPS
) -> DataFrame:
    """Streaming funnel over (user_id, ts, event_type): emits
    ``user_id, step_1_us .. step_n_us`` (epoch-micros of the earliest
    valid chain) whenever a key's chain is complete — ONE stateful
    operator instead of the batch path's N join/agg shuffles. The
    handler is a local closure (cloudpickle ships it by value)."""
    n_steps = len(steps)
    out_schema = StructType(
        [StructField("user_id", LongType())]
        + [StructField(f"step_{i + 1}_us", LongType()) for i in range(n_steps)]
    )
    state_schema = StructType(
        [StructField(f"s{i}", ArrayType(LongType())) for i in range(n_steps)]
    )
    step_index = {s: i for i, s in enumerate(steps)}

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        cands: list[list[int]] = (
            [list(x) for x in state.get] if state.exists else [[] for _ in steps]
        )
        for pdf in pdfs:
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            for t, et in zip(ts_us, pdf["event_type"]):
                i = step_index.get(et)
                if i is not None:
                    cands[i].append(int(t))
        for lst in cands:
            lst.sort()
        state.update(tuple(cands))
        chain = _greedy_chain(cands)
        if chain is not None:
            yield pd.DataFrame(
                {"user_id": [user_id],
                 **{f"step_{i + 1}_us": [chain[i]] for i in range(n_steps)}}
            )

    filtered = events.filter(F.col("event_type").isin(*steps)).select(
        "user_id", "ts", "event_type"
    )
    return filtered.groupBy("user_id").applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
