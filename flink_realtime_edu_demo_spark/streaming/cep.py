"""Streaming row-pattern matching — the incremental deployment of
operators/cep.py (SURVEY.md §2.9): emit a session's matches once the
watermark proves the session CLOSED (no event can extend it), the same
emission contract Flink CEP has under event-time + session windows.

Lowering (the repo's standard foreachBatch landing shape, like
streaming/changelog.py): each micro-batch lands in a keyed event store;
the watermark is max-seen event time minus the session gap; sessions
whose last event is older than the watermark are closed — no future
row can fall inside their gap window — so their matches are final and
are (re)computed with the BATCH match_recognize_sessionized and
published atomically. Matches of still-open sessions are withheld, so
every published row is immutable (append-only downstream, no retract
needed — the reason to emit on session close rather than per match).

The in-memory event list here is the test stand-in for the keyed store
(a Delta/parquet staging table at scale, appended idempotently by
batchId); the recompute would then touch only keys present in the
batch — sessionization and matching are per-key, so incremental
recompute is safe by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.cep import match_recognize_sessionized, sessionize
from .sinks import idempotent_foreach_batch


class SessionCepSink:
    """foreachBatch body: accumulate events, publish matches of closed
    sessions. ``emitted`` maps (key..., session_id, match_no) -> match
    row dict; once present it never changes (tested)."""

    def __init__(self, pattern, gap_minutes: int, key: str = "user_id",
                 ts: str = "ts", id_col: str = "event_id"):
        self.pattern = pattern
        self.gap_minutes = gap_minutes
        self.key, self.ts, self.id_col = key, ts, id_col
        self.events: list = []
        self.schema = None
        self.emitted: dict[tuple, dict] = {}
        self.emitted_per_batch: list[int] = []
        self._seen_batches: set[int] = set()

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._seen_batches:  # replay after recovery: no-op
            return
        self._seen_batches.add(batch_id)
        self.schema = batch_df.schema
        self.events.extend(batch_df.collect())
        if not self.events:
            self.emitted_per_batch.append(0)
            return
        spark = batch_df.sparkSession
        all_df = spark.createDataFrame(self.events, self.schema)
        # session close rule: last event ts + gap <= max seen ts means
        # no arriving row (ts <= max so far under the file-source's
        # in-order delivery; a real pipeline uses the watermark) can
        # extend the session.
        sess = sessionize(all_df, self.gap_minutes, self.key, self.ts, self.id_col)
        bounds = sess.groupBy(self.key, "session_id").agg(
            F.max(self.ts).alias("__last_ts")
        )
        max_ts = all_df.agg(F.max(self.ts)).collect()[0][0]
        closed = bounds.filter(
            F.col("__last_ts") + F.expr(f"INTERVAL {int(self.gap_minutes)} MINUTES")
            <= F.lit(max_ts)
        ).select(self.key, "session_id")
        matches = match_recognize_sessionized(
            all_df, self.pattern, self.gap_minutes,
            key=self.key, ts=self.ts, id_col=self.id_col,
        ).join(closed, [self.key, "session_id"])
        n_new = 0
        for r in matches.collect():
            row = r.asDict()
            mk = (row[self.key], row["session_id"], row["match_no"])
            if mk in self.emitted:
                assert self.emitted[mk] == row, (
                    f"published match changed after emission: {mk}"
                )
            else:
                self.emitted[mk] = row
                n_new += 1
        self.emitted_per_batch.append(n_new)


def start_session_cep(
    stream_df: DataFrame, checkpoint: str, sink: SessionCepSink
) -> StreamingQuery:
    """Run an event stream into a SessionCepSink (append semantics)."""
    return idempotent_foreach_batch(
        stream_df, checkpoint, sink.write_batch, mode="append"
    )
