"""Custom Spark Python DataSource: a deterministic education-analytics
event generator — the PySpark-4-native equivalent of Flink's `datagen`
connector (and of the rate-source stand-ins in readers.py), built on
the public ``pyspark.sql.datasource`` API (SPARK-44076).

Capabilities exercised on purpose, because they are the parts of a real
connector that matter at 100 TB:

- **partition planning**: the row range splits into N independent
  ``InputPartition``s; every executor generates only its slice, so the
  source scales out with zero coordination (same contract a parquet or
  Kafka split reader has).
- **filter pushdown** (``pushFilters``): EqualTo/GreaterThan(OrEqual)/
  LessThan(OrEqual) on ``event_id`` narrow the generated range and
  EqualTo on ``event_type`` prunes inside the generator — accepted
  filters are REMOVED from Spark's post-scan Filter, observable in the
  plan (tests assert both the row counts and the pruned plan).
- **micro-batch streaming** (``SimpleDataSourceStreamReader``):
  offsets are row positions handed BACK to ``read(start)`` from the
  checkpoint, so a restarted query resumes exactly at the committed
  position; each trigger manufactures the next slice with the SAME
  deterministic content as the batch path, so stream == batch is
  testable exactly (the Flink "bounded stream replay" property).

Determinism: row *i* is a pure function of (seed, i) via the same
multiplicative mixers used by q_llm_split — re-reads, retries and
speculative tasks always regenerate identical rows, which is what
makes the source exactly-once-replayable.

All classes are defined at module level (the package is importable in
local mode); the generator row function is a plain function of ints —
no state, no RNG objects shipped.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_SCHEMA_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, course_id long"
)
_EVENT_TYPES = ("view", "click", "enroll", "play", "purchase")
_MIX = 2654435761  # Knuth multiplicative constant (public)
_MOD = 1 << 32
_BASE_TS = _dt.datetime(2024, 1, 1)


def _gen_row(seed: int, i: int, n_users: int):
    h = (i * _MIX + seed) % _MOD
    et = _EVENT_TYPES[h % len(_EVENT_TYPES)]
    return (
        i,
        _BASE_TS + _dt.timedelta(seconds=i * 7 + h % 5),
        (h // 5) % n_users,
        et,
        round((h % 10_000) / 100.0, 2),
        (h // 7) % 200,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class EduEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("users", 100))
        self.lo = 0            # narrowed by pushed event_id predicates
        self.hi = self.n_rows
        # all pushed event_type equality values; >1 distinct value means
        # the conjunction is unsatisfiable (emit nothing) — storing only
        # the last value would silently drop the earlier predicate
        self.event_types: set[str] = set()

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept range predicates on event_id and equality on
        event_type; everything else stays with Spark. Returned filters
        are the UNHANDLED ones (Spark re-applies only those)."""
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col == "event_id" and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
                    LessThanOrEqual)
            ):
                v = int(f.value)
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, v)
                    self.hi = min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:
                    self.hi = min(self.hi, v + 1)
            elif col == "event_type" and isinstance(f, EqualTo):
                self.event_types.add(f.value)
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.n_parts)
        span = max(1, -(-(hi - lo) // n)) if hi > lo else 1
        parts = []
        s = lo
        while s < hi:
            parts.append(_RangePartition(s, min(s + span, hi)))
            s += span
        return parts or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        if len(self.event_types) > 1:
            return  # contradictory equalities: correct result is empty
        want = next(iter(self.event_types)) if self.event_types else None
        for i in range(partition.start, partition.end):
            row = _gen_row(self.seed, i, self.n_users)
            if want is not None and row[3] != want:
                continue
            yield row


class EduEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream reader with row-position offsets.

    Implemented as a SimpleDataSourceStreamReader deliberately: the
    simple API passes the COMMITTED start offset into ``read(start)``,
    so position is a pure function of the checkpoint — a restarted
    query resumes exactly where the offset log says, with no
    driver-side mutable position that could regress and re-emit rows
    (the partition-planning stream API gives latestOffset() no start
    argument, making the restart path unfixable inside the reader).
    Replays of an uncommitted batch go through readBetweenOffsets with
    the logged range and regenerate identical rows (deterministic
    generator), so the source is exactly-once under both failure
    modes. tests/test_pyds.py drives the kill-and-restart path.
    """

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("users", 100))
        self.per_batch = int(options.get("rowsperbatch", 250))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, lo: int, hi: int):
        return [_gen_row(self.seed, i, self.n_users) for i in range(lo, hi)]

    def read(self, start):
        lo = int(start["pos"])
        hi = min(self.n_rows, lo + self.per_batch)
        return iter(self._rows(lo, hi)), {"pos": hi}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(int(start["pos"]), int(end["pos"])))

    def commit(self, end):
        pass  # offsets are pure row positions; nothing to release


class EduEventsDataSource(DataSource):
    """format name: ``edu_events``. Options: rows, partitions, seed,
    users, rowsPerBatch (stream)."""

    @classmethod
    def name(cls) -> str:
        return "edu_events"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return EduEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return EduEventsStreamReader(self.options)


def register_edu_events(spark) -> None:
    # pushFilters requires opting in (off by default in Spark 4.1)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(EduEventsDataSource)
