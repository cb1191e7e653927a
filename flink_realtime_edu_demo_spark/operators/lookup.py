"""External-service lookup enrichment — Flink's Async I/O operator
(`AsyncDataStream.unorderedWait` with an async client + batching)
mapped to Spark.

Flink amortizes per-record RPC latency with in-flight async requests;
the idiomatic Spark lowering amortizes the same latency with BULK
requests per Arrow batch inside ``mapInPandas``: one service round
trip per few-thousand rows instead of per row, no event loop needed.
For dim tables that fit in memory, prefer the broadcast snapshot
(tables.dim / streaming.metrics.broadcast_dim_join); this operator is
for genuinely external, un-snapshotable services (feature stores,
model endpoints).

The service client is passed as a plain ``batch_fn: keys -> {key:
value}`` so tests inject a deterministic fake; a production client
opens its connection lazily per worker (inside the generator, once per
partition, not per batch).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def async_lookup(
    df: DataFrame,
    batch_fn: Callable[[list], dict],
    key_col: str,
    value_col: str,
    value_type: str = "string",
) -> DataFrame:
    """Enrich ``df`` with ``value_col`` = service lookup of ``key_col``,
    one bulk ``batch_fn`` call per Arrow batch (deduplicated keys).
    Missing keys yield NULL. Output schema = input + value_col."""
    import pandas as pd

    fields = StructType.fromDDL(
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + f", {value_col} {value_type}"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            keys = pdf[key_col].drop_duplicates().tolist()
            mapping = batch_fn(keys)  # ONE round trip per Arrow batch
            out = pdf.copy()
            out[value_col] = pdf[key_col].map(mapping)
            yield out

    return df.mapInPandas(run, schema=fields)
