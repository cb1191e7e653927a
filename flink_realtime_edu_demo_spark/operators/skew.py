"""Skew-handling joins (SURVEY.md §4 distinct-agg/skew row; BASELINE.md
100 TB rules).

First line of defense is AQE's skew-join splitting (on by default in
session.get_spark). This module is the explicit fallback for the cases
AQE can't fix:

- salted_join: a key-salted shuffle join for a *skewed fact ⋈ small-ish
  dim* where the dim is too big to broadcast whole but small enough to
  replicate ``salt`` times: fact rows get a random salt in [0, salt);
  dim rows are replicated once per salt value; the join key becomes
  (key, salt), splitting each hot key's row group across ``salt``
  reducers.
- salted_agg_count: two-phase aggregation under key skew — partial
  count per (key, salt), then final sum per key. (Spark's own partial
  aggregation already does this for algebraic aggs; the explicit form
  is for building skew-safe custom aggregations.)

Salt uses a deterministic hash of a unique column rather than rand() so
results are reproducible run-to-run (important for the driver's
hash-compare and for retry idempotency at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on ``key`` with ``salt``-way key splitting.

    salt_source: a fact column whose hash picks the salt; defaults to a
    per-row monotonically_increasing_id so a hot key concentrated in few
    input partitions is still spread across all ``salt`` reducers (a
    partition-level salt would leave it whole). The salt choice never
    changes the *result* for the supported join types — only the
    physical split — so outputs stay reproducible run-to-run.

    Only ``inner`` and ``left`` are supported: the dim side is
    replicated ``salt`` times, so right/full outer would emit each
    unmatched dim row once per replica."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated dim side would duplicate unmatched rows under "
            "right/full outer"
        )
    src = F.col(salt_source) if salt_source else F.monotonically_increasing_id()
    salted_fact = fact.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(salt)))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def salted_agg_count(df: DataFrame, key: str, salt: int = 8,
                     salt_source: str | None = None) -> DataFrame:
    """Skew-safe exact count per key: partial per (key, salt) → final."""
    src = F.col(salt_source) if salt_source else F.monotonically_increasing_id()
    partial = (
        df.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(salt)))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(key).agg(F.sum("__n").alias("n"))
