"""Binned range join — point-in-interval joins without the O(N·M) theta
join (SURVEY.md §2.3 non-equi family; the classic bin/bucket lowering
used by range-join optimizers, e.g. Databricks' range-join hints and
kdb's band joins).

A naive `p BETWEEN lo AND hi` join forces BroadcastNestedLoop (or a
cartesian) — every point against every interval. The binned lowering:

1. pick a bin width `w`;
2. points map to ONE bin: floor(p/w) — a narrow projection;
3. intervals replicate to EVERY bin they overlap:
   floor(lo/w)..floor(hi/w) — a bounded explode (≤ len/w + 2 copies);
4. equi-join on the bin key (hash shuffle, AQE-skew-splittable), then
   re-check the exact predicate.

Each (point, interval) match shares exactly one bin — the point's — so
no dedup pass is needed. Cost scales with matches + interval
replication, not |points|×|intervals|; pick w ≈ median interval length
so replication stays O(1) per interval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    max_bins_per_interval: int = 1024,
) -> DataFrame:
    """Inner join of ``points`` with ``intervals`` on
    ``lo_col <= point_col <= hi_col`` via bin equi-join.

    ``max_bins_per_interval`` guards against a degenerate interval
    (hi-lo ≫ bin_width) exploding the build side; such rows raise at
    plan-build time via a runtime assert column instead of silently
    replicating unboundedly.
    """

    def bin_of(c: Column) -> Column:
        return F.floor(c / F.lit(bin_width)).cast("long")

    p = points.withColumn("__bin", bin_of(F.col(point_col)))
    n_bins = bin_of(F.col(hi_col)) - bin_of(F.col(lo_col)) + 1
    # the guard lives INSIDE the explode input so it cannot be pruned:
    # a degenerate interval raises at execution instead of replicating
    # unboundedly (or being silently trimmed, which would drop matches).
    hi_bin = F.when(n_bins <= max_bins_per_interval, bin_of(F.col(hi_col))).otherwise(
        F.raise_error(
            F.format_string(
                "range_join_binned: interval spans %%s bins > max_bins_per_interval=%d; "
                "raise bin_width or split the interval" % max_bins_per_interval,
                n_bins.cast("string"),
            )
        ).cast("long")
    )
    iv = intervals.withColumn("__bin", F.explode(F.sequence(bin_of(F.col(lo_col)), hi_bin)))
    joined = p.join(iv, "__bin").filter(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    )
    return joined.drop("__bin")
