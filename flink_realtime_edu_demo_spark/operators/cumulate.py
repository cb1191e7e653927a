"""CUMULATE window (Flink 1.13+ cumulative windows; SURVEY.md §2.9).

CUMULATE(ts, step, max_size) assigns each row to the growing windows
[aligned_start, aligned_start + k*step) for k = ceil((ts-start)/step)..
max_size/step — i.e. the early-firing partial results of a tumbling
window of max_size, materialized as separate windows.

Spark has no native cumulate; the lowering is an explode over the k
growing window ends + a plain groupBy — a narrow map (×max/step row
amplification) followed by one shuffle, which is exactly what Flink's
internal slice-based implementation shuffles too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def cumulate_window(
    df: DataFrame,
    ts_col: str,
    step: str = "15 minutes",
    max_size: str = "1 hour",
) -> DataFrame:
    """Add (window_start, window_end) columns, one output row per growing
    window containing the event. step/max_size are SQL interval strings;
    max_size must be a multiple of step."""
    step_s = F.expr(f"INTERVAL {step}")
    start: Column = F.window(F.col(ts_col), max_size).getField("start")
    n = int(_seconds(max_size) // _seconds(step))
    k = F.explode(F.sequence(F.lit(1), F.lit(n))).alias("k")
    with_k = df.select("*", start.alias("window_start"), k)
    out = with_k.withColumn(
        "window_end",
        (F.col("window_start").cast("timestamp")
         + F.col("k") * step_s).cast(df.schema[ts_col].dataType),
    ).filter(F.col(ts_col) < F.col("window_end"))
    return out.drop("k")


def _seconds(interval: str) -> int:
    qty, unit = interval.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(qty) * mult
