"""Gap-based sessionization over event streams.

Not in the reference's surface (its "sessions" are per-chapter jobs),
but a first-class training-pipeline operator: group events into sessions
that close after ``gap`` of inactivity. Classic two-window plan —
``lag`` to detect session starts, running sum to number them — one
shuffle on the user key; the streaming twin is
``session_window`` in streaming.windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeops import epoch_micros, epoch_seconds


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: float,
) -> DataFrame:
    """Assign ``session_id`` (1-indexed per key, in time order)."""
    order = Window.partitionBy(*key_cols).orderBy(F.col(ts_col))
    # epoch_seconds is NTZ-safe (routes TIMESTAMP_NTZ through ltz under
    # the pinned-UTC session tz) so the operator accepts any caller's
    # frame, not just load_table's normalized one.
    ts_num = epoch_seconds(df, ts_col)
    prev_num = F.lag(ts_num).over(order)
    is_new = F.when(
        prev_num.isNull() | ((ts_num - prev_num) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(run)
    ).drop("_new")


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: float,
) -> DataFrame:
    """Per-session rollup: bounds, duration, event count.

    Duration is an integer-millisecond bigint (``duration_ms``), not a
    rounded double: epoch-second doubles round differently across
    engines at .0005 boundaries (Spark HALF_UP vs DuckDB), which flips
    value hashes under strict canonicalization. Integer microsecond
    subtraction + ``div`` is exact on every engine.
    """
    s = sessionize(df, key_cols, ts_col, gap_seconds)
    agg = s.groupBy(*key_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )
    dur_us = epoch_micros(agg, "session_end") - epoch_micros(agg, "session_start")
    return agg.withColumn(
        "duration_ms", F.try_divide(dur_us, F.lit(1000)).cast("bigint")
    ).select(*key_cols, "session_id", "session_start", "session_end", "duration_ms", "n_events")
