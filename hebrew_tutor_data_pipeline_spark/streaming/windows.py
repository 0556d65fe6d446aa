"""Windowed streaming aggregations (T2 tumbling, plus sliding/session).

T2: the trimmer's fixed 2-second RMS segments
(`scripts/hebrew_audio_trimmer.py:113-124`) are a tumbling window over a
sample stream; the generic form here runs over any timestamped event
stream. T4: missing timestamps default via coalesce before windowing;
late rows are governed by the watermark
(`hebrew_alignment_tool.py:230-231` → ``withWatermark``).

Scale posture: windowed aggregation state is bounded by the watermark —
Spark drops window state older than (max event time - delay), so the
100 TB/unbounded-stream path holds constant memory per key·window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _default_ts(ts_col: str, default: Column | None) -> Column:
    # T4: the reference substitutes 0.0 / prior+0.5 for missing chunk
    # timestamps; streams must also null-guard before the watermark.
    if default is None:
        return F.col(ts_col)
    return F.coalesce(F.col(ts_col), default)


def tumbling_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    key_cols: tuple[str, ...] = (),
    value_col: str = "value",
    ts_default: Column | None = None,
) -> DataFrame:
    """T2: tumbling-window count/sum/avg with watermark-bounded state.

    Identical aggregation shape to the batch `tumbling_hour_stats`
    catalog query, so the batch oracle verifies streaming output when
    the full input is replayed (availableNow trigger).
    """
    src = events.withColumn(ts_col, _default_ts(ts_col, ts_default))
    return (
        src.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), *key_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        # avg derives from the 4dp-agreed sum — the module-wide policy
        # (see sliding_window_stats): a second independent float
        # aggregation re-exposes incremental-state summation order,
        # which flips round(avg, 6) by 1 ulp against any batch oracle
        # exact integer half-up division, not round(float-quotient, 6):
        # group sizes like n=64 put the true mean EXACTLY on a 6-dp .5
        # decimal boundary where Spark's and DuckDB's double rounding
        # disagree (12/150k groups flipped at sf10, r13). sum_e4
        # recovers the 4-dp sum's integer exactly (the double is within
        # ulps of it), so avg = (2*s4*100 + n) div (2n) micro-units is
        # the same integer on both engines.
        .withColumn(
            "sum_e4",
            F.floor(F.col("sum_value") * F.lit(10000) + F.lit(0.5)).cast("long"),
        )
        .withColumn(
            "avg_value",
            F.expr("(2 * sum_e4 * 100 + n_events) div (2 * n_events)").cast(
                "double"
            )
            / F.lit(1000000.0),
        )
        .drop("sum_e4")
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *key_cols,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sliding_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    slide_duration: str = "15 minutes",
    watermark_delay: str = "10 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Sliding-window variant (stretch beyond the reference's surface —
    SURVEY.md §2.10 notes tumbling first, sliding as stretch). avg is
    derived from the 4dp-rounded sum, not a second float aggregation —
    the cross-engine policy every streaming aggregate here follows
    (incremental state summation order can flip round(avg, 6) by 1 ulp
    against a batch oracle)."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration, slide_duration))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        # exact integer half-up division, not round(float-quotient, 6):
        # group sizes like n=64 put the true mean EXACTLY on a 6-dp .5
        # decimal boundary where Spark's and DuckDB's double rounding
        # disagree (12/150k groups flipped at sf10, r13). sum_e4
        # recovers the 4-dp sum's integer exactly (the double is within
        # ulps of it), so avg = (2*s4*100 + n) div (2n) micro-units is
        # the same integer on both engines.
        .withColumn(
            "sum_e4",
            F.floor(F.col("sum_value") * F.lit(10000) + F.lit(0.5)).cast("long"),
        )
        .withColumn(
            "avg_value",
            F.expr("(2 * sum_e4 * 100 + n_events) div (2 * n_events)").cast(
                "double"
            )
            / F.lit(1000000.0),
        )
        .drop("sum_e4")
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    key_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Gap-based session windows — the streaming twin of
    operators.sessionize (same 30-minute-gap semantics, state closed by
    the watermark instead of a batch window function)."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(F.col(ts_col), gap), *key_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            *key_cols,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
