"""Stream-stream interval joins (SURVEY.md §2.10 extension — the
streaming twin of the batch J7 point-in-interval join).

The reference's viewer maps a playback tick into the containing verse
window over a static alignment (`standalone_hebrew_tester.html:458-492`);
the unbounded version of that shape is correlating two live streams —
here, clicks landing inside the hour after a purchase. Structured
Streaming requires stream-stream joins to carry (a) an EQUALITY
predicate — supplied by the same fixed-width time-bin key the batch
operator uses (`operators.intervals.point_in_interval_join`), each
interval exploded onto the bins it covers, each point owning exactly
one bin — and (b) watermarks plus event-time bounds in the condition,
from which the engine derives how long each side's rows live in state:
purchases are held ~(window + watermark), clicks ~watermark, so state
is rate-bounded forever regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeops import epoch_seconds


def clicks_in_purchase_windows_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    window_seconds: int = 3600,
    watermark: str = "10 minutes",
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Join each click to every purchase whose [ts, ts + window]
    interval contains it — on two unbounded streams. Output is
    (*key_cols, click_id, purchase_id), identical to the batch
    `clicks_in_purchase_windows` catalog entry over the same data; each
    pair emerges once because a click owns exactly one bin.

    ``key_cols`` adds equality keys (e.g. ``("user_id",)`` — a click
    matches only ITS user's purchase windows). This is the form that
    scales: on a density-growing stream the UNKEYED pair count is
    ∝ rate², inherent to the semantics (measured r10: the unkeyed
    entry's x30 output hits ~5·10⁸ pairs,
    bench_runs/r10_scaling_events_streaming.json), while per-key rates
    stay bounded and the keyed output grows linearly."""
    c = clicks.select(
        *key_cols, F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    ).withWatermark("cts", watermark)
    # epoch_seconds is NTZ-safe (TIMESTAMP_NTZ routes through ltz under
    # the pinned-UTC session tz) so the stream join accepts sources that
    # surface naive timestamps.
    c = c.withColumn("bin", F.floor(epoch_seconds(c, "cts") / window_seconds))
    p = purchases.select(
        *[F.col(k).alias(f"_p_{k}") for k in key_cols],
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    ).withWatermark("pts", watermark)
    p_num = epoch_seconds(p, "pts")
    p = p.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(p_num / window_seconds),
                F.floor((p_num + window_seconds) / window_seconds),
            )
        ),
    )
    cond = (
        (c["bin"] == p["bin"])
        & (F.col("cts") >= F.col("pts"))
        & (
            F.col("cts")
            <= F.col("pts") + F.expr(f"INTERVAL {window_seconds} SECONDS")
        )
    )
    for k in key_cols:
        cond = cond & (c[k] == p[f"_p_{k}"])
    return c.join(p, cond).select(*key_cols, "click_id", "purchase_id")
