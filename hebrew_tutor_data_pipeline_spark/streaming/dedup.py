"""Streaming exact deduplication with bounded state (SURVEY.md §2.10
extension; training-pipeline requirement).

A corpus ingest stream re-delivers documents — at-least-once sources,
crawler re-fetches, upstream retries. Batch exact dedup
(`operators.dedup.exact_dedup`) has the whole corpus to window over; a
stream cannot hold every key ever seen. The scale-correct tool is
``dropDuplicatesWithinWatermark``: keys are remembered only for the
watermark delay, so state is bounded by (arrival rate × delay) no
matter how long the stream runs, and any duplicate arriving within the
delay — the only kind an at-least-once source produces — is dropped
exactly like the batch twin would.

The reference's analog is the `processed_files` skip-set the aligner
keeps to avoid re-transcribing chapters (`fixed_hebrew_aligner.py`
resume logic) — an unbounded in-memory set; the watermark bound is what
makes the same semantics survive an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key arriving within ``delay`` of
    the original (event time). First occurrence wins; state for a key is
    freed once the watermark passes its event time + delay."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )
