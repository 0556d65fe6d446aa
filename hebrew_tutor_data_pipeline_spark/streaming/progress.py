"""Streaming progress/observability (T5).

The reference logs monotonic progress counters every 10 chapters
(`fixed_hebrew_aligner.py:756-759`). Spark-first: ``observe()`` attaches
named aggregates to the plan itself (reported per micro-batch with no
extra pass over the data) and a ``StreamingQueryListener`` receives
every progress event — the engine-level replacement for hand-rolled
counters.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.listener import StreamingQueryListener

from ..functions.timeops import epoch_micros


def with_observed_metrics(df: DataFrame, name: str = "progress") -> DataFrame:
    """Attach row/error-free counters to any (batch or streaming) plan.
    Metrics surface in QueryProgressEvent.observedMetrics[name] for
    streams, or via DataFrame.observe listeners in batch."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows_seen"),
    )


class CountingListener(StreamingQueryListener):
    """Collects per-batch row counts and observed metrics — the T5
    progress surface. Thread-safe; read ``.progress`` after the query
    stops (or live)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            self.progress.append(
                {
                    # identity fields so a consumer can filter to ITS
                    # query — the listener bus is session-wide, and a
                    # concurrent stream's batches would otherwise be
                    # silently counted into another query's metrics
                    "name": p.name,
                    "runId": str(p.runId),
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "observedMetrics": {
                        k: v.asDict() if hasattr(v, "asDict") else dict(v)
                        for k, v in (p.observedMetrics or {}).items()
                    },
                }
            )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing dependent
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.terminated.append(str(event.id))

    def total_input_rows(self) -> int:
        with self._lock:
            return sum(p["numInputRows"] for p in self.progress)


def running_eta(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    ts_col: str,
    total: int,
) -> DataFrame:
    """A9: per-completion running average + ETA, the declarative form of
    the reference's progress loop (`scripts/hebrew_alignment_clean_fixed.py:415-429`:
    ``avg = elapsed/processed; eta = remaining * avg``).

    One window sort per group: ``processed`` = running completion count,
    ``elapsed_ms`` = integer ms since the group's first completion,
    ``eta_ms`` = ``(total - processed) * elapsed_ms / processed``.
    ``order_cols`` must make the ordering unique within a group (pass a
    unique event id as tiebreak) or running counts are nondeterministic.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    # epoch_micros is NTZ-safe (TIMESTAMP_NTZ routes through ltz under
    # the pinned-UTC session tz); taking first() over the already-
    # converted micros keeps the whole expression in one integer domain.
    ts_us = epoch_micros(df, ts_col)
    first_us = F.first(ts_us).over(run)
    elapsed_ms = F.try_divide(ts_us - first_us, F.lit(1000)).cast("bigint")
    return (
        df.withColumn("processed", F.row_number().over(w))
        .withColumn("elapsed_ms", elapsed_ms)
        .withColumn(
            "eta_ms",
            (F.lit(total) - F.col("processed")) * F.col("elapsed_ms") / F.col("processed"),
        )
    )


def format_eta(seconds: Column) -> Column:
    """The reference's three-tier ETA string
    (`hebrew_alignment_clean_fixed.py:422-427`): seconds under a minute,
    tenths of minutes under an hour, tenths of hours beyond."""
    return (
        F.when(seconds < 60, F.concat(F.format_string("%.0f", seconds), F.lit(" seconds")))
        .when(seconds < 3600, F.concat(F.format_string("%.1f", seconds / 60), F.lit(" minutes")))
        .otherwise(F.concat(F.format_string("%.1f", seconds / 3600), F.lit(" hours")))
    )
