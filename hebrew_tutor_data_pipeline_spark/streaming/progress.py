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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.listener import StreamingQueryListener


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
