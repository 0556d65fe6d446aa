"""Config/state upsert (SURVEY.md §2.1 S9).

The reference maintains ``trim_config.json`` by read-modify-write of a
whole dict keyed by file path (`scripts/hebrew_audio_trimmer.py:67-87,
186-195`) — unbounded driver state. Spark-first: the state store is a
DataFrame; an upsert is ``union → row_number over (key ORDER BY ts DESC)
→ keep 1`` — one shuffle on the key, any size, last-write-wins exactly
like the reference's dict assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_wins_upsert(
    state: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Merge ``updates`` into ``state``: per key keep the newest row.

    Ties on ``ts_col`` resolve in favor of the update (the reference's
    dict assignment overwrites on equal timestamps too).
    """
    tagged_state = state.withColumn("_src", F.lit(0))
    tagged_updates = updates.withColumn("_src", F.lit(1))
    unioned = tagged_state.unionByName(tagged_updates)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col("_src").desc()
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def latest_state(
    history: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse an append-only history to current state (last-wins).
    ``tiebreak_cols`` break equal-timestamp ties deterministically
    (descending, like the timestamp)."""
    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        history.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
