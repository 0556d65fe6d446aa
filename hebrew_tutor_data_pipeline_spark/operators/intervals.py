"""Interval containment joins (SURVEY.md §2.3 J7).

The reference's consumer query maps a playback time to the containing
verse/word interval by linear scan (`standalone_hebrew_tester.html:458-492`).
Spark-first this is a range join; the naive plan is
BroadcastNestedLoopJoin (fine when one side broadcasts), but at 100 TB
both sides are large, so ``point_in_interval_join`` implements the
binned rewrite from SURVEY.md §4.1: explode each interval onto the
fixed-width bins it covers, bin each point, equi-join on the bin (a
plain shuffled hash join Catalyst handles), then re-check the exact
range predicate. Cost: |intervals| × (avg_span/bin_width) replication
versus an all-pairs nested loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def _bin_domain(df: DataFrame, col: str) -> Column:
    """Numeric bin domain: epoch seconds for timestamps, value otherwise.
    TIMESTAMP_NTZ has no direct double cast — route through ltz (session
    tz is pinned UTC, so the epoch is unambiguous)."""
    dt = df.schema[col].dataType
    if isinstance(dt, (TimestampNTZType, DateType)):
        return F.col(col).cast("timestamp_ltz").cast("double")
    if isinstance(dt, TimestampType):
        return F.col(col).cast("double")
    return F.col(col).cast("double")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
    how: str = "inner",
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Join every point to every interval with start ≤ point ≤ end
    (within the same ``keys`` group when given — e.g. intervals are
    per-track and a point may only match its own track's intervals).

    Both inputs may be arbitrarily large: the equi-join key is
    ``floor(value / bin_width)`` (plus ``keys``), so pick ``bin_width``
    near the typical interval span — each interval then lands in O(1)
    bins and the join becomes a shuffle-partitioned hash join on the bin
    (AQE handles residual bin skew). Each matching pair appears exactly
    once because a point owns exactly one bin. A single-literal point
    side folds its bin to a constant, so the equi-key prunes the
    interval scan — the sub-second viewer point-lookup path.
    """
    p_num = _bin_domain(points, point_col)
    s_num = _bin_domain(intervals, start_col)
    e_num = _bin_domain(intervals, end_col)

    binned_intervals = intervals.withColumn(
        "_bin", F.explode(F.sequence(F.floor(s_num / bin_width), F.floor(e_num / bin_width)))
    )
    binned_points = points.withColumn("_bin", F.floor(p_num / bin_width))
    cond = (
        (binned_points["_bin"] == binned_intervals["_bin"])
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    for k in keys:
        cond = cond & (binned_points[k] == binned_intervals[k])
    joined = binned_points.join(binned_intervals, cond, how)
    if keys:  # keep one copy of each join key (the points side)
        joined = joined.drop(*[binned_intervals[k] for k in keys])
    return joined.drop("_bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: float,
) -> DataFrame:
    """Interval × interval overlap join via the same binning rewrite
    (overlap ⇔ ``l_start ≤ r_end AND r_start ≤ l_end``). Pairs sharing
    several bins are kept once, at the canonical first shared bin."""
    ls, le = _bin_domain(left, l_start), _bin_domain(left, l_end)
    rs, re_ = _bin_domain(right, r_start), _bin_domain(right, r_end)
    lb = left.withColumn(
        "_bin", F.explode(F.sequence(F.floor(ls / bin_width), F.floor(le / bin_width)))
    )
    rb = right.withColumn(
        "_bin", F.explode(F.sequence(F.floor(rs / bin_width), F.floor(re_ / bin_width)))
    )
    first_shared = F.greatest(F.floor(ls / bin_width), F.floor(rs / bin_width))
    return (
        lb.join(
            rb,
            (lb["_bin"] == rb["_bin"])
            & (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end)),
        )
        .filter(lb["_bin"] == first_shared)
        .drop("_bin")
    )
