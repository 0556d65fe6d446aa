"""As-of (most-recent-prior) joins.

The reference's cursor alignment is as-of-shaped (J5: each reference
word takes the nearest not-yet-consumed transcript word); the generic
time-series form — "for each left row, the latest right row with
``right.ts <= left.ts`` per key" — is implemented here with the
union+window plan rather than a per-key loop:

1. tag and union both sides on (key, ts),
2. one window sorted by (ts, tag) per key carries the last-seen right
   payload forward (``last(..., ignorenulls=True)``),
3. keep only left rows.

One shuffle on the key, no driver state, no ``applyInPandas`` — this is
the plan that survives 100 TB (pandas-free, spill-friendly, AQE-aware).
Tolerance is applied as a post-filter on the carried timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeops import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: each left row gets the payload of the nearest right
    row at-or-before (``backward``) / at-or-after (``forward``) its
    timestamp, per join key.

    ``tolerance`` (same units as the timestamp domain; seconds for
    timestamps) nulls out matches farther than the bound.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    payload = [f"{c}{suffix}" for c in right_cols]
    matched_ts = f"{right_ts}{suffix}"

    # the whole right payload travels as ONE struct per right row: an
    # independent last(col, ignorenulls) per payload column skips NULLs
    # PER COLUMN and can stitch fields from DIFFERENT right rows into a
    # row that never existed (e.g. a_right from ts=1 with b_right from
    # ts=2 when the true match's a is NULL). The struct is non-NULL for
    # every right row (its ts field is), so one last(struct, ignorenulls)
    # carries the nearest right ROW intact, NULL fields included.
    from pyspark.sql.types import StructField, StructType

    pay_type = StructType(
        [StructField("_mts", right.schema[right_ts].dataType, True)]
        + [
            StructField(p, right.schema[c].dataType, True)
            for c, p in zip(right_cols, payload)
        ]
    )
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in on and c != left_ts],
        F.lit(None).cast(pay_type).alias("_rpay"),
    ).withColumn(left_ts, F.col("_ts"))
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on and c != left_ts],
        F.struct(
            F.col(right_ts).alias("_mts"),
            *[F.col(c).alias(p) for c, p in zip(right_cols, payload)],
        ).alias("_rpay"),
    ).withColumn(left_ts, F.lit(None).cast(left.schema[left_ts].dataType))

    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort before a left row at the same ts → "at or before"
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = F.last("_rpay", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carried = F.first("_rpay", ignorenulls=True).over(w)

    keep = [c for c in unioned.columns if c not in ("_rpay", "_is_left", "_ts")]
    out = unioned.select(*keep, F.col("_is_left"), F.col("_ts"), carried.alias("_rp")).filter(
        F.col("_is_left") == 1
    )
    fields = [(matched_ts, "_mts")] + list(zip(payload, payload))

    if tolerance is not None:
        # NTZ-safe: epoch_seconds routes TIMESTAMP_NTZ through ltz
        # (session tz pinned UTC) before the double cast.
        out = out.withColumn("_mts_x", F.col("_rp._mts"))
        gap = F.abs(epoch_seconds(out, "_ts") - epoch_seconds(out, "_mts_x"))
        out = out.select(
            *keep,
            *[
                F.when(gap <= tolerance, F.col(f"_rp.{src}"))
                .otherwise(F.lit(None))
                .alias(dst)
                for dst, src in fields
            ],
        )
    else:
        out = out.select(
            *keep, *[F.col(f"_rp.{src}").alias(dst) for dst, src in fields]
        )
    # restore the historical column order: payload columns, then the ts
    return out.select(*keep, *payload, matched_ts)
