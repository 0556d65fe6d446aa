"""Data-layout optimization: Z-order (Morton) clustering for scan
pruning.

At 100 TB the fastest scan is the one that never happens: parquet
footers carry per-file min/max for every column, and the planner skips
files whose range cannot satisfy the predicate. A LINEAR layout
clusters exactly one column — predicates on any other column hit every
file. A Z-ORDER layout interleaves the bits of several columns so
every file covers a small hyper-rectangle of the key space, and
predicates on ANY of the interleaved columns skip most files (the
layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`; Morton 1966).

Files are modeled as FIXED-WIDTH key-range buckets (the curve's high
bits), not equal-row ntiles: bucket assignment is then pure map-side
integer arithmetic — no global sort, no window, nothing that breaks at
1000 executors — and per-bucket min/max are one hash aggregation.
(Production writers range-partition for even file sizes; the skipping
GEOMETRY — which predicates prune which fraction of files — is
identical, and the fixed-width form is exactly reproducible in SQL.)

Everything here is integer column arithmetic — JVM-side, codegen-
friendly, with an exact SQL twin for every expression — so the same
formulas serve the engine and the DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints into a
    Morton key: bit i of ``a`` lands at position 2i, bit i of ``b`` at
    2i+1. Callers normalize the inputs first (modulo / rank / epoch-day
    — anything that maps the domain onto [0, 2^bits))."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
        terms.append(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1))
        )
    return reduce(lambda x, y: x + y, terms)


def zorder_key_sql(a: str, b: str, bits: int = 10) -> str:
    """The DuckDB twin of :func:`zorder_key` — the identical bit
    arithmetic spelled with integer division (portable, no dialect
    shift operators)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a}) // {1 << i}) % 2 * {1 << (2 * i)}")
        terms.append(f"(({b}) // {1 << i}) % 2 * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def bucket_minmax_stats(
    df: DataFrame,
    key1: Column,
    key2: Column,
    bucket: Column,
    layout: str,
) -> DataFrame:
    """Per-bucket footer statistics for a simulated file layout:
    ``bucket`` is the file-assignment expression (a high-bits slice of
    the layout key — map-side arithmetic), and the result carries the
    min/max of both predicate columns per bucket, i.e. exactly what a
    planner reads from parquet footers before deciding what to scan.

    Returns (layout, bucket_id, min1, max1, min2, max2) — one row per
    NON-EMPTY bucket. Plan: one projection + one hash aggregation."""
    return (
        df.select(key1.alias("k1"), key2.alias("k2"), bucket.alias("bucket_id"))
        .groupBy("bucket_id")
        .agg(
            F.min("k1").alias("min1"),
            F.max("k1").alias("max1"),
            F.min("k2").alias("min2"),
            F.max("k2").alias("max2"),
        )
        .select(F.lit(layout).alias("layout"), "bucket_id", "min1", "max1", "min2", "max2")
    )


def skipping_report(
    stats: DataFrame,
    k1_eq: int,
    k2_lo: int,
    k2_hi: int,
) -> DataFrame:
    """Evaluate two canonical predicates against the per-bucket footer
    stats: an equality on key1 and a range on key2. A bucket is HIT
    when its [min, max] envelope cannot rule the predicate out — the
    planner must scan it. Returns one row per (layout, predicate):
    (layout, predicate, files_hit, files_total)."""
    hit1 = (F.col("min1") <= k1_eq) & (F.col("max1") >= k1_eq)
    hit2 = (F.col("min2") <= k2_hi) & (F.col("max2") >= k2_lo)
    per_layout = stats.groupBy("layout").agg(
        F.sum(hit1.cast("long")).alias("hit_k1"),
        F.sum(hit2.cast("long")).alias("hit_k2"),
        F.count(F.lit(1)).alias("files_total"),
    )
    k1_rows = per_layout.select(
        "layout",
        F.lit("key1_eq").alias("predicate"),
        F.col("hit_k1").alias("files_hit"),
        "files_total",
    )
    k2_rows = per_layout.select(
        "layout",
        F.lit("key2_range").alias("predicate"),
        F.col("hit_k2").alias("files_hit"),
        "files_total",
    )
    return k1_rows.unionByName(k2_rows)
