"""NTZ-safe time-domain conversion helpers.

Every timestamp the reference touches is float seconds
(`fixed_hebrew_aligner.py:427-437`), so time-domain conversion is core
plumbing here, not an edge case. Parquet written with tz-naive
timestamps arrives in Spark as TIMESTAMP_NTZ, on which neither
``cast("double")`` nor ``unix_micros()`` is legal — the session
timezone is pinned UTC (session.py), so routing NTZ through
``timestamp_ltz`` first is lossless and oracle-consistent (DuckDB
treats the same parquet values as naive-UTC). These helpers are
schema-aware so operators work on ANY caller's frame — LTZ, NTZ, DATE,
or already-numeric — not just frames produced by ``load_table``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DateType,
    NumericType,
    TimestampNTZType,
    TimestampType,
)


def _ltz(col: Column, dt: DataType) -> Column:
    if isinstance(dt, (TimestampNTZType, DateType)):
        return col.cast("timestamp_ltz")
    return col


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Epoch seconds as DOUBLE (fractional micros preserved) for any
    time-like or numeric column; the common gap/tolerance domain."""
    dt = df.schema[col].dataType
    if isinstance(dt, NumericType):
        return F.col(col).cast("double")
    return _ltz(F.col(col), dt).cast("double")


def epoch_micros(df: DataFrame, col: str) -> Column:
    """Epoch microseconds as BIGINT — exact integer arithmetic for
    duration math (doubles round differently across engines at .0005
    boundaries, flipping value hashes). Numeric columns are treated as
    epoch SECONDS (the same convention epoch_seconds returns)."""
    dt = df.schema[col].dataType
    if isinstance(dt, NumericType):
        # round, don't truncate: 2.000005 * 1e6 is 2000004.9999999998 in
        # binary — a bare cast would floor to 2000004 while the DuckDB
        # oracle's CAST rounds to 2000005, flipping value hashes
        return F.round(F.col(col).cast("double") * 1_000_000).cast("long")
    return F.unix_micros(_ltz(F.col(col), dt))


def ensure_ltz(df: DataFrame, col: str) -> DataFrame:
    """Normalize one column to TIMESTAMP (LTZ) in place; no-op if it
    already is."""
    dt = df.schema[col].dataType
    if isinstance(dt, (TimestampNTZType, DateType)):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
