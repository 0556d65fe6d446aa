"""Streaming sources (T1 — event streams as micro-batches).

The reference consumes Azure recognition events via callbacks appending
to a list until `session_stopped` (`fixed_hebrew_aligner.py:278-314`).
Structured Streaming's file/rate sources give the same
unbounded-append model with replay and exactly-once bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Schema of the synthetic `events` table as a stream (file sources
#: require an explicit schema — no runtime inference on unbounded input).
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_file_stream(
    spark: SparkSession,
    directory: str,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay an events directory as a stream. ``maxFilesPerTrigger``
    throttles ingestion (the streaming analog of the reference's
    semaphore-bounded concurrency, `fixed_hebrew_aligner.py:724-731`)."""
    reader = spark.readStream.format(fmt).schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(directory)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic unbounded source for smoke tests and demos — one row per
    tick with (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(F.col("timestamp").alias("ts"), F.col("value"))
    )
