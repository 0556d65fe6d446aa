"""Data layout for scan efficiency: partitioned+sorted writes and
small-file compaction (SURVEY.md §2.11 / §4 posture).

Two layout problems dominate 100 TB scan cost:

- **Partition pruning**: a query filtering on ingest date must read
  only that date's files. ``write_partitioned_sorted`` lays data out as
  hive-style ``col=value`` directories (Catalyst turns date predicates
  into PartitionFilters — directories never listed, let alone read) and
  sorts rows within files so min/max row-group statistics prune inside
  the files that do get read.
- **Small files**: streaming sinks and per-chapter jobs (the
  reference's one-JSON-per-chapter output tree,
  `hebrew_alignment_tool.py:417-464`) accumulate thousands of tiny
  files; scans then pay one task + one open per file. ``compact``
  rewrites a directory into ceil(bytes/target)-sized files with one
  coalesce — no shuffle, since coalesce only merges read splits.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_sorted(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | str,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet, one shuffle on the partition
    columns first so each output directory is produced by few tasks
    (otherwise every task writes a sliver into every partition —
    #tasks × #partitions small files), then sorted within partitions
    for row-group min/max pruning on the sort key."""
    pcols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    out = df.repartition(*[df[c] for c in pcols])
    if sort_cols:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        out = out.sortWithinPartitions(*scols)
    out.write.partitionBy(*pcols).mode(mode).parquet(path)


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 128,
) -> int:
    """Rewrite a parquet directory into files near ``target_mb``.
    Returns the number of output files. Uses ``coalesce`` (split merge,
    no shuffle); row order within merged files is preserved per split,
    so sorted inputs keep their row-group pruning value."""
    df = spark.read.parquet(src)
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path
    fs = jpath(src).getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    total_bytes = sum(
        fs.getFileStatus(jpath(f)).getLen() for f in df.inputFiles()
    ) or 1
    n = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df.coalesce(n).write.mode("overwrite").parquet(dst)
    return len(spark.read.parquet(dst).inputFiles())
