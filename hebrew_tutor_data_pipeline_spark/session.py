"""SparkSession bootstrap tuned for both local testing and cluster scale.

The reference hand-rolls concurrency (asyncio semaphores, thread pools,
retry loops — SURVEY.md §2.11); here all of that belongs to the Spark
scheduler. This module owns the one place engine-wide execution knobs are
set so every entry point (tests, bench, driver contract) gets the same
behavior.

Scale posture (100 TB design point):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy demotion replace any hand-tuned partition math.
- Arrow on: every pandas UDF crosses the JVM/Python boundary in columnar
  batches, never row-at-a-time pickling.
- shuffle.partitions is a *default* for local[32]; on a real cluster AQE
  coalesces from a deliberately high initial number, so we leave
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` unset here
  and let deployments override via ``extra_conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[32] test harness; cluster deployments
# override via extra_conf / spark-submit --conf.
_DEFAULT_CONF: dict[str, str] = {
    # --- Adaptive execution: the engine's answer to skew and mis-sized shuffles
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # --- Arrow for every Python<->JVM crossing
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # --- Broadcast threshold: dimensions (region/nation/book_map) are tiny;
    # 64 MB keeps even a 10M-row dim broadcastable on a big cluster.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # --- Shuffle sizing for local tests (AQE coalesces down when small)
    "spark.sql.shuffle.partitions": "32",
    # --- Heap for the single local JVM (driver == executors in local
    # mode): Spark's 1g default starves 32 task threads — posting-list
    # self-joins OOM long before they would spill — but OVERSIZING hurts
    # more than it helps here: a 48g heap measured 2-4× slower on the
    # shuffle-heavy catalog queries than 8g (first-touch page faults +
    # G1 scanning huge regions). Must be set before JVM launch, so it
    # lives here, not in SparkConf-at-runtime. Cluster deployments size
    # executors via spark-submit instead.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # --- Scans: pushdown + pruning are on by default; keep partition files
    # near the 128 MB sweet spot at scale.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # --- Session timezone pinned so timestamp semantics match the DuckDB
    # oracle regardless of host timezone.
    "spark.sql.session.timeZone": "UTC",
    # --- Parquet TIMESTAMP(NANOS) columns (events.ts) surface as LongType
    # instead of failing the scan; sources.readers converts them to
    # microsecond timestamps (same truncation DuckDB applies).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # --- Quieter local runs
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def default_parallelism() -> int:
    """Local CPU budget, overridable by the driver via SPARK_GRAFT_CPUS."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "hebrew-tutor-data-pipeline-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` resolution order: explicit argument, then the
    ``SPARK_MASTER`` env var's VALUE, then whatever spark-submit already
    configured (``spark.master`` in the loaded SparkConf — spark-submit
    communicates the master via conf, never via any env var), and only
    when none of those exist the ``local[$SPARK_GRAFT_CPUS]`` fallback —
    so a submitted cluster master is never silently overridden with
    local mode.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = os.environ.get("SPARK_MASTER")
    if master is None:
        from pyspark import SparkConf

        try:
            configured = SparkConf().contains("spark.master")
        except Exception:  # no JVM yet and no defaults — not configured
            configured = False
        if not configured:
            master = f"local[{default_parallelism()}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
