"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (W2 cumulative proportional
allocation — the shape of the reference's shipped estimation-only
alignment pipeline) on sf0.001. ``queries()`` / ``oracle_sql()`` expose
the full catalog from ``hebrew_tutor_data_pipeline_spark.plans``; every
oracle-checkable query has a DuckDB SQL twin with identical column
names and rounding.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hebrew_tutor_data_pipeline_spark.plans import oracle_map, query_map  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return query_map()["alloc_order_value"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omissions → rows-only check)."""
    return oracle_map()
