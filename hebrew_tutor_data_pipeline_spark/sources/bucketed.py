"""Bucketed tables: pay a join's shuffle once at write time
(SURVEY.md §2.11 / §4 physical-execution posture).

At 100 TB the dominant cost of a fact-to-fact equi-join (orders ⋈
lineitem, documents ⋈ embeddings) is shuffling both sides on the key.
When the same join recurs across queries — exactly the catalog's shape —
Spark's answer is bucketing: write both tables hash-partitioned (and
optionally sorted) by the join key into the same number of buckets, and
every later join/aggregation on that key runs with ZERO exchange: the
scan itself reports the hash distribution and Catalyst drops the
shuffle on both sides (and the sort, when sortBy matches).

The reference has no analog — its data always fits one process — but a
cluster deployment of this engine would bucket `lineitem`/`orders` by
orderkey and `embeddings` by doc block. ``tests/test_sources_sinks.py``
proves the contract: the bucketed join plan contains no Exchange and
returns rows identical to the shuffled join.

Bucketing here is native-Parquet (no Hive metastore needed): tables
register in the session catalog; pass ``path`` to keep data external
(e.g. a test tmp dir) so dropping the table never deletes data you
don't own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    sort_cols: list[str] | str | None = None,
    path: str | None = None,
    format: str = "parquet",
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_cols`` into
    ``num_buckets`` files per partition. Joins between two tables
    bucketed on the same key with the same bucket count are
    exchange-free; ``sort_cols`` additionally pre-sorts each bucket so
    sort-merge joins skip their sort step. ``num_buckets`` should put
    one bucket near the 128 MB scan sweet spot at the target scale."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.format(format).mode("overwrite").bucketBy(num_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sc)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]] | None:
    """(num_buckets, bucket columns) of a catalog table, or None if the
    table is unbucketed — lets callers assert co-location before relying
    on an exchange-free plan."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        return None
    n = int(info["Num Buckets"])
    cols = [c.strip(" `") for c in info["Bucket Columns"].strip("[]").split(",")]
    return n, cols
