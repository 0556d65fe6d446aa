"""Latency probe for the consumer-facing point lookup (VERDICT r7 #7):
the HTML viewer's time→word query (`standalone_hebrew_tester.html:458-492`)
served from a partitioned parquet layout of the alignment output.

Builds a serving table = corpus word spread × N_TRACKS synthetic tracks
(the multi-user serving shape: one aligned track per user session),
written partitioned by book and sorted by (chapter, word_start) within
partitions, then times single-literal point lookups — the form where the
bin/partition keys fold to constants and prune the scan. Records median
and p90 wall ms to bench_runs/r08_point_lookup.json.

Usage: python tools/point_lookup_latency.py [sf_dir] [n_tracks]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_tracks = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import functions as F

    from hebrew_tutor_data_pipeline_spark.plans.catalog_hebrew import (
        corpus_word_spread,
    )
    from hebrew_tutor_data_pipeline_spark.session import get_spark

    spark = get_spark("point_lookup_latency")
    out = Path(tempfile.mkdtemp(prefix="htdp_serving_"))
    try:
        words = corpus_word_spread(spark, sf_dir)
        serving = words.crossJoin(
            spark.range(n_tracks).select(F.col("id").alias("track_id"))
        )
        (
            serving.repartition("book")
            .sortWithinPartitions("chapter", "word_start")
            .write.mode("overwrite")
            .partitionBy("book")
            .parquet(str(out / "serving"))
        )
        table = spark.read.parquet(str(out / "serving"))
        n_rows = table.count()

        # deterministic probe set: stride across tracks/books/chapters
        keys = [
            (r["book"], r["chapter"], float(r["dur"]))
            for r in words.groupBy("book", "chapter")
            .agg(F.max("word_end").alias("dur"))
            .orderBy("book", "chapter")
            .collect()
        ]
        probes = []
        for i in range(20):
            book, chapter, dur = keys[i % len(keys)]
            probes.append(
                (i * 37 % n_tracks, book, chapter, round(dur * (i % 9 + 1) / 10, 2))
            )

        def lookup(track, book, chapter, t):
            return (
                table.filter(
                    (F.col("track_id") == track)
                    & (F.col("book") == book)
                    & (F.col("chapter") == chapter)
                    & (F.lit(t) >= F.col("word_start"))
                    & (F.lit(t) <= F.col("word_end"))
                )
                .orderBy("verse_num", "word_pos")
                .limit(1)
                .select("verse_num", "word_pos", "word")
            )

        # prove the scan prunes: partition filter on book, data filters
        # pushed to parquet (min/max skipping on the sorted word_start)
        plan = lookup(*probes[0])._jdf.queryExecution().executedPlan().toString()
        pushed = "PushedFilters: [" in plan and "IsNotNull" in plan
        partition_pruned = "PartitionFilters: [" in plan and "book" in plan.split(
            "PartitionFilters:"
        )[1].split("]")[0]

        lookup(*probes[0]).collect()  # warm codegen/JIT once
        lat_ms = []
        for p in probes:
            t0 = time.perf_counter()
            rows = lookup(*p).collect()
            lat_ms.append((time.perf_counter() - t0) * 1000.0)
            assert len(rows) <= 1
        lat_ms.sort()
        result = {
            "metric": "point_lookup_latency",
            "sf_dir": sf_dir,
            "n_tracks": n_tracks,
            "serving_rows": n_rows,
            "n_probes": len(probes),
            "median_ms": round(lat_ms[len(lat_ms) // 2], 1),
            "p90_ms": round(lat_ms[int(len(lat_ms) * 0.9)], 1),
            "max_ms": round(lat_ms[-1], 1),
            "pushed_filters": pushed,
            "partition_pruned": partition_pruned,
            "sub_second": lat_ms[-1] < 1000.0,
        }
        print(json.dumps(result))
        dest = Path(__file__).resolve().parent.parent / "bench_runs"
        dest.mkdir(exist_ok=True)
        (dest / "r08_point_lookup.json").write_text(json.dumps(result, indent=2))
        return 0
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
