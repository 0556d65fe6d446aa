"""Streaming state-store scale probe (VERDICT r06 'Next round' #6).

The three driver-gated streaming queries hold per-key state (watermark
dedup keys, applyInPandasWithState job state). The default
HDFSBackedStateStoreProvider materializes EVERY key's state as JVM
objects on the executor heap, so state memory grows linearly with key
cardinality until the executor OOMs; RocksDBStateStoreProvider (now the
default in streaming.sources.run_available_now_to_parquet) keeps state
in native RocksDB memtables/SSTs with bounded block-cache memory.

This probe measures exactly that: a watermark dedup over synthetic
streams of growing DISTINCT-KEY cardinality (10^5 → 10^7 — the "x100
key cardinality" axis; the driver corpora hold events fixed at 100k
rows, so the probe synthesizes its own keyed input), run under BOTH
providers, recording per-run wall time and the engine's own
stateOperators metrics (numRowsTotal, memoryUsedBytes, and for RocksDB
the customMetrics memory split). Output: one JSON report for
bench_runs/.

Usage: python tools/state_probe.py [--out bench_runs/r07_state_store.json]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hebrew_tutor_data_pipeline_spark.session import get_spark  # noqa: E402
from hebrew_tutor_data_pipeline_spark.streaming.sources import (  # noqa: E402
    ROCKSDB_PROVIDER,
)

HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)

KEY_COUNTS = (100_000, 1_000_000, 10_000_000)


def synth_events(spark, n_keys: int, root: Path) -> str:
    """n_keys rows, every row a DISTINCT dedup key (worst case for
    state growth: nothing is ever evicted as a duplicate), event times
    inside one watermark window so no state is dropped mid-run either —
    the stream must HOLD n_keys state rows at its peak."""
    out = root / f"events_{n_keys}"
    if not (out / "_SUCCESS").exists():
        (
            spark.range(n_keys)
            .selectExpr(
                "id AS user_id",
                "CAST(timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id % 60) AS timestamp) AS ts",
                "CAST(id AS STRING) AS event_type",
            )
            .coalesce(8)
            .write.mode("overwrite")
            .parquet(str(out))
        )
    return str(out)


def run_dedup(spark, src: str, provider: str, ckpt_root: Path) -> dict:
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    ckpt = ckpt_root / f"ckpt_{provider.rsplit('.', 1)[-1]}_{Path(src).name}"
    shutil.rmtree(ckpt, ignore_errors=True)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    t0 = time.perf_counter()
    q = (
        stream.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(900):
        q.stop()
        raise TimeoutError("state probe stream did not finish")
    sec = round(time.perf_counter() - t0, 2)
    peak = {"numRowsTotal": 0, "memoryUsedBytes": 0}
    custom: dict = {}
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            if so.get("numRowsTotal", 0) >= peak["numRowsTotal"]:
                peak = {
                    "numRowsTotal": so.get("numRowsTotal", 0),
                    "memoryUsedBytes": so.get("memoryUsedBytes", 0),
                }
                custom = so.get("customMetrics", {}) or {}
    shutil.rmtree(ckpt, ignore_errors=True)
    rec = {
        "sec": sec,
        "state_rows_peak": peak["numRowsTotal"],
        "state_memory_mb": round(peak["memoryUsedBytes"] / 1e6, 1),
    }
    for k in (
        "rocksdbTotalMemoryUsageBytes",
        "rocksdbReadBlockCacheHitCount",
        "rocksdbSstFileSize",
        "loadedMapCacheHitCount",
    ):
        if k in custom:
            rec[k] = custom[k]
    return rec


def main() -> int:
    out_path = "bench_runs/r07_state_store.json"
    args = sys.argv[1:]
    if args and args[0] == "--out":
        out_path = args[1]

    spark = get_spark("state-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = Path(tempfile.gettempdir()) / "htdp_state_probe"
    report: dict = {"key_counts": list(KEY_COUNTS), "providers": {}}
    try:
        for n in KEY_COUNTS:
            src = synth_events(spark, n, root)
            for label, provider in (
                ("hdfs", HDFS_PROVIDER),
                ("rocksdb", ROCKSDB_PROVIDER),
            ):
                rec = run_dedup(spark, src, provider, root)
                report["providers"].setdefault(label, {})[str(n)] = rec
                print(f"# {label} n={n}: {rec}", file=sys.stderr)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    Path(out_path).write_text(json.dumps(report, indent=1))
    print(json.dumps({"out": out_path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
