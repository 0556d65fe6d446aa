"""MinHash cache adjudication probe (VERDICT r10 'what's wrong' #1 /
'next' #1): the committed r10 evidence contradicts itself — the gated
eager cache (operators/dedup.py minhash_lsh_pairs cache_hashed) won 11 s
of wall at x100 (51.6 -> 40.3 s) but the SAME committed JSON records
14.3 GB of execution spill and 3.4 GB of shuffle where the uncached
rework ran with ZERO spill and 238/408 MB — while three prose sites
claimed "zero spill" for the cached run.

This probe separates the confounded metrics per variant at x1/x10/x100:
  - wall (noop write, the r10 protocol)
  - shuffle write/read bytes (UI stage metrics)
  - execution spill, memoryBytesSpilled and diskBytesSpilled SEPARATED
    (the r10 number lumped them; memory-spill is the deserialized size,
    typically several x the disk bytes)
  - storage footprint of persisted blocks (UI /storage/rdd — NOT spill)
  - the FINAL AQE plan's join strategies (BroadcastHashJoin vs
    SortMergeJoin count), captured from an executed collect() — the
    suspected mechanism is that persisting `hashed` replaces its
    lineage size estimate with the materialized columnar size, flipping
    the static planner's broadcast decisions for the two verify joins
    into SMJs that shuffle the corpus-sized `th` array column.

Variants:
  uncached   materialize=False      (the r10 rework of record — 4 folds)
  persist    materialize="persist"  (the r10 cache whose record was wrong)
  reuse      materialize="reuse"    (r11 fix: one repartition(id) exchange
             shared by all four subtrees via AQE stage reuse — fold runs
             once, lineage stats intact, broadcasts survive)

Usage: python tools/minhash_cache_probe.py [--out bench_runs/rXX.json] [DIR ...]
  defaults: /root/scale_data/x{1,10,100}
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hebrew_tutor_data_pipeline_spark.operators import dedup  # noqa: E402
from hebrew_tutor_data_pipeline_spark.sources.readers import spread  # noqa: E402
from hebrew_tutor_data_pipeline_spark.session import get_spark  # noqa: E402
from tools.scale_bench import clear_persisted, stage_metrics  # noqa: E402


def _docs(spark, d: str):
    return spread(
        spark.read.parquet(str(Path(d) / "documents.parquet")).selectExpr(
            "doc_id", "text"
        )
    )


def _pairs(spark, d: str, **kw):
    return dedup.minhash_lsh_pairs(
        _docs(spark, d), "doc_id", "text", n=3, num_hashes=32, bands=16,
        threshold=0.5, **kw,
    )


def _storage_mb(ui: str) -> dict:
    try:
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10))
        rdds = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{apps[0]['id']}/storage/rdd", timeout=10
            )
        )
    except Exception:  # noqa: BLE001
        return {}
    return {
        "storage_memory_mb": round(sum(r.get("memoryUsed", 0) for r in rdds) / 1e6, 2),
        "storage_disk_mb": round(sum(r.get("diskUsed", 0) for r in rdds) / 1e6, 2),
    }


def _join_mix(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "final": "isFinalPlan=true" in plan,
    }


def main() -> int:
    args = sys.argv[1:]
    out_path = "bench_runs/minhash_cache_probe.json"
    if args[:1] == ["--out"]:
        out_path, args = args[1], args[2:]
    dirs = args or ["/root/scale_data/x1", "/root/scale_data/x10", "/root/scale_data/x100"]

    variants: dict[str, dict] = {
        "uncached": {"materialize": False},
        "persist": {"materialize": "persist"},
        "reuse": {"materialize": "reuse"},
    }

    spark = get_spark("minhash-cache-probe", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    report: dict = {"variants": {}}
    for d in dirs:
        label = Path(d).name
        for vname, kw in variants.items():
            seen = set(stage_metrics(ui)) if ui else set()
            t0 = time.perf_counter()
            df = _pairs(spark, d, **kw)
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 3)
            rec: dict = {"sec": wall}
            rec.update(_storage_mb(ui))
            if ui:
                after = stage_metrics(ui)
                new = [after[k] for k in after.keys() - seen]
                rec["shuffle_write_mb"] = round(
                    sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 2
                )
                rec["spill_memory_mb"] = round(
                    sum(s.get("memoryBytesSpilled", 0) for s in new) / 1e6, 2
                )
                rec["spill_disk_mb"] = round(
                    sum(s.get("diskBytesSpilled", 0) for s in new) / 1e6, 2
                )
            # final-plan join mix from an executed action on the SAME frame
            n_pairs = df.count()
            rec["n_pairs"] = n_pairs
            rec["joins"] = _join_mix(df)
            clear_persisted(spark)
            report["variants"].setdefault(vname, {})[label] = rec
            print(f"# {label} {vname}: {json.dumps(rec)}", file=sys.stderr)

    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    Path(out_path).write_text(json.dumps(report, indent=1))
    print(json.dumps({"out": out_path}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
