"""Per-query Spark JOB counts — the deterministic half of the sf0.1
fixed-overhead analysis (guide §1: know where the time goes before
touching anything; on a steal-noisy host, job counts are the signal
wall-clock is not).

Each catalog query runs once inside its own job group; the number of
jobs it launched is read from the status tracker. A query whose plan is
"one action" still pays one job per eager sub-step (knob counts,
persist materializations, Lloyd passes, localCheckpoint rounds,
streaming micro-batches) — at sf0.1 each such job costs ~0.2-0.5 s of
pure scheduling/launch latency, so job count x per-job floor bounds the
fixed overhead an entry can never go below without restructuring.

Usage: python tools/job_count.py <query> [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    from hebrew_tutor_data_pipeline_spark.plans import CATALOG
    from hebrew_tutor_data_pipeline_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark("job-count")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # warm the Python worker pool + JIT as bench.py does, off the books
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name in names:
        spec = CATALOG[name]
        group = f"jc_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = spec.spark(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(group)
        out[name] = (len(jobs), round(dt, 2))
        print(f"{name}: {len(jobs)} jobs, {dt:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
