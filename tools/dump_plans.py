"""Dump `.explain("formatted")` for named catalog queries to
plans/<round>/<query>_<tag>.txt — the optimization round's before/after
plan evidence (guide §1: capture the plan shape for every query you
touch, so claims like "2 Exchange -> 1" are checkable offline).

Usage: python tools/dump_plans.py <tag> <query> [query ...]
       python tools/dump_plans.py <tag> --all
Set DUMP_ROUND (default r14) to pick the output subdirectory.
Plans are built lazily (no execution) so a sweep over the whole catalog
costs analysis time only; streaming/side-effecting entries that cannot
produce a batch plan without running are skipped with a note.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

SF_DIR = "/root/testdata/sf0.1"
OUT_DIR = (
    Path(__file__).resolve().parent.parent
    / "plans"
    / os.environ.get("DUMP_ROUND", "r14")
)


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    from hebrew_tutor_data_pipeline_spark.plans import CATALOG
    from hebrew_tutor_data_pipeline_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--all"]:
        names = list(CATALOG)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    # explain(formatted) re-expands every InMemoryRelation's FULL cached
    # child plan at every reference, so a plan with nested eager caches
    # (r14 persist-locking) renders megabytes of repeated text — bound
    # the string so dumps stay reviewable; Spark appends an explicit
    # truncation marker. Mention-counts (Exchange/Scan) are therefore
    # NOT comparable between cached and uncached plan dumps — use job
    # counts (tools/job_count.py) for executed-work deltas.
    spark.conf.set("spark.sql.maxPlanStringLength", str(256 * 1024))
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for name in names:
        spec = CATALOG[name]
        out = OUT_DIR / f"{name}_{tag}.txt"
        try:
            df = spec.spark(spark, SF_DIR)
            out.write_text(formatted_plan(df))
            print(f"{name}: {out}")
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            print(f"{name}: SKIP ({type(exc).__name__}: {exc})"[:300])
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
