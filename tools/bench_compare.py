"""Compare two bench.py JSON outputs and flag per-query regressions.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]
       python tools/bench_compare.py OLD1.json,OLD2.json,... NEW1.json,NEW2.json,... [threshold]

Reads either raw one-line bench output or the driver's BENCH_r{N}.json
wrapper (with a "parsed" field). Prints per-query deltas sorted worst
first and exits 1 if any query slowed by more than ``threshold``
(default 1.5×) AND by more than 0.5 s absolute — both gates, because
local timings jitter ±30% on sub-second queries (see memory: compare
only fresh full runs).

Comma-joined file lists take the per-query BEST (min) of each side
before comparing — the cross-ROUND protocol (VERDICT r10 #3): the
r9→r10 trimmer_intro_analysis drift (best-vs-best 1.47×) was invisible
because every r10 comparison was within-round; best-of-N per side
removes ambient jitter, so what survives is reproducible. Run it as
  python tools/bench_compare.py "$(ls bench_runs/r09_quiet_run_*.json | paste -sd,)" \\
      "$(ls bench_runs/r10_quiet_run_*.json | paste -sd,)" 1.3
at the end of every round, against the PREVIOUS round's quiet runs.
"""

from __future__ import annotations

import json
import sys


def load_one(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:
        doc = doc["parsed"]
    return doc["queries"]


def load(spec: str) -> dict[str, float]:
    """One path, or a comma-joined list reduced to per-query best-of."""
    paths = [p for p in spec.split(",") if p]
    merged: dict[str, float] = {}
    for p in paths:
        for name, sec in load_one(p).items():
            if name not in merged or sec < merged[name]:
                merged[name] = sec
    return merged


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    rows = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None:
            rows.append((float("inf"), name, o, n, "added" if o is None else "removed"))
            continue
        ratio = n / o if o else float("inf")
        flag = "REGRESSION" if (ratio > threshold and n - o > 0.5) else ""
        rows.append((ratio, name, o, n, flag))
    rows.sort(reverse=True)
    bad = 0
    for ratio, name, o, n, flag in rows:
        r = f"{ratio:5.2f}x" if ratio != float("inf") else "    —"
        print(f"{r}  {name:38s} {o if o is not None else '—':>7} -> "
              f"{n if n is not None else '—':>7}  {flag}")
        # a query that vanished from the NEW run (errored or deleted)
        # must count as a regression: fault-isolated bench.py excludes
        # errored queries from the sum, so a lower total with exit 0
        # would otherwise read as a speedup
        bad += flag == "REGRESSION" or flag == "removed"
    for spec, label in ((sys.argv[1], "old"), (sys.argv[2], "new")):
        for run in spec.split(","):
            if not run:
                continue
            with open(run) as f:
                doc = json.load(f)
            errs = (doc.get("parsed") or doc).get("errors") or {}
            if errs:
                print(f"{label} run {run} recorded {len(errs)} query error(s): {sorted(errs)}")
                # errored queries that were in the old run are already flagged
                # 'removed' above — only count ones the diff rows missed.
                # A query absent from old that errored in ONE merged new
                # run but has a valid best-of timing from another is NOT
                # a regression (ADVICE r11): require it missing from the
                # merged new dict too.
                bad += (
                    sum(1 for q in errs if q not in old and q not in new)
                    if label == "new"
                    else 0
                )
    tot_o, tot_n = sum(old.values()), sum(new.values())
    print(f"\ntotal: {tot_o:.1f}s -> {tot_n:.1f}s  ({tot_n / tot_o:.2f}x), "
          f"{bad} regression(s) past {threshold}x+0.5s (removed/errored count)")
    return 1 if bad else 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # e.g. piped into `head`
        raise SystemExit(0)
