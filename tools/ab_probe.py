"""Alternating A/B probe for one catalog entry (r14 discipline): run
`python bench.py <query>` in a FRESH process per trial (cold session —
the driver's measurement condition), alternating between the working
tree and nothing (same tree twice = noise floor), and print each trial's
wall seconds plus job count context.

The host shows hypervisor steal (identical code 64.9 vs 128.8 s twenty
minutes apart, r13), so single runs prove nothing: evidence is the
MEDIAN of ≥3 fresh-session trials, and a change is only claimed when
the medians separate beyond the trial spread.

Usage: python tools/ab_probe.py <query> [trials=3] [cpus=32]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def trial(name: str, cpus: int) -> float:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), name],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    if r.returncode != 0:
        raise RuntimeError(f"bench rc={r.returncode}: {r.stderr[-1500:]}")
    line = r.stdout.strip().splitlines()[0]
    doc = json.loads(line)
    if doc.get("errors"):
        raise RuntimeError(f"query errored: {doc['errors']}")
    return doc["queries"][name]


def main() -> int:
    name = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    vals = []
    for i in range(trials):
        v = trial(name, cpus)
        vals.append(v)
        print(f"trial {i + 1}: {v:.3f}s", flush=True)
    print(
        f"{name} @ {cpus} cores: median {statistics.median(vals):.3f}s, "
        f"min {min(vals):.3f}s, max {max(vals):.3f}s over {trials} trials"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
