"""Round-close measurement checklist, as ONE executable (VERDICT r11
next #7): the quiet pair, the cross-round best-of-N comparator against
COMMITTED controls, and the dangling-citation gate — so every round ends
with the same committed evidence instead of a prose checklist.

Steps (strictly serial — concurrent Spark sessions contaminate timings,
the r06/r11 lesson):
  1. two solo `bench.py` runs → bench_runs/r{N}_quiet_run_{a,b}.json
     (each is the FULL sidecar copied from bench_runs/BENCH_last.json,
     so the record never depends on stdout tail size);
  2. tools/bench_compare.py <old-runs> <new pair> →
     bench_runs/r{N}_cross_round_compare.txt — any >1.5×+0.5 s flag is
     printed and must get a dedicated probe THE SAME ROUND (r11 #4);
  3. the citation contract test, so a dangling bench_runs reference
     fails the close, not the next judge pass.

Usage: python tools/round_close.py N old1.json,old2.json [tag1,tag2]

RUN TWICE PER ROUND (VERDICT r12 #6): once at ~70% of the turn budget
(the CHECKPOINT close — guarantees a complete committed evidence set
even if the final minutes are lost, the exact failure that hollowed two
r12 artifacts) and once at the end (the refresh). The quiet-pair files
are simply overwritten by the refresh; commit after each run.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(out: Path) -> None:
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=7200,
    )
    if r.returncode != 0:
        raise RuntimeError(f"bench.py rc={r.returncode}:\n{r.stderr[-2000:]}")
    sidecar = REPO / "bench_runs" / "BENCH_last.json"
    shutil.copyfile(sidecar, out)
    doc = json.loads(out.read_text())
    errs = doc.get("errors") or {}
    print(
        f"{out.name}: {doc['value']} s, {len(doc['queries'])} queries, "
        f"{len(errs)} errors" + (f" {sorted(errs)}" if errs else "")
    )


def main() -> int:
    if len(sys.argv) not in (3, 4):
        sys.exit(__doc__)
    n, old = int(sys.argv[1]), sys.argv[2]
    # optional pair of run tags, e.g. "d,e" for the end-of-round refresh
    # so it does not overwrite the checkpoint close's a/b record
    tags = tuple(sys.argv[3].split(",")) if len(sys.argv) == 4 else ("a", "b")
    runs = []
    for tag in tags:
        out = REPO / "bench_runs" / f"r{n:02d}_quiet_run_{tag}.json"
        run_bench(out)
        runs.append(str(out))

    suffix = "" if tags == ("a", "b") else "_" + "".join(tags)
    cmp_out = REPO / "bench_runs" / f"r{n:02d}_cross_round_compare{suffix}.txt"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_compare.py"), old, ",".join(runs)],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    cmp_out.write_text(r.stdout + r.stderr)
    print(r.stdout.splitlines()[-1] if r.stdout else r.stderr[-500:])
    flagged = r.returncode != 0

    gate = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_contract.py::test_every_cited_bench_artifact_is_committed",
            "-q",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    print("citation gate:", "green" if gate.returncode == 0 else "RED")
    if gate.returncode != 0:
        print(gate.stdout[-1500:])

    if flagged:
        print(
            "\ncomparator flagged regressions — probe each one THIS round "
            f"(see {cmp_out.name}); exit 1 so the close is not silently green"
        )
    return 1 if (flagged or gate.returncode != 0) else 0


if __name__ == "__main__":
    raise SystemExit(main())
