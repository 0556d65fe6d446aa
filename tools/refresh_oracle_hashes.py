"""Refresh plans/oracle_green_hashes.json — the changed-entries-first
rotation's memory of "which oracle text the driver last validated".

Run RIGHT AFTER a round's CORRECTNESS_r{N}.json lands (i.e. at round
start, before touching any oracle): for every entry hash-green in the
LATEST correctness record, the live oracle text is by construction the
text the driver just validated, so its sha256 becomes the entry's
snapshot value. Entries green only in OLDER rounds keep their existing
snapshot untouched — updating them from the live text would silently
clear a changed flag without driver validation (exactly the gap VERDICT
r12 #3 closed). Never-green entries stay absent: they already sort
first in the rotation.

Usage: python tools/refresh_oracle_hashes.py [--dry-run]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def merge_snapshot(
    snap: dict[str, str],
    latest_record: dict,
    oracle_hashes: dict[str, str],
) -> tuple[dict[str, str], list[str], list[str]]:
    """Pure merge rule: entries hash-green in the LATEST record take the
    live oracle hash (the text the driver just validated); entries green
    only in older rounds keep their existing snapshot value (updating
    them would silently clear a changed flag without driver
    validation); names no longer in the catalog are dropped. Returns
    (new_snapshot, updated_names, dropped_names)."""
    out = dict(snap)
    updated = []
    for name, rec in latest_record.items():
        if not (isinstance(rec, dict) and rec.get("hash_match") is True):
            continue
        h = oracle_hashes.get(name)
        if h is not None and out.get(name) != h:
            out[name] = h
            updated.append(name)
    dropped = sorted(set(out) - set(oracle_hashes))
    for name in dropped:
        del out[name]
    return out, updated, dropped


def main() -> int:
    from hebrew_tutor_data_pipeline_spark.plans import (
        CATALOG,
        _HASH_SNAPSHOT,
        oracle_text_hash,
    )

    records = sorted(
        (
            (int(re.search(r"CORRECTNESS_r(\d+)\.json$", str(f)).group(1)), f)
            for f in REPO.glob("CORRECTNESS_r*.json")
        ),
    )
    if not records:
        print("no CORRECTNESS_r*.json records — nothing to refresh")
        return 1
    rnd, latest = records[-1]
    data = json.loads(latest.read_text())
    try:
        snap = json.loads(_HASH_SNAPSHOT.read_text())
    except (OSError, ValueError):
        snap = {}

    from hebrew_tutor_data_pipeline_spark.plans import plan_source_hash

    # dict form (r13): oracle-text hash + plan-function source hash, so
    # a plan refactor re-enters the window even when the oracle text is
    # untouched. Legacy bare-string records remain readable by
    # load_changed and upgrade here on the entry's next driver-green.
    hashes = {
        n: {"oracle": oracle_text_hash(s.oracle), "plan": plan_source_hash(s)}
        for n, s in CATALOG.items()
        if s.oracle is not None
    }
    snap, updated, stale = merge_snapshot(snap, data, hashes)

    print(
        f"latest record: r{rnd} ({latest.name}); "
        f"{len(updated)} snapshot update(s): {updated}; "
        f"{len(stale)} stale entr{'y' if len(stale)==1 else 'ies'} dropped"
    )
    if "--dry-run" in sys.argv:
        return 0
    _HASH_SNAPSHOT.write_text(
        json.dumps(dict(sorted(snap.items())), indent=1) + "\n"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
