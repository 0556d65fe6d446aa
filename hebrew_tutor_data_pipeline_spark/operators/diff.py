"""Snapshot reconciliation: content-fingerprint diff of two corpus
versions (added / removed / changed / unchanged).

An incrementally-crawled 100 TB corpus is re-materialized in snapshots;
the first question every refresh answers is "what changed since the
last run" — which docs are new, which disappeared, which were edited —
so downstream stages (dedup index refresh, re-embedding, re-tokenizing)
can process the delta instead of the world.

Reference counterpart: the reference's trimmer keeps one-shot
``.backup`` copies next to overwritten WAVs
(scripts/hebrew_audio_trimmer.py:540-706) but has no corpus-level
versioning; at scale, snapshot diffing is the incremental-processing
entry point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    fp_col: str,
) -> DataFrame:
    """Full-outer fingerprint reconciliation of two snapshots.

    Both inputs carry a stable id and a content fingerprint (any
    deterministic digest — ``functions.text.doc_fingerprint`` here,
    xxhash/md5 in production). Returns one row per id seen in either
    snapshot: ``(id, status, fp_old, fp_new)`` with status in
    {'added','removed','changed','unchanged'}.

    Plan shape / 100 TB posture: ONE full-outer sort-merge join on the
    id — the canonical delta plan. Fingerprints are compared, never
    texts, so the shuffle carries (id, digest) pairs only; with both
    snapshots bucketed by id on disk (sources.bucketed) the exchange
    disappears entirely. Status derivation is map-side column
    arithmetic after the join.
    """
    o = old.select(
        F.col(id_col).alias("id"),
        F.col(fp_col).alias("fp_old"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        F.col(fp_col).alias("fp_new"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "id", "full_outer")
    # membership comes from explicit per-side markers, NOT from
    # fingerprint NULL-ness: a legitimately NULL digest (e.g. a NULL
    # text column) must not masquerade as an add/remove
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old").eqNullSafe(F.col("fp_new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("id", status.alias("status"), "fp_old", "fp_new")
