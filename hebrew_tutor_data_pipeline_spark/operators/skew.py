"""Skew mitigation: salted joins and two-phase salted aggregation
(SURVEY.md §2.11 physical-execution posture).

The reference never faces key skew — it processes one chapter per loop
iteration in a single process (`fixed_hebrew_aligner.py` process_all_chapters,
SURVEY.md §3 entry point 2). At 100 TB the equivalent plans shuffle on keys
whose value distribution is power-law (event types, book ids, hot shingles),
and a handful of reducers receive most of the data.

Two mitigations, complementary to AQE:

- ``spark.sql.adaptive.skewJoin`` (on in session.py) splits oversized
  partitions of a **sort-merge join** at runtime. It does NOT help
  skewed *aggregations*, nor joins that resolve to other strategies.
- The operators here handle those cases statically: ``salted_join``
  spreads each hot key over ``n_salts`` sub-keys (replicating the small
  side), and ``salted_aggregate`` runs any skewed groupBy as two hash
  aggregations — partial on ``(keys, salt)``, merge on ``keys`` — so no
  single reducer ever materializes a hot key's full row set.

When is salting the right call vs letting Spark handle it?

- sum/count/min/max/avg: Spark's hash aggregate already does map-side
  partial aggregation; salting adds little. Included for completeness.
- collect_set / collect_list / distinct-within-group: partial
  aggregation still ships every element of a hot key to ONE reducer
  (the map-side combine can't shrink a set below its cardinality).
  This is the case that OOMs at scale and the one ``salted_aggregate``
  exists for: each salt's partial set is bounded by ~1/n_salts of the
  key's rows, and the merge combines n_salts *arrays* per key instead
  of all raw rows.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Aggregation kinds supported by salted_aggregate. Each maps to
# (partial aggregation over (keys, salt), merge aggregation over keys).
_KINDS = ("sum", "count", "min", "max", "avg", "collect_set")


def with_salt(
    df: DataFrame,
    n_salts: int,
    salt_col: str = "_salt",
    spread_identical_rows: bool = False,
) -> DataFrame:
    """Per-row salt in [0, n_salts).

    Default: a hash over the row's values — fully deterministic, so a
    shuffle-map retry reproduces the same salt for the same row
    regardless of upstream row order (the SPARK-23207 class of
    lost/duplicated rows under fetch-failure recompute cannot occur).
    Limitation: byte-identical duplicate rows of a hot key (heartbeats,
    retry storms) all hash to ONE salt, and the mitigation degrades to
    a no-op for them.

    ``spread_identical_rows=True`` additionally mixes in the row's
    position (``monotonically_increasing_id``) so even identical rows
    spread. Use it ONLY when the input's lineage is deterministic up to
    this operator (e.g. a file scan, where a task retry replays its
    partition with the same ids); on a nondeterministically-ordered
    upstream (output of another shuffle), a stage retry could re-salt
    rows differently mid-shuffle. Consumers are salt-invariant either
    way — this choice affects retry-time partition stability, not
    results."""
    cols = [F.col(c) for c in df.columns]
    if spread_identical_rows:
        cols.append(F.monotonically_increasing_id())
    return df.withColumn(
        # pmod alone (no abs): pmod already maps negative hashes into
        # [0, n), and abs(hash) THROWS under ANSI mode when a row's
        # 32-bit hash lands exactly on INT_MIN (p = 2^-32 per row — a
        # statistical certainty at the trillion-row design point)
        salt_col, F.pmod(F.hash(*cols), F.lit(n_salts))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
    spread_identical_rows: bool = False,
) -> DataFrame:
    """Equi-join a skew-keyed big side against a small (but not
    broadcastable) side: the big side gets a per-row salt, the small side
    is replicated once per salt value, and the join key becomes
    ``on + [salt]`` — each formerly-hot shuffle partition splits into
    ``n_salts`` pieces. Output == plain ``big.join(small, on, how)``.

    Cost model: small side is written ``n_salts`` times into the
    shuffle; pick ``n_salts`` ≈ (hot-key rows / target partition rows).
    If the small side fits in memory, prefer ``F.broadcast`` — zero
    shuffle beats a salted one. Supported joins: inner / left (the
    semantics that survive key replication unchanged).

    NULL join keys follow standard SQL equi-join semantics, identical
    to the unsalted join: NULL never equals NULL, so NULL-key rows
    produce no match — dropped under ``inner``, kept (with NULL small
    side) under ``left``. The salt cannot perturb this: it is derived
    from the row's values (never NULL itself) and only ever SPLITS an
    equality group, so a pair that wouldn't join unsalted can't join
    salted. An oracle that models NULLs as a joinable group (e.g. a
    GROUP BY over an outer join) must be compared against the
    ``left`` form, not ``inner`` (tests/test_operators.py pins
    salted==plain equivalence for both, NULL keys included).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_big = with_salt(big, n_salts, spread_identical_rows=spread_identical_rows)
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(replicated, keys + ["_salt"], how).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: Iterable[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    spread_identical_rows: bool = False,
) -> DataFrame:
    """Two-phase aggregation over skewed group keys.

    ``aggs`` maps output alias -> (input column, kind) with kind one of
    sum / count / min / max / avg / collect_set. Phase 1 aggregates on
    ``(keys, salt)`` — n_salts partial states per hot key, each bounded;
    phase 2 merges the partials on ``keys`` alone, combining at most
    ``n_salts`` rows per key. Results are exactly those of the direct
    ``df.groupBy(keys).agg(...)`` (collect_set order is normalized by
    the caller as with any Spark set aggregate).
    """
    keys = list(keys)
    for alias, (_, kind) in aggs.items():
        if kind not in _KINDS:
            raise ValueError(f"unsupported kind {kind!r} for {alias!r}")

    partial_exprs = []
    for alias, (col, kind) in aggs.items():
        if kind == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{alias}"))
        elif kind == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{alias}"))
        elif kind == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{alias}"))
        elif kind == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{alias}"))
        elif kind == "avg":  # decompose: avg of partial avgs is wrong
            partial_exprs.append(F.sum(col).alias(f"_ps_{alias}"))
            partial_exprs.append(F.count(col).alias(f"_pc_{alias}"))
        elif kind == "collect_set":
            partial_exprs.append(F.collect_set(col).alias(f"_p_{alias}"))
    partial = with_salt(
        df, n_salts, spread_identical_rows=spread_identical_rows
    ).groupBy(*keys, "_salt").agg(*partial_exprs)

    merge_exprs = []
    for alias, (_, kind) in aggs.items():
        if kind in ("sum", "count"):
            merge_exprs.append(F.sum(f"_p_{alias}").alias(alias))
        elif kind == "min":
            merge_exprs.append(F.min(f"_p_{alias}").alias(alias))
        elif kind == "max":
            merge_exprs.append(F.max(f"_p_{alias}").alias(alias))
        elif kind == "avg":
            merge_exprs.append(
                (F.sum(f"_ps_{alias}") / F.sum(f"_pc_{alias}")).alias(alias)
            )
        elif kind == "collect_set":
            merge_exprs.append(
                F.array_distinct(F.flatten(F.collect_list(f"_p_{alias}"))).alias(alias)
            )
    return partial.groupBy(*keys).agg(*merge_exprs)
