"""Bloom-filter approximate membership — the incremental-crawl primitive
the exact/SimHash/MinHash incremental tiers don't cover: "has this key
EVER been indexed?" answered without shipping the full key set, with a
bounded, measurable false-positive rate and zero false negatives
(Bloom, CACM 1970; the standard crawl-frontier / URL-seen-set structure,
e.g. Heritrix's already-seen module).

Spark-first shape: the filter's SET BITS live as a distributed table of
integer positions, not a driver-side bitmap — building it is one
explode + distinct (a single int-keyed shuffle, ∝ k·n_index), and the
membership probe is one explode + LEFT SEMI join + per-key count==k
HashAggregate. Nothing but 64-bit ints ever shuffles; at small index
sizes AQE broadcasts the probe join, at 100 TB it's a co-partitioned
SMJ on ints. A production deployment can fold the same positions into
an actual bitmap per partition; the relational form here is what makes
the semantics oracle-replayable bit-for-bit.

Hash family: double hashing over the two independent polynomial chains
(token_hash base-31, token_hash2 base-131 — Kirsch/Mitzenmacher 2006:
pos_i = (h1 + i·h2) mod m needs only two independent hashes for
asymptotically optimal FPR). Both chains are already oracle-mirrored
SQL fragments, so DuckDB replays every bit position exactly.

Derived knobs (the engine's house rule — no fixed-size filter that
saturates at 100 TB): m = BITS_PER_KEY·n_index bits and k =
round(ln 2 · m/n) = 7, giving the classic ~1% theoretical FPR at 10
bits/key regardless of corpus size. m derives from a corpus count
in-plan and is replayed by the oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import token_hash, token_hash2

#: classic sizing: 10 bits per indexed key -> k = round(ln2 * 10) = 7
#: hash functions -> theoretical FPR (1 - e^(-7/10))^7 ~ 0.82%.
BITS_PER_KEY = 10
NUM_HASHES = 7


def bloom_m_for(n_index: int) -> int:
    """Filter width in bits for an index of ``n_index`` keys (>=64 so
    degenerate tiny indexes still spread across positions)."""
    return max(64, BITS_PER_KEY * n_index)


def bloom_positions(key: Column, m: int, k: int = NUM_HASHES) -> Column:
    """The ``k`` set-bit positions of ``key`` in an ``m``-bit filter via
    Kirsch-Mitzenmacher double hashing: (h1 + i*h2) mod m, i in [0, k).
    h2 is forced odd (|1) so it is never 0 — h2=0 would collapse all k
    probes onto h1's position and silently raise the FPR.

    The raw polynomial chains are MIXED with a quadratic step
    (h² + c mod p) first: structured key families (".../docs/1",
    ".../docs/2", ... — exactly what URL corpora look like) give the
    raw polynomials small arithmetic deltas, and affine double-hashing
    preserves arithmetic progressions into the position space — the
    r10 certificate MEASURED it: zero position collisions where uniform
    draws predict ~30%, and 7.7% FPR against the 0.8% theory. Squaring
    mod p is nonlinear in the delta (2hd+d²), overflow-safe in BIGINT
    (h < 2³¹ → h² < 2⁶²) and replayable in DuckDB, where a 64-bit
    wrapping multiply (the usual avalanche finalizer) is not. One
    map-only expression; positions may repeat for one key (harmless:
    set-bit semantics).

    The (h1, h2) pair is :func:`mixed_hash_pair` — the single family
    definition shared with Count-Min (operators/freqsketch.py), so the
    engine and its oracle twins can never desynchronize per-structure.
    """
    h1, h2 = mixed_hash_pair(key)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (h1 + i.cast("long") * h2) % F.lit(m).cast("long"),
    )


def sql_bloom_positions(key_expr: str, m_expr: str, k: int = NUM_HASHES) -> str:
    """DuckDB twin of :func:`bloom_positions` over SQL expression
    strings (``m_expr`` may itself be a derived-count subquery).
    Delegates to :func:`sql_mixed_hash_pair` — one family definition
    per engine, same as the Column side."""
    h1, h2 = sql_mixed_hash_pair(key_expr)
    return (
        f"list_transform(range(0, {k}), i -> ({h1} + i * {h2}) % ({m_expr}))"
    )


def bloom_bits(index: DataFrame, key_col: str, m: int, k: int = NUM_HASHES) -> DataFrame:
    """The filter's set bits as a one-column table ``(pos)`` — distinct
    positions across every indexed key. One explode + one int-keyed
    distinct shuffle; ∝ k·n rows, never the keys themselves."""
    return (
        index.select(F.explode(bloom_positions(F.col(key_col), m, k)).alias("pos"))
        .distinct()
    )


def bloom_membership(
    batch: DataFrame,
    index: DataFrame,
    key_col: str,
    m: int,
    k: int = NUM_HASHES,
    bits: DataFrame | None = None,
) -> DataFrame:
    """Probe every (distinct) batch key against the index's Bloom set:
    ``(key, maybe_seen)`` where maybe_seen=false is EXACT (no false
    negatives) and maybe_seen=true is approximate at the filter's FPR.

    Plan: batch keys explode to k positions, LEFT join the bit table,
    and a key-grouped count of matched positions == k decides — two
    int-keyed shuffles (the semi-join probe and the per-key agg), no
    key strings past the first projection.

    ``bits`` lets a caller that already built (and typically persisted)
    the position table share it across probes — the membership entry
    and its FPR certificate pay the corpus fold once between them
    instead of once each (VERDICT r10 next #7)."""
    if bits is None:
        bits = bloom_bits(index, key_col, m, k)
    probes = (
        batch.select(F.col(key_col).alias("key"))
        .distinct()
        .select("key", F.explode(bloom_positions(F.col("key"), m, k)).alias("pos"))
    )
    hit = probes.join(bits.withColumn("_set", F.lit(1)), "pos", "left")
    return hit.groupBy("key").agg(
        (F.count("_set") == k).alias("maybe_seen")
    )


# ---------------------------------------------------------------------------
# Shared mixed double-hash family (Bloom positions above, Count-Min rows
# in operators/freqsketch.py)

def mixed_hash_pair(key: Column) -> tuple[Column, Column]:
    """The quadratic-mixed (h1, h2) pair behind every position family
    here: see :func:`bloom_positions` for why raw polynomial chains are
    NOT enough on structured key families. h2 forced odd."""
    from ..functions.hashing import HASH_MOD, HASH_MOD2

    h1 = (token_hash(key) * token_hash(key) + F.lit(3)) % F.lit(HASH_MOD)
    h2 = (
        (token_hash2(key) * token_hash2(key) + F.lit(7)) % F.lit(HASH_MOD2)
    ).bitwiseOR(F.lit(1))
    return h1, h2


def sql_mixed_hash_pair(key_expr: str) -> tuple[str, str]:
    """DuckDB twin of :func:`mixed_hash_pair`."""
    from ..functions.hashing import HASH_BASE, HASH_BASE2, HASH_MOD, HASH_MOD2

    p1 = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({key_expr}, ''), c -> CAST(greatest(unicode(c), 0) AS BIGINT))), "
        f"(acc, x) -> (acc * {HASH_BASE} + x) % {HASH_MOD})"
    )
    p2 = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({key_expr}, ''), c -> CAST(greatest(unicode(c), 0) AS BIGINT))), "
        f"(acc, x) -> (acc * {HASH_BASE2} + x) % {HASH_MOD2})"
    )
    h1 = f"(({p1} * {p1} + 3) % {HASH_MOD})"
    h2 = f"((({p2} * {p2} + 7) % {HASH_MOD2}) | 1)"
    return h1, h2
