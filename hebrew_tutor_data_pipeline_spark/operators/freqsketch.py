"""Count-Min frequency sketch (Cormode & Muthukrishnan, J. Algorithms
2005) — approximate per-key counts in O(d·w) memory regardless of
corpus size, with one-sided error: estimate ≥ true always, and
estimate ≤ true + ε·N with probability 1−δ per key (ε = e/w, δ = e^−d).
The training-data use case is frequency gating without exact counts —
df-caps, stop-token lists, vocabulary pruning — where shipping an exact
(token, count) table is the thing you're trying not to do.

Spark-first shape: counters are a (row, pos, c) TABLE built by one
explode of d positions per distinct key + one (row, pos)-keyed
HashAggregate — never a driver array, never a UDF. The sketch is
FIXED-size by design (the one knob family in this engine that must NOT
derive from the corpus count: CM's memory/ε tradeoff is the contract —
absolute error ε·N grows with N, relative error stays put). Point
queries join probes' d cells against the counter table — the sketch is
at most d·w rows, so the probe join always broadcasts.

Row hashes are the Kirsch/Mitzenmacher family over the shared
quadratic-MIXED pair (operators.membership.mixed_hash_pair —
structured-key lesson measured by the Bloom FPR certificate):
cell_j(x) = (h1 + j·h2) mod P mod w for rows j = 0..d−1, replayed
exactly by the DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import HASH_MOD
from .membership import mixed_hash_pair, sql_mixed_hash_pair

#: w = 2048 → ε = e/w ≈ 0.13% of total mass; d = 4 → δ = e⁻⁴ ≈ 1.8%.
WIDTH = 2048
DEPTH = 4


def cm_positions(key: Column, w: int = WIDTH, d: int = DEPTH) -> Column:
    """array<struct<row,pos>> — the ``d`` counter cells of ``key``."""
    h1, h2 = mixed_hash_pair(key)
    return F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        # field names r/p, not row/pos: ROW is a DuckDB keyword and the
        # oracle's recursive unnest surfaces struct fields as columns
        lambda j: F.struct(
            j.cast("int").alias("r"),
            ((h1 + j.cast("long") * h2) % F.lit(HASH_MOD) % F.lit(w)).alias("p"),
        ),
    )


def sql_cm_positions(key_expr: str, w: int = WIDTH, d: int = DEPTH) -> str:
    """DuckDB twin of :func:`cm_positions`."""
    h1, h2 = sql_mixed_hash_pair(key_expr)
    return (
        f"list_transform(range(0, {d}), j -> "
        f"{{'r': CAST(j AS INTEGER), 'p': ({h1} + j * {h2}) % {HASH_MOD} % {w}}})"
    )


def cm_sketch(
    weighted: DataFrame, key_col: str, weight_col: str, w: int = WIDTH, d: int = DEPTH
) -> DataFrame:
    """The counter table ``(row, pos, c)`` from (key, weight) pairs.
    By linearity the counters are identical whether fed raw instances
    or pre-aggregated weights — a streaming deployment feeds instances,
    a batch build saves the explode. ≤ d·w rows out."""
    # withColumn-then-select, not one select: aliasing the key column and
    # referencing it inside the explode in the SAME projection trips
    # Spark's LateralColumnAliasReference internal error when key_col
    # already carries the output name
    cells = weighted.withColumn(
        "_cell", F.explode(cm_positions(F.col(key_col), w, d))
    )
    return cells.groupBy(
        F.col("_cell.r").alias("r"), F.col("_cell.p").alias("p")
    ).agg(F.sum(weight_col).alias("c"))


def cm_estimate(
    probes: DataFrame, sketch: DataFrame, key_col: str, w: int = WIDTH, d: int = DEPTH
) -> DataFrame:
    """(key, cm_estimate): min over the ``d`` cells, absent cells = 0
    (a key with any true mass always has all d cells present, so a zero
    can only mean truly-unseen-or-collision-free — the ≥-true guarantee
    is preserved)."""
    cells = probes.withColumn(
        "_cell", F.explode(cm_positions(F.col(key_col), w, d))
    ).select(
        F.col(key_col).alias("key"),
        F.col("_cell.r").alias("r"),
        F.col("_cell.p").alias("p"),
    )
    joined = cells.join(sketch, ["r", "p"], "left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_estimate")
    )
