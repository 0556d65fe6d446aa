"""Generate (explode/posexplode) without the optimizer's duplicated
pre-filter.

``InferFiltersFromGenerate`` adds ``isnotnull(arr) AND size(arr) > 0``
below every INNER generate, and predicate pushdown then rewrites that
filter through the projection chain — inlining the array-building
expression into a Filter that runs below any ``spread()`` repartition.
For cheap attribute arrays that is pure win (prunes empties early); for
an EXPENSIVE derived array (HOF n-gram shingles, rolling-hash k-grams,
banded-signature structs) it evaluates the whole construction TWICE per
row, one copy on the pre-repartition layout — measured 10× on trigram
shingling at sf0.1 (5.0 s → 0.5 s for the identical result).

The fix: generate OUTER (infers nothing, keeps empty/null arrays as one
null-element row) and drop those rows with a filter on the generate
OUTPUT, which cannot be pushed below the generate. Result rows are
identical to the inner form **provided array elements themselves are
never null** — every caller in this engine constructs elements
(concat/struct/hash), which cannot be null. Do NOT route attribute
arrays with possibly-null elements through this helper.

Scope is MEASURED, not blanket — and the measurement must span scales:
the outer form's narrower codegen span is a per-row cost that GROWS
with data. The MinHash banded-signature explode looked like a win at
sf0.1 (1.5 s → 0.9 s) and regressed 6× at sf1 (4.7 s → 28 s); the BM25
token explode was +10% at sf0.1 and −19% at sf1. Both keep the plain
inner explode, as do the flat sites (winnowing k-grams, DSIR grams,
BPE pair counting). The one caller that keeps this helper is
trigram-shingle contamination, where the duplicated filter collapsed
parallelism below a repartition — a structural win that holds at every
measured scale (6× at sf0.1, 17× at sf1, n^0.35 at x100).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_nonempty(df: DataFrame, keep: list, arr: Column | str, alias: str) -> DataFrame:
    """``df.select(*keep, explode(arr).alias(alias))`` minus the
    inferred duplicated pre-filter. ``keep`` entries may be column
    names or Column expressions."""
    out = df.select(*keep, F.explode_outer(arr).alias(alias))
    return out.filter(F.col(alias).isNotNull())
