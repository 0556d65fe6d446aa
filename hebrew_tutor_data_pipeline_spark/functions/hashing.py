"""The ONE home of the engine-portable polynomial hash convention.

Every hashed surface — shingle postings, MinHash/SimHash/winnowing keys,
document fingerprints, feature-hash buckets, SRP hyperplane seeds — and
every DuckDB oracle replaying them (plans/catalog_ml._sql_token_hash)
runs the identical integer recurrence, so the constants and the token
fold live here exactly once. A base/mod tweak anywhere else would
silently desynchronize engine and oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
HASH_BASE = 31

#: second independent chain — paired with the first to form 62-bit
#: k-gram keys (dedup._kgram_hash); a lone 31-bit chain collides.
HASH_MOD2 = 2_147_483_629  # largest prime below 2^31-1 distinct from HASH_MOD
HASH_BASE2 = 131


def token_hash(tok: Column) -> Column:
    """Polynomial rolling hash over a token's codepoints:
    ``h = (h*31 + codepoint) mod (2^31-1)``. Engine-portable (no xxhash)."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * HASH_BASE + F.ascii(c)) % HASH_MOD,
    )


def token_hash2(tok: Column) -> Column:
    """The independent second polynomial (base 131, different prime)."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * HASH_BASE2 + F.ascii(c)) % HASH_MOD2,
    )
