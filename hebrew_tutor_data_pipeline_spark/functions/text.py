"""Text-analysis expression library for the training-data pipeline ops.

Beyond the reference's own surface (BASELINE.json north star): language
identification, quality scoring, token counting, and document
fingerprinting over the `documents` table — each a pure column
expression so the 100 TB path stays inside whole-stage codegen.

Design constraint: every expression here has an exact ANSI-SQL twin
(DuckDB oracle), so regex classes are kept to RE2-compatible basics and
hashes to plain integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
import re as _re

from pyspark.sql import functions as F

from .hashing import HASH_BASE, HASH_MOD, token_hash

# ---------------------------------------------------------------------------
# Tokenization / counting

#: BPE-ish pre-tokenizer: letter runs, single digits, single punctuation.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def whitespace_tokens(col: Column) -> Column:
    """Whitespace tokenization as maximal non-space runs
    (``regexp_extract_all('\\S+')``): empty/whitespace-only → [] and
    tab/newline-EDGED text carries no empty edge tokens, so
    ``size(whitespace_tokens(x)) == whitespace_token_count(x)`` for
    every input. (trim-then-split kept edge empties for '\\tthe end' —
    SQL trim strips only spaces — silently desyncing every tokenized
    surface from its regexp_count twin and the DuckDB oracles.)"""
    return F.regexp_extract_all(col, F.lit(r"\S+"), 0)


def whitespace_token_count(col: Column) -> Column:
    """Count of whitespace tokens == count of maximal non-space runs —
    a single JVM-side regexp_count, no array materialization (equal to
    ``size(whitespace_tokens(col))`` for every input, empty included)."""
    return F.regexp_count(col, F.lit(r"\S+"))


def bpe_ish_token_count(col: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex (counts matches,
    JVM-side via regexp_count)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE))


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios)

EN_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "that", "it", "for")


def punct_ratio(col: Column) -> Column:
    """Fraction of non-space characters that are punctuation — i.e. not
    a LETTER or DIGIT in any script (``\\p{L}\\p{N}``, RE2-safe in both
    engines). An ASCII-only kept class scored every Hebrew/accented
    character as punctuation, rating the very corpus this pipeline
    processes as maximally punctuation-laden."""
    non_space = F.length(F.regexp_replace(col, r"\s", ""))
    punct = F.length(F.regexp_replace(col, r"[\p{L}\p{N}\s]", ""))
    return F.round(F.coalesce(F.try_divide(punct, non_space), F.lit(0.0)), 6)


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of whitespace tokens that are (lowercased) stopwords.

    Counted with one JVM regex — a stopword bounded by string edge or
    whitespace on both sides is exactly a whitespace token (Java regex
    supports the lookaround; the DuckDB oracle keeps its equivalent
    ``list_filter`` formulation — same values, different mechanism).
    The interpreted per-token ``filter(isin)`` form measured ~3× slower.
    """
    pat = (
        r"(?:(?<=\s)|^)(?:"
        + "|".join(_re.escape(w) for w in stopwords)
        + r")(?=\s|$)"
    )
    hits = F.regexp_count(F.lower(col), F.lit(pat))
    return F.round(
        F.coalesce(F.try_divide(hits, whitespace_token_count(col)), F.lit(0.0)), 6
    )


def mean_token_len(col: Column) -> Column:
    """Mean whitespace-token length. Σ token lengths == count of
    non-whitespace characters, so this is two JVM-side string ops — no
    token array."""
    total = F.length(F.regexp_replace(col, r"\s", ""))
    return F.round(
        F.coalesce(F.try_divide(total, whitespace_token_count(col)), F.lit(0.0)), 6
    )


# ---------------------------------------------------------------------------
# Language identification (n-gram / marker-word heuristic)

#: Marker vocabularies per language. Deliberately small and disjoint where
#: possible; zh is detected by CJK codepoints instead of words.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "les", "des", "est", "une", "dans", "que"),
    "es": ("el", "los", "las", "es", "una", "por", "que"),
}
CJK_CLASS = "[\\u4e00-\\u9fff]"


def lang_score(col: Column, lang: str) -> Column:
    """Marker-hit count for one language (zh = CJK char count)."""
    if lang == "zh":
        return F.length(col) - F.length(F.regexp_replace(col, CJK_CLASS, ""))
    markers = "|".join(LANG_MARKERS[lang])
    return F.regexp_count(F.lower(col), F.lit(f"\\b({markers})\\b"))


def predict_lang(col: Column) -> Column:
    """Argmax over language scores with a fixed tie-break order
    (en > de > fr > es > zh); 'und' (undetermined) when all scores are 0."""
    order = ("en", "de", "fr", "es", "zh")
    scores = {lang: lang_score(col, lang) for lang in order}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(order):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# Document fingerprinting (rolling polynomial hash)

# aliases of the single hash convention (functions/hashing.py)
FP_MOD = HASH_MOD
FP_BASE = HASH_BASE


def doc_fingerprint(col: Column) -> Column:
    """Order-sensitive rolling hash over whitespace tokens:
    ``h = (h*31 + token_hash(token)) mod (2^31-1)`` — the shared
    polynomial (functions/hashing.py) lifted from codepoints to the
    token sequence. Pure bigint arithmetic → identical in any engine;
    collision rate ~n²/2³¹."""
    return F.aggregate(
        whitespace_tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * HASH_BASE + token_hash(t)) % HASH_MOD,
    )


# ---------------------------------------------------------------------------
# Feature-hashing linear classifier (model-based quality filtering)

def classifier_weights(n_buckets: int = 1024, seed: int = 42) -> list[float]:
    """Deterministic per-bucket weights in [-0.5, 0.5), 6 dp — the same
    LCG family as the SRP hyperplanes, so any engine re-running the
    integer recurrence builds the identical vector. A REAL deployment
    loads trained weights here (a fasttext/logistic quality classifier
    exports exactly this: a hashed-feature weight table); everything
    downstream — broadcast, lookup, scoring plan — is unchanged."""
    weights = []
    for i in range(n_buckets):
        state = (seed + i * 1_000_003) % FP_MOD
        state = (state * 1_103_515_245 + 12_345) % FP_MOD
        # % 1_000_000 (matching the divisor) keeps the documented
        # half-open [-0.5, 0.5): % 1_000_001 could land exactly on +0.5
        weights.append(round((state % 1_000_000) / 1_000_000 - 0.5, 6))
    return weights


def hashed_weight_sum(col: Column, weights: list[float]) -> Column:
    """Σ over tokens of the hashed-feature weight ``w[h(t) mod D]`` —
    the linear classifier's raw accumulator. One fold over the token
    array, weight table as a broadcast-literal array — map-only, no
    shuffle, JVM-side. The fold visits tokens in array order, so any
    engine replaying the same order produces the identical double.
    Downstream consumers should move to integer micro-units
    (``floor(sum*1e6 + 0.5)`` — the weights are 6 dp decimals, so the
    product sits within float noise of an integer) BEFORE any division:
    a 6 dp-weight sum divided by a token count lands on exact 7-digit
    decimal ties, where Spark's BigDecimal rounding and a float-math
    ``round()`` legitimately split."""
    d = len(weights)
    warr = F.lit(weights)

    toks = whitespace_tokens(col)
    return F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(warr, (token_hash(t) % d + 1).cast("int")),
    )


# ---------------------------------------------------------------------------
# Shingling (shared by the dedup operators)

def word_ngrams(tokens: Column, n: int = 3) -> Column:
    """Contiguous word n-grams from an array<string> column, via an
    indexed transform over ``sequence`` — no explode, no UDF. Documents
    shorter than n yield a single joined shingle.

    n=1 short-circuits to the token array itself: the generic
    slice-and-join path is interpreted per element (higher-order
    functions sit outside codegen) and measures ~7× slower than the
    identity it would compute.
    """
    if n == 1:
        return tokens
    joined = F.array_join(tokens, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
    )
    return F.when(F.size(tokens) < n, F.array(joined)).otherwise(grams)


# ---------------------------------------------------------------------------
# Context-window chunking (U-surface: Python UDTF)

def make_chunker_udtf(chunk_tokens: int = 10):
    """Build the document-chunker UDTF: each (doc_id, text) row expands
    into fixed ``chunk_tokens``-token training-window chunks — the
    standard context-window preparation step for LLM corpora, and the
    engine's demonstration of Spark's Python UDTF surface (SURVEY.md
    §2.9). Arrow-optimized; one output row per chunk with its index and
    actual length (the tail chunk may be short). Whitespace-only or
    empty docs yield no rows. Not for hot paths where a built-in HOF can
    express the same (see word_ngrams) — this exists for the cases that
    genuinely need imperative row-to-rows logic."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, chunk_idx int, chunk string, n_tokens int",
        useArrow=True,
    )
    class ChunkDocuments:
        def eval(self, doc_id: int, text: str):  # noqa: D102
            import re

            # ASCII-whitespace tokenization, NOT str.split(): the SQL
            # twin (and every other tokenizer in this engine) splits on
            # regex \s+, which is ASCII-only — str.split() would also
            # eat   etc. and silently diverge from the oracle on
            # text containing Unicode whitespace
            stripped = re.sub(r"^[ \t\n\r\f\v]+|[ \t\n\r\f\v]+$", "", text or "")
            toks = re.split(r"[ \t\n\r\f\v]+", stripped) if stripped else []
            for i in range(0, len(toks), chunk_tokens):
                part = toks[i : i + chunk_tokens]
                yield doc_id, i // chunk_tokens, " ".join(part), len(part)

    return ChunkDocuments


# ---------------------------------------------------------------------------
# PII scrubbing

#: Redaction patterns, applied IN ORDER (URLs before emails so an email
#: inside a URL path is consumed by the URL rule; phones last). RE2-safe
#: basics only, so the DuckDB oracle runs the identical expressions.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("url", r"https?://[^\s]+"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{4}"),
)


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (counted BEFORE any redaction)."""
    pat = dict(PII_PATTERNS)[kind]
    return F.regexp_count(col, F.lit(pat))


def redact_pii(col: Column) -> Column:
    """Replace each PII match with its <KIND> placeholder, in pattern
    order. One fused chain of JVM regexp_replace calls — the 100 TB
    scrub pass stays map-only inside whole-stage codegen."""
    out = col
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filtering)

def top_ngram_fraction(grams: Column) -> Column:
    """Fraction of n-gram instances taken by the single most frequent
    n-gram (Rae et al. 2021's "fraction of characters in most common
    n-gram", in instance rather than char units so the SQL twin stays
    exact integer arithmetic). Per-row O(k²) higher-order functions —
    no shuffle; k is tokens-per-doc, not corpus size, so the 100 TB
    pass stays map-only.

    ``grams`` MUST be a materialized column (``withColumn`` first, the
    winnowing lesson): interpreted HOF lambdas re-evaluate referenced
    EXPRESSIONS per element, so passing ``word_ngrams(...)`` directly
    re-builds every n-gram once per distinct gram — measured 30× slower
    over the documents table at sf0.1."""
    counts = F.transform(
        F.array_distinct(grams),
        lambda g: F.size(F.filter(grams, lambda x: x == g)),
    )
    return F.when(F.size(grams) <= 0, F.lit(0.0)).otherwise(
        F.round(F.array_max(counts) / F.size(grams), 6)
    )


def duplicate_ngram_fraction(grams: Column) -> Column:
    """Fraction of n-gram instances whose n-gram occurs more than once
    in the document (Gopher's duplicate-n-gram fraction family). Same
    materialized-column contract as :func:`top_ngram_fraction`."""
    counts = F.transform(
        F.array_distinct(grams),
        lambda g: F.size(F.filter(grams, lambda x: x == g)),
    )
    dup_instances = F.aggregate(
        F.filter(counts, lambda c: c > 1),
        F.lit(0),
        lambda acc, c: acc + c,
    )
    return F.when(F.size(grams) <= 0, F.lit(0.0)).otherwise(
        F.round(dup_instances / F.size(grams), 6)
    )
