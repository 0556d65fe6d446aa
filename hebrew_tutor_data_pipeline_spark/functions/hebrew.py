"""Hebrew/Unicode scalar expression library (SURVEY.md §2.8 F1–F5, F16–F17).

The reference normalizes Hebrew text before fuzzy comparison
(`fixed_hebrew_aligner.py:559-574`) and counts Hebrew characters to
detect encoding corruption (`scripts/hebrew_alignment_encoding_fixed.py:205-220`).
All of it is pure column expressions — JVM-side, codegen-friendly — except
NFC normalization, which Java regex cannot express and stays a pandas UDF.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType

# Unicode ranges (literal \u classes — SURVEY.md §7.4)
NIKKUD_CLASS = "[֑-ׇ]"          # cantillation + vowel points
HEBREW_LETTER_CLASS = "[א-ת]"   # alef..tav
HEBREW_BLOCK_CLASS = "[֐-׿]"    # full Hebrew block


def strip_nikkud(col: Column) -> Column:
    """F1: remove diacritics U+0591–U+05C7 (`fixed_hebrew_aligner.py:565`)."""
    return F.regexp_replace(col, NIKKUD_CLASS, "")


def hebrew_letters_only(col: Column) -> Column:
    """F2: whitelist U+05D0–U+05EA + whitespace (`fixed_hebrew_aligner.py:569`)
    — composed from HEBREW_LETTER_CLASS so the letter range lives once."""
    return F.regexp_replace(col, f"[^{HEBREW_LETTER_CLASS[1:-1]}\\s]", "")


def normalize_whitespace(col: Column) -> Column:
    """F3: ``' '.join(s.split()).strip()`` (`fixed_hebrew_aligner.py:572`)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def normalize_hebrew(col: Column) -> Column:
    """Full normalization chain used before similarity scoring."""
    return normalize_whitespace(hebrew_letters_only(strip_nikkud(col)))


def hebrew_char_count(col: Column) -> Column:
    """F5: count of chars in the Hebrew block
    (`scripts/hebrew_alignment_transcription_fixed.py:596`)."""
    return F.length(col) - F.length(F.regexp_replace(col, HEBREW_BLOCK_CLASS, ""))


def char_class_map(col: Column, cls: str) -> Column:
    """F17: per-character 0/1 membership map
    (`scripts/convert_hebrew_grammar_pdf.py:123-124`). Higher-order array
    function — no UDF."""
    return F.transform(
        F.split(col, ""),
        lambda c: F.when(c.rlike(cls), F.lit(1)).otherwise(F.lit(0)),
    )


@F.pandas_udf(StringType())
def nfc_normalize(s: pd.Series) -> pd.Series:
    """F16: Unicode NFC normalization (`scripts/convert_hebrew_grammar_pdf.py:120-145`).
    No Spark built-in exists; Arrow-batched pandas UDF, not per-row."""
    return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)


@F.pandas_udf(BooleanType())
def is_nfc_normalized(s: pd.Series) -> pd.Series:
    return s.map(lambda x: unicodedata.is_normalized("NFC", x) if x is not None else None)


def has_replacement_char(col: Column) -> Column:
    """U+FFFD corruption probe (`scripts/convert_hebrew_grammar_pdf.py:139`)."""
    return col.contains("�")
