"""Alignment operators — the engine's flagship domain (SURVEY.md §2.5, §2.3 J5/J6).

Three layers, mirroring the reference lineages:

- ``allocate_proportional`` (W2): the estimation-only path that produced
  the reference's sole 929/929 run — verse start/end = cumulative
  word-density share of the total duration
  (`hebrew_alignment_optimized.py:494-554`). Pure window functions.
- ``spread_uniform`` (W3): word j of n inside a verse gets
  ``start + j·(dur/n)`` (`scripts/hebrew_alignment_tool_gpu.py:487-496`).
  Pure posexplode arithmetic.
- ``fuzzy_cursor_align`` (J5/W5/U6): the sequential fuzzy merge of
  reference words against transcript words with a bounded look-ahead
  window (`fixed_hebrew_aligner.py:485-557`). Inherently order-stateful
  within a group, so it runs as ``applyInPandas`` per (book, chapter) —
  groups are tiny (≤ ~90 verses), while the operator scales across
  millions of groups.

Scale: all three shuffle once on the group key; no driver-side state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


#: Nudge added before 2-dp rounding: weight shares routinely produce values
#: mathematically ON the .005 boundary, where double error (≪1e-7) would
#: otherwise make round() engine-dependent. 1e-7 ≫ fp error and ≪ the grid.
ROUND_EPS = 1e-7


def allocate_proportional(
    df: DataFrame,
    group_cols: list[str],
    order_col: str | list[str],
    weight_col: str,
    total_col: str,
    start_name: str = "start",
    end_name: str = "end",
    min_unit: float | None = None,
) -> DataFrame:
    """W2: allocate each group's total across its rows ∝ weight.

    ``dur_i = max(min_unit, (w_i / Σw) × total)``; ``start_i`` is the
    running sum of prior durations (window ``rowsBetween(unboundedPreceding,
    -1)``). Reference invariant "min 1 s per verse"
    (`hebrew_alignment_optimized.py:514`) maps to ``min_unit``.
    ``order_col`` accepts a list — include tiebreak columns whenever the
    primary order key can repeat within a group (a tied running sum is
    otherwise nondeterministic).
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    # The group total doesn't need an ordering, but giving it the SAME
    # (partition, order) spec as the running-sum window — with an
    # unbounded frame, so the result is still the whole-group sum — lets
    # the planner satisfy both windows with ONE sort instead of sorting
    # the group twice (once keys-only, once keys+order).
    g = (
        Window.partitionBy(*group_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_sum = F.sum(F.col(weight_col)).over(g)
    dur = F.col(weight_col) / w_sum * F.col(total_col)
    if min_unit is not None:
        dur = F.greatest(F.lit(float(min_unit)), dur)
    run = (
        Window.partitionBy(*group_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_incl = (
        Window.partitionBy(*group_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_dur = df.withColumn("_dur", dur)
    # end derives from the INCLUSIVE running sum — the same expression
    # the next row rounds as its start, so end_i == start_{i+1} exactly.
    # Rounding the already-rounded start plus the raw duration instead
    # broke contiguity by ±0.01 whenever the cumulative sum and the
    # duration round in different directions off the 2-dp grid.
    return (
        with_dur.withColumn(
            start_name,
            F.round(F.coalesce(F.sum("_dur").over(run), F.lit(0.0)) + ROUND_EPS, 2),
        )
        .withColumn(end_name, F.round(F.sum("_dur").over(run_incl) + ROUND_EPS, 2))
        .drop("_dur")
    )


def spread_uniform(
    df: DataFrame,
    words_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """W3: explode an array column, spreading [start, end] uniformly over
    the elements. Output adds (word_pos 1-indexed, word, word_start,
    word_end) — timestamps rounded to 2 dp like every reference writer
    (`scripts/hebrew_alignment_tool_gpu.py:493-495`). Uniform splits of
    2-dp bounds land exactly on .005 boundaries constantly (e.g.
    6.09/2), so the ROUND_EPS nudge applies here too."""
    n = F.size(F.col(words_col))
    step = (F.col(end_col) - F.col(start_col)) / n
    return df.select(
        "*",
        F.posexplode(F.col(words_col)).alias("_pos", "word"),
    ).select(
        *df.columns,
        (F.col("_pos") + 1).alias("word_pos"),
        F.col("word"),
        F.round(F.col(start_col) + F.col("_pos") * step + ROUND_EPS, 2).alias(
            "word_start"
        ),
        F.round(F.col(start_col) + (F.col("_pos") + 1) * step + ROUND_EPS, 2).alias(
            "word_end"
        ),
    )


def estimate_verse_alignment(
    verses: DataFrame,
    durations: DataFrame,
    book_col: str = "book",
    chapter_col: str = "chapter",
    verse_col: str = "verse_num",
    word_count_col: str = "word_count",
    duration_col: str = "total_duration",
    confidence: float = 0.1,
) -> DataFrame:
    """The shipped estimation-only pipeline as one declarative plan:
    verses ⋈ per-chapter durations (broadcast when small) → W2 allocation
    by word density → estimated-confidence convention 0.1
    (`scripts/hebrew_alignment_clean_fixed.py`, SURVEY.md §7.6)."""
    joined = verses.join(durations, [book_col, chapter_col])
    return allocate_proportional(
        joined,
        [book_col, chapter_col],
        verse_col,
        word_count_col,
        duration_col,
    ).withColumn("confidence", F.lit(confidence))


# ---------------------------------------------------------------------------
# J5: sequential fuzzy cursor alignment (applyInPandas)

CURSOR_ALIGN_SCHEMA = StructType(
    [
        StructField("group_key", StringType(), False),
        StructField("ref_idx", LongType(), False),
        StructField("ref_word", StringType(), False),
        StructField("matched_idx", LongType(), True),
        StructField("matched_word", StringType(), True),
        StructField("start", DoubleType(), True),
        StructField("end", DoubleType(), True),
        StructField("similarity", DoubleType(), False),
        StructField("matched", IntegerType(), False),
    ]
)


def _ratio(a: str, b: str) -> float:
    """difflib-free similarity: normalized Levenshtein ratio, the same
    formula as functions.similarity.levenshtein_ratio (so the pandas path
    and the SQL path agree)."""
    if not a and not b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return 1.0 - prev[lb] / max(la, lb)


def _align_group(
    ref: list[str],
    trans: list[tuple[str, float, float]],
    window: int,
    threshold: float,
) -> Iterable[tuple]:
    """The reference's cursor loop (`fixed_hebrew_aligner.py:488-531`):
    walk reference words in order; for each, scan the next ``window``
    unconsumed transcript words; accept the best scoring ≥ threshold and
    advance the cursor past it; otherwise leave the word unmatched."""
    cursor = 0
    for ri, rw in enumerate(ref):
        best_j, best_sim = -1, 0.0
        for j in range(cursor, min(cursor + window, len(trans))):
            sim = _ratio(rw, trans[j][0])
            if sim > best_sim:
                best_j, best_sim = j, sim
        if best_j >= 0 and best_sim >= threshold:
            tw = trans[best_j]
            yield (ri, rw, best_j, tw[0], tw[1], tw[2], round(best_sim, 6), 1)
            cursor = best_j + 1
        else:
            yield (ri, rw, None, None, None, None, round(best_sim, 6), 0)


def fuzzy_cursor_align(
    ref_words: DataFrame,
    trans_words: DataFrame,
    group_col: str,
    ref_order_col: str,
    ref_word_col: str,
    trans_order_col: str,
    trans_word_col: str,
    trans_start_col: str,
    trans_end_col: str,
    window: int = 5,
    threshold: float = 0.6,
) -> DataFrame:
    """J5 as a grouped-map pandas UDF: one group = one chapter's ordered
    word lists; state (the cursor) lives inside the group, the operator
    shuffles once on the group key and scales across groups.

    INDEX CONTRACT: ``ref_idx``/``matched_idx`` are 0-based POSITIONS
    within each group's sorted word lists — ``ref_order_col`` /
    ``trans_order_col`` define the sort only, their VALUES are not
    echoed. A caller joining ``ref_idx`` back to its order column must
    therefore construct that column 0-based and contiguous per group
    (as aligned_verse_rollup's row_number()-1 token_idx does); a 1-based
    or gapped order key would silently join every row to the wrong word."""
    ref = ref_words.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(ref_order_col).cast("long").alias("_ord"),
        F.col(ref_word_col).alias("_w"),
        F.lit("r").alias("_side"),
        F.lit(None).cast("double").alias("_s"),
        F.lit(None).cast("double").alias("_e"),
    )
    trans = trans_words.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(trans_order_col).cast("long").alias("_ord"),
        F.col(trans_word_col).alias("_w"),
        F.lit("t").alias("_side"),
        F.col(trans_start_col).cast("double").alias("_s"),
        F.col(trans_end_col).cast("double").alias("_e"),
    )
    both = ref.unionByName(trans)

    def align(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["group_key"].iloc[0]
        r = pdf[pdf["_side"] == "r"].sort_values("_ord")
        t = pdf[pdf["_side"] == "t"].sort_values("_ord")
        rows = list(
            _align_group(
                list(r["_w"]),
                list(zip(t["_w"], t["_s"], t["_e"])),
                window,
                threshold,
            )
        )
        return pd.DataFrame(
            [
                {
                    "group_key": key,
                    "ref_idx": ri,
                    "ref_word": rw,
                    "matched_idx": mj,
                    "matched_word": mw,
                    "start": s,
                    "end": e,
                    "similarity": sim,
                    "matched": m,
                }
                for (ri, rw, mj, mw, s, e, sim, m) in rows
            ],
            columns=[f.name for f in CURSOR_ALIGN_SCHEMA.fields],
        )

    return both.groupBy("group_key").applyInPandas(align, CURSOR_ALIGN_SCHEMA)


def validate_total_duration(
    df: DataFrame,
    group_cols: list[str],
    end_col: str,
    duration_col: str,
    factor: float = 1.1,
    out_col: str = "total_duration",
) -> DataFrame:
    """The reference's output-validation invariant
    (`hebrew_alignment_tool.py:405-415` `_validate_output`): a group's
    aligned total duration (max end) must not exceed the audio duration
    × ``factor`` (1.1). Adds ``out_col`` and boolean ``valid`` via one
    unbounded window — when ``df`` arrives already partitioned by the
    group key (the usual case, straight out of a grouped aggregate) no
    extra shuffle is introduced.

    ``valid`` compares the window expression itself (never the added
    column), and overwriting the audio-duration column is rejected —
    composing with estimate_verse_alignment (whose default duration
    column is also named ``total_duration``) used to silently replace
    the audio duration and make the check vacuously true."""
    if out_col == duration_col:
        raise ValueError(
            f"out_col ({out_col!r}) would overwrite duration_col before the "
            "comparison — pass a different out_col"
        )
    w = Window.partitionBy(*group_cols)
    observed = F.max(F.col(end_col)).over(w)
    return df.withColumn(out_col, observed).withColumn(
        "valid",
        observed <= F.col(duration_col) * F.lit(float(factor)),
    )
