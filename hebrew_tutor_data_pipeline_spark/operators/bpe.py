"""BPE-style merge-round vocabulary induction over a tokenized corpus.

The tokenizer-training step of a data pipeline: repeatedly find the
most frequent adjacent token pair corpus-wide and fuse it into a new
vocabulary symbol (Sennrich/Haddow/Birch, "Neural Machine Translation
of Rare Words with Subword Units", ACL 2016 — the byte-pair-encoding
merge loop; applied at word level it is phrase/collocation induction in
the spirit of Mikolov et al. 2013's word2phrase). Alongside k-means
codebook training this is the engine's second iterative algorithm:
bounded model state on the driver (one merge pair per round), all
counting distributed.

Reference counterpart: none — the reference never trains a vocabulary;
this is part of the training-data surface built beyond it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens


def _adjacent_pairs(tokens: Column) -> Column:
    """Array of 'left right' strings for each adjacent token pair.
    Guarded: Spark's sequence(1, 0) is DESCENDING [1, 0], so short
    arrays must short-circuit to [] explicitly."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - 1),
        lambda i: F.concat(
            F.element_at(tokens, i), F.lit(" "), F.element_at(tokens, i + 1)
        ),
    )
    return F.when(F.size(tokens) >= 2, grams).otherwise(
        F.array().cast("array<string>")
    )


def merge_pair_fold(tokens: Column, left: str, right: str, joiner: str = "+") -> Column:
    """Greedy leftmost non-overlapping fuse of the (left, right) token
    pair inside an array<string> — the BPE apply step — as ONE
    ``F.aggregate`` fold with a string accumulator (tokens never contain
    spaces, so the space-joined accumulator is unambiguous; a token
    fused in an earlier round carries the joiner, which is not a space,
    so full-token suffix tests stay exact). Greedy-leftmost falls out of
    the fold order, and a fused token never re-fuses with the next
    element unless it literally equals ``left`` — classic BPE semantics.
    """
    merged = left + joiner + right
    empty = F.array().cast("array<string>")
    folded = F.aggregate(
        tokens,
        F.lit(""),
        lambda acc, x: F.when(
            (x == F.lit(right))
            & ((acc == F.lit(left)) | acc.endswith(F.lit(" " + left))),
            F.concat(
                acc.substr(F.lit(1), F.length(acc) - len(left)), F.lit(merged)
            ),
        )
        .when(acc == F.lit(""), x)
        .otherwise(F.concat(acc, F.lit(" "), x)),
    )
    # split('', ' ') = [''] — an EMPTY token array must stay empty, or a
    # zero-token doc reports n_tokens_bpe=1 / n_fused=-1 downstream
    return F.when(F.size(tokens) == 0, empty).otherwise(F.split(folded, " "))


def bpe_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rounds: int = 3,
    joiner: str = "+",
) -> DataFrame:
    """Learn ``rounds`` merge operations; returns one row per round:
    ``(round, left, right, pair_count)`` — the merge table a tokenizer
    ships. Ties break (count DESC, left ASC, right ASC), so the learned
    table is deterministic across partitionings and engines.

    Plan shape / 100 TB posture: each round is ONE corpus-wide pair
    count — explode of adjacent pairs into a map-side-combined groupBy —
    cut to the top pair by TakeOrderedAndProject; the winning pair (a
    2-string model artifact, like the k-means centroids) drives the next
    round's re-tokenization map stage. The corpus is never shuffled; the
    driver holds ``rounds`` pairs. The re-tokenization lineage grows one
    map stage per round — for large ``rounds`` checkpoint every ~10. At
    100 TB vocabulary induction runs on a corpus SAMPLE (pass a sampled
    DataFrame in — the same move as k-means codebook training); applying
    the learned merges to the full corpus is a pure map pass.
    """
    t = df.select(
        F.col(id_col).alias("id"), whitespace_tokens(F.col(text_col)).alias("t")
    )
    spark = df.sparkSession
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        top = (
            t.select(F.explode(_adjacent_pairs(F.col("t"))).alias("pg"))
            .groupBy("pg")
            .agg(F.count("*").alias("c"))
            .select(
                F.split_part(F.col("pg"), F.lit(" "), F.lit(1)).alias("l"),
                F.split_part(F.col("pg"), F.lit(" "), F.lit(2)).alias("r"),
                "c",
            )
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rnd, l, r, c))
        t = t.withColumn("t", merge_pair_fold(F.col("t"), l, r, joiner))
    return spark.createDataFrame(
        merges, "round int, left string, right string, pair_count long"
    )


def apply_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    joiner: str = "+",
) -> DataFrame:
    """ENCODE a corpus with a learned merge table — the other half of
    the tokenizer surface: training runs on a sample (``bpe_merges``),
    encoding runs corpus-wide as a PURE MAP PASS (one ``merge_pair_fold``
    stage per merge, no shuffle anywhere, the 100 TB tokenization shape).
    ``merges`` is the ordered [(left, right), ...] table; returns
    ``(id, tokens, n_tokens_raw, n_tokens_bpe, n_fused)`` per document.
    """
    t = df.select(
        F.col(id_col).alias("id"), whitespace_tokens(F.col(text_col)).alias("t")
    ).withColumn("n_tokens_raw", F.size("t"))
    for left, right in merges:
        t = t.withColumn("t", merge_pair_fold(F.col("t"), left, right, joiner))
    return t.select(
        "id",
        F.col("t").alias("tokens"),
        "n_tokens_raw",
        F.size("t").alias("n_tokens_bpe"),
        (F.col("n_tokens_raw") - F.size("t")).alias("n_fused"),
    )
