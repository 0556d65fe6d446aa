"""Deterministic sampling and split assignment for training-data curation.

A 100 TB corpus cannot use RNG-state sampling (``df.sample`` /
``sampleBy``): results change across retries, partition counts, and
engine versions, and a task retry silently double- or under-samples its
partition. The industry-standard fix is content-addressed sampling —
bucket every row by a salted hash of its stable id and keep a fixed
bucket range. That makes train/valid/test assignment and per-stratum
downsampling pure map-side column arithmetic: zero shuffle, zero driver
state, reproducible row-for-row on any engine (the DuckDB oracles replay
the same polynomial hash).

Reference counterpart: the reference processes fixed chapter lists
(hebrew_alignment_tool.py:417-464) and never samples; at corpus scale,
split assignment and data mixing are where a training pipeline starts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import token_hash

#: bucket space for all rate arithmetic — rates are exact per-mille.
N_BUCKETS = 1000


def hash_bucket(id_col: Column, salt: str) -> Column:
    """Salted deterministic bucket in [0, N_BUCKETS) from a stable id.

    Different salts give independent bucketings, so split assignment and
    sampling decisions don't correlate (a doc's split never predicts
    whether it survives downsampling).
    """
    return token_hash(F.concat(F.lit(salt + "|"), id_col.cast("string"))) % N_BUCKETS


def assign_split(
    id_col: Column,
    ratios: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("valid", 0.1),
        ("test", 0.1),
    ),
    salt: str = "split",
) -> Column:
    """Map a stable id to a named split with the given ratios.

    Ratios must sum to 1 and resolve to whole buckets; assignment is a
    per-row CASE over the salted bucket — no shuffle, no RNG.
    """
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name, ratio in ratios:
        acc += ratio
        bounds.append((name, round(acc * N_BUCKETS)))
    if bounds[-1][1] != N_BUCKETS:
        raise ValueError(f"ratios must sum to 1, got cumulative {bounds[-1][1]}")
    b = hash_bucket(id_col, salt)
    expr = F.lit(bounds[-1][0])
    for name, upper in reversed(bounds[:-1]):
        expr = F.when(b < upper, F.lit(name)).otherwise(expr)
    return expr


def stratified_sample_flag(
    id_col: Column,
    strata_col: Column,
    rates: dict[str, float],
    default_rate: float,
    salt: str = "sample",
) -> Column:
    """True iff the row survives per-stratum downsampling at the given
    keep rates (per-mille precision). Deterministic: the same id keeps
    the same fate across runs, partitionings, and engines."""
    thresholds = [(k, round(v * N_BUCKETS)) for k, v in rates.items()]
    m = F.create_map(
        *[F.lit(x) for kv in thresholds for x in kv]  # k1, v1, k2, v2, ...
    )
    threshold = F.coalesce(
        m[strata_col.cast("string")], F.lit(round(default_rate * N_BUCKETS))
    )
    return hash_bucket(id_col, salt) < threshold


def split_and_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
) -> DataFrame:
    """Convenience: annotate df with split assignment and sample flag."""
    return df.withColumn("split", assign_split(F.col(id_col))).withColumn(
        "sampled",
        stratified_sample_flag(F.col(id_col), F.col(strata_col), rates, default_rate),
    )


def pack_plan(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    partition_cols: list[str],
    budget: int,
) -> DataFrame:
    """Concat-and-chunk sequence-packing plan: documents inside each
    partition are laid end-to-end in deterministic (salted-hash, id)
    order; every ``budget`` tokens starts a new pack. Returns per doc
    its start offset in the stream, the pack holding that start, and
    whether the doc straddles a pack boundary.

    This is the GPT-style training-prep step after curation: the output
    is a PLAN (offsets), so the expensive byte movement can be executed
    by any writer. One window shuffle on the partition columns; the
    deterministic order key means re-runs and task retries produce the
    identical layout (same property as hash_bucket sampling).
    """
    order_key = token_hash(
        F.concat(F.lit("pack|"), F.col(id_col).cast("string"))
    )
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_key.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(n_tokens_col)).over(w) - F.col(n_tokens_col)).alias(
        "start_offset"
    )
    out = df.select(
        *partition_cols,
        F.col(id_col),
        F.col(n_tokens_col),
        start,
    )
    return out.select(
        "*",
        F.floor(F.col("start_offset") / budget).alias("pack_id"),
        (
            F.floor(F.col("start_offset") / budget)
            != F.floor((F.col("start_offset") + F.col(n_tokens_col) - 1) / budget)
        ).alias("straddles_boundary"),
    )


def mixture_plan(
    df: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    salt: str = "mix",
    resolution: int = 1_000_000,
    allow_upsample: bool = False,
) -> DataFrame:
    """Temperature-weighted source-mixture resampling plan: compute the
    per-source acceptance rates that reshape the corpus toward
    ``weight_s ∝ n_s^alpha`` (alpha < 1 upweights small sources — the
    temperature-sampling rule of multilingual/multi-source pre-training:
    Arivazhagan et al. 2019 §4.2; The Pile and Gopher use the same
    fixed-weight mixture shape), then apply them with the engine's
    salted-hash acceptance test — deterministic under retries and
    repartitioning, unlike RNG sampling.

    Returns one row per source: ``(group, n_docs, weight, rate_ppm,
    n_accepted)`` where ``rate_ppm = round(min(1, weight·target_total /
    n_s)·resolution)`` and ``n_accepted`` counts the docs whose salted
    hash lands under it — the audit record a training run stores next
    to the actual filtered corpus.

    ``allow_upsample=True`` removes the 1.0 rate cap: a source whose
    temperature weight exceeds its share is OVER-sampled (the other half
    of the published temperature-mixing rule — small sources repeat).
    Each doc then contributes ``floor(rate) + [hash < frac(rate)]``
    copies, all in integer ppm arithmetic, so the expected-copies count
    stays deterministic and engine-exact; ``n_accepted`` becomes the
    total copy count.

    Plan shape / 100 TB posture: pass 1 is one map-side-combined
    groupBy on the source; the normalizer is a 1-row broadcast
    crossJoin; the rate table (|sources| rows) broadcasts back onto the
    corpus for the acceptance pass — the corpus itself is never
    shuffled, only its per-source counts are. No RNG, no collect.
    """
    # `counts` feeds both the normalizer and the rate table, and `rates`
    # below is consumed twice (broadcast onto the corpus + the audit
    # join) — deliberately NOT persisted (adjudicated r13/r14): for the
    # standalone mixture entries both references live in ONE action and
    # AQE exchange reuse dedupes the groupBy shuffle at runtime, while a
    # persist boundary measured strictly worse (11 → 15 jobs, wall
    # flat). The one consumer where cached inputs below this subtree
    # defeated exchange reuse (curation_refresh_e2e) computes its
    # mixture inline over an eagerly pinned ≤|sources|-row frame
    # instead (plans/catalog_ml.py, r14) — the persist question is
    # settled per consumer, not here.
    counts = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count("*").alias("n_docs")
    )
    tot = counts.agg(
        F.sum(F.pow(F.col("n_docs"), F.lit(alpha))).alias("z"),
        F.sum("n_docs").alias("n"),
    )
    w = F.pow(F.col("n_docs"), F.lit(alpha)) / F.col("z")
    raw_rate = w * (F.lit(target_frac) * F.col("n")) / F.col("n_docs")
    if not allow_upsample:
        raw_rate = F.least(F.lit(1.0), raw_rate)
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "group",
        "n_docs",
        F.round(w, 6).alias("weight"),
        # half-away ROUND, not floor: a mathematically-exact rate (e.g.
        # uniform sources at target 1.0 -> rate 1.0) sits ON the floor
        # boundary, where a 1-ulp cross-engine difference in the z sum
        # flips the ppm; the .5-ppm round boundary is unreachable
        F.round(raw_rate * resolution, 0).cast("long").alias("rate_ppm"),
    )
    accept_hash = token_hash(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))
    ) % resolution
    # null-safe joins throughout: groupBy keeps a NULL source as a real
    # group, so the acceptance pass must too — a plain equi-join dropped
    # NULL-group docs and the plan row then claimed a positive rate with
    # n_accepted=0, an internally inconsistent audit record
    tagged = df.select(F.col(group_col).alias("group"), accept_hash.alias("_ah")).join(
        F.broadcast(rates.select(F.col("group").alias("_rg"), "rate_ppm")),
        F.col("group").eqNullSafe(F.col("_rg")),
    ).drop("_rg")
    if allow_upsample:
        # `div` keeps the whole chain in BIGINT — a double intermediate
        # would silently lose exactness past 2^53 summed copies
        copies = F.expr(f"rate_ppm div {resolution}") + (
            F.col("_ah") < F.col("rate_ppm") % resolution
        ).cast("long")
        accepted = tagged.groupBy("group").agg(
            F.sum(copies).alias("n_accepted")
        )
    else:
        accepted = (
            tagged.filter(F.col("_ah") < F.col("rate_ppm"))
            .groupBy("group")
            .agg(F.count("*").alias("n_accepted"))
        )
    return rates.join(
        accepted.select(F.col("group").alias("_ag"), "n_accepted"),
        F.col("group").eqNullSafe(F.col("_ag")),
        "left",
    ).select(
        "group",
        "n_docs",
        "weight",
        "rate_ppm",
        F.coalesce(F.col("n_accepted"), F.lit(0)).alias("n_accepted"),
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_col: Column,
    buckets: int = 256,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): score every raw
    document by how much more likely its hashed-n-gram bag is under the
    TARGET domain's distribution than under the raw corpus's.

    Features are the paper's hashed n-grams: unigrams + bigrams bucketed
    by the shared polynomial ``token_hash`` into ``buckets`` cells. Both
    bag-of-buckets distributions get add-one smoothing; the per-bucket
    log-ratio ``ln(p_target) - ln(p_raw)`` is quantized to integer 1e-8
    units and a doc's weight is the 6-dp MEAN log-ratio (derived from
    the exact integer sum) over its gram instances
    (the mean, not the paper's sum, so weights are length-neutral and
    the downstream top-k is not a long-document detector).

    Returns ``(id, gram_ct, avg_logratio)`` — one row per input doc.

    Plan shape / 100 TB posture: one explode over grams feeds (a) the
    bucket-count aggregation — map-side combined, the shuffle carries at
    most ``partitions x buckets`` partial rows — and (b) the scoring
    pass, which joins the ≤``buckets``-row log-ratio table back via
    BROADCAST and aggregates once on the doc id. The corpus shuffles
    exactly once (doc-id agg); distributions and totals ride 1-row /
    ≤buckets-row broadcasts. No RNG, no Python, no collect.
    """
    from ..functions.text import whitespace_tokens, word_ngrams

    toks = df.select(
        F.col(id_col).alias("id"),
        target_col.alias("is_t"),
        whitespace_tokens(F.col(text_col)).alias("toks"),
    )
    # STRICT bigrams, not word_ngrams' shorter-than-n branch: that branch
    # emits the whole doc as one joined shingle (right for dedup blocking,
    # where a short doc must still be matchable) — here it would count a
    # 1-token doc's only token TWICE and mint one '' gram for empty text,
    # skewing both DSIR distributions toward short documents. The paper's
    # feature set is unigrams + bigrams, nothing else.
    bigrams = F.when(
        F.size("toks") < 2, F.array().cast("array<string>")
    ).otherwise(word_ngrams(F.col("toks"), 2))
    grams = toks.select(
        "id",
        "is_t",
        F.explode(F.concat(F.col("toks"), bigrams)).alias("gram"),
    ).select("id", "is_t", (token_hash(F.col("gram")) % buckets).alias("b"))
    counts = grams.groupBy("b").agg(
        F.count("*").alias("q_ct"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("p_ct"),
    )
    tot = counts.agg(
        F.sum("q_ct").alias("q_tot"), F.sum("p_ct").alias("p_tot")
    )
    # per-bucket log-ratio as an INTEGER (1e-8 units, floor(x*1e8+0.5) =
    # round-half-up both engines): the per-doc mean then rides an exact
    # BIGINT sum, so float-summation order can't flip the 6-dp weight
    # (round(avg(float8),6) lost a 1-ulp hash at sf0.1)
    ratios = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            (
                F.log((F.col("p_ct") + F.lit(1.0)) / (F.col("p_tot") + buckets))
                - F.log((F.col("q_ct") + F.lit(1.0)) / (F.col("q_tot") + buckets))
            )
            * F.lit(100000000)
            + F.lit(0.5)
        ).alias("lr_e8"),
    )
    # the 6-dp mean is EXACT integer arithmetic, not round(double, 6):
    # group sizes that land the true mean on the x.xxxxxx5 boundary make
    # Spark's BigDecimal HALF_UP and DuckDB's double round() disagree
    # (the avg_after_skip2 class; dsir flipped at sf10 in the r13 value
    # sweep). Signed twist this family adds: log-ratios go NEGATIVE, and
    # Spark's `div` truncates toward zero while DuckDB's `//` floors —
    # so the half-up division runs on the MAGNITUDE (positive operands,
    # where both engines agree) and the sign is re-applied, giving
    # ties-away-from-zero: the same tie rule both engines' round()
    # already used for non-boundary values.
    scored = (
        grams.join(F.broadcast(ratios), "b")
        .groupBy("id")
        .agg(
            F.count("*").alias("gram_ct"),
            F.sum("lr_e8").alias("s_e8"),
        )
        .select(
            "id",
            "gram_ct",
            (
                F.when(F.col("s_e8") < 0, -1).otherwise(1)
                * F.expr("(2 * abs(s_e8) + 100 * gram_ct) div (200 * gram_ct)")
            )
            .cast("double")
            .alias("m_e6"),
        )
        .select(
            "id",
            "gram_ct",
            (F.col("m_e6") / F.lit(1000000.0)).alias("avg_logratio"),
        )
    )
    # restore zero-gram docs (empty/whitespace text emits no gram rows,
    # so the explode path silently dropped them): gram_ct 0, weight NULL
    # — the documented one-row-per-input-doc contract, and downstream
    # reconciliation joins keep every id
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce(F.col("gram_ct"), F.lit(0).cast("long")).alias("gram_ct"),
        "avg_logratio",
    )
