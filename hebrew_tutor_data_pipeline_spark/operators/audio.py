"""Audio analysis operators (SURVEY.md §2.4 A7/A8, §2.5 W1, §2.9 U4).

The reference's trimmer loads a waveform, cuts it into fixed 2-second
segments, computes RMS energy per segment, derives a threshold from the
mean energy of segments 3+, and picks the first segment above threshold
as the intro boundary (`scripts/hebrew_audio_trimmer.py:105-153`).

Spark-first: the waveform is an ``array<float>`` column; segmentation +
RMS is a tumbling-window aggregate — implemented with posexplode +
groupBy so it is the *same plan* batch or streaming (streaming twin in
streaming.windows). Everything after decode is pure SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rms_energy_segments(
    waveforms: DataFrame,
    id_col: str = "path",
    samples_col: str = "samples",
    sample_rate_col: str = "sample_rate",
    segment_seconds: float = 2.0,
) -> DataFrame:
    """A7: tumbling-window RMS — ``sqrt(mean(x²))`` per ``segment_seconds``.

    posexplode(samples) → seg_idx = floor(pos / (seg·sr)) → grouped agg.
    Map-side partial aggregation keeps the shuffle at one row per
    (file, segment), not per sample.
    """
    exploded = waveforms.select(
        F.col(id_col).alias("path"),
        F.col(sample_rate_col).alias("sr"),
        F.posexplode(F.col(samples_col)).alias("pos", "x"),
    ).withColumn(
        "seg_idx",
        (F.col("pos") / (F.lit(segment_seconds) * F.col("sr")).cast("long")).cast(
            "int"
        ),
    )
    return (
        exploded.groupBy("path", "sr", "seg_idx")
        .agg(
            F.sqrt(F.avg(F.col("x") * F.col("x"))).alias("rms_energy"),
            F.count("*").alias("n_samples"),
        )
        .withColumn("start_time", F.col("seg_idx") * F.lit(segment_seconds))
        .withColumn(
            "end_time", F.col("start_time") + F.col("n_samples") / F.col("sr")
        )
        .drop("sr", "n_samples")
    )


def intro_threshold(
    segments: DataFrame,
    skip_segments: int = 2,
    factor: float = 0.3,
) -> DataFrame:
    """A8: per file, threshold = factor × mean(rms of segments skip+).
    The skip excludes the intro itself from its own baseline
    (`scripts/hebrew_audio_trimmer.py:127-130`)."""
    return (
        segments.filter(F.col("seg_idx") >= skip_segments)
        .groupBy("path")
        .agg((F.lit(factor) * F.avg("rms_energy")).alias("threshold"))
    )


def suggest_intro_trim(
    segments: DataFrame,
    skip_segments: int = 2,
    factor: float = 0.3,
    buffer_seconds: float = 0.5,
    min_trim: float = 1.0,
) -> DataFrame:
    """W1+P5: first segment over threshold ⇒ intro end; subtract a
    0.5 s buffer, clamp at 0, and only suggest trims > 1 s
    (`scripts/hebrew_audio_trimmer.py:132-140,464`).

    Files too short to own a baseline (no segments at index ≥
    skip_segments) keep a row with NULL first_loud_start and
    should_trim = false — an inner threshold join silently DROPPED
    them, leaving callers unable to tell 'no trim needed' from 'never
    analyzed'."""
    with_thr = segments.join(
        F.broadcast(intro_threshold(segments, skip_segments, factor)),
        "path",
        "left",
    )
    first_loud = with_thr.groupBy("path").agg(
        F.min(
            F.when(F.col("rms_energy") > F.col("threshold"), F.col("start_time"))
        ).alias("first_loud_start")
    )
    return (
        first_loud.withColumn(
            "suggested_trim",
            F.greatest(
                F.col("first_loud_start") - F.lit(buffer_seconds), F.lit(0.0)
            ),
        )
        .withColumn("should_trim", F.col("suggested_trim") > min_trim)
    )


def energy_bars(segments: DataFrame, width: int = 20) -> DataFrame:
    """F18: per-file normalized bar length ``floor(rms/max · width)`` for
    the preview display (`scripts/hebrew_audio_trimmer.py:437-442`).
    An all-silent file (per-file max rms == 0) gets bar_len 0 — the bare
    division is 0/0, which THROWS under the session's default ANSI mode
    instead of drawing an empty bar."""
    w = Window.partitionBy("path")
    return segments.withColumn(
        "bar_len",
        F.coalesce(
            F.floor(
                F.try_divide(F.col("rms_energy"), F.max("rms_energy").over(w))
                * F.lit(width)
            ),
            F.lit(0),
        ).cast("int"),
    )


def spectral_features(
    waveforms: DataFrame,
    nfft: int = 1024,
    path_col: str = "path",
    samples_col: str = "samples",
    sample_rate_col: str = "sample_rate",
) -> DataFrame:
    """Dominant-frequency estimation over a REAL fast Fourier transform
    (numpy.fft.rfft) of each file's first ``nfft`` samples — the
    spectral stage of an audio-curation pipeline (tonality gating,
    speech-band checks) the reference's librosa chain would run after
    decode (`scripts/hebrew_audio_trimmer.py:105-124` loads exactly
    such a waveform before its energy pass).

    One Arrow-batched ``mapInPandas`` pass: per file, magnitude spectrum
    over bins 1..nfft/2 (DC excluded), ``dominant_bin`` = first-argmax,
    ``dominant_freq_hz`` = bin·sr/nfft (exact binary arithmetic when sr
    is a multiple of nfft), ``tonality_milli`` = half-away-rounded
    peak-to-total magnitude share in milli-units — an integer, so the
    cross-engine surface has no float rounding. Files shorter than
    ``nfft`` samples are dropped (callers filter on ``size(samples)``).

    The DuckDB twin replays the IDENTICAL spectrum as a naive O(n·k)
    DFT in SQL (sum of x·cos / x·sin terms) — a genuinely independent
    algorithm from the Cooley-Tukey path numpy takes, so hash equality
    certifies the transform itself, not a shared implementation.

    Scale posture: map-only (no shuffle at all); cost is nfft·log nfft
    per file regardless of file length; at 100 TB this pipelines with
    decode in the same stage, and the per-batch FFT is one vectorized
    numpy call over the Arrow buffer.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    half = nfft // 2

    def feats(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                samples = row[samples_col]
                if samples is None or len(samples) < nfft:
                    continue
                sr = int(row[sample_rate_col])
                x = np.asarray(samples[:nfft], dtype="float64")
                mag = np.abs(np.fft.rfft(x))
                dom = int(np.argmax(mag[1 : half + 1]) + 1)  # first-max
                tot = float(mag[1 : half + 1].sum())
                # a DC-only signal (constant) has zero non-DC energy:
                # dominant_bin stays the first-argmax (1) and tonality 0
                ton = 0 if tot <= 0.0 else int(
                    np.floor(1000.0 * float(mag[dom]) / tot + 0.5)
                )
                out.append(
                    {
                        "path": row[path_col],
                        "num_samples": int(len(samples)),
                        "dominant_bin": dom,
                        "dominant_freq_hz": dom * sr / nfft,
                        "tonality_milli": ton,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "path",
                    "num_samples",
                    "dominant_bin",
                    "dominant_freq_hz",
                    "tonality_milli",
                ],
            )

    return waveforms.mapInPandas(
        feats,
        StructType(
            [
                StructField("path", StringType(), False),
                StructField("num_samples", LongType(), False),
                StructField("dominant_bin", IntegerType(), False),
                StructField("dominant_freq_hz", DoubleType(), False),
                StructField("tonality_milli", LongType(), False),
            ]
        ),
    )
