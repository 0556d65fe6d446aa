"""Multimodal (binary) column operators — decode / feature plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata;
the heavy decode step runs as Arrow-batched ``mapInPandas`` so one
Python worker processes a whole batch of files per call. The actual
codec libraries (librosa/soundfile/PIL/cv2) are NOT in this container —
per the build contract the decode body is stubbed: ``fake=True`` (the
default) produces a deterministic synthetic waveform/feature so the
Spark-side plumbing (schema, batching, partitioning, downstream SQL) is
fully real and testable, and ``fake=False`` raises NotImplementedError
where the real codec call belongs.

Reference behavior being reproduced: S5 robust decode
(`scripts/hebrew_alignment_tool_optimized.py:281-303`), S6 resample
(`hebrew_alignment_tool.py:208-214`), U8 image preprocess
(`scripts/convert_hebrew_grammar_pdf.py:34-42`).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..schemas import WAVEFORM_SCHEMA

FAKE_SR = 16_000
FAKE_SECONDS_PER_KB = 0.05  # deterministic duration ∝ payload size


def _fake_waveform(payload: bytes, sr: int) -> list[float]:
    """Deterministic stand-in decode: a short sine whose frequency and
    length derive from the payload digest/size. Stable across runs,
    executors, and engines."""
    digest = hashlib.md5(payload).digest()
    freq = 100 + digest[0]  # 100..355 Hz
    n = max(sr // 100, int(len(payload) / 1024 * FAKE_SECONDS_PER_KB * sr))
    return [math.sin(2 * math.pi * freq * i / sr) for i in range(n)]


def decode_audio(
    files: DataFrame,
    sample_rate: int = FAKE_SR,
    fake: bool = True,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """S5: binaryFile rows → waveform rows (path, sample_rate,
    num_samples, duration, samples).

    ``mapInPandas`` so each Arrow batch of files is decoded in one
    Python call — the executor-side analog of the reference's explicit
    GPU micro-batching (U2), with partition size as the batch knob.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                if fake:
                    samples = _fake_waveform(payload, sample_rate)
                else:
                    raise NotImplementedError(
                        "real audio decode requires librosa/soundfile; "
                        "install and replace this branch (S5, "
                        "`scripts/hebrew_alignment_tool_optimized.py:281-303`)"
                    )
                out.append(
                    {
                        "path": row[path_col],
                        "sample_rate": sample_rate,
                        "num_samples": len(samples),
                        "duration": round(len(samples) / sample_rate, 6),
                        "samples": samples,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in WAVEFORM_SCHEMA.fields]
            )

    return files.mapInPandas(decode, WAVEFORM_SCHEMA)


IMAGE_FEATURE_SCHEMA = (
    "path string, width int, height int, mean_luma double, feature array<double>"
)


def image_features(
    files: DataFrame,
    fake: bool = True,
    feature_dim: int = 8,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """U8 plumbing: binary image → (dims, luma, small feature vector).

    Fake mode derives all values from the payload digest — deterministic
    and engine-portable; real mode is the cv2/PIL slot."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                if not fake:
                    raise NotImplementedError(
                        "real image decode requires cv2/PIL (U8, "
                        "`scripts/convert_hebrew_grammar_pdf.py:34-42`)"
                    )
                d = hashlib.md5(payload).digest()
                out.append(
                    {
                        "path": row[path_col],
                        "width": 64 + d[1],
                        "height": 64 + d[2],
                        "mean_luma": round(d[3] / 255.0, 6),
                        "feature": [round(b / 255.0, 6) for b in d[4 : 4 + feature_dim]],
                    }
                )
            yield pd.DataFrame(
                out, columns=["path", "width", "height", "mean_luma", "feature"]
            )

    return files.mapInPandas(extract, IMAGE_FEATURE_SCHEMA)
