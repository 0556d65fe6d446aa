"""Mock ASR transcription stage (SURVEY.md §2 U1–U3).

The reference's stage 3 transcribes a chapter's audio into word rows
with interval timestamps, three ways:

- U1 local Whisper with chunked word timestamps
  (`hebrew_alignment_tool.py:216-251`): ``chunk_length_s=20`` chunks;
  every word in a chunk is emitted with the CHUNK's ``(start, end)``
  timestamps and a placeholder confidence.
- U2 batched GPU Whisper with adaptive device fallback
  (`scripts/hebrew_alignment_tool_gpu.py:335-468`): lazy model load,
  GPU-memory probe, OOM → CPU retry. The Spark analog of its explicit
  micro-batching is ``mapInPandas`` — one Arrow batch of chapters per
  Python call — and the lazy load is the executor-singleton below.
- U3 Azure continuous / REST-batch recognition
  (`fixed_hebrew_aligner.py:252-407`): word offsets arrive as 100 ns
  ticks and are divided by 1e7 into seconds (`:427-437`); the REST
  job-status poll loop is the stateful streaming operator in
  ``streaming/polling.py``.

Real model weights / service credentials are absent from this container
by contract, so the model body is stubbed exactly like
``operators/multimodal.py``: ``fake=True`` (default) is a deterministic
digest-derived fake whose arithmetic is pure integer math — stable
across runs, executors, AND engines, so the catalog entry carries a
full DuckDB oracle rather than a rows-only check. ``fake=False`` raises
``NotImplementedError`` where the whisper/azure call belongs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_CHUNK_MS = 20_000  # chunk_length_s=20 (`hebrew_alignment_tool.py:221`)


class _AsrSingleton:
    """Executor-singleton model holder (U2's lazy-load pattern,
    `scripts/hebrew_alignment_tool_gpu.py:300-333`).

    One instance per Python worker process, loaded on first batch and
    reused for every subsequent Arrow batch — the Spark equivalent of
    the reference keeping ``self.model`` alive across chapters. A real
    implementation would pick the device here (probe
    ``torch.cuda`` free memory, fall back to CPU under 1 GB, move the
    model back after an OOM retry — `hebrew_alignment_tool_gpu.py:346-420`);
    the fake has no device state.
    """

    _instance: "_FakeAsrModel | None" = None

    @classmethod
    def get(cls, backend: str, fake: bool) -> "_FakeAsrModel":
        if not fake:
            raise NotImplementedError(
                "real ASR backends (whisper/azure) are not available in this "
                "container; the fake=True path implements the full contract"
            )
        if cls._instance is None or cls._instance.backend != backend:
            cls._instance = _FakeAsrModel(backend)
        return cls._instance


class _FakeAsrModel:
    """Deterministic stand-in for the Whisper pipeline / Azure recognizer.

    Timing model (all integer milliseconds, so the DuckDB oracle can
    reproduce it exactly):

    - the chapter's ``n`` tokens are uniformly spread over
      ``duration_ms``: token ``i`` nominally starts at ``i*D // n``;
    - each token is assigned the 20 s chunk containing its nominal
      start, and — faithful to `hebrew_alignment_tool.py:227-235` —
      emitted with the CHUNK's bounds ``(chunk_idx*C, min((chunk_idx+1)*C, D))``;
    - every ``drop_every``-th token is dropped (ASR miss simulation) so
      downstream fuzzy alignment has real work to do;
    - confidence is digest-derived per word:
      ``(ord(md5(word).hexdigest()[0]) % 50 + 50) / 100`` — the fake's
      stand-in for Azure's per-word confidence (`fixed_hebrew_aligner.py:427-437`),
      replacing Whisper-path's constant 0.8 placeholder with something
      value-checkable.

    The ``azure`` backend round-trips timings through 100 ns ticks
    (``ms * 10_000`` then ``ticks // 10_000``) to mirror the reference's
    offset/1e7 conversion — exact on integers, so both backends emit
    identical rows by construction.
    """

    def __init__(self, backend: str) -> None:
        if backend not in ("whisper", "azure"):
            raise ValueError(f"unknown ASR backend: {backend}")
        self.backend = backend

    def transcribe(
        self,
        text: str,
        duration_ms: int,
        chunk_ms: int,
        drop_every: int,
    ) -> list[tuple[int, str, int, int, int, float]]:
        tokens = text.split()
        n = len(tokens)
        if n == 0 or duration_ms <= 0:
            return []
        out = []
        for i, word in enumerate(tokens):
            if drop_every > 0 and i % drop_every == drop_every - 1:
                continue
            nominal_start = i * duration_ms // n
            chunk_idx = nominal_start // chunk_ms
            start_ms = chunk_idx * chunk_ms
            end_ms = min((chunk_idx + 1) * chunk_ms, duration_ms)
            if self.backend == "azure":
                # ticks round-trip (exact): ms → 100 ns ticks → ms
                start_ms = (start_ms * 10_000) // 10_000
                end_ms = (end_ms * 10_000) // 10_000
            conf = (ord(hashlib.md5(word.encode()).hexdigest()[0]) % 50 + 50) / 100.0
            out.append((i, word, chunk_idx, start_ms, end_ms, conf))
        return out


def transcribe_words(
    chapters: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    duration_ms_col: str = "duration_ms",
    chunk_ms: int = DEFAULT_CHUNK_MS,
    drop_every: int = 7,
    backend: str = "whisper",
    fake: bool = True,
) -> DataFrame:
    """U1/U2/U3: chapter rows → one row per transcribed word.

    Input: one row per chapter with the full reference text and the
    audio duration in ms. Output: ``id_cols`` + ``(word_idx, word,
    chunk_idx, start_ms, end_ms, confidence)`` conforming to
    ``schemas.TRANSCRIBED_WORD_SCHEMA`` (ms-integer variant).

    ``mapInPandas`` so each Arrow batch of chapters is transcribed in
    one Python call against the executor-singleton model — U2's
    batching; partition size / ``arrow.maxRecordsPerBatch`` is the
    batch-size knob. Scales as one narrow map stage: no shuffle, and
    chapters (the unit of work) partition freely across executors.
    """
    id_fields = [chapters.schema[c] for c in id_cols]
    out_schema = StructType(
        id_fields
        + [
            StructField("word_idx", IntegerType(), False),
            StructField("word", StringType(), False),
            StructField("chunk_idx", IntegerType(), False),
            StructField("start_ms", LongType(), False),
            StructField("end_ms", LongType(), False),
            StructField("confidence", DoubleType(), False),
        ]
    )
    cols = list(id_cols) + [text_col, duration_ms_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _AsrSingleton.get(backend, fake)
        names = [f.name for f in out_schema.fields]
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                ids = tuple(getattr(rec, c) for c in id_cols)
                text = getattr(rec, text_col)
                dur = getattr(rec, duration_ms_col)
                # NULL text / NULL duration (NaN after pandas' nullable
                # coercion) = nothing to transcribe: emit zero words
                # instead of crashing the task on None.split()/int(NaN)
                if text is None or dur is None or pd.isna(dur):
                    continue
                words = model.transcribe(
                    text,
                    int(dur),
                    chunk_ms,
                    drop_every,
                )
                rows.extend(ids + w for w in words)
            yield pd.DataFrame(rows, columns=names)

    return chapters.select(*cols).mapInPandas(run, out_schema)
