"""Explicit StructTypes for every data shape the reference keeps implicit.

The reference passes Python dicts with duck-typed shapes (SURVEY.md §1);
schema drift between variants (``verse_num``+``text`` vs
``verse_number``+``word``, `hebrew_alignment_tool.py:433-445` vs
`scripts/hebrew_alignment_tool_gpu.py:507-517`) is resolved here by fixing
ONE canonical schema per shape — the GPU-lineage output schema, which is
what the HTML viewer consumes (SURVEY.md §7.2).

Three tiers of usage:
- PDF_PAGE / VIDEO_FRAME / WAVEFORM are the LIVE output schemas of
  operators/multimodal.py;
- ENERGY_SEGMENT / AUDIO_FILE conform to their producers
  (audio.rms_energy_segments, readers.read_binary_files) and
  tests/test_contract.py pins that;
- the rest document the reference's §1 record shapes (seconds-domain,
  nested-words) that the engine re-expresses relationally — e.g.
  transcribe_words emits the ms-integer VARIANT of TRANSCRIBED_WORD
  and corpus_verses flattens VERSE's words array to text. They are
  documentation of the source data model, not dead code.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# (a) Bible corpus, normalized to one row per verse
# (`hebrew_alignment_tool.py:187-195` flattened verse_metadata record).
VERSE_SCHEMA = StructType(
    [
        StructField("book", StringType(), False),
        StructField("chapter", IntegerType(), False),
        StructField("verse_num", IntegerType(), False),
        StructField("words", ArrayType(StringType()), False),
        StructField("text", StringType(), False),
        StructField("word_count", IntegerType(), False),
    ]
)

# (d) Transcribed word with interval timestamps
# (`fixed_hebrew_aligner.py:427-437`, Azure ticks already ÷ 1e7).
TRANSCRIBED_WORD_SCHEMA = StructType(
    [
        StructField("text", StringType(), False),
        StructField("start", DoubleType(), False),
        StructField("end", DoubleType(), False),
        StructField("confidence", DoubleType(), False),
    ]
)

# (e) Alignment output: word- and verse-level rows (canonical GPU-lineage
# keys; `scripts/hebrew_alignment_tool_gpu.py:507-517,573-583`).
ALIGNED_WORD_SCHEMA = StructType(
    [
        StructField("word", StringType(), False),
        StructField("start", DoubleType(), False),
        StructField("end", DoubleType(), False),
        StructField("confidence", DoubleType(), False),
    ]
)

ALIGNED_VERSE_SCHEMA = StructType(
    [
        StructField("book", StringType(), False),
        StructField("chapter", IntegerType(), False),
        StructField("verse_num", IntegerType(), False),
        StructField("text", StringType(), False),
        StructField("start", DoubleType(), False),
        StructField("end", DoubleType(), False),
        StructField("confidence", DoubleType(), False),
        StructField("word_count", IntegerType(), False),
        StructField("words", ArrayType(ALIGNED_WORD_SCHEMA), False),
    ]
)

# (f) Trim-config state store record (`scripts/hebrew_audio_trimmer.py:186-195`).
TRIM_RECORD_SCHEMA = StructType(
    [
        StructField("file_path", StringType(), False),
        StructField("trim_method", StringType(), True),
        StructField("trim_start", DoubleType(), True),
        StructField("trim_end", DoubleType(), True),
        StructField("keep_duration", DoubleType(), True),
        StructField("trim_from", StringType(), True),
        StructField("original_duration", DoubleType(), True),
        StructField("new_duration", DoubleType(), True),
        StructField("timestamp", TimestampType(), True),
    ]
)

# (b)+(c) Audio inventory row (binaryFile scan + parsed key columns) and
# decoded waveform row (S5 decode output).
AUDIO_FILE_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("modificationTime", TimestampType(), True),
        StructField("length", LongType(), False),
        StructField("content", BinaryType(), True),
    ]
)

WAVEFORM_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("num_samples", LongType(), False),
        StructField("duration", DoubleType(), False),
        StructField("samples", ArrayType(FloatType()), True),
    ]
)

# (g) OCR'd grammar-book page (`scripts/convert_hebrew_grammar_pdf.py:120-133`):
# per-page text + char-class binary maps + NER-entity structs.
PDF_PAGE_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("page_number", IntegerType(), False),
        StructField("page_image", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("nikud_map", ArrayType(IntegerType()), True),
        StructField(
            "entities",
            ArrayType(
                StructType(
                    [
                        StructField("entity", StringType(), False),
                        StructField("label", StringType(), False),
                        StructField("score", DoubleType(), False),
                    ]
                )
            ),
            True,
        ),
    ]
)

# Sampled video frame rows (multimodal frame-sample plumbing).
VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("t", DoubleType(), False),
        StructField("frame", BinaryType(), True),
    ]
)

# Energy segment rows (tumbling 2-s RMS windows,
# `scripts/hebrew_audio_trimmer.py:113-124`).
ENERGY_SEGMENT_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("seg_idx", IntegerType(), False),
        StructField("start_time", DoubleType(), False),
        StructField("end_time", DoubleType(), False),
        StructField("rms_energy", DoubleType(), False),
    ]
)
