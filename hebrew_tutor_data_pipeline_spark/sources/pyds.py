"""Custom connector on Spark 4's Python DataSource API (S3's
computed-path lookup as a REAL pluggable source).

The reference derives chapter audio paths from (book number, book code,
chapter) with an irregular-width branch and probes the filesystem for
each candidate (`scripts/hebrew_alignment_corrected.py:124-131`,
`fixed_hebrew_aligner.py:335-342`). Rounds 1-6 expressed that as a
DataFrame plan over a binaryFile scan; this module lifts it to the
engine-native connector surface: ``spark.read.format("hebrew_chapters")``
with options, schema, and one input partition PER BOOK directory so the
existence probing parallelizes across executors like any other scan.

Why this shape scales: partitions() returns lightweight partition
objects (one per book — thousands of books ⇒ thousands of independent
tasks); each task lists ONLY its own directory and computes its own
candidate grid, so no driver-side listing of a 100 TB tree ever
happens. A cloud-blob deployment swaps the ``os`` calls for its SDK
inside ``read()`` — the plan, schema, and partitioning are unchanged
(the same activation-slot discipline as the abfss connector,
sources/readers.py).
"""

from __future__ import annotations

import os
import re
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: (book string, chapter int, ...) — the computed-candidate grid with
#: the probe result. `filename` is the COMPUTED candidate (2-digit form
#: unless the 3-digit probe hit — the Psalms-analog irregular branch).
CHAPTER_SCHEMA = (
    "book_num int, book string, abbr string, chapter int, "
    "filename string, exists boolean, size bigint"
)


class _BookPartition(InputPartition):
    def __init__(self, dirname: str) -> None:
        self.dirname = dirname


class ChapterAudioDataSource(DataSource):
    """``format("hebrew_chapters")`` — options:

    - ``root``: directory holding ``NN_BookName/`` book directories
    - ``max_chapter``: candidate chapters probed per book (default 5)
    """

    @classmethod
    def name(cls) -> str:
        return "hebrew_chapters"

    def schema(self) -> str:
        return CHAPTER_SCHEMA

    def reader(self, schema) -> "ChapterAudioReader":
        return ChapterAudioReader(self.options)


def _scan_book(root: str, dirname: str, max_chapter: int):
    """The per-partition probe, shared verbatim by the executor-side
    ``read()`` and the oracle builder (same function, same bytes —
    the digest-oracle discipline)."""
    m = re.match(r"^(\d+)_(.+)$", dirname)
    if not m:
        return
    book_num, book = int(m.group(1)), m.group(2)
    book_dir = os.path.join(root, dirname)
    present = {f for f in os.listdir(book_dir) if f.endswith(".mp3")}
    # the book code is connector metadata discovered from the partition's
    # own listing (first candidate match), not a driver-side table
    abbrs = sorted(
        {
            am.group(1)
            for f in present
            if (am := re.match(r"^\d+-([A-Za-z]+)_\d+\.mp3$", f))
        }
    )
    abbr = abbrs[0] if abbrs else book[:3]
    for ch in range(1, max_chapter + 1):
        two = f"{book_num:02d}-{abbr}_{ch:02d}.mp3"
        three = f"{book_num:02d}-{abbr}_{ch:03d}.mp3"  # Psalms-analog width
        name = three if three in present else two
        exists = name in present
        size = os.path.getsize(os.path.join(book_dir, name)) if exists else 0
        yield (book_num, book, abbr, ch, name, exists, size)


class ChapterAudioReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.root = options.get("root")
        if not self.root:
            raise ValueError("hebrew_chapters: the 'root' option is required")
        self.max_chapter = int(options.get("max_chapter", 5))

    def partitions(self) -> list[_BookPartition]:
        # driver lists only the TOP level (one entry per book), never
        # the files — the file probes run inside each task
        return [
            _BookPartition(d)
            for d in sorted(os.listdir(self.root))
            if os.path.isdir(os.path.join(self.root, d))
        ]

    def read(self, partition: _BookPartition) -> Iterator[tuple]:
        yield from _scan_book(self.root, partition.dirname, self.max_chapter)
