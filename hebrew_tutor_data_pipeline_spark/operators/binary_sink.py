"""Side-effect binary sinks (SURVEY.md §2.1 S10, S13).

The reference mutates audio files IN PLACE after trimming, keeping a
one-time backup tree for restore (`scripts/hebrew_audio_trimmer.py:89-103`
create_backup, `:180-184` overwrite, `:480-502` restore_backup), and
uploads audio blobs for batch transcription
(`fixed_hebrew_aligner.py:335-342`).

Spark-first shape: these are ACTIONS, not transformations — each runs as
``foreachPartition`` so the side effects execute executor-side, in
parallel across partitions, with no data ever collected to the driver.
Per-file semantics are idempotent (backup only if absent; atomic
tmp+rename replace) so Spark task retries and speculative duplicates
cannot corrupt a file — the property that matters when 1000 executors
re-run a lost partition.

The "remote" targets are directories here (any mounted/NFS path); the
cloud-SDK call sites are documented ``NotImplementedError`` slots like
multimodal's codecs, with the local-directory fake implementing the full
contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession


def _atomic_write(dest: str, payload: bytes) -> None:
    """tmp-in-same-dir + os.replace — the reference's sf.write is not
    atomic (a killed trimmer leaves a truncated mp3); rename is."""
    d = os.path.dirname(dest)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def overwrite_with_backup(
    df: DataFrame,
    backup_dir: str,
    root_dir: str,
    path_col: str = "path",
    content_col: str = "content",
) -> None:
    """S10: overwrite each file with new content, backing up the
    original ONCE (first write wins; re-runs never clobber the backup —
    `hebrew_audio_trimmer.py:95-99` ``if not backup_file.exists()``).

    Backup layout mirrors the reference: ``backup_dir/<parent>/<name>``.
    ``root_dir`` strips any ``file:`` URI prefix Spark's binaryFile scan
    put on the path column.
    """

    def run(rows: Iterator) -> None:
        for row in rows:
            path = row[path_col]
            if path.startswith("file:"):
                path = path[len("file:") :]
            parent = os.path.basename(os.path.dirname(path))
            backup = os.path.join(backup_dir, parent, os.path.basename(path))
            if not os.path.exists(backup):
                os.makedirs(os.path.dirname(backup), exist_ok=True)
                if os.path.exists(path):
                    # the backup itself must be atomic: a task killed
                    # mid-copy would leave a TRUNCATED backup that a
                    # retry's exists() check then trusts, after which
                    # the overwrite below destroys the only good copy —
                    # stage to a task-private tmp, then os.replace
                    tmp = f"{backup}.tmp.{os.getpid()}"
                    shutil.copy2(path, tmp)
                    os.replace(tmp, backup)
            _atomic_write(path, bytes(row[content_col]))

    df.select(path_col, content_col).foreachPartition(run)


def restore_from_backup(
    spark: SparkSession,
    backup_dir: str,
    target_root: str,
) -> int:
    """S10 restore path (`hebrew_audio_trimmer.py:480-502`): copy every
    backed-up file back over its mutated original. The backup tree is
    listed as a binaryFile scan and restored executor-side; returns the
    number restored (a count over the scan, not a driver loop)."""
    from ..sources.readers import read_binary_files

    files = read_binary_files(spark, backup_dir, glob="*").select("path", "content")

    def run(rows: Iterator) -> None:
        for row in rows:
            path = row["path"]
            if path.startswith("file:"):
                path = path[len("file:") :]
            rel = os.path.relpath(path, backup_dir)
            _atomic_write(os.path.join(target_root, rel), bytes(row["content"]))

    files.foreachPartition(run)
    return files.count()


def upload_blobs(
    df: DataFrame,
    container_dir: str | None = None,
    path_col: str = "path",
    content_col: str = "content",
    prefix: str = "audio",
    fake: bool = True,
    name_col: str | None = None,
) -> None:
    """S13: blob upload sink (`fixed_hebrew_aligner.py:335-342`).

    Blob names follow the reference pattern ``{prefix}/{filename}`` with
    ``overwrite=True`` semantics; pass ``name_col`` to supply
    collision-proof names (basenames silently merge when equal
    filenames live under different directories — the same hazard the
    trimmer manifest keys on book_dir/filename to avoid).
    ``fake=True`` writes into a local
    container directory (the full contract: naming, overwrite,
    partition-parallel execution); ``fake=False`` is the documented slot
    where ``BlobClient.upload_blob`` belongs — the SDK is absent from
    this container by contract. The reference's ``_{int(time.time())}``
    name suffix is deliberately dropped: non-deterministic names break
    idempotent retries, and overwrite-by-stable-name is what a Spark
    task re-run needs.
    """
    if not fake:
        raise NotImplementedError(
            "azure-storage-blob is not available in this container; "
            "fake=True implements the naming/overwrite contract locally"
        )
    if container_dir is None:
        raise ValueError("fake upload needs a container_dir")

    cols = [name_col or path_col, content_col]

    def run(rows: Iterator) -> None:
        for row in rows:
            name = row[name_col] if name_col else os.path.basename(row[path_col])
            _atomic_write(
                os.path.join(container_dir, prefix, name), bytes(row[content_col])
            )

    df.select(*cols).foreachPartition(run)
