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

from ..schemas import PDF_PAGE_SCHEMA, VIDEO_FRAME_SCHEMA, WAVEFORM_SCHEMA

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


def _decode_wav_bytes(payload: bytes) -> tuple[int, list[float]]:
    """REAL decode of a 16-bit PCM RIFF/WAV payload via the stdlib
    ``wave`` module — no codec library involved. Returns (native sample
    rate, float samples in [-1, 1]). Multi-channel audio is downmixed by
    channel mean (the reference loads mono, `hebrew_alignment_tool.py:208-214`).
    Floats use the /32767 convention so ``encode_wav`` → decode round-
    trips the int16 samples bit-exactly."""
    import wave
    from io import BytesIO

    import numpy as np

    with wave.open(BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only 16-bit PCM WAV supported, got {8 * w.getsampwidth()}-bit"
            )
        sr = w.getframerate()
        if sr <= 0:
            raise ValueError(f"WAV header declares non-positive sample rate {sr}")
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    x = np.frombuffer(raw, dtype="<i2").astype("float64")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return sr, list(x / 32767.0)


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

    ``fake=False`` REALLY decodes RIFF/WAV payloads (stdlib ``wave`` —
    the tested real-bytes tier; the emitted ``sample_rate`` is the
    file's native rate, no resampling). Compressed codecs (MP3/OGG)
    still require librosa/soundfile and raise; the reference's decode
    chain is `scripts/hebrew_alignment_tool_optimized.py:281-303`.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                if fake:
                    sr = sample_rate
                    samples = _fake_waveform(payload, sample_rate)
                elif not payload:
                    raise ValueError(f"empty audio payload for {row[path_col]!r}")
                elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                    sr, samples = _decode_wav_bytes(payload)
                else:
                    raise NotImplementedError(
                        "real decode of compressed audio requires "
                        "librosa/soundfile; only RIFF/WAV decodes "
                        "natively (S5, "
                        "`scripts/hebrew_alignment_tool_optimized.py:281-303`)"
                    )
                out.append(
                    {
                        "path": row[path_col],
                        "sample_rate": sr,
                        "num_samples": len(samples),
                        "duration": round(len(samples) / sr, 6),
                        "samples": samples,
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in WAVEFORM_SCHEMA.fields]
            )

    return files.mapInPandas(decode, WAVEFORM_SCHEMA)


def encode_wav(
    waveforms: DataFrame,
    path_col: str = "path",
    samples_col: str = "samples",
    rate_col: str = "sample_rate",
) -> DataFrame:
    """S6: waveform rows → REAL 16-bit PCM RIFF/WAV bytes.

    The reference converts MP3→WAV for the Azure recognizer
    (`hebrew_alignment_tool.py:208-214`: librosa.load at 16 kHz +
    soundfile write). The encode half needs no codec library — the
    stdlib ``wave`` module writes the RIFF container — so unlike the
    decode slot this is NOT a stub: output bytes are a valid mono WAV
    any reader can parse. Floats are clipped to [-1, 1] and quantized
    half-away-from-zero to int16, the same convention soundfile uses.
    """
    import wave
    from io import BytesIO

    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("path", StringType(), False),
            StructField("sample_rate", IntegerType(), False),
            StructField("num_samples", LongType(), False),
            StructField("wav", BinaryType(), False),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                x = np.asarray(row[samples_col], dtype="float64")
                x = np.clip(x, -1.0, 1.0)
                pcm = (np.sign(x) * np.floor(np.abs(x) * 32767 + 0.5)).astype("<i2")
                sr = int(row[rate_col])
                buf = BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(pcm.tobytes())
                rows.append((row[path_col], sr, len(pcm), buf.getvalue()))
            yield pd.DataFrame(
                rows, columns=["path", "sample_rate", "num_samples", "wav"]
            )

    return waveforms.select(path_col, rate_col, samples_col).mapInPandas(
        encode, out_schema
    )


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
                # extend the digest material deterministically (chained
                # md5 blocks) so feature_dim > 12 yields a FULL-length
                # vector — a silent slice of the 16-byte digest returned
                # 12 elements max, feeding dimension-mismatched vectors
                # into fixed-dim consumers (NULL cosines, no error)
                mat = d
                while len(mat) < 4 + feature_dim:
                    mat += hashlib.md5(mat).digest()
                out.append(
                    {
                        "path": row[path_col],
                        "width": 64 + d[1],
                        "height": 64 + d[2],
                        "mean_luma": round(d[3] / 255.0, 6),
                        "feature": [
                            round(b / 255.0, 6) for b in mat[4 : 4 + feature_dim]
                        ],
                    }
                )
            yield pd.DataFrame(
                out, columns=["path", "width", "height", "mean_luma", "feature"]
            )

    return files.mapInPandas(extract, IMAGE_FEATURE_SCHEMA)


RESIZED_IMAGE_SCHEMA = "path string, width int, height int, image binary"


def image_resize(
    files: DataFrame,
    width: int = 64,
    height: int = 64,
    fake: bool = True,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Multimodal resize plumbing: binary image → fixed-dims binary image.

    Real slot = cv2/PIL ``resize`` (the reference's CLAHE/Otsu preprocess
    sits at the same pipeline point, `scripts/convert_hebrew_grammar_pdf.py:34-42`).
    Fake mode emits ``width*height`` deterministic bytes by cycling the
    payload digest, so downstream byte-level assertions are stable."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                if not fake:
                    raise NotImplementedError(
                        "real image resize requires cv2/PIL (U8 slot)"
                    )
                d = hashlib.md5(payload).digest()
                out.append(
                    {
                        "path": row[path_col],
                        "width": width,
                        "height": height,
                        "image": (d * (n // len(d) + 1))[:n],
                    }
                )
            yield pd.DataFrame(out, columns=["path", "width", "height", "image"])

    return files.mapInPandas(resize, RESIZED_IMAGE_SCHEMA)


def video_frame_sample(
    files: DataFrame,
    every_s: float = 1.0,
    fake: bool = True,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Multimodal frame-sample plumbing: binary video → one row per
    sampled frame (path, frame_idx, t, frame bytes).

    1-in-N frame sampling is the video analog of the reference's chunked
    audio decode (U1 ``chunk_length_s``, `hebrew_alignment_tool.py:216-251`).
    Fake mode derives duration from payload size (like ``decode_audio``)
    and each frame's bytes from digest(payload ‖ frame_idx) —
    deterministic across executors and runs. ``fake=False`` shells out
    to the ``ffmpeg`` binary per payload (stdin→mjpeg→stdout, frames
    split on JPEG SOI/EOI markers — the reference's subprocess pattern,
    `scripts/audio_trimmer_interface.py:37-131`); it raises if ffmpeg is
    not on PATH, and the ``-m realmedia`` test tier exercises it where
    one is installed."""

    def _ffmpeg_frames(payload: bytes) -> list[bytes]:
        import shutil
        import subprocess

        if shutil.which("ffmpeg") is None:
            raise NotImplementedError(
                "real frame sampling requires the ffmpeg binary on PATH "
                "(U9 slot, `scripts/audio_trimmer_interface.py:37-131`)"
            )
        proc = subprocess.run(
            [
                "ffmpeg", "-hide_banner", "-loglevel", "error",
                "-i", "pipe:0",
                "-vf", f"fps=1/{every_s}",
                "-f", "image2pipe", "-vcodec", "mjpeg", "pipe:1",
            ],
            input=payload, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        if proc.returncode != 0:
            # surface ffmpeg's own diagnostic — a bare CalledProcessError
            # hides WHY the payload was undecodable
            tail = proc.stderr.decode("utf-8", "replace").strip()[-500:]
            raise ValueError(f"ffmpeg failed (rc {proc.returncode}): {tail}")
        frames, buf, start = [], proc.stdout, 0
        while True:
            soi = buf.find(b"\xff\xd8", start)
            if soi < 0:
                break
            eoi = buf.find(b"\xff\xd9", soi + 2)
            if eoi < 0:
                break
            frames.append(buf[soi : eoi + 2])
            start = eoi + 2
        return frames

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                if not fake:
                    for i, fb in enumerate(_ffmpeg_frames(payload)):
                        out.append(
                            {
                                "path": row[path_col],
                                "frame_idx": i,
                                "t": round(i * every_s, 6),
                                "frame": fb,
                            }
                        )
                    continue
                duration = max(every_s, len(payload) / 1024 * FAKE_SECONDS_PER_KB * 20)
                n_frames = int(duration / every_s)
                for i in range(n_frames):
                    out.append(
                        {
                            "path": row[path_col],
                            "frame_idx": i,
                            "t": round(i * every_s, 6),
                            "frame": hashlib.md5(payload + bytes([i % 256])).digest(),
                        }
                    )
            yield pd.DataFrame(out, columns=["path", "frame_idx", "t", "frame"])

    return files.mapInPandas(sample, VIDEO_FRAME_SCHEMA)


def _pdf_extract_pages(payload: bytes) -> list[tuple[bytes, str]]:
    """REAL per-page text extraction from a standard text PDF using only
    the stdlib: locate page objects, follow their /Contents references,
    inflate FlateDecode streams with ``zlib``, and read the text-showing
    operators (``(..) Tj`` and ``[..] TJ``) from the content stream.
    Returns ``[(decoded content-stream bytes, text), ...]`` in page
    order. This is the extraction half of S11; rasterization (a page
    *image*) still requires PyMuPDF and is not attempted — callers get
    the decoded stream bytes in the image slot, documented below.
    Handles the overwhelmingly common single-generation, non-encrypted,
    Flate-or-plain case; exotic PDFs raise ValueError so the caller can
    quarantine rather than mis-parse."""
    import re
    import zlib

    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    if b"/Encrypt" in payload:
        raise ValueError("encrypted PDF unsupported in stdlib extraction")

    # obj number -> raw object bytes
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2)
        for m in re.finditer(
            rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", payload, re.DOTALL
        )
    }

    def stream_of(body: bytes) -> bytes:
        m = re.search(rb"stream\r?\n(.*?)\r?\nendstream", body, re.DOTALL)
        if not m:
            return b""
        data = m.group(1)
        if b"/FlateDecode" in body:
            data = zlib.decompress(data)
        return data

    def texts_of(stream: bytes) -> str:
        # (…) Tj, <hex> Tj and [(…) kern <hex> …] TJ, extracted in STREAM
        # ORDER (real PDFs freely interleave the operators; collecting
        # per-kind would scramble the page text and the nikud map derived
        # from it). Hex strings with a UTF-16BE BOM decode as the PDF
        # text-string encoding (ISO 32000-1 §7.9.2.2); BOM-less hex
        # decodes latin-1 byte-per-code like literal strings.
        import unicodedata

        # ONE left-to-right pass over every escape (ISO 32000-1 §7.3.4.2):
        # sequential substitutions mis-decoded an escaped backslash
        # followed by digits — in (C:\\101) the octal pass consumed the
        # second backslash plus '101' as an octal escape, yielding 'C:\A'
        # instead of 'C:\101'. A single alternation consumes each escape
        # exactly once in document order.
        _ESC = {
            b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\",
        }

        def _esc_repl(m: "re.Match[bytes]") -> bytes:
            g = m.group(1)
            if g in (b"\r\n", b"\r", b"\n"):
                return b""  # escaped EOL = line continuation
            if g[:1].isdigit():
                # Only [0-7]{1,3} matches are octal escapes; the `.`
                # alternative can still hand us \8 or \9, which ISO
                # 32000-1 §7.3.4.2 treats as an unknown escape (drop
                # the backslash, keep the digit) — int(g, 8) on those
                # would raise and fail the whole page.
                if all(c in b"01234567" for c in g):
                    return bytes([int(g, 8) & 0xFF])
                return g
            # known escape, else the spec drops the backslash
            return _ESC.get(g, g)

        def unescape(s: bytes) -> str:
            s = re.sub(rb"\\(\r\n|[0-7]{1,3}|.)", _esc_repl, s, flags=re.DOTALL)
            return s.decode("latin-1")

        def unhex(s: bytes) -> str:
            # ISO 32000-1 §7.3.4.3: whitespace inside hex strings is
            # ignored and an odd digit count implies a trailing 0 — strip
            # and pad explicitly (bytes.fromhex tolerates neither odd
            # length nor, pre-3.11, embedded whitespace).
            h = re.sub(rb"\s", b"", s)
            if len(h) % 2:
                h += b"0"
            raw = bytes.fromhex(h.decode("ascii"))
            if raw.startswith(b"\xfe\xff"):
                return raw[2:].decode("utf-16-be", errors="replace")
            return raw.decode("latin-1")

        parts: list[str] = []
        show_op = re.compile(
            rb"\(((?:\\.|[^\\()])*)\)\s*Tj"
            rb"|<([0-9A-Fa-f\s]*)>\s*Tj"
            rb"|\[((?:\\.|[^\]])*)\]\s*TJ"
        )
        run_str = re.compile(rb"\(((?:\\.|[^\\()])*)\)|<([0-9A-Fa-f\s]*)>")
        for m in show_op.finditer(stream):
            if m.group(1) is not None:
                parts.append(unescape(m.group(1)))
            elif m.group(2) is not None:
                parts.append(unhex(m.group(2)))
            else:
                run = "".join(
                    unescape(s.group(1)) if s.group(1) is not None else unhex(s.group(2))
                    for s in run_str.finditer(m.group(3))
                )
                if run:
                    parts.append(run)
        # The reference NFC-normalizes immediately after OCR
        # (`scripts/convert_hebrew_grammar_pdf.py:120`); normalizing at
        # the extraction boundary keeps every downstream consumer (and
        # the oracle replay) in one canonical form.
        return unicodedata.normalize(
            "NFC", " ".join(p.strip() for p in parts if p.strip())
        )

    def _kids_order() -> list[int]:
        # page order = the /Pages tree's /Kids order (ISO 32000-1
        # §7.7.3.2), NOT object-number order — incremental updates and
        # some generators emit page objects with arbitrary numbering,
        # and object-number order then attaches texts to the wrong
        # page_number. Falls back to object order when no intact
        # Catalog→Pages tree exists.
        cat = next(
            (b for b in objs.values() if re.search(rb"/Type\s*/Catalog\b", b)),
            None,
        )
        if cat is None:
            return []
        root = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", cat)
        if not root:
            return []
        order: list[int] = []
        seen: set[int] = set()

        def walk(num: int) -> None:
            if num in seen:  # defensive: malformed cyclic tree
                return
            seen.add(num)
            body = objs.get(num, b"")
            if re.search(rb"/Type\s*/Page\b(?!s)", body):
                order.append(num)
                return
            kids = re.search(rb"/Kids\s*\[([^\]]*)\]", body)
            if kids:
                for r in re.finditer(rb"(\d+)\s+\d+\s+R", kids.group(1)):
                    walk(int(r.group(1)))

        walk(int(root.group(1)))
        return order

    page_nums = _kids_order() or [
        n for n in sorted(objs) if re.search(rb"/Type\s*/Page\b(?!s)", objs[n])
    ]
    pages: list[tuple[bytes, str]] = []
    for num in page_nums:
        body = objs[num]
        if not re.search(rb"/Type\s*/Page\b(?!s)", body):
            continue
        # /Contents may be a single reference or an ARRAY of references
        # (both standard); array streams concatenate in order
        cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        ca = re.search(rb"/Contents\s*\[([^\]]*)\]", body)
        if ca:
            stream = b"\n".join(
                stream_of(objs.get(int(r.group(1)), b""))
                for r in re.finditer(rb"(\d+)\s+\d+\s+R", ca.group(1))
            )
        elif cm:
            stream = stream_of(objs.get(int(cm.group(1)), b""))
        else:
            stream = stream_of(body)
        pages.append((stream, texts_of(stream)))
    if not pages:
        raise ValueError("no /Type /Page objects found")
    return pages


#: Unicode combining marks used by the real nikud char-class map
_NIKUD_RANGE = range(0x0591, 0x05C8)


def pdf_pages(
    files: DataFrame,
    fake: bool = True,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """S11+S12+U7: binary PDF → per-page OCR'd rows
    (page_number 1-indexed, page_image, text, nikud_map, entities).

    Reference: PyMuPDF renders pages and Azure Document Intelligence OCRs
    them in parallel (`scripts/convert_hebrew_grammar_pdf.py:34-86`); the
    per-page records carry char-class maps and NER entities
    (`scripts/convert_hebrew_grammar_pdf.py:88-133`). One ``mapInPandas``
    stage = one connection-reusing worker per partition (the reference's
    ThreadPoolExecutor analog). Fake mode synthesizes page count, text,
    and entity structs from the payload digest.

    ``fake=False`` REALLY extracts: page objects, inflated content
    streams, and Tj/TJ text via the stdlib (``_pdf_extract_pages``);
    ``nikud_map`` becomes the true per-char Hebrew-mark class over the
    extracted text (first 64 chars). What stays stubbed, explicitly:
    rasterized page images (PyMuPDF slot — ``page_image`` carries the
    decoded content-stream bytes instead) and OCR/NER entities (external
    service slot — empty list)."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PDF_PAGE_SCHEMA.fields]
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                if not fake:
                    for p, (stream, text) in enumerate(_pdf_extract_pages(payload), 1):
                        out.append(
                            {
                                "path": row[path_col],
                                "page_number": p,
                                "page_image": stream,
                                "text": text,
                                "nikud_map": [
                                    1 if ord(ch) in _NIKUD_RANGE else 0
                                    for ch in text[:64]
                                ],
                                "entities": [],
                            }
                        )
                    continue
                d = hashlib.md5(payload).digest()
                n_pages = 1 + d[0] % 4
                for p in range(1, n_pages + 1):
                    pd_digest = hashlib.md5(payload + bytes([p])).digest()
                    text = " ".join(f"w{b:02x}" for b in pd_digest[:6])
                    out.append(
                        {
                            "path": row[path_col],
                            "page_number": p,
                            "page_image": pd_digest,
                            "text": text,
                            "nikud_map": [b % 2 for b in pd_digest[:8]],
                            "entities": [
                                {
                                    "entity": f"w{pd_digest[0]:02x}",
                                    "label": "WORD",
                                    "score": round(pd_digest[1] / 255.0, 6),
                                }
                            ],
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(render, PDF_PAGE_SCHEMA)
