"""Audio-analysis and multimodal-plumbing tests (SURVEY.md §2.4 A7/A8,
§2.5 W1, §2.9 U4/U8, §2.1 S5): RMS segmentation against numpy, intro
trim suggestion logic, and the fake-decode mapInPandas plumbing over the
committed binary fixture tree."""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np
from pyspark.sql import functions as F

from hebrew_tutor_data_pipeline_spark.operators.audio import (
    energy_bars,
    intro_threshold,
    rms_energy_segments,
    suggest_intro_trim,
)
from hebrew_tutor_data_pipeline_spark.operators.multimodal import (
    decode_audio,
    image_features,
    image_resize,
    pdf_pages,
    video_frame_sample,
)
from hebrew_tutor_data_pipeline_spark.sources.readers import read_binary_files

FIXTURE_AUDIO = str(Path(__file__).resolve().parent / "fixtures" / "audio_tree")

SR = 100  # small synthetic sample rate keeps arrays tiny


def quiet_then_loud(sr=SR, quiet_s=4, loud_s=6, amp=1.0):
    """quiet_s seconds of near-silence then loud_s seconds of a sine —
    the trimmer's canonical intro shape."""
    quiet = [0.01 * math.sin(2 * math.pi * 5 * i / sr) for i in range(quiet_s * sr)]
    loud = [
        amp * math.sin(2 * math.pi * 10 * i / sr) for i in range(loud_s * sr)
    ]
    return quiet + loud


class TestRms:
    def test_rms_matches_numpy(self, spark):
        samples = quiet_then_loud()
        df = spark.createDataFrame(
            [("f1", SR, samples)], ["path", "sample_rate", "samples"]
        )
        segs = {
            r["seg_idx"]: r["rms_energy"]
            for r in rms_energy_segments(df, segment_seconds=2.0).collect()
        }
        arr = np.array(samples)
        for i in range(5):
            expected = float(np.sqrt(np.mean(arr[i * 200 : (i + 1) * 200] ** 2)))
            assert math.isclose(segs[i], expected, rel_tol=1e-9), i

    def test_segment_bounds(self, spark):
        df = spark.createDataFrame(
            [("f1", SR, quiet_then_loud())], ["path", "sample_rate", "samples"]
        )
        rows = (
            rms_energy_segments(df, segment_seconds=2.0)
            .orderBy("seg_idx")
            .collect()
        )
        assert [r["start_time"] for r in rows] == [0.0, 2.0, 4.0, 6.0, 8.0]
        assert rows[-1]["end_time"] == 10.0


class TestIntroSuggestion:
    def test_threshold_skips_intro_segments(self, spark):
        df = spark.createDataFrame(
            [("f1", SR, quiet_then_loud())], ["path", "sample_rate", "samples"]
        )
        segs = rms_energy_segments(df, segment_seconds=2.0)
        thr = intro_threshold(segs).first()["threshold"]
        # segments 2..4: one quiet (idx 2 covers 4-6s? no: quiet is 0-4s →
        # idx 0,1 quiet; idx 2,3,4 loud) → baseline over idx>=2 is loud RMS
        loud_rms = 1.0 / math.sqrt(2)
        assert math.isclose(thr, 0.3 * loud_rms, rel_tol=1e-6)

    def test_suggested_trim(self, spark):
        df = spark.createDataFrame(
            [("f1", SR, quiet_then_loud())], ["path", "sample_rate", "samples"]
        )
        segs = rms_energy_segments(df, segment_seconds=2.0)
        row = suggest_intro_trim(segs).first()
        # first loud segment starts at 4.0 → suggest 4.0 - 0.5 buffer
        assert row["first_loud_start"] == 4.0
        assert math.isclose(row["suggested_trim"], 3.5)
        assert row["should_trim"] is True

    def test_no_trim_when_loud_from_start(self, spark):
        loud = [math.sin(2 * math.pi * 10 * i / SR) for i in range(10 * SR)]
        df = spark.createDataFrame(
            [("f1", SR, loud)], ["path", "sample_rate", "samples"]
        )
        row = suggest_intro_trim(rms_energy_segments(df, segment_seconds=2.0)).first()
        assert row["first_loud_start"] == 0.0
        # 0 - 0.5 clamps to 0 → below the 1 s minimum → no trim
        assert row["suggested_trim"] == 0.0 and row["should_trim"] is False

    def test_energy_bars_normalized(self, spark):
        df = spark.createDataFrame(
            [("f1", SR, quiet_then_loud())], ["path", "sample_rate", "samples"]
        )
        bars = {
            r["seg_idx"]: r["bar_len"]
            for r in energy_bars(rms_energy_segments(df, segment_seconds=2.0)).collect()
        }
        assert max(bars.values()) == 20  # the max segment gets a full bar
        assert bars[0] < 2  # quiet intro nearly empty
        assert min(bars[i] for i in (2, 3, 4)) >= 19  # loud segments ~full


class TestMultimodalPlumbing:
    def test_decode_audio_fake_end_to_end(self, spark):
        """S2 scan → S5 fake decode → A7 RMS → W1 suggestion: the full
        trimmer pipeline shape over the committed binary fixtures."""
        files = read_binary_files(spark, FIXTURE_AUDIO, glob="*.mp3")
        waves = decode_audio(files, sample_rate=1000)
        rows = waves.select("path", "num_samples", "duration").collect()
        assert len(rows) == 6
        assert all(r["num_samples"] > 0 for r in rows)
        # determinism: same content → same waveform length
        again = {
            r["path"]: r["num_samples"]
            for r in decode_audio(files, sample_rate=1000).collect()
        }
        assert {r["path"]: r["num_samples"] for r in rows} == again
        # fake waveforms are 0.1–0.3 s at sr=1000 → 0.02 s segments give
        # every file the ≥3 segments intro_threshold's skip needs
        segs = rms_energy_segments(waves, segment_seconds=0.02)
        out = suggest_intro_trim(segs)
        assert out.count() == 6  # one suggestion row per file

    def test_decode_audio_real_mode_raises(self, spark):
        files = read_binary_files(spark, FIXTURE_AUDIO, glob="*.mp3").limit(1)
        import pytest as _pytest

        with _pytest.raises(Exception, match="NotImplementedError|librosa"):
            decode_audio(files, fake=False).collect()

    def test_image_features_fake(self, spark):
        files = read_binary_files(spark, FIXTURE_AUDIO, glob="*.mp3")
        feats = image_features(files, feature_dim=8).collect()
        assert len(feats) == 6
        for r in feats:
            assert 64 <= r["width"] <= 319 and len(r["feature"]) == 8
            assert 0.0 <= r["mean_luma"] <= 1.0


    def test_image_resize_fake(self, spark):
        files = read_binary_files(spark, FIXTURE_AUDIO, glob="*.mp3")
        rows = image_resize(files, width=8, height=4).collect()
        assert len(rows) == 6
        for r in rows:
            assert (r["width"], r["height"]) == (8, 4)
            assert len(bytes(r["image"])) == 8 * 4
        # determinism across runs
        again = {r["path"]: bytes(r["image"]) for r in image_resize(files, 8, 4).collect()}
        assert {r["path"]: bytes(r["image"]) for r in rows} == again

    def test_video_frame_sample_fake(self, spark):
        files = read_binary_files(spark, FIXTURE_AUDIO, glob="*.mp3")
        frames = video_frame_sample(files, every_s=0.5)
        rows = frames.collect()
        assert len(rows) >= 6  # at least one frame per file
        per_file = {}
        for r in rows:
            per_file.setdefault(r["path"], []).append(r)
        for path, fr in per_file.items():
            idxs = sorted(f["frame_idx"] for f in fr)
            assert idxs == list(range(len(fr)))  # dense 0..n-1
            ts = {f["frame_idx"]: f["t"] for f in fr}
            assert all(abs(ts[i] - 0.5 * i) < 1e-9 for i in idxs)
            assert len({bytes(f["frame"]) for f in fr}) == len(fr)  # distinct frames

    def test_pdf_pages_fake(self, spark):
        files = read_binary_files(spark, FIXTURE_AUDIO, glob="*.mp3")
        rows = pdf_pages(files).collect()
        assert len(rows) >= 6
        by_file = {}
        for r in rows:
            by_file.setdefault(r["path"], []).append(r)
        assert len(by_file) == 6
        for path, pages in by_file.items():
            nums = sorted(p["page_number"] for p in pages)
            assert nums == list(range(1, len(pages) + 1))  # 1-indexed dense
            for p in pages:
                assert p["text"] and len(p["nikud_map"]) == 8
                assert set(p["nikud_map"]) <= {0, 1}
                (ent,) = p["entities"]
                assert ent["label"] == "WORD" and 0.0 <= ent["score"] <= 1.0

    def test_real_mode_slots_raise(self, spark):
        """Real-mode error contracts on an MP3 payload: image resize is
        still a cv2/PIL slot (NotImplementedError); video frame sampling
        requires an ffmpeg binary on PATH (NotImplementedError here —
        the container ships none; with ffmpeg installed it would fail on
        the non-video payload instead); PDF extraction rejects the
        non-PDF payload outright (ValueError)."""
        files = read_binary_files(spark, FIXTURE_AUDIO, glob="*.mp3").limit(1)
        import pytest as _pytest

        for op, pat in (
            (lambda: image_resize(files, fake=False).collect(), "NotImplementedError|requires"),
            # without the binary: the NotImplementedError names ffmpeg;
            # with it: the mp3 payload has no video stream, so the
            # operator raises ValueError carrying ffmpeg's own stderr —
            # both contracts mention ffmpeg explicitly
            (lambda: video_frame_sample(files, fake=False).collect(), "ffmpeg"),
            (lambda: pdf_pages(files, fake=False).collect(), "not a PDF"),
        ):
            with _pytest.raises(Exception, match=pat):
                op()


class TestWavEncode:
    def test_encode_wav_is_real_riff(self, spark, tmp_path):
        """S6 encode half is NOT a stub: output parses with the stdlib
        wave reader and round-trips samples to 16-bit precision."""
        import math
        import wave
        from io import BytesIO

        from hebrew_tutor_data_pipeline_spark.operators.multimodal import encode_wav

        sr = 8000
        samples = [math.sin(2 * math.pi * 440 * i / sr) * 0.5 for i in range(400)]
        df = spark.createDataFrame(
            [("a.mp3", sr, samples)], "path string, sample_rate int, samples array<float>"
        )
        row = encode_wav(df).collect()[0]
        assert row["num_samples"] == 400
        with wave.open(BytesIO(bytes(row["wav"])), "rb") as w:
            assert w.getnchannels() == 1
            assert w.getframerate() == sr
            assert w.getsampwidth() == 2
            assert w.getnframes() == 400
            import struct

            decoded = struct.unpack("<400h", w.readframes(400))
        for orig, got in zip(samples, decoded):
            assert abs(orig - got / 32767) < 2 / 32767

    def test_decode_then_encode_pipeline(self, spark):
        """S5 (fake decode) -> S6 (real encode) composes end-to-end."""
        from hebrew_tutor_data_pipeline_spark.operators.multimodal import (
            decode_audio,
            encode_wav,
        )
        from hebrew_tutor_data_pipeline_spark.plans.catalog_hebrew import (
            FIXTURE_AUDIO_TREE,
        )
        from hebrew_tutor_data_pipeline_spark.sources.readers import read_binary_files

        files = read_binary_files(spark, FIXTURE_AUDIO_TREE, glob="*.mp3")
        wavs = encode_wav(decode_audio(files)).collect()
        assert len(wavs) == 6
        for r in wavs:
            assert bytes(r["wav"])[:4] == b"RIFF"
            assert r["num_samples"] > 0


def test_trimmer_pipeline_e2e_roundtrip(spark):
    """Entry point 2 composed: detect intro -> trim bytes in place with
    backup -> restore. Restored lengths must equal the originals and
    trims must have actually shortened the working copies."""
    from hebrew_tutor_data_pipeline_spark.plans.catalog import CATALOG

    rows = CATALOG["trimmer_pipeline_e2e"].spark(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 6
    for r in rows:
        assert r.restored_length == r.orig_length          # backup proven
        assert r.restored_md5 == r.orig_md5                # byte-exact restore
        if r.should_trim:
            assert r.trimmed_length < r.orig_length        # mutation proven
            assert r.trimmed_md5 != r.orig_md5
            assert r.suggested_trim > 1.0                  # P5 gate


class TestRealMediaTier:
    """Real decoded-byte assertions (the `-m realmedia` tier): the WAV
    paths use only the stdlib codecs so they run everywhere; the ffmpeg
    path runs wherever the binary exists."""

    realmedia = True  # marker applied via pytestmark below

    def test_wav_real_decoded_bytes_roundtrip(self, spark, tmp_path):
        """Write REAL 16-bit PCM WAV files to disk with stdlib wave, scan
        them with binaryFile, decode with decode_audio(fake=False), and
        assert the exact int16 sample values come back — actual decoded
        bytes, no fake tier involved."""
        import wave

        import pytest as _pytest

        sr = 8000
        pcm = np.array([0, 1000, -1000, 32767, -32767, 123], dtype="<i2")
        d = tmp_path / "wavs"
        d.mkdir()
        with wave.open(str(d / "a.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        # stereo variant: channel mean downmix
        stereo = np.stack([pcm, pcm * 0]).T.reshape(-1).astype("<i2")
        with wave.open(str(d / "b.wav"), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(stereo.tobytes())

        files = read_binary_files(spark, str(d), glob="*.wav")
        rows = {
            Path(r["path"]).name: r
            for r in decode_audio(files, fake=False).collect()
        }
        a = rows["a.wav"]
        assert a["sample_rate"] == sr and a["num_samples"] == len(pcm)
        recovered = np.array([round(s * 32767) for s in a["samples"]], dtype="<i2")
        assert (recovered == pcm).all()
        b = rows["b.wav"]
        mean = (pcm.astype("float64") + 0.0) / 2  # second channel is zeros
        assert np.allclose(np.array(b["samples"]) * 32767.0, mean)

    def test_encode_then_real_decode_roundtrip(self, spark):
        """encode_wav (real RIFF writer) → decode_audio(fake=False) (real
        RIFF reader) must round-trip the quantized samples bit-exactly."""
        from hebrew_tutor_data_pipeline_spark.operators.multimodal import encode_wav

        sr = 4000
        samples = [math.sin(2 * math.pi * 7 * i / sr) * 0.8 for i in range(400)]
        df = spark.createDataFrame(
            [("x.wav", sr, samples)], "path string, sample_rate int, samples array<double>"
        )
        wav_row = encode_wav(df).collect()[0]
        back = decode_audio(
            spark.createDataFrame(
                [(wav_row["path"], bytearray(wav_row["wav"]))],
                "path string, content binary",
            ),
            fake=False,
        ).collect()[0]
        assert back["sample_rate"] == sr
        q = [round(max(-1.0, min(1.0, s)) * 32767) / 32767.0 for s in samples]
        # WAVEFORM_SCHEMA carries samples as float32: compare bit-exactly
        # at that precision (the int16 PCM itself round-trips exactly —
        # float32 resolution ~1e-7 is far below the 1/32767 quantum)
        assert (
            np.asarray(back["samples"], dtype="float32")
            == np.asarray(q, dtype="float32")
        ).all()
        recovered = np.array(
            [round(float(s) * 32767) for s in back["samples"]], dtype="<i2"
        )
        expected = np.array([round(s * 32767) for s in q], dtype="<i2")
        assert (recovered == expected).all()

    def test_video_frames_real_ffmpeg(self, spark, tmp_path):
        """U9 real branch: only runs where an ffmpeg binary exists (the
        build container has none — the test documents and exercises the
        subprocess contract wherever it can actually run)."""
        import shutil
        import subprocess

        import pytest as _pytest

        if shutil.which("ffmpeg") is None:
            _pytest.skip("ffmpeg binary not installed")
        mp4 = tmp_path / "t.mp4"
        subprocess.run(
            [
                "ffmpeg", "-hide_banner", "-loglevel", "error",
                "-f", "lavfi", "-i", "testsrc=duration=3:size=64x64:rate=5",
                str(mp4),
            ],
            check=True,
        )
        files = read_binary_files(spark, str(tmp_path), glob="*.mp4")
        rows = video_frame_sample(files, every_s=1.0, fake=False).collect()
        assert len(rows) >= 2
        for r in rows:
            assert bytes(r["frame"][:2]) == b"\xff\xd8"  # real JPEG SOI


import pytest as _pytest_mod

TestRealMediaTier = _pytest_mod.mark.realmedia(TestRealMediaTier)


def _build_real_pdf(page_texts, compress=True):
    """Hand-assemble a minimal but VALID two-object-per-page PDF (catalog,
    pages tree, page + Flate content stream per page, correct xref) —
    real bytes any conforming reader opens."""
    import zlib

    objs = []  # (obj_num, body_bytes)
    n_pages = len(page_texts)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append((1, f"<< /Type /Catalog /Pages 2 0 R >>".encode()))
    objs.append(
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    )
    for i, text in enumerate(page_texts):
        page_num, stream_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            (
                page_num,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Contents {stream_num} 0 R >>"
                ).encode(),
            )
        )
        esc = text.encode("latin-1").replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
        content = b"BT /F1 12 Tf 72 720 Td (" + esc + b") Tj ET"
        if compress:
            data = zlib.compress(content)
            body = (
                f"<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n".encode()
                + data
                + b"\nendstream"
            )
        else:
            body = (
                f"<< /Length {len(content)} >>\nstream\n".encode()
                + content
                + b"\nendstream"
            )
        objs.append((stream_num, body))

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num, body in objs:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for num, _ in objs:
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


class TestRealPdfTier:
    """S11 real extraction path (stdlib zlib + content-stream parsing):
    page count, per-page text, and the true nikud char-class map come
    from actual PDF bytes, not the digest fake."""

    def test_real_pdf_text_extraction(self, spark, tmp_path):
        texts = ["Hello (escaped) world", "Second page text"]
        pdf_bytes = _build_real_pdf(texts, compress=True)
        d = tmp_path / "pdfs"
        d.mkdir()
        (d / "doc.pdf").write_bytes(pdf_bytes)

        files = read_binary_files(spark, str(d), glob="*.pdf")
        rows = sorted(
            pdf_pages(files, fake=False).collect(), key=lambda r: r["page_number"]
        )
        assert [r["page_number"] for r in rows] == [1, 2]
        assert rows[0]["text"] == "Hello (escaped) world"
        assert rows[1]["text"] == "Second page text"
        # page_image carries the REAL decoded content stream
        assert b"Hello \\(escaped\\) world" in bytes(rows[0]["page_image"])
        assert rows[0]["entities"] == []  # OCR/NER slot stays external
        assert all(v == 0 for v in rows[0]["nikud_map"])  # no Hebrew marks

    def test_real_pdf_uncompressed_and_tj_arrays(self, spark, tmp_path):
        pdf_bytes = _build_real_pdf(["plain stream"], compress=False)
        # splice in a TJ-array operator to cover the kerned-text form
        pdf_bytes = pdf_bytes.replace(
            b"(plain stream) Tj", b"[(pla) -20 (in)] TJ (stream) Tj"
        )
        d = tmp_path / "pdfs2"
        d.mkdir()
        (d / "u.pdf").write_bytes(pdf_bytes)
        rows = pdf_pages(
            read_binary_files(spark, str(d), glob="*.pdf"), fake=False
        ).collect()
        assert len(rows) == 1
        assert rows[0]["text"] == "plain stream"  # stream order: TJ run, then Tj

    def test_contents_array_form(self, spark, tmp_path):
        """The /Contents value may be an ARRAY of stream references —
        both forms are standard; array streams concatenate in order."""
        pdf_bytes = _build_real_pdf(["part one"], compress=True)
        # rewrite the page's /Contents to array form referencing the
        # same stream object twice (concatenation in order)
        pdf_bytes = pdf_bytes.replace(
            b"/Contents 4 0 R", b"/Contents [4 0 R 4 0 R]"
        )
        d = tmp_path / "pdfs3"
        d.mkdir()
        (d / "arr.pdf").write_bytes(pdf_bytes)
        rows = pdf_pages(
            read_binary_files(spark, str(d), glob="*.pdf"), fake=False
        ).collect()
        assert len(rows) == 1
        assert rows[0]["text"] == "part one part one"

    def test_non_pdf_payload_raises(self, spark, tmp_path):
        import pytest as _pytest

        d = tmp_path / "bad"
        d.mkdir()
        (d / "x.pdf").write_bytes(b"not a pdf at all")
        with _pytest.raises(Exception, match="not a PDF|ValueError"):
            pdf_pages(
                read_binary_files(spark, str(d), glob="*.pdf"), fake=False
            ).collect()


TestRealPdfTier = _pytest_mod.mark.realmedia(TestRealPdfTier)


class TestSpectralFeatures:
    """spectral_features: the numpy-FFT dominant bin must agree with an
    independently-coded naive DFT on arbitrary sines, short inputs are
    dropped, and the frequency arithmetic is exact."""

    def _naive_dom(self, x, half=512):
        n = len(x)
        best = (-1.0, 0)
        tot = 0.0
        for k in range(1, half + 1):
            re = sum(x[i] * math.cos(2 * math.pi * k * i / n) for i in range(n))
            im = sum(x[i] * math.sin(2 * math.pi * k * i / n) for i in range(n))
            mag = math.hypot(re, im)
            tot += mag
            if mag > best[0]:
                best = (mag, k)
        return best[1], best[0], tot

    def test_matches_naive_dft(self, spark):
        from hebrew_tutor_data_pipeline_spark.operators.audio import (
            spectral_features,
        )

        nfft = 256
        rows = []
        expect = {}
        for j, (freq, phase) in enumerate(
            [(430.0, 0.0), (1202.5, 1.1), (3333.0, 2.7), (7001.0, 0.4)]
        ):
            x = [
                float(np.float32(math.sin(2 * math.pi * freq * i / 16000 + phase)))
                for i in range(nfft)
            ]
            rows.append((f"f{j}", 16000, x))
            dom, mag, tot = self._naive_dom(x, half=nfft // 2)
            expect[f"f{j}"] = (
                dom,
                dom * 16000 / nfft,
                int(math.floor(1000.0 * mag / tot + 0.5)),
            )
        df = spark.createDataFrame(rows, "path string, sample_rate int, samples array<float>")
        got = {
            r["path"]: (r["dominant_bin"], r["dominant_freq_hz"], r["tonality_milli"])
            for r in spectral_features(df, nfft=nfft).collect()
        }
        assert got == expect

    def test_short_inputs_dropped(self, spark):
        from hebrew_tutor_data_pipeline_spark.operators.audio import (
            spectral_features,
        )

        df = spark.createDataFrame(
            [("short", 16000, [0.1] * 100), ("ok", 16000, [0.1] * 300)],
            "path string, sample_rate int, samples array<float>",
        )
        out = spectral_features(df, nfft=256).collect()
        assert [r["path"] for r in out] == ["ok"]
        assert out[0]["num_samples"] == 300
