"""Generate the committed deterministic PDF fixtures (tests/fixtures/pdf_tree).

Real, openable single-generation PDFs (header, objects, xref, trailer)
whose page content streams exercise every branch of the stdlib extractor
(`operators/multimodal._pdf_extract_pages`):

- literal `(..) Tj` strings (latin-1 text),
- UTF-16BE hex strings `<FEFF..> Tj` carrying Hebrew with nikud/dagesh
  (the PDF text-string encoding, ISO 32000-1 §7.9.2.2 — the fixture
  font's code space is declared identity so show-strings use it too),
- `[..] TJ` arrays interleaving literal and hex runs with kern numbers,
- FlateDecode vs plain streams,
- a page whose /Contents is an ARRAY of stream refs.

Byte-deterministic (no timestamps, no randomness): run once, commit the
outputs; oracles replay extraction from the committed bytes.

Reference behavior modeled: `scripts/convert_hebrew_grammar_pdf.py:34-86`
renders pages and OCRs them to per-page Hebrew text; here the committed
fixture IS the page text source so the downstream NLP is checkable.
"""

from __future__ import annotations

import zlib
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "pdf_tree"


def hexstr(s: str) -> str:
    """UTF-16BE text string with BOM, PDF hex-string syntax."""
    return "<FEFF" + s.encode("utf-16-be").hex().upper() + ">"


# Hebrew with diacritics (nikud U+05B0-U+05C7, dagesh U+05BC inside):
BERESHIT = "בְּרֵאשִׁית"  # בְּרֵאשִׁית
SHEMOT = "שְׁמוֹת"  # שְׁמוֹת
TEHILLIM = "תְּהִלִּים"  # תְּהִלִּים
DAGESH = "דָּגֵשׁ"  # דָּגֵשׁ
SHVA = "שְׁוָא"  # שְׁוָא
QAMATS = "קָמַץ"  # קָמַץ
PATACH = "פַּתָּח"  # פַּתָּח
TORAH = "תּוֹרָה"  # תּוֹרָה (not in gazetteer)


def content(ops: list[str]) -> bytes:
    body = "BT /F1 12 Tf 72 720 Td " + " ".join(ops) + " ET"
    return body.encode("latin-1")


def build_pdf(pages: list[list[bytes] | bytes], flate: bool = True) -> bytes:
    """Assemble a valid PDF. Each page is one content stream (bytes) or a
    list of streams (emitted as a /Contents array)."""
    objs: list[bytes] = []  # 1-indexed bodies, without "N 0 obj"/"endobj"

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    stream_ids: list[list[int]] = []
    for page in pages:
        streams = page if isinstance(page, list) else [page]
        ids = []
        for data in streams:
            if flate:
                payload = zlib.compress(data, 9)
                head = f"<< /Length {len(payload)} /Filter /FlateDecode >>"
            else:
                payload = data
                head = f"<< /Length {len(payload)} >>"
            ids.append(
                add(head.encode() + b"\nstream\n" + payload + b"\nendstream")
            )
        stream_ids.append(ids)

    page_ids = []
    pages_id = len(objs) + len(pages) + 1  # pages node comes after page objs
    for ids in stream_ids:
        if len(ids) == 1:
            contents = f"/Contents {ids[0]} 0 R"
        else:
            contents = "/Contents [" + " ".join(f"{i} 0 R" for i in ids) + "]"
        page_ids.append(
            add(
                (
                    f"<< /Type /Page /Parent {pages_id} 0 R "
                    f"/MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 {font} 0 R >> >> "
                    f"{contents} >>"
                ).encode()
            )
        )
    kids = " ".join(f"{i} 0 R" for i in page_ids)
    assert add(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>".encode()
    ) == pages_id
    catalog = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root {catalog} 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    genesis = build_pdf(
        [
            content(
                [
                    "(Genesis grammar notes: the book) Tj",
                    f"{hexstr(BERESHIT)} Tj",
                    f"[(opens with a ) -250 {hexstr(DAGESH)} (, a doubling dot.)] TJ",
                ]
            ),
            content(
                [
                    f"[{hexstr(SHVA)} -200 ( and ) -200 {hexstr(QAMATS)}] TJ",
                    "(mark vowel length; see also) Tj",
                    f"{hexstr(PATACH)} Tj",
                ]
            ),
        ],
        flate=True,
    )
    (OUT / "genesis_notes.pdf").write_bytes(genesis)

    # /Contents ARRAY page, mixed plain streams
    exodus = build_pdf(
        [
            [
                content(["(Exodus, in Hebrew) Tj", f"{hexstr(SHEMOT)} Tj"]),
                content(
                    [f"[(names the book; ) -100 {hexstr(TORAH)} (\\(Torah\\) scroll)] TJ"]
                ),
            ]
        ],
        flate=False,
    )
    (OUT / "exodus_notes.pdf").write_bytes(exodus)

    psalms = build_pdf(
        [
            content([f"(Psalms praise collection) Tj {hexstr(TEHILLIM)} Tj"]),
            content(
                [
                    f"[{hexstr(QAMATS)} -150 ( under the first letter of )] TJ",
                    f"{hexstr(TEHILLIM)} Tj",
                ]
            ),
            content(["(A page with no Hebrew at all: 150 psalms.) Tj"]),
        ],
        flate=True,
    )
    (OUT / "psalms_notes.pdf").write_bytes(psalms)

    for p in sorted(OUT.glob("*.pdf")):
        print(p.name, len(p.read_bytes()), "bytes")


if __name__ == "__main__":
    main()
