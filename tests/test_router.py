"""Byte-sniffing format router (extractor/router.py).

Reference parity target: the extension-based converter dispatch
(app/core/document_converter.py:285-290), re-expressed as content
sniffing over an opaque binary column with per-document containment
(document_converter.py:95-118).
"""
import json

import pytest

from extractor.docx import synth_docx_bytes
from extractor.pdf import text_to_pdf_bytes
from extractor.router import extract_any, route_payload, sniff_format


# --- sniffing --------------------------------------------------------------

@pytest.mark.parametrize(
    "payload,expected",
    [
        (None, "empty"),
        (b"", "empty"),
        (b"   \n\t ", "empty"),
        (b"%PDF-1.4 junk", "pdf"),
        (text_to_pdf_bytes("hello"), "pdf"),
        (synth_docx_bytes(1), "docx"),
        (b"\x89PNG\r\n\x1a\n\x00\x00", "image"),
        (b"\xff\xd8\xff\xe0 jpeg-ish", "image"),
        (b"GIF89a\x00\x00", "image"),
        (b"\xff\xfe\x00\x00 utf32-ish", "binary"),
        (b"<html><body>hi</body></html>", "html"),
        (b"  <!DOCTYPE html><p>x</p>", "html"),
        (b"<h2>heading only</h2>", "html"),
        (b'{"pages": [{"page": 1, "blocks": []}]}', "layout_json"),
        (b'{"not_pages": 1}', "text"),  # JSON without layout shape
        (b"[1, 2, 3]", "text"),
        (b"just plain prose, 3 < 5 but no tags", "text"),
        ("already a str payload", "text"),
        (b"{broken json", "text"),
    ],
)
def test_sniff_format(payload, expected):
    assert sniff_format(payload) == expected


def test_sniff_zip_without_ooxml_is_zip():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data.txt", "x")
    assert sniff_format(buf.getvalue()) == "zip"


def test_sniff_truncated_zip_is_binary():
    assert sniff_format(b"PK\x03\x04garbage-not-a-zip") == "binary"


def test_html_mention_deep_in_text_stays_text():
    # The tag scan covers only the first 4 KiB window.
    payload = ("x" * 5000 + " later mention of <p> tag").encode()
    assert sniff_format(payload) == "text"


# --- routing ---------------------------------------------------------------

def test_route_html_through_kernel():
    out = route_payload(b"<h1>T</h1><p>body &amp; tail</p>")
    assert out["format"] == "html"
    assert out["extracted_text"] == "# T\n\nbody & tail"
    assert out["error"] is None


def test_route_docx_counts_flow_through():
    # synth mode 2 is the header-table document
    out = route_payload(synth_docx_bytes(2))
    assert out["format"] == "docx"
    assert out["tables_count"] == 1
    assert "| hA | hB |" in out["extracted_text"]


def test_route_pdf_roundtrip():
    out = route_payload(text_to_pdf_bytes("alpha\nbeta"))
    assert out["format"] == "pdf"
    # XY-cut merges vertically-adjacent lines of one block with a space
    assert out["extracted_text"] == "alpha beta"
    assert out["error"] is None


def test_route_layout_json():
    doc = {"pages": [{"page": 1, "width": 612.0, "blocks": [
        {"x": 72.0, "y": 0.0, "w": 90.0, "h": 12.0, "size": 10.0,
         "text": "hello layout"}]}]}
    out = route_payload(json.dumps(doc).encode())
    assert out["format"] == "layout_json"
    assert out["extracted_text"] == "hello layout"


def test_route_text_normalizes_line_endings():
    out = route_payload(b"a\r\nb\rc")
    assert out["extracted_text"] == "a\nb\nc"


def test_route_unsupported_contained():
    out = route_payload(b"\x00\x01\x02")
    assert out["format"] == "binary"
    assert out["extracted_text"] is None
    assert out["error"].startswith("unsupported_format")


def test_route_empty_contained():
    out = route_payload(None)
    assert out == {
        "format": "empty", "extracted_text": None, "tables_count": 0,
        "math_count": 0, "images_count": 0, "error": "empty_payload",
    }


# --- Spark plumbing --------------------------------------------------------

def test_extract_any_map_only_plan_and_rows(spark):
    rows = [
        (0, bytearray(b"<p>html doc</p>")),
        (1, bytearray(synth_docx_bytes(6))),
        (2, bytearray(text_to_pdf_bytes("pdf body"))),
        (3, bytearray(b"plain body")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    routed = extract_any(df)
    # map-only: no Exchange between the scan and the Python stage
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["doc_id"]: r.asDict() for r in routed.collect()}
    assert got[0]["format"] == "html" and got[0]["extracted_text"] == "html doc"
    assert got[1]["format"] == "docx"
    assert got[2]["extracted_text"] == "pdf body"
    assert got[3]["format"] == "text"
    assert got[4]["format"] == "empty" and got[4]["error"] == "empty_payload"


def test_route_image_payloads():
    """Images decode for real (PNG/BMP/baseline JPEG) and count as
    media; corrupt bytes become contained error rows."""
    from extractor.imagecodec import bmp_encode, png_encode
    from extractor.jpegcodec import jpeg_encode

    out = route_payload(png_encode(4, 3, bytes(36), 2))
    assert out["format"] == "image" and out["error"] is None
    assert out["images_count"] == 1 and out["extracted_text"] is None
    out = route_payload(bmp_encode(2, 2, bytes(12)))
    assert out["format"] == "image" and out["error"] is None
    assert out["images_count"] == 1
    out = route_payload(jpeg_encode(4, 3, bytes(36), 3, 90))
    assert out["format"] == "image" and out["error"] is None
    assert out["images_count"] == 1
    out = route_payload(b"\xff\xd8\xff\xe0 not a real jpeg")
    assert out["format"] == "image"
    assert out["error"] is not None and "JPEG" in out["error"]
    good = bytearray(png_encode(4, 3, bytes(36), 2))
    good[-5] ^= 0xFF  # corrupt a CRC
    out = route_payload(bytes(good))
    assert out["format"] == "image" and out["error"] is not None


def test_pdf_images_count():
    """PDF images_count = embedded /Subtype /Image XObjects (A3
    statistics parity for scanned docs); text extraction unaffected."""
    from extractor.jpegcodec import jpeg_encode
    from extractor.pdf import text_to_pdf_bytes
    from extractor.router import route_payload

    base = text_to_pdf_bytes("with image")
    assert route_payload(base)["images_count"] == 0
    jpg = jpeg_encode(4, 4, bytes(16), 1)
    obj = (
        b"900 0 obj\n<< /Type /XObject /Subtype /Image /Width 4"
        b" /Height 4 /BitsPerComponent 8 /Filter /DCTDecode"
        b" /Length %d >>\nstream\n" % len(jpg)
    ) + jpg + b"\nendstream\nendobj\n"
    pdf = base.replace(b"%%EOF", obj + b"%%EOF")
    r = route_payload(pdf)
    assert r["images_count"] == 1 and r["error"] is None
    assert r["extracted_text"].startswith("with image")
