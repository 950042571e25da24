"""S9 PDF export: deterministic stdlib PDF 1.4 writer (extractor/pdf.py).

Reference analogue: scripts/convert_docx_to_pdf.py:32-66 (Word COM export,
unavailable off-Windows) — here a byte-deterministic render sink.
"""
from extractor.pdf import (
    LINES_PER_PAGE,
    WRAP_COLS,
    is_valid_pdf,
    n_lines,
    n_pages,
    text_to_pdf_bytes,
    wrap_lines,
)


def test_structurally_valid_and_deterministic():
    t = "\n".join(f"line {i}: " + "a" * i for i in range(200))
    pdf = text_to_pdf_bytes(t)
    assert pdf == text_to_pdf_bytes(t)
    assert is_valid_pdf(pdf)
    assert pdf.startswith(b"%PDF-1.4\n") and pdf.endswith(b"%%EOF\n")


def test_xref_offsets_point_at_objects():
    pdf = text_to_pdf_bytes("hello\nworld")
    xref_at = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    xref = pdf[xref_at:].split(b"trailer")[0].splitlines()
    # entries after "xref" and "0 N": each offset must land on "N 0 obj"
    offsets = [
        int(line.split()[0]) for line in xref[2:] if line.endswith(b"n ")
    ]
    for i, off in enumerate(offsets, start=1):
        assert pdf[off:].startswith(b"%d 0 obj" % i), i


def test_counts_read_back_from_bytes_match_wrap_math():
    from extractor.pdf import pdf_to_text

    # includes adversarial text containing the PDF operators themselves —
    # substring counting over the bytes would overcount these
    for t in (
        "", "x", "a" * 91, "l1\n\nl3",
        "b" * (WRAP_COLS * LINES_PER_PAGE + 1),
        "contains ) Tj inside a line",
        "and /Type /Page too",
    ):
        pages = pdf_to_text(text_to_pdf_bytes(t))
        assert sum(len(p) for p in pages) == n_lines(t), repr(t[:20])
        assert len(pages) == n_pages(t), repr(t[:20])


def test_wrap_math():
    assert wrap_lines("") == [""]
    assert n_lines("") == 1 and n_pages("") == 1
    assert n_lines("a" * WRAP_COLS) == 1
    assert n_lines("a" * (WRAP_COLS + 1)) == 2
    # "x\n"*108 -> 108 x-lines + trailing "" = 109 lines -> 3 pages of 54
    assert n_pages("x\n" * (LINES_PER_PAGE * 2)) == 3
    assert (
        n_lines("x\n" * LINES_PER_PAGE) == LINES_PER_PAGE + 1
    )  # split yields trailing ""


def test_escaping_and_unicode_degradation():
    pdf = text_to_pdf_bytes("par(en)s \\ back — ünïcode ✓")
    assert is_valid_pdf(pdf)
    assert b"\\(en\\)" in pdf
    assert b"\\\\ back" in pdf
    assert b"?" in pdf  # non-latin1 degraded, render never raises


def test_stream_lengths_exact():
    pdf = text_to_pdf_bytes("abc\ndef")
    at = pdf.find(b"/Length ")
    declared = int(pdf[at + 8 : pdf.find(b" ", at + 8)])
    start = pdf.find(b"stream\n", at) + len(b"stream\n")
    assert pdf[start + declared : start + declared + len(b"\nendstream")] == b"\nendstream"


def test_pdf_to_text_roundtrip_exact():
    from extractor.pdf import pdf_to_text

    for t in (
        "hello (world) \\ test\n" + "x" * 200 + "\n\nlast",
        "",
        "\n".join("line %d (%s) \\" % (i, "a" * (i % 120)) for i in range(300)),
    ):
        pages = pdf_to_text(text_to_pdf_bytes(t))
        assert [l for p in pages for l in p] == wrap_lines(t), repr(t[:30])
        assert len(pages) == n_pages(t)


def test_pdf_to_text_rejects_general_pdfs():
    import pytest

    from extractor.pdf import pdf_to_text

    with pytest.raises(NotImplementedError):
        pdf_to_text(b"%PDF-1.5\nx /Filter /FlateDecode y")
    with pytest.raises(ValueError):
        pdf_to_text(b"not a pdf")


def test_layout_decodes_own_pdf_bytes():
    """decode_layout consumes REAL PDF bytes (the engine's uncompressed
    subset) and the XY-cut linearizer reads them in order."""
    from extractor.layout import decode_layout, linearize_layout

    doc = decode_layout(text_to_pdf_bytes("alpha\nbeta\n\ngamma"))
    r = linearize_layout(doc)
    assert r.error is None
    assert r.n_pages == 1 and r.n_blocks == 3  # blank line emits no block
    assert r.text.split() == ["alpha", "beta", "gamma"]  # reading order
