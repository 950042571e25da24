"""S9 PDF export sink — text → deterministic PDF 1.4 bytes, stdlib only.

Reference parity: ``scripts/convert_docx_to_pdf.py:32-66`` exports DOCX to
PDF through Windows Word COM (``doc.SaveAs2(..., FileFormat=17)``) one file
at a time.  That renderer is unavailable off-Windows by construction, so
the Spark-first analogue renders extracted text to PDF directly: a minimal
but valid PDF 1.4 writer (catalog/pages/font objects, per-page content
streams, correct xref byte offsets) producing DETERMINISTIC bytes — the
render becomes an Arrow-batchable column transform instead of a COM
round-trip per document, and the sink is just a binary column write.

Fidelity scope (honest): Helvetica-only, fixed 10 pt type, hard character
wrap — a faithful *pagination and byte-format* model, not a typography
model.  What IS exact and testable: the PDF is structurally valid (xref
offsets, stream lengths), byte-deterministic, and its line/page counts are
pure functions of the input text that a SQL oracle reproduces.
"""
from __future__ import annotations

import math

WRAP_COLS = 90        # hard wrap width, characters
LINES_PER_PAGE = 54   # 720pt usable height / 12pt leading, floor
PAGE_W, PAGE_H = 612, 792  # US Letter, points
MARGIN_X, TOP_Y = 72, 720
FONT_SIZE, LEADING = 10, 12


def wrap_lines(text: str) -> list[str]:
    """Deterministic hard wrap: each source line (split on ``\\n``) becomes
    ``max(1, ceil(len/WRAP_COLS))`` chunks of WRAP_COLS characters.  The
    count (not the chunk content) is SQL-expressible — the oracle's hook."""
    out: list[str] = []
    for line in text.split("\n"):
        if not line:
            out.append("")
            continue
        for i in range(0, len(line), WRAP_COLS):
            out.append(line[i : i + WRAP_COLS])
    return out


def n_lines(text: str) -> int:
    return sum(
        max(1, math.ceil(len(line) / WRAP_COLS)) for line in text.split("\n")
    )


def n_pages(text: str) -> int:
    return max(1, math.ceil(n_lines(text) / LINES_PER_PAGE))


def _pdf_escape(line: str) -> bytes:
    """PDF literal-string escaping; non-Latin-1 chars degrade to '?'
    (Helvetica/WinAnsi has no wider repertoire — documented scope)."""
    b = line.encode("latin-1", errors="replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def text_to_pdf_bytes(text: str) -> bytes:
    """Render *text* to a complete, valid, deterministic PDF 1.4 file."""
    lines = wrap_lines(text)
    pages = [
        lines[i : i + LINES_PER_PAGE]
        for i in range(0, len(lines), LINES_PER_PAGE)
    ] or [[]]

    # object numbering: 1 catalog, 2 pages, 3 font,
    # 4..3+N page objects, 4+N..3+2N content streams
    n = len(pages)
    objects: list[bytes] = []
    kids = " ".join(f"{4 + i} 0 R" for i in range(n))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i in range(n):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {4 + n + i} 0 R >>"
            ).encode()
        )
    for page in pages:
        body = b"BT /F1 %d Tf %d %d Td %d TL\n" % (
            FONT_SIZE, MARGIN_X, TOP_Y, LEADING,
        )
        for j, line in enumerate(page):
            body += b"(" + _pdf_escape(line) + b") Tj T*\n"
        body += b"ET"
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body)
        )

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the free head
    for idx, obj in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n%s\nendobj\n" % (idx, obj)
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(buf)


def pdf_to_text(payload: bytes) -> list[list[str]]:
    """Decode text back OUT of an uncompressed PDF (the byte-decode side of
    the T1/layout axis, real for the uncompressed-stream subset): returns
    pages as lists of lines, parsed from ``(...) Tj`` show-text operators
    inside ``stream``/``endstream`` blocks with PDF literal-string
    unescaping.  General PDFs with compressed streams raise
    ``NotImplementedError`` (a codec stub, same contract as image decode);
    anything non-PDF raises ``ValueError``."""
    if payload is None:
        raise ValueError("null payload")
    if not bytes(payload).startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    payload = bytes(payload)
    if b"/Filter" in payload:
        raise NotImplementedError(
            "compressed PDF streams require a codec library not available "
            "in this environment (only uncompressed streams decode)"
        )
    pages: list[list[str]] = []
    found_text = False
    pos = 0
    while True:
        s = payload.find(b"stream\n", pos)
        if s < 0:
            break
        if payload[s - 3 : s] == b"end":  # matched inside "endstream\n"
            pos = s + len(b"stream\n")
            continue
        e = payload.find(b"\nendstream", s)
        if e < 0:
            break  # torn stream: stop rather than loop
        body = payload[s + len(b"stream\n") : e]
        pos = e + len(b"\nendstream")
        if b"BT" not in body:
            continue
        found_text = True
        lines: list[str] = []
        i = 0
        while True:
            i = body.find(b"(", i)
            if i < 0:
                break
            # scan to the matching unescaped ')'
            j, chunk = i + 1, bytearray()
            while j < len(body):
                c = body[j : j + 1]
                if c == b"\\" and j + 1 < len(body):
                    chunk += body[j + 1 : j + 2]
                    j += 2
                    continue
                if c == b")":
                    break
                chunk += c
                j += 1
            if body[j + 1 : j + 4].strip()[:2] == b"Tj":
                lines.append(chunk.decode("latin-1"))
            i = j + 1
        pages.append(lines)
    if not found_text:
        raise ValueError("no text content streams found in PDF")
    return pages


def is_valid_pdf(payload: bytes) -> bool:
    """Structural check used by the export query's ``valid`` column: header
    + EOF marker + a startxref offset that actually points at the xref."""
    if not (payload.startswith(b"%PDF-1.4\n") and payload.endswith(b"%%EOF\n")):
        return False
    try:
        tail = payload.rsplit(b"startxref\n", 1)[1]
        at = int(tail.split(b"\n", 1)[0])
        return payload[at : at + 5] == b"xref\n"
    except (IndexError, ValueError):
        return False
