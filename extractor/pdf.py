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

Decoder scope (``pdf_to_text``): uncompressed AND ``/FlateDecode`` content
streams (stdlib ``zlib``), literal strings with full PDF escape semantics
(octal, ``\\n``-family, line continuations, balanced parens), hex strings,
and the ``Tj`` / ``'`` / ``"`` / ``TJ`` show-text operators — i.e. the text
layer of the overwhelming majority of real-world PDFs.  Still out of scope
(raise ``NotImplementedError``): non-Flate filters (DCT/JPX images, LZW,
CCITT), filter *chains*, and predictor-coded streams.
"""
from __future__ import annotations

import math
import re
import zlib

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


def text_to_pdf_bytes(text: str, compress: bool = False) -> bytes:
    """Render *text* to a complete, valid, deterministic PDF 1.4 file.

    ``compress=True`` Flate-compresses each page content stream
    (``/Filter /FlateDecode``, fixed zlib level → still deterministic);
    the default stays uncompressed so the s9 oracle's byte-length math
    remains SQL-expressible."""
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
        if compress:
            body = zlib.compress(body, 6)
            objects.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(body), body)
            )
        else:
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


_ESCAPE_MAP = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
}


def _parse_literal(body: bytes, i: int) -> tuple[bytes, int]:
    """Parse a PDF literal string starting at ``body[i] == '('``.  Full
    spec semantics: balanced unescaped parens nest, ``\\n``-family and
    3-digit octal escapes decode, a backslash before a real EOL is a line
    continuation (both bytes dropped).  Returns (decoded bytes, index just
    past the closing paren)."""
    depth, j, out = 1, i + 1, bytearray()
    n = len(body)
    while j < n and depth:
        c = body[j]
        if c == 0x5C:  # backslash
            j += 1
            if j >= n:
                break
            e = body[j]
            if e in _ESCAPE_MAP:
                out += _ESCAPE_MAP[e]
                j += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                val, k = 0, j
                while k < n and k - j < 3 and 0x30 <= body[k] <= 0x37:
                    val = val * 8 + (body[k] - 0x30)
                    k += 1
                out.append(val & 0xFF)
                j = k
            elif e in (0x0A, 0x0D):  # escaped EOL: continuation
                j += 1
                if e == 0x0D and body[j : j + 1] == b"\n":
                    j += 1
            else:  # \( \) \\ and "ignore the backslash" for the rest
                out.append(e)
                j += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            j += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            j += 1
        else:
            out.append(c)
            j += 1
    return bytes(out), j


def _content_lines(body: bytes) -> list[str]:
    """Extract shown text from one decoded content stream.  Line model:
    each show-text operator (``Tj``, ``'``, ``\"``) emits one line; a
    ``[...] TJ`` array emits ONE line joining its string elements (kerning
    numbers ignored).  Positioning operators are not interpreted — this is
    the same honest scope as the writer (one op per rendered line)."""
    lines: list[str] = []
    last: bytes | None = None
    tj: list[bytes] | None = None
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == 0x28:  # ( literal string
            s, i = _parse_literal(body, i)
            last = s
            if tj is not None:
                tj.append(s)
        elif c == 0x3C:  # < hex string  (<< is a dict open — skip)
            if body[i + 1 : i + 2] == b"<":
                i += 2
                continue
            e = body.find(b">", i)
            if e < 0:
                break
            hx = re.sub(rb"\s+", b"", body[i + 1 : e])
            if len(hx) % 2:
                hx += b"0"
            try:
                s = bytes.fromhex(hx.decode("ascii"))
            except ValueError:
                s = b""
            last = s
            if tj is not None:
                tj.append(s)
            i = e + 1
        elif c == 0x5B:  # [ — start collecting a TJ array
            tj = []
            i += 1
        elif c == 0x5D:  # ] — emit if the next operator is TJ
            m = re.match(rb"\s*TJ", body[i + 1 : i + 8])
            if m is not None and tj is not None:
                lines.append(b"".join(tj).decode("latin-1"))
                i += 1 + m.end()
            else:
                i += 1
            tj = None
        elif c == 0x54 and body[i + 1 : i + 2] == b"j":  # Tj
            if last is not None:
                lines.append(last.decode("latin-1"))
                last = None
            i += 2
        elif c in (0x27, 0x22):  # ' and " show-next-line operators
            if last is not None:
                lines.append(last.decode("latin-1"))
                last = None
            i += 1
        else:
            i += 1
    return lines


def _decode_stream(dict_bytes: bytes, body: bytes) -> bytes:
    """Apply the stream dict's filter to the raw body.  Flate inflates via
    stdlib zlib; no filter passes through; anything else (LZW, DCT, CCITT,
    filter chains, predictor-coded data) raises ``NotImplementedError`` —
    the remaining honest codec boundary."""
    filters = re.findall(rb"/Filter\s*(?:\[\s*((?:/\w+\s*)+)\]|/(\w+))", dict_bytes)
    names: list[bytes] = []
    for arr, single in filters:
        if single:
            names.append(single)
        else:
            names.extend(re.findall(rb"/(\w+)", arr))
    if not names:
        return body
    if names != [b"FlateDecode"]:
        raise NotImplementedError(
            "unsupported PDF stream filter(s) %s (only FlateDecode and "
            "uncompressed streams decode in this environment)"
            % [x.decode() for x in names]
        )
    m = re.search(rb"/Predictor\s+(\d+)", dict_bytes)
    if m and int(m.group(1)) > 1:
        raise NotImplementedError(
            "predictor-coded Flate streams are not supported"
        )
    try:
        return zlib.decompress(body)
    except zlib.error as exc:
        raise ValueError("corrupt FlateDecode stream: %s" % exc) from exc


def _iter_streams(payload: bytes):
    """Yield ``(dict_bytes, raw_body)`` for every stream object.  The body
    is delimited by the dict's direct ``/Length N`` when present and
    consistent (binary-safe — compressed data may contain ``endstream`` as
    a byte pattern), falling back to an ``endstream`` scan for indirect or
    absent lengths."""
    pos = 0
    n = len(payload)
    while True:
        s = payload.find(b"stream", pos)
        if s < 0:
            return
        if payload[s - 3 : s] == b"end":  # matched inside "endstream"
            pos = s + 6
            continue
        # EOL after the keyword: \r\n or \n per spec
        b0 = s + 6
        if payload[b0 : b0 + 2] == b"\r\n":
            b0 += 2
        elif payload[b0 : b0 + 1] == b"\n":
            b0 += 1
        # the stream's own dict: from the owning "N 0 obj" (bounded lookback)
        d0 = payload.rfind(b"obj", max(0, s - 4096), s)
        dict_bytes = payload[d0 if d0 >= 0 else max(0, s - 512) : s]
        body = None
        m = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", dict_bytes)
        if m:
            ln = int(m.group(1))
            if b0 + ln <= n and payload[b0 + ln : b0 + ln + 16].lstrip(
                b"\r\n "
            ).startswith(b"endstream"):
                body = payload[b0 : b0 + ln]
                pos = b0 + ln
        if body is None:
            e = payload.find(b"endstream", b0)
            if e < 0:
                return  # torn stream: stop rather than loop
            body = payload[b0:e].rstrip(b"\r\n")
            pos = e
        yield dict_bytes, body


def pdf_to_text(payload: bytes) -> list[list[str]]:
    """Decode text back OUT of a PDF (the byte-decode side of the
    T1/layout axis): returns pages as lists of lines, one page per content
    stream containing a ``BT`` text block, parsed per the module-docstring
    decoder scope (uncompressed + FlateDecode streams; ``Tj``/``'``/``\"``/
    ``TJ`` operators; literal + hex strings).  Non-Flate filters raise
    ``NotImplementedError`` (the remaining codec stub, same contract as
    image decode); anything non-PDF raises ``ValueError``."""
    if payload is None:
        raise ValueError("null payload")
    payload = bytes(payload)
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    pages: list[list[str]] = []
    found_text = False
    for dict_bytes, raw in _iter_streams(payload):
        body = _decode_stream(dict_bytes, raw)
        if b"BT" not in body:
            continue
        found_text = True
        pages.append(_content_lines(body))
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
