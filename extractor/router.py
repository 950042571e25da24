"""Byte-sniffing format router — one binary column in, markdown out.

The reference dispatches on file extension at the filesystem layer
(``app/core/document_converter.py:285-290`` rglobs ``*.docx``; the web UI
routes uploads by suffix) and runs one converter per format.  At 100 TB the
input is an Iceberg table of opaque ``binary`` payloads, not a directory
tree, and extensions are unavailable or untrustworthy — so this module
sniffs the *content*:

* ``%PDF-``          → PDF       → stdlib content-stream decode + XY-cut
                                     linearize (``extractor/pdf.py`` /
                                     ``extractor/layout.py``)
* ``PK\\x03\\x04`` zip → DOCX      → stdlib OOXML reader
                                     (``extractor/docx.py``) → DOM kernel
* JSON with "pages"  → layout doc → XY-cut linearizer
* image magics       → image      → real stdlib PNG/GIF/TIFF/BMP decode
                                     (``extractor/imagecodec.py``) +
                                     baseline JPEG (``jpegcodec.py``);
                                     WebP/arith-coded → contained error
* markup tags        → HTML       → DOM kernel (``extractor/kernel.py``)
* decodable utf-8    → plain text → passthrough (line-ending normalize)
* anything else      → contained error row (never raises — the reference's
                       per-document containment, ``document_converter.py:95-118``)

Everything runs inside one Arrow ``mapInPandas`` kernel: sniff + decode +
convert per record batch, zero per-row Python dispatch from Spark's side,
no shuffle — the same map-only shape as the main extraction pipeline, so
the routed path scales exactly like ``extract_transcripts`` does.
"""

from __future__ import annotations

import io
import json
import re
import zipfile

from .docx import decode_docx
from .kernel import DEFAULT_OPTIONS, MAX_TEXT_CHARS, ConvertOptions, convert_text
from .layout import parse_layout

FORMATS = (
    "empty", "pdf", "docx", "zip", "layout_json", "html", "text", "image",
    "binary",
)

# Tags that mark a decoded text payload as HTML (first-window scan only —
# a plain-text doc that *mentions* "<p>" late in the body is still text).
_HTML_TAG_RE = re.compile(
    r"<(?:!doctype\s|html[\s>]|head[\s>]|body[\s>]|p[\s>]|div[\s>]|span[\s>]"
    r"|h[1-6][\s>]|table[\s>]|ul[\s>]|ol[\s>]|li[\s>]|a\s|img\s|br\s*/?>)",
    re.IGNORECASE,
)
_SNIFF_WINDOW = 4096


def sniff_format(payload) -> str:
    """Classify one payload into :data:`FORMATS`.  Never raises."""
    if payload is None:
        return "empty"
    if isinstance(payload, str):
        text = payload
    else:
        raw = bytes(payload)
        if not raw:
            return "empty"
        if raw[:5] == b"%PDF-":
            return "pdf"
        from extractor.imagecodec import sniff_image

        if sniff_image(raw) is not None:
            return "image"
        if raw[:4] == b"PK\x03\x04":
            try:
                with zipfile.ZipFile(io.BytesIO(raw)) as zf:
                    names = set(zf.namelist())
            except (zipfile.BadZipFile, OSError):
                return "binary"
            return "docx" if "word/document.xml" in names else "zip"
        if b"\x00" in raw[:_SNIFF_WINDOW]:
            return "binary"
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            return "binary"
    if not text.strip():
        return "empty"
    head = text.lstrip()
    if head[:1] in "{[":
        try:
            doc = json.loads(text)
        except (ValueError, RecursionError):
            doc = None
        if isinstance(doc, dict) and "pages" in doc:
            return "layout_json"
    if _HTML_TAG_RE.search(head[:_SNIFF_WINDOW]):
        return "html"
    return "text"


def route_payload(
    payload,
    max_chars: int = MAX_TEXT_CHARS,
    options: ConvertOptions = DEFAULT_OPTIONS,
) -> dict:
    """Sniff + decode + convert one payload.  Never raises.

    Returns ``{"format", "extracted_text", "tables_count", "math_count",
    "images_count", "error"}`` — table/math counts are 0 for the
    non-DOM formats (PDF/layout/text carry no table/math structure
    after linearization); PDF ``images_count`` counts embedded
    ``/Subtype /Image`` XObjects (the A1/A3 statistics parity for
    scanned documents — see ``pdf_extract_images`` for the actual
    pixel decode)."""
    fmt = sniff_format(payload)
    out = {
        "format": fmt,
        "extracted_text": None,
        "tables_count": 0,
        "math_count": 0,
        "images_count": 0,
        "error": None,
    }
    try:
        if fmt == "empty":
            out["error"] = "empty_payload"
        elif fmt in ("pdf", "layout_json"):
            r = parse_layout(payload)
            out["extracted_text"], out["error"] = r.text, r.error
            if fmt == "pdf":
                raw = (
                    payload.encode("utf-8")
                    if isinstance(payload, str) else bytes(payload)
                )
                out["images_count"] = len(
                    re.findall(rb"/Subtype\s*/Image\b", raw)
                )
        elif fmt == "docx":
            html = decode_docx(
                payload.encode("utf-8") if isinstance(payload, str) else payload
            )
            res = convert_text(html, max_chars, options)
            out.update(
                extracted_text=res.extracted_text,
                tables_count=res.tables_count,
                math_count=res.math_count,
                images_count=res.images_count,
                error=res.error,
            )
        elif fmt == "html":
            text = (
                payload
                if isinstance(payload, str)
                else bytes(payload).decode("utf-8")
            )
            res = convert_text(text, max_chars, options)
            out.update(
                extracted_text=res.extracted_text,
                tables_count=res.tables_count,
                math_count=res.math_count,
                images_count=res.images_count,
                error=res.error,
            )
        elif fmt == "text":
            text = (
                payload
                if isinstance(payload, str)
                else bytes(payload).decode("utf-8")
            )
            out["extracted_text"] = (
                text.replace("\r\n", "\n").replace("\r", "\n")
            )
        elif fmt == "image":
            # lossless containers decode for real (own stdlib PNG/BMP
            # codecs); images carry no text — they route to the media
            # side table (S6), here counted + validated only
            from extractor.imagecodec import (
                bmp_decode,
                gif_decode,
                png_decode,
                sniff_image,
                tiff_decode,
            )

            raw = (
                payload.encode("utf-8") if isinstance(payload, str) else bytes(payload)
            )
            kind = sniff_image(raw)
            if kind == "png":
                png_decode(raw)  # raises on corrupt bytes → contained below
            elif kind == "gif":
                gif_decode(raw)
            elif kind == "tiff":
                tiff_decode(raw)
            elif kind == "bmp":
                bmp_decode(raw)
            elif kind == "jpeg":
                from extractor.jpegcodec import jpeg_decode

                jpeg_decode(raw)
            else:  # webp/avif: codecs absent — honest boundary
                raise NotImplementedError(
                    "image codec for %s not available in this environment"
                    % kind
                )
            out["images_count"] = 1
        else:  # zip / binary — no codec for this payload
            out["error"] = f"unsupported_format: {fmt}"
    except Exception as exc:  # containment of last resort, mirrors kernel
        out["extracted_text"] = None
        out["error"] = f"route_error: {type(exc).__name__}: {str(exc)[:200]}"
    return out


def route_batch(
    payloads,
    max_chars: int = MAX_TEXT_CHARS,
    options: ConvertOptions = DEFAULT_OPTIONS,
):
    """Arrow-batch wrapper: ``pd.Series -> pd.DataFrame`` (one call per
    record batch inside ``mapInPandas``)."""
    import pandas as pd

    rows = [
        route_payload(
            None if value is None or value is pd.NA else value,
            max_chars,
            options,
        )
        for value in payloads
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "format",
            "extracted_text",
            "tables_count",
            "math_count",
            "images_count",
            "error",
        ],
    )


ROUTED_SCHEMA = (
    "format string, extracted_text string, tables_count int, "
    "math_count int, images_count int, error string"
)


def extract_any(df, payload_col: str = "payload", id_cols=("doc_id",),
                max_chars: int = MAX_TEXT_CHARS,
                options: ConvertOptions = DEFAULT_OPTIONS):
    """DataFrame op: route an opaque binary/string column to markdown.

    Map-only (no shuffle): sniff/decode/convert fuse into a single Python
    stage per input partition, so the routed path inherits the scan's
    partitioning — the property the plan gates assert for the main kernel.
    """
    id_cols = list(id_cols)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in id_cols
    )
    full_schema = f"{schema}, {ROUTED_SCHEMA}" if schema else ROUTED_SCHEMA

    def gen(iterator):
        for pdf in iterator:
            routed = route_batch(pdf[payload_col], max_chars, options)
            for c in reversed(id_cols):
                routed.insert(0, c, pdf[c].values)
            yield routed

    return df.select(*id_cols, payload_col).mapInPandas(gen, full_schema)
