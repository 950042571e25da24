"""Real image codecs, stdlib only: PNG (encode + decode) and BMP.

Closes the lossless half of the multimodal decode boundary
(``extractor/ops/multimodal.py``): PNG is zlib (stdlib) over per-row
filters — the identical filter algorithm our PDF ``/Predictor`` codec
already implements (``extractor.pdf.png_predict_decode``, PNG spec §6) —
and BI_RGB BMP is plain pixel rows with 4-byte padding.  JPEG/WebP/AVIF
stay out of scope (lossy DCT/entropy codecs need a real codec library)
and keep raising ``NotImplementedError`` at the call site.

Reference parity: the reference treats images as opaque files it copies
and inventories (`app/core/html_processor.py:406-416`); decoding pixels
is OUR extension (SURVEY §2 multimodal family).  Everything here is a
pure bytes→bytes function, so on Spark it rides inside the same Arrow
``mapInPandas`` kernels as the fake-payload path — no new topology.

Scope (honest): PNG bit depth 8, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), interlace 0 (non-Adam7), ancillary
chunks skipped, CRCs verified; BMP: uncompressed 24-bit BI_RGB,
bottom-up or top-down.  Out-of-scope shapes raise ``NotImplementedError``
(depths/interlace) or ``ValueError`` (corrupt bytes) — callers contain
both as error rows (O4 semantics).
"""
from __future__ import annotations

import struct
import zlib

from extractor.pdf import png_predict_decode, png_predict_encode

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type at bit depth 8
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filter_type: int = 0,
) -> bytes:
    """Write a real, spec-valid PNG (8-bit, non-interlaced).  *pixels* is
    ``height`` rows × ``width`` px × channels bytes, top-down.  Row
    filtering uses one fixed ``filter_type`` (0=None default) so output
    is byte-deterministic (fixed zlib level 6)."""
    ch = _PNG_CHANNELS.get(color_type)
    if ch is None:
        raise ValueError("bad PNG color type %d" % color_type)
    if color_type == 3:
        raise NotImplementedError("png_encode: palette writing not needed")
    if len(pixels) != width * height * ch:
        raise ValueError(
            "pixel buffer is %d bytes, want %d (%dx%dx%d)"
            % (len(pixels), width * height * ch, width, height, ch)
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    # png_predict_encode emits exactly the PNG row framing: one filter
    # tag byte then the filtered row (pdf.py shares the algorithm)
    raw = png_predict_encode(pixels, width, colors=ch, filter_type=filter_type)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixels)`` — top-down
    8-bit samples, palette rows expanded to RGB (channels=3).  CRCs are
    verified; sub-8-bit depths, 16-bit depth, and Adam7 interlace raise
    ``NotImplementedError`` (documented scope); structural damage raises
    ``ValueError``."""
    payload = bytes(payload)
    if not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIG)
    n = len(payload)
    width = height = color_type = None
    idat = bytearray()
    palette = b""
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk %r" % tag)
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk %r CRC mismatch" % tag)
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise NotImplementedError(
                    "png_decode: only bit depth 8 (got %d)" % depth
                )
            if interlace:
                raise NotImplementedError("png_decode: Adam7 interlace")
            if comp or filt:
                raise ValueError("bad IHDR compression/filter method")
            if color_type not in _PNG_CHANNELS:
                raise ValueError("bad PNG color type %d" % color_type)
        elif tag == b"PLTE":
            palette = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, gAMA, ...) are skipped
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    ch = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError("corrupt PNG IDAT: %s" % exc) from exc
    if len(raw) != height * (1 + width * ch):
        raise ValueError(
            "PNG scanline data is %d bytes, want %d"
            % (len(raw), height * (1 + width * ch))
        )
    pixels = png_predict_decode(raw, width, colors=ch)
    if color_type == 3:
        if not palette or len(palette) % 3:
            raise ValueError("paletted PNG missing/odd PLTE")
        lut = [palette[i : i + 3] for i in range(0, len(palette), 3)]
        try:
            pixels = b"".join(lut[i] for i in pixels)
        except IndexError as exc:
            raise ValueError("palette index out of range") from exc
        ch = 3
    return width, height, ch, pixels


def bmp_encode(width: int, height: int, pixels: bytes) -> bytes:
    """Write an uncompressed 24-bit BI_RGB BMP.  *pixels* is top-down RGB;
    the file stores the spec's bottom-up BGR rows with 4-byte padding."""
    import numpy as np

    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    pad = (-width * 3) % 4
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, RGB→BGR
    padded = np.zeros((height, width * 3 + pad), dtype=np.uint8)
    padded[:, : width * 3] = bgr.reshape(height, width * 3)
    data = padded.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + dib + data


def bmp_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode an uncompressed 24-bit BI_RGB BMP to ``(width, height, 3,
    top-down RGB pixels)``.  Negative height (top-down storage) handled;
    other bit depths / compressions raise ``NotImplementedError``."""
    payload = bytes(payload)
    if not payload.startswith(b"BM") or len(payload) < 54:
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise NotImplementedError("bmp_decode: BITMAPCOREHEADER")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            "bmp_decode: only uncompressed 24-bit BI_RGB (got %d bpp, "
            "compression %d)" % (bpp, compression)
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0 or planes != 1:
        raise ValueError("bad BMP dimensions")
    import numpy as np

    stride = (width * 3 + 3) & ~3
    if off + stride * height > len(payload):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=off
    ).reshape(height, stride)[:, : width * 3]
    if not top_down:
        rows = rows[::-1]
    rgb = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR→RGB
    return width, height, 3, np.ascontiguousarray(rgb).tobytes()


def sniff_image(payload: bytes) -> str | None:
    """Byte-sniff the image container: 'png' | 'bmp' | 'jpeg' | 'gif' |
    None (unrecognized)."""
    if payload is None:
        return None
    head = bytes(payload[:8])
    if head.startswith(PNG_SIG):
        return "png"
    if head.startswith(b"BM"):
        return "bmp"
    if head.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if head.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    return None
