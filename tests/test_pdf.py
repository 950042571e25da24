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


def _one_stream_pdf(dict_extra: bytes, body: bytes) -> bytes:
    return (
        b"%%PDF-1.5\n1 0 obj\n<< /Length %d %s >>\nstream\n%s\nendstream\nendobj\n"
        % (len(body), dict_extra, body)
    )


def test_pdf_to_text_rejects_unsupported_filters():
    import pytest

    from extractor.pdf import pdf_to_text

    # lossy/image codecs stay out of scope
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        pdf_to_text(_one_stream_pdf(b"/Filter /DCTDecode", b"BT x ET"))
    with pytest.raises(NotImplementedError, match="CCITTFaxDecode"):
        pdf_to_text(
            _one_stream_pdf(b"/Filter [/ASCII85Decode /CCITTFaxDecode]", b"BT ET")
        )
    with pytest.raises(ValueError):
        pdf_to_text(b"not a pdf")
    # corrupt flate data is a ValueError, not a crash
    with pytest.raises(ValueError, match="corrupt"):
        pdf_to_text(_one_stream_pdf(b"/Filter /FlateDecode", b"BT not-zlib ET"))


def test_lzw_matches_pdf_spec_vector():
    """PDF 1.7 §7.4.4.2 publishes a worked LZW example — our codec must
    match it byte-for-byte both directions (EarlyChange=1 default)."""
    from extractor.pdf import lzw_decode, lzw_encode

    data = bytes([45, 45, 45, 45, 45, 65, 45, 45, 45, 66])
    spec = bytes.fromhex("800B6050220C0C8501")
    assert lzw_encode(data) == spec
    assert lzw_decode(spec) == data


def test_lzw_roundtrip_width_growth_and_reset():
    import random

    from extractor.pdf import lzw_decode, lzw_encode

    rnd = random.Random(7)
    cases = [
        b"",
        b"A",
        b"AAAA" * 2000,
        bytes(rnd.randrange(256) for _ in range(20000)),
        b"the quick brown fox " * 3000,
        bytes(rnd.randrange(4) for _ in range(60000)),  # forces table resets
    ]
    for c in cases:
        assert lzw_decode(lzw_encode(c)) == c
        assert lzw_decode(lzw_encode(c, 0), early_change=0) == c


def test_lzw_eod_on_width_boundary_roundtrips():
    """When the final data code lands the table exactly on a 2^width
    boundary, the decoder's last table append bumps its code width BEFORE
    reading EOD; the encoder must emit EOD at that bumped width or the
    stream desyncs (silent trailing garbage or ValueError).  255 distinct
    bytes produce exactly 254 loop emits → next_code 512 at the final
    emit (regression: round-5 fuzz finding)."""
    import random

    from extractor.pdf import lzw_decode, lzw_encode

    for ec, n in [(0, 255), (1, 254), (0, 256), (1, 255)]:
        data = bytes(range(n))
        assert lzw_decode(lzw_encode(data, ec), early_change=ec) == data
    # seeded fuzz across the boundary-adjacent size band
    rnd = random.Random(17)
    for _ in range(300):
        n = rnd.randrange(240, 280)
        data = bytes(rnd.randrange(256) for _ in range(n))
        for ec in (0, 1):
            assert lzw_decode(lzw_encode(data, ec), early_change=ec) == data


def test_decodeparms_paired_per_filter():
    """PDF 1.7 §7.3.8.2: with an array /Filter, /DecodeParms is an array
    pairing each filter with its parms (dict or null).  A predictor
    declared for the FIRST filter must not be re-applied after the
    second, and vice versa."""
    import zlib

    from extractor.pdf import lzw_encode, pdf_to_text, png_predict_encode

    body = b"BT (chain line) Tj ET"
    # Filters decode in listed order, so the stream is built by applying
    # each filter's ENCODE in reverse list order; a predictor pairs with
    # its own filter (applied before that filter's compression).
    # predictor on the Flate stage (filter 0) only:
    pdf = _one_stream_pdf(
        b"/Filter [/FlateDecode /LZWDecode] "
        b"/DecodeParms [<< /Predictor 12 /Columns 8 >> null]",
        zlib.compress(png_predict_encode(lzw_encode(body), 8)),
    )
    assert pdf_to_text(pdf) == [["chain line"]]
    # predictor on the LZW stage (filter 0 of the swapped chain) only:
    pdf = _one_stream_pdf(
        b"/Filter [/LZWDecode /FlateDecode] "
        b"/DecodeParms [<< /Predictor 12 /Columns 8 >> null]",
        lzw_encode(png_predict_encode(zlib.compress(body), 8)),
    )
    assert pdf_to_text(pdf) == [["chain line"]]
    # EarlyChange parms on the second (LZW) element, null on the first
    pdf = _one_stream_pdf(
        b"/Filter [/ASCIIHexDecode /LZWDecode] "
        b"/DecodeParms [null << /EarlyChange 0 >>]",
        lzw_encode(body, early_change=0).hex().encode(),
    )
    assert pdf_to_text(pdf) == [["chain line"]]
    # spec-invalid lone dict with an array Filter: pairs with the first
    # compression filter (here LZW), not with ASCIIHex
    pdf = _one_stream_pdf(
        b"/Filter [/ASCIIHexDecode /LZWDecode] "
        b"/DecodeParms << /EarlyChange 0 >>",
        lzw_encode(body, early_change=0).hex().encode(),
    )
    assert pdf_to_text(pdf) == [["chain line"]]


def test_png_predictor_roundtrip_all_filters():
    import random

    from extractor.pdf import png_predict_decode, png_predict_encode

    rnd = random.Random(11)
    payload = bytes(rnd.randrange(256) for _ in range(1000))
    for ft in range(5):
        for cols, colors in [(16, 1), (7, 3), (90, 1)]:
            enc = png_predict_encode(payload, cols, colors, filter_type=ft)
            assert png_predict_decode(enc, cols, colors) == payload


def test_predictor_and_lzw_filter_streams_decode():
    """A stream dict carrying /LZWDecode (+ PNG predictor DecodeParms,
    + EarlyChange 0, + /Predictor 2 TIFF) decodes through pdf_to_text."""
    import zlib

    from extractor.pdf import lzw_encode, pdf_to_text, png_predict_encode

    body = b"BT (lzw line) Tj ET"
    pdf = _one_stream_pdf(b"/Filter /LZWDecode", lzw_encode(body))
    assert pdf_to_text(pdf) == [["lzw line"]]
    pdf = _one_stream_pdf(
        b"/Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>",
        lzw_encode(body, early_change=0),
    )
    assert pdf_to_text(pdf) == [["lzw line"]]
    # flate + PNG Up predictor
    pdf = _one_stream_pdf(
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 8 >>",
        zlib.compress(png_predict_encode(body, 8)),
    )
    assert pdf_to_text(pdf) == [["lzw line"]]
    # TIFF predictor 2 (horizontal differencing, colors=1: per-row delta)
    row = bytearray(body)
    for i in range(len(row) - 1, 0, -1):  # single logical row: Columns big
        row[i] = (row[i] - row[i - 1]) & 0xFF
    pdf = _one_stream_pdf(
        b"/Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns 4096 >>",
        zlib.compress(bytes(row)),
    )
    assert pdf_to_text(pdf) == [["lzw line"]]
    # ASCIIHex, and an AHx -> LZW chain
    pdf = _one_stream_pdf(b"/Filter /ASCIIHexDecode", body.hex().encode() + b">")
    assert pdf_to_text(pdf) == [["lzw line"]]
    pdf = _one_stream_pdf(
        b"/Filter [/ASCIIHexDecode /LZWDecode]", lzw_encode(body).hex().encode()
    )
    assert pdf_to_text(pdf) == [["lzw line"]]


def test_lzw_write_modes_roundtrip():
    from extractor.pdf import is_valid_pdf, pdf_to_text

    t = "\n".join("line %d (%s) \\" % (i, "a" * (i % 120)) for i in range(300))
    base = pdf_to_text(text_to_pdf_bytes(t))
    for mode in ("lzw", "lzw-png"):
        b = text_to_pdf_bytes(t, stream_filter=mode)
        assert is_valid_pdf(b)
        assert b == text_to_pdf_bytes(t, stream_filter=mode)  # deterministic
        assert pdf_to_text(b) == base


def test_flate_roundtrip_exact():
    """compress=True output decodes to the identical line/page structure —
    the writer/decoder pair covers the dominant real-world PDF encoding."""
    from extractor.pdf import pdf_to_text

    for t in (
        "hello (world) \\ test\n" + "x" * 200 + "\n\nlast",
        "",
        "\n".join("line %d (%s) \\" % (i, "a" * (i % 120)) for i in range(300)),
    ):
        blob = text_to_pdf_bytes(t, compress=True)
        assert blob == text_to_pdf_bytes(t, compress=True)  # deterministic
        assert is_valid_pdf(blob)
        assert len(blob) < len(text_to_pdf_bytes(t)) or len(t) < 400
        pages = pdf_to_text(blob)
        assert [l for p in pages for l in p] == wrap_lines(t), repr(t[:30])
        assert pages == pdf_to_text(text_to_pdf_bytes(t))


def _content_pdf(body: bytes) -> bytes:
    """Minimal single-stream PDF wrapping a raw content stream body."""
    return (
        b"%%PDF-1.4\n4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(body), body)
    )


def test_foreign_pdf_operators_decode():
    """Operators our own writer never emits but real PDFs use constantly:
    hex strings, TJ kerning arrays, ' and \" show ops, octal escapes."""
    from extractor.pdf import pdf_to_text

    # hex string + Tj
    assert pdf_to_text(_content_pdf(b"BT <48656C6C6F> Tj ET")) == [["Hello"]]
    # odd-length hex pads a trailing 0 nibble
    assert pdf_to_text(_content_pdf(b"BT <48656C6C6F2> Tj ET")) == [["Hello "]]
    # TJ array with kerning numbers joins string elements into ONE line
    assert pdf_to_text(
        _content_pdf(b"BT [(He) -120 (l) 30 <6C6F>] TJ ET")
    ) == [["Hello"]]
    # ' and " show-next-line operators
    assert pdf_to_text(_content_pdf(b"BT (a) ' 2 1 (b) \" ET")) == [["a", "b"]]
    # octal + named escapes + continuation + nested balanced parens
    assert pdf_to_text(
        _content_pdf(b"BT (\\110i\\tthere\\\n joined (nested) ok) Tj ET")
    ) == [["Hi\tthere joined (nested) ok"]]
    # plain [ ... ] that is NOT followed by TJ emits nothing
    assert pdf_to_text(
        _content_pdf(b"BT [(dropped)] TD (kept) Tj ET")
    ) == [["kept"]]


def test_layout_decodes_own_pdf_bytes():
    """decode_layout consumes REAL PDF bytes (the engine's uncompressed
    subset) and the XY-cut linearizer reads them in order."""
    from extractor.layout import decode_layout, linearize_layout

    doc = decode_layout(text_to_pdf_bytes("alpha\nbeta\n\ngamma"))
    r = linearize_layout(doc)
    assert r.error is None
    assert r.n_pages == 1 and r.n_blocks == 3  # blank line emits no block
    assert r.text.split() == ["alpha", "beta", "gamma"]  # reading order


def test_rle_codec_roundtrip_and_spec_shapes():
    """RunLengthDecode (PDF 1.7 §7.4.5): literal chunks, ≥3-byte runs as
    repeats, 128-byte chunk caps, EOD byte — plus random roundtrips."""
    import random

    from extractor.pdf import rle_decode, rle_encode

    # spec framing: repeat of 130 zeros → two repeat chunks (128 + 2 → a
    # 2-run is emitted literal), literal 'ab' → length byte 1
    assert rle_encode(b"ab") == bytes([1]) + b"ab" + bytes([128])
    assert rle_encode(b"A" * 3) == bytes([257 - 3, ord("A"), 128])
    assert rle_decode(bytes([257 - 128]) + b"Z" + bytes([128])) == b"Z" * 128
    for data in (b"", b"x", b"\x00" * 1000, b"A" * 129, b"AB" * 200):
        assert rle_decode(rle_encode(data)) == data
    rnd = random.Random(11)
    for _ in range(100):
        data = bytes(
            rnd.choice((0, 255, rnd.randrange(256)))
            for _ in range(rnd.randrange(0, 512))
        )
        assert rle_decode(rle_encode(data)) == data
    import pytest

    with pytest.raises(ValueError, match="corrupt"):
        rle_decode(bytes([5]) + b"ab")  # short literal
    with pytest.raises(ValueError, match="corrupt"):
        rle_decode(bytes([200]))  # dangling repeat


def test_a85_codec_roundtrip_and_leniency():
    """ASCII85Decode: z shortcut, whitespace, missing ~> EOD tolerated."""
    import random

    from extractor.pdf import a85_decode, a85_encode

    assert a85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert a85_decode(b" z \n ") == b"\x00\x00\x00\x00"  # no EOD, spaces
    rnd = random.Random(13)
    for _ in range(100):
        data = bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 256)))
        assert a85_decode(a85_encode(data)) == data
    import pytest

    with pytest.raises(ValueError, match="corrupt"):
        a85_decode(b"\x01\x02~>")


def test_rle_a85_write_modes_roundtrip():
    """The rle / a85 / chained a85-flate write modes all read back to the
    identical line structure as the uncompressed render."""
    from extractor.pdf import is_valid_pdf, pdf_to_text

    t = "\n".join("line %d (%s) \\" % (i, "a" * (i % 120)) for i in range(300))
    base = pdf_to_text(text_to_pdf_bytes(t))
    for mode in ("rle", "a85", "a85-flate"):
        b = text_to_pdf_bytes(t, stream_filter=mode)
        assert is_valid_pdf(b)
        assert b == text_to_pdf_bytes(t, stream_filter=mode)  # deterministic
        assert pdf_to_text(b) == base


def test_foreign_rle_a85_filter_streams_decode():
    """Filter dicts our writer never emits: bare and chained forms."""
    import zlib

    from extractor.pdf import a85_encode, pdf_to_text, rle_encode

    body = b"BT (mixed line) Tj ET"
    pdf = _one_stream_pdf(b"/Filter /RunLengthDecode", rle_encode(body))
    assert pdf_to_text(pdf) == [["mixed line"]]
    pdf = _one_stream_pdf(b"/Filter /ASCII85Decode", a85_encode(body))
    assert pdf_to_text(pdf) == [["mixed line"]]
    # real-world chain: a85 wrapping flate
    pdf = _one_stream_pdf(
        b"/Filter [/ASCII85Decode /FlateDecode]",
        a85_encode(zlib.compress(body)),
    )
    assert pdf_to_text(pdf) == [["mixed line"]]
    # triple chain incl. RLE
    pdf = _one_stream_pdf(
        b"/Filter [/ASCII85Decode /RunLengthDecode /FlateDecode]",
        a85_encode(rle_encode(zlib.compress(body))),
    )
    assert pdf_to_text(pdf) == [["mixed line"]]


def _image_pdf(text: str, images) -> bytes:
    """Splice /Subtype /Image XObjects into a rendered text PDF.  The
    decoder iterates streams without the xref, so appended objects are
    seen exactly like writer-emitted ones."""
    pdf = text_to_pdf_bytes(text)
    objs = b""
    for i, (dict_extra, body) in enumerate(images):
        objs += (
            b"%d 0 obj\n<< /Type /XObject /Subtype /Image %s /Length %d >>"
            b"\nstream\n" % (900 + i, dict_extra, len(body))
        ) + body + b"\nendstream\nendobj\n"
    return pdf.replace(b"%%EOF", objs + b"%%EOF")


def test_pdf_to_text_skips_image_xobjects():
    """A document with embedded images still yields its text (O4: an
    image stream must never fail text extraction) — incl. image codecs
    that would raise if routed through the text decoder."""
    from extractor.pdf import pdf_to_text

    pdf = _image_pdf(
        "body text",
        [
            (b"/Width 2 /Height 2 /Filter /DCTDecode", b"\xff\xd8junk"),
            (b"/Width 2 /Height 2 /Filter /JPXDecode", b"\x00" * 8),
        ],
    )
    assert pdf_to_text(pdf) == [["body text"]]


def test_pdf_extract_images_dct_and_flate():
    import zlib

    import numpy as np

    from extractor.jpegcodec import jpeg_decode, jpeg_encode
    from extractor.pdf import pdf_extract_images, pdf_to_text

    rng = np.random.RandomState(7)
    px = (rng.rand(16, 24, 3) * 255).astype(np.uint8).tobytes()
    jpg = jpeg_encode(24, 16, px, 3, quality=90)
    raw = bytes(range(40))  # 8x5 gray bitmap
    pdf = _image_pdf(
        "hello",
        [
            (
                b"/Width 24 /Height 16 /ColorSpace /DeviceRGB"
                b" /BitsPerComponent 8 /Filter /DCTDecode",
                jpg,
            ),
            (
                b"/Width 8 /Height 5 /ColorSpace /DeviceGray"
                b" /BitsPerComponent 8 /Filter /FlateDecode",
                zlib.compress(raw),
            ),
        ],
    )
    imgs = pdf_extract_images(pdf)
    assert len(imgs) == 2
    a, b = imgs
    assert (a["width"], a["height"], a["channels"], a["error"]) == (
        24, 16, 3, None,
    )
    # DCT pixels must equal a direct decode of the same JPEG bytes
    assert a["pixels"] == jpeg_decode(jpg)[3]
    assert (b["width"], b["height"], b["channels"], b["error"]) == (
        8, 5, 1, None,
    )
    assert b["pixels"] == raw
    # text extraction coexists
    assert pdf_to_text(pdf) == [["hello"]]


def test_pdf_extract_images_chained_and_contained():
    """A85-wrapped JPEG decodes through the pre-filter chain; out-of-scope
    codecs and corrupt data become contained error rows, never raises."""
    from extractor.jpegcodec import jpeg_encode
    from extractor.pdf import a85_encode, pdf_extract_images

    jpg = jpeg_encode(4, 4, bytes(16), 1, quality=75)
    pdf = _image_pdf(
        "x",
        [
            (
                b"/Width 4 /Height 4 /Filter [/ASCII85Decode /DCTDecode]",
                a85_encode(jpg),
            ),
            (b"/Width 4 /Height 4 /Filter /JPXDecode", b"\x00" * 8),
            (b"/Width 4 /Height 4 /Filter /JBIG2Decode", b"\x00" * 8),
            (b"/Width 3 /Height 3 /Filter /DCTDecode", b"\xff\xd8torn"),
            # raw bitmap whose byte count is not a multiple of w*h
            (b"/Width 4 /Height 4", b"\x00" * 9),
            # missing dimensions entirely
            (b"/Filter /FlateDecode", __import__("zlib").compress(b"\x00" * 4)),
        ],
    )
    recs = pdf_extract_images(pdf)
    assert len(recs) == 6
    ok = recs[0]
    assert ok["error"] is None and (ok["width"], ok["height"]) == (4, 4)
    assert ok["channels"] == 1 and len(ok["pixels"]) == 16
    for r in recs[1:]:
        assert r["pixels"] is None and r["error"]
    assert "JPXDecode" in recs[1]["error"]
    assert "JBIG2Decode" in recs[2]["error"]
    assert recs[3]["error"].startswith("ValueError")
    assert "bytes for" in recs[4]["error"]
    assert "Width" in recs[5]["error"]


def test_pdf_extract_images_rejects_non_pdf():
    import pytest

    from extractor.pdf import pdf_extract_images

    with pytest.raises(ValueError):
        pdf_extract_images(b"not a pdf")
    with pytest.raises(ValueError):
        pdf_extract_images(None)
    # a PDF with no images: empty list, not an error
    assert pdf_extract_images(text_to_pdf_bytes("t")) == []


def test_predictors_all_bit_depths():
    """PNG filters act bytewise at 1/2/4/8/16-bit components (PNG spec
    §6: step = max(1, colors*bpc/8)); TIFF differencing is per SAMPLE
    (TIFF 6.0 §14) — roundtrip both against reference encoders."""
    import random

    from extractor.pdf import (
        png_predict_decode,
        png_predict_encode,
        tiff_predict_decode,
    )

    rng = random.Random(3)

    def unpack(row, bpc, n):
        mask, pb = (1 << bpc) - 1, 8 // bpc
        return [
            (b >> (8 - bpc * (j + 1))) & mask
            for b in row
            for j in range(pb)
        ][:n]

    def pack(samples, bpc, nbytes):
        mask, pb = (1 << bpc) - 1, 8 // bpc
        out = bytearray()
        for bi in range(nbytes):
            acc = 0
            for j in range(pb):
                si = bi * pb + j
                acc = (acc << bpc) | (
                    samples[si] if si < len(samples) else 0
                )
            out.append(acc)
        return bytes(out)

    for bpc in (1, 2, 4, 8, 16):
        for colors in (1, 3):
            cols = 11
            rowlen = (cols * colors * bpc + 7) // 8
            data = bytes(rng.randrange(256) for _ in range(rowlen * 7))
            for ft in range(5):
                enc = png_predict_encode(
                    data, cols, colors=colors, bpc=bpc, filter_type=ft
                )
                assert (
                    png_predict_decode(enc, cols, colors=colors, bpc=bpc)
                    == data
                ), (bpc, colors, ft)

            # TIFF: sample-wise forward differencing as the reference
            if bpc < 8:  # zero the row padding bits so repack is exact
                data = b"".join(
                    pack(
                        unpack(data[r : r + rowlen], bpc, cols * colors),
                        bpc,
                        rowlen,
                    )
                    for r in range(0, len(data), rowlen)
                )
            diff = bytearray()
            for r in range(0, len(data), rowlen):
                row = data[r : r + rowlen]
                if bpc == 16:
                    ws = [
                        row[i] << 8 | row[i + 1]
                        for i in range(0, len(row), 2)
                    ]
                    ds = list(ws)
                    for i in range(colors, len(ws)):
                        ds[i] = (ws[i] - ws[i - colors]) & 0xFFFF
                    for w in ds:
                        diff += bytes([(w >> 8) & 0xFF, w & 0xFF])
                elif bpc == 8:
                    rb = list(row)
                    for i in range(len(rb) - 1, colors - 1, -1):
                        rb[i] = (rb[i] - rb[i - colors]) & 0xFF
                    diff += bytes(rb)
                else:
                    s = unpack(row, bpc, cols * colors)
                    d = list(s)
                    mask = (1 << bpc) - 1
                    for i in range(colors, len(s)):
                        d[i] = (s[i] - s[i - colors]) & mask
                    diff += pack(d, bpc, rowlen)
            assert (
                tiff_predict_decode(
                    bytes(diff), cols, colors=colors, bpc=bpc
                )
                == data
            ), (bpc, colors)


def test_sub8bit_predictor_stream_decodes():
    """End-to-end: a flate+PNG-predictor stream with /BitsPerComponent 4
    decodes through _decode_stream's parameter plumbing."""
    import zlib

    from extractor.pdf import _decode_stream, png_predict_encode

    body = b"BT (4bit pred) Tj ET pad"  # arbitrary bytes, 6 cols x 4bit
    cols = 6
    rowlen = (cols * 4 + 7) // 8
    body = body[: (len(body) // rowlen) * rowlen]
    enc = zlib.compress(
        png_predict_encode(body, cols, colors=1, bpc=4, filter_type=4)
    )
    dict_bytes = (
        b"<< /Filter /FlateDecode /DecodeParms << /Predictor 15"
        b" /Columns 6 /Colors 1 /BitsPerComponent 4 >> /Length %d >>"
        % len(enc)
    )
    assert _decode_stream(dict_bytes, enc) == body
