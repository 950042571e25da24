"""T1 raw-byte DOCX decode — stdlib OOXML reader (extractor/docx.py).

Reference parity target: the pandoc DOCX→HTML stage
(app/core/pandoc_converter.py:21-118), re-expressed without subprocess.
"""
import io
import zipfile

import pytest

from extractor.docx import (
    decode_docx,
    synth_docx_bytes,
    synth_docx_xml,
    _omml_to_latex,
)
import xml.etree.ElementTree as ET


M = "{http://schemas.openxmlformats.org/officeDocument/2006/math}"


def test_mode0_heading_paragraph():
    html = decode_docx(synth_docx_bytes(6))  # m=0, a=6, b=1
    assert html == "<h1>Title6</h1><p>body1</p>"


def test_mode1_bold_image_rels_resolution():
    html = decode_docx(synth_docx_bytes(7))  # m=1, a=0, b=2
    assert "<strong>bold0</strong>" in html
    # rId7 resolved through word/_rels/document.xml.rels to the media path
    assert '<img src="media/image1.png" alt="" />' in html
    assert html.endswith("<p>tail2</p>")


def test_mode2_header_table():
    html = decode_docx(synth_docx_bytes(8))  # m=2, a=1, b=3
    assert (
        "<table><tr><th>hA</th><th>hB</th></tr>"
        "<tr><td>a1</td><td>b3</td></tr></table>" in html
    )


def test_mode3_omml_superscript():
    html = decode_docx(synth_docx_bytes(9))  # m=3, b=4
    assert '<span class="math inline">x^{4}+1</span>' in html


def test_decode_is_deterministic():
    assert synth_docx_bytes(11) == synth_docx_bytes(11)
    assert decode_docx(synth_docx_bytes(11)) == decode_docx(synth_docx_bytes(11))


def test_kernel_end_to_end():
    """Decoded HTML flows through the real DOM kernel (the full T1 path)."""
    from extractor.kernel import convert_text

    r = convert_text(decode_docx(synth_docx_bytes(8)))
    assert r.error is None
    assert r.tables_count == 1
    assert r.extracted_text.startswith("pre1")
    assert "| hA | hB |" in r.extracted_text

    r = convert_text(decode_docx(synth_docx_bytes(7)))
    assert r.images_count == 1
    # T2 normalization: package media path → images/<basename>
    assert r.images[0]["src"] == "images/image1.png"


def test_error_containment_non_zip():
    with pytest.raises(ValueError):
        decode_docx(b"%PDF-1.4 not a docx")
    with pytest.raises(ValueError):
        decode_docx(None)


def test_error_missing_document_xml():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/other.xml", "<x/>")
    with pytest.raises(ValueError, match="document.xml"):
        decode_docx(buf.getvalue())


def test_missing_rels_degrades_to_default_src():
    """A drawing whose rId has no rels entry gets the fallback media path
    (per-unit degradation, not a raised error)."""
    xml = synth_docx_xml(7)  # m=1 contains the rId7 drawing
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr("word/document.xml", xml)  # no document.xml.rels part
    html = decode_docx(buf.getvalue())
    assert '<img src="media/image.png" alt="" />' in html


def test_omml_fraction_and_subscript():
    omml = (
        f'<m:oMath xmlns:m="http://schemas.openxmlformats.org/officeDocument/2006/math">'
        f"<m:f><m:num><m:r><m:t>a</m:t></m:r></m:num>"
        f"<m:den><m:r><m:t>b</m:t></m:r></m:den></m:f>"
        f"<m:sSub><m:e><m:r><m:t>y</m:t></m:r></m:e>"
        f"<m:sub><m:r><m:t>i</m:t></m:r></m:sub></m:sSub>"
        f"</m:oMath>"
    )
    assert _omml_to_latex(ET.fromstring(omml)) == "\\frac{a}{b}y_{i}"


def test_unknown_elements_degrade_to_text():
    """Out-of-subset body elements are skipped, not fatal."""
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        "<w:body><w:sdt><w:p><w:r><w:t>inside-sdt</w:t></w:r></w:p></w:sdt>"
        "<w:p><w:r><w:t>plain</w:t></w:r></w:p></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    html = decode_docx(buf.getvalue())
    assert html == "<p>plain</p>"  # sdt container skipped, no crash


def test_html_escaping_in_runs():
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        "<w:body><w:p><w:r><w:t>a &lt; b &amp; c</w:t></w:r></w:p></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    assert decode_docx(buf.getvalue()) == "<p>a &lt; b &amp; c</p>"


def test_mode4_lists_grouped_and_numbering_resolved():
    html = decode_docx(synth_docx_bytes(10))  # m=4, a=3, b=0
    assert "<ul><li>bulA3</li><li>bulB0</li></ul>" in html
    assert "<ol><li>numA3</li><li>numB0</li></ol>" in html


def test_mode5_hyperlink_resolved():
    html = decode_docx(synth_docx_bytes(11))  # m=5, a=4, b=1
    assert '<a href="https://example.com/doc">link4</a>' in html


def test_hyperlink_without_rel_degrades_to_text():
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<w:body><w:p><w:hyperlink r:id="rId99"><w:r><w:t>orphan</w:t></w:r>'
        "</w:hyperlink></w:p></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    assert decode_docx(buf.getvalue()) == "<p>orphan</p>"


def test_list_without_numbering_part_defaults_to_bullet():
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        "<w:body>"
        '<w:p><w:pPr><w:numPr><w:numId w:val="5"/></w:numPr></w:pPr>'
        "<w:r><w:t>item</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    assert decode_docx(buf.getvalue()) == "<ul><li>item</li></ul>"


def test_table_flushes_open_list():
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        "<w:body>"
        '<w:p><w:pPr><w:numPr><w:numId w:val="1"/></w:numPr></w:pPr>'
        "<w:r><w:t>item</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>c</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    html = decode_docx(buf.getvalue())
    assert html.index("</ul>") < html.index("<table>")


def test_corrupt_zip_and_xml_raise_valueerror():
    """Containment contract: corrupt packages surface as ValueError, not
    BadZipFile / ParseError (which would escape per-row catches)."""
    with pytest.raises(ValueError, match="corrupt DOCX"):
        decode_docx(b"PK\x03\x04garbage-not-a-zip")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", "<w:document truncated")
    with pytest.raises(ValueError, match="corrupt DOCX"):
        decode_docx(buf.getvalue())
