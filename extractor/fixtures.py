"""Golden fixture corpus for the extraction kernel (SURVEY.md §5.1).

Each case exercises a sub-operator of the reference core (T2–T10,
``app/core/html_processor.py``); the expected outputs live in
``fixtures/golden_kernel.json`` (hand-reviewed, byte-exact — the pinned
specification of the kernel's observable behavior, standing in for the
reference's output since bs4/html2text/pandoc are not installable here).

Coverage map: FIXTURES.md §3.
"""

from __future__ import annotations

FIXTURE_CASES: dict[str, str | None] = {
    # --- plain / degenerate inputs (O4 containment, F3 analogue) ---------
    "plain_prose": "Hello   world, this is  plain\n\nprose text.",
    "empty": "",
    "null": None,
    "whitespace_only": "  \n\t \n ",
    "non_html_markdown": "# Already markdown\n\n- bullet one\n- bullet two",
    "placeholder_lookalike": "literal ___TABLE_PLACEHOLDER_0___ in text",
    # --- prose markup (T8 linearizer) ------------------------------------
    "headings_paragraphs": (
        "<h1>Title</h1><p>Intro paragraph.</p><h2>Section</h2>"
        "<p>Body with <strong>bold</strong>, <em>italic</em> and "
        "<code>inline_code()</code>.</p>"
    ),
    "links": (
        '<p>See <a href="https://spark.apache.org">the docs</a>, an internal '
        '<a href="#sec1">anchor</a>, and <a href="https://x.example">'
        "https://x.example</a>.</p>"
    ),
    "lists_nested": (
        "<ul><li>one</li><li>two<ul><li>deep a</li><li>deep b</li></ul></li>"
        "</ul><ol><li>first</li><li>second</li></ol>"
    ),
    "line_breaks": "<p>line one<br>line two<br/>line three</p>",
    "hr_rule": "<p>above</p><hr><p>below</p>",
    "div_soup": "<div>outer<div>inner block</div>tail</div>",
    "span_transparent": '<p>a <span class="x">spanned</span> word</p>',
    "script_dropped": "<p>kept</p><script>var x = 1;</script><style>p{}</style>",
    # --- cleanup chain (T10; SQL-oracle-able) ----------------------------
    "blockquote_stripped": "<blockquote>quoted wisdom</blockquote><p>after</p>",
    "nested_blockquote": "<blockquote><blockquote>deep quote</blockquote></blockquote>",
    "pre_code_marked": "<pre><code>def f():\n    return 1\n</code></pre>",
    "excess_newlines": "<p>a</p>\n\n\n\n\n<p>b</p>",
    # --- tables (T4/T5) ---------------------------------------------------
    "table_with_header": (
        "<table><tr><th>Name</th><th>Qty</th></tr>"
        "<tr><td>apple</td><td>3</td></tr><tr><td>pear</td><td>5</td></tr></table>"
    ),
    "table_no_header": (
        "<table><tr><td>r1c1</td><td>r1c2</td></tr>"
        "<tr><td>r2c1</td><td>r2c2</td></tr></table>"
    ),
    "table_ragged_rows": (
        "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr>"
        "<tr><td>only-one-cell</td></tr><tr><td>3</td><td>4</td></tr></table>"
    ),
    "table_cell_markup": (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>text <b>bold</b> mix</td><td> padded </td></tr></table>"
    ),
    "table_image_in_cell": (
        '<table><tr><th>pic</th><th>label</th></tr>'
        '<tr><td><img src="media/a/cell.png" alt="cell img"></td>'
        "<td>caption</td></tr></table>"
    ),
    "table_image_titled_cell": (
        '<table><tr><td>c1<img src="m/t.png" alt="t" title="Titled"></td>'
        "<td>c2</td></tr><tr><td>a</td><td>b</td></tr></table>"
    ),
    "table_empty": "<table></table>",
    "table_first_row_no_cells": (
        # reference quirk: first <tr> without th/td cells → arity check does
        # len(int) → TypeError → whole table degrades to empty (:216-218);
        # the placeholder restores to nothing, but the table is still counted.
        "<table><tr></tr><tr><td>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr></table><p>tail</p>"
    ),
    "two_tables": (
        "<p>first:</p><table><tr><th>x</th></tr><tr><td>1</td></tr></table>"
        "<p>second:</p><table><tr><th>y</th></tr><tr><td>2</td></tr></table>"
    ),
    # --- math (T6) --------------------------------------------------------
    "math_data_latex_attr": (
        '<p>Energy:</p><math data-latex="E=mc^2"><mi>E</mi></math>'
    ),
    "math_data_tex_attr": '<span class="math inline" data-tex="a+b"></span>',
    "math_text_content": '<span class="math display">\\(x^2 + y^2\\)</span>',
    "math_annotation": (
        "<math><semantics><mrow><mi>z</mi></mrow>"
        '<annotation encoding="application/x-tex">z_0</annotation>'
        "</semantics></math>"
    ),
    "math_long_display": (
        '<math data-latex="\\sum_{i=0}^{N} \\alpha_i x^i + \\beta_i y^i + '
        '\\gamma_i z^i = 0"><mi>s</mi></math>'
    ),
    "math_multiline": '<span class="math">line1\nline2</span>',
    "math_predollared": '<span class="math">$already$</span>',
    "math_empty_fallback": "<math><mrow></mrow></math>",
    "math_class_quirk_errors": '<math class="math"><mi>x</mi></math>',
    "math_two_inline": (
        '<p>Both <span class="math">a^2</span> and <span class="math">b^2</span>.</p>'
    ),
    # --- images (T2/T7) ---------------------------------------------------
    "image_standalone": '<p>Look:</p><img src="media/img/pic1.png" alt="a pic">',
    "image_titled": '<img src="deep/path/p.png" alt="alt text" title="The Title">',
    "image_no_src": "<img alt='lost'>",
    "image_numbering_after_table": (
        '<table><tr><td>c<img src="x/incell.png" alt="in"></td><td>d</td></tr>'
        '<tr><td>1</td><td>2</td></tr></table><img src="y/solo.png" alt="solo">'
    ),
    # --- combined document ------------------------------------------------
    "full_document": (
        "<h1>Report</h1><p>Intro with <strong>emphasis</strong>.</p>"
        "<table><tr><th>metric</th><th>value</th></tr>"
        "<tr><td>throughput</td><td>42</td></tr></table>"
        '<p>Formula: <math data-latex="T = n/s"><mi>T</mi></math></p>'
        '<img src="m/chart.png" alt="chart" title="Chart 1">'
        "<blockquote>a quoted remark</blockquote>"
        "<ul><li>takeaway one</li><li>takeaway two</li></ul>"
    ),
    # --- markdown escaping (html2text escape_md_section) ------------------
    "md_escape_numbered_prose": "1. not a list\n2. still prose",
    "md_escape_dash_plus": "- dash start\n+ plus start\nmid - dash stays",
    "md_escape_backslash": r"a \*literal star\* and C:\path\to\file",
    "md_escape_code_exempt": (
        "<p>1. escaped</p><pre>2. raw pre</pre>"
        "<p>x <code>3. code raw</code> y</p>"
    ),
    "md_escape_chunk_anchor": (
        # html2text anchors ^ per text CHUNK: the text node after </b>
        # starts " 1. bar" → dot-escaped even though it is mid-line.
        "<p>foo <b>x</b> 1. bar</p>"
    ),
    # --- entity-chunk boundaries (bs4 round-trip; linearize.escape_md_text):
    # bs4 decodes source charrefs, re-escapes only & < > on serialization,
    # and html2text receives those as separate UNESCAPED chunks that
    # re-anchor ^ for the neighboring literal chunks.
    "md_escape_entity_boundary_numbered": "<p>x &amp; 1. y</p>",
    "md_escape_charref_decoded_list": "<p>&#49;. foo</p>",
    "md_escape_amp_literal_rest": "<p>&amp;#x2b; x</p>",
    "md_escape_gt_boundary_plus": "foo >+ bar",  # prose fast path
    "md_escape_gt_boundary_numbered": "scores >1. top",  # prose fast path
    "md_escape_lt_boundary_dash": "<p>a &lt;- b</p>",
    # backslash RUNS before a special char: every backslash in the run is
    # followed by a special (\\ itself is special), so a run of k doubles
    # to 2k before a special and 2k-1 otherwise (lookahead semantics).
    "md_escape_backslash_run": "run \\\\* end and \\\\ alone",
    # --- sloppy real-world HTML ------------------------------------------
    "unclosed_tags": "<p>para one<p>para two<ul><li>a<li>b</ul>",
    "entities": "<p>5 &lt; 6 &amp;&amp; 7 &gt; 3 &mdash; &quot;ok&quot;</p>",
    # --- operator interaction cases --------------------------------------
    "math_in_table_cell": (
        # tables extract FIRST (T7 order), so in-cell math is flattened to
        # its text by get_text, never becoming a math placeholder
        '<table><tr><th>eq</th><th>name</th></tr>'
        '<tr><td><span class="math">E=mc^2</span></td><td>einstein</td></tr>'
        "</table>"
    ),
    "list_in_blockquote": (
        "<blockquote><p>quoth:</p><ul><li>item a</li><li>item b</li></ul>"
        "</blockquote>"
    ),
    "table_after_list": (
        "<ul><li>first</li><li>second</li></ul>"
        "<table><tr><th>k</th></tr><tr><td>v</td></tr></table>"
    ),
    "link_with_emphasis": (
        '<p>A <a href="https://x.example"><strong>bold link</strong></a> and '
        '<em><a href="https://y.example">italic link</a></em>.</p>'
    ),
    "entities_in_table": (
        "<table><tr><th>expr</th></tr><tr><td>a &lt; b &amp;&amp; c</td></tr>"
        "</table>"
    ),
    "dl_definition_list": (
        "<dl><dt>term</dt><dd>definition text here</dd>"
        "<dt>term2</dt><dd>second definition</dd></dl>"
    ),
    "two_maths_same_latex": (
        '<p><span class="math">x+y</span> then <span class="math">x+y</span></p>'
    ),
    "image_between_paragraphs": (
        '<p>before</p><img src="a/b.png" alt="mid"><p>after</p>'
    ),
    "crlf_newlines": "<p>line1</p>\r\n\r\n\r\n\r\n<p>line2</p>",
    "only_boilerplate_tags": "<div><span></span><b></b></div>",
    "top_level_inline": "before <strong>bold</strong> and <em>em</em> after",
    "nested_table": (
        # reference quirk: inner table gets a placeholder entry (counted)
        # that never surfaces — it is flattened into the outer cell's text
        "<table><tr><th>outer</th></tr><tr><td>"
        "<table><tr><td>inner</td></tr></table></td></tr></table><p>tail</p>"
    ),
}


def oversized_case(max_chars: int) -> str:
    """A deterministic text exceeding *max_chars* (size-cap quarantine)."""
    return "x" * (max_chars + 1)


# T1 option-axis cases: (html, ConvertOptions kwargs).  Golden outputs in
# fixtures/golden_options.json (same hand-reviewed-spec discipline as the
# main corpus).
OPTION_CASES: dict[str, tuple[str, dict]] = {
    "mathjax_inline": (
        '<p>Sum: <span class="math">a+b</span> done.</p>',
        {"math_engine": "mathjax"},
    ),
    "mathjax_display": (
        '<math data-latex="\\sum_{i=0}^{N} \\alpha_i x^i + \\beta_i y^i + '
        '\\gamma_i z^i = 0"><mi>s</mi></math>',
        {"math_engine": "mathjax"},
    ),
    "mathjax_predollared": (
        '<span class="math">$already$</span>',
        {"math_engine": "mathjax"},
    ),
    "mathml_passthrough": (
        '<p>Energy:</p><math data-latex="E=mc^2"><mi>E</mi></math>',
        {"math_engine": "mathml"},
    ),
    "toc_basic": (
        "<h1>Title</h1><p>intro</p><h2>Section A</h2><p>a</p>"
        "<h2>Section B</h2><h3>B.1</h3><p>b1</p>",
        {"include_toc": True},
    ),
    "toc_depth_capped": (
        "<h1>Top</h1><h4>Deep4</h4><h5>Deep5 excluded</h5><p>body</p>",
        {"include_toc": True},
    ),
    "toc_no_headings_empty": (
        "<p>just prose, no headings</p>",
        {"include_toc": True},
    ),
    "toc_plus_mathjax_combined": (
        '<h1>Doc</h1><p>f: <span class="math">x^2</span></p>',
        {"include_toc": True, "math_engine": "mathjax"},
    ),
}
