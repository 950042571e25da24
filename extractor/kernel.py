"""The extraction kernel: operators T2–T10 fused into one pure function.

Reproduces, byte-for-byte, the observable text output of the reference's
stage-2 core ``HTMLProcessor.convert_html_to_markdown_enhanced``
(``app/core/html_processor.py:32-126``) as a self-contained
``convert_text(str) -> ExtractionResult``:

  parse (T3, :65) → special-element protect (T7, :344-422) with
  table→pipe-table (T4/T5, :154-274) and math→LaTeX (T6, :276-342) →
  body linearization (T8, :77-83) → placeholder restore (T9, :447-480) →
  markdown cleanup regex chain (T10, :482-509).

Reference quirks intentionally reproduced, not fixed:

- ``<math class="…math…">`` elements are matched by BOTH find_all passes
  (:373-374); the second ``replace_with`` on the already-detached element
  raises ``ValueError`` inside bs4, failing the whole document (caught by the
  outer handler :123-126 → error result).  We raise and catch identically.
- blockquote stripping (:493) and 4-space-indent stripping (:497) apply to
  *all* content, destroying real blockquotes/code indents.
- table rows whose cell count mismatches the header are dropped (:210-211).
- a table whose FIRST <tr> has no th/td cells (but later rows do) degrades
  to empty content: the reference's arity check evaluates ``len(int)`` →
  TypeError → caught at :216-218 → ("", []).
- prose text chunks get html2text's ``escape_md_section`` markdown escaping
  (backslash-before-special doubled; chunk-leading ``1.``/``+``/``-``
  escaped) — outside code/pre only, with ``&``/``<``/``>`` acting as
  unescaped entity-chunk boundaries exactly as the bs4 serialization
  round-trip produces them; see ``linearize.escape_md_text``.
- in-table images never get placeholders (placeholder='' :258) and so are
  never "restored"; they are inlined in the cell text (T5) but still counted.
- standalone-image placeholder numbering continues after in-table images
  (``len(image_list)`` :407).

Scale note: this module is imported on executors and invoked through
``convert_batch`` over whole Arrow record batches (``pd.Series`` in,
``pd.DataFrame`` out) — the per-row loop lives here, inside the batch,
amortized by Arrow transfer; Spark never dispatches per-row Python.
"""

from __future__ import annotations

import posixpath
import re
from dataclasses import dataclass, field

from .dom import Element, parse_html
from .linearize import escape_md_text, linearize

# Mirrors MAX_FILE_SIZE (reference app/config.py:24): 50 MB per unit of work.
MAX_TEXT_CHARS = 50 * 1024 * 1024

_MATH_DELIM_RE = re.compile(r"[\\$]+")

# T1 conversion-option axes (reference user-facing surface):
#   math_engine — pandoc --mathml|--latex|--mathjax selection
#     (app/core/pandoc_converter.py:58-64, default app/config.py:34),
#     validated like app/models.py:34-40 (ValueError on unknown engine);
#   include_toc — pandoc --toc --toc-depth (pandoc_converter.py:66-69,
#     depth default app/config.py:35). Pandoc emits the TOC as a <nav> of
#     internal #links; under the pinned html2text config
#     (skip_internal_links) those render as a plain nested bullet list of
#     heading texts — which is what ``include_toc`` produces here.
MATH_ENGINES = ("mathml", "latex", "mathjax")


@dataclass(frozen=True)
class ConvertOptions:
    """Per-run conversion options (one column/argument per reference knob).

    ``latex`` is the default engine so the option-free pipeline keeps its
    pinned golden behavior ($..$ / $$..$$ delimiters)."""

    math_engine: str = "latex"
    include_toc: bool = False
    toc_depth: int = 4

    def __post_init__(self):
        if self.math_engine not in MATH_ENGINES:
            # mirrors the reference's request validation (models.py:34-40)
            raise ValueError(
                f"Math engine must be one of: {list(MATH_ENGINES)}"
            )


DEFAULT_OPTIONS = ConvertOptions()


@dataclass
class ExtractionResult:
    extracted_text: str | None
    spans: list = field(default_factory=list)
    tables_count: int = 0
    math_count: int = 0
    images_count: int = 0
    output_length: int = 0
    error: str | None = None
    # image inventory (reference ImageInfo, app/models.py:52-58; built at
    # html_processor.py:250-261,408-415) — explodes to the S6 side table
    images: list = field(default_factory=list)


def _basename(src: str) -> str:
    # Path(src).name equivalent for URL-ish/POSIX paths.
    return posixpath.basename(src.rstrip("/")) if src else ""


def _image_markdown(alt: str, src: str, title: str) -> str:
    # Reference app/core/html_processor.py:246-249,401-404.
    if title:
        return f'![{alt}]({src} "{title}")'
    return f"![{alt}]({src})"


def _process_table_cell(cell: Element) -> tuple[str, list[dict]]:
    """T5 (reference :220-274): inline images → markdown, then stripped text.
    Mirrors the reference's per-cell containment (:271-274): on error, fall
    back to bare get_text — which may itself raise, propagating to T4."""
    try:
        return _process_table_cell_inner(cell)
    except Exception:
        return cell.get_text(strip=True), []


def _process_table_cell_inner(cell: Element) -> tuple[str, list[dict]]:
    cell_images = []
    for img in cell.find_all("img"):
        src = img.get("src", "")
        alt = img.get("alt", "")
        title = img.get("title", "")
        markdown_img = _image_markdown(alt, src, title)
        cell_images.append(
            {
                "src": src,
                "alt": alt,
                "title": title,
                "filename": _basename(src),
                "markdown": markdown_img,
                "placeholder": "",  # in-table images get none (reference :258)
                "in_table": True,
            }
        )
        img.replace_with(markdown_img)
    return cell.get_text(strip=True), cell_images


def _convert_table_to_markdown(table: Element) -> tuple[str, list[dict]]:
    """T4 (reference :154-218): HTML table → pipe table; arity-mismatched rows
    dropped; first row is always the header; trailing blank line.  A failing
    table degrades to empty content (reference :216-218), not a doc error."""
    try:
        return _convert_table_to_markdown_inner(table)
    except Exception:
        return "", []


def _convert_table_to_markdown_inner(table: Element) -> tuple[str, list[dict]]:
    rows = table.find_all("tr")
    if not rows:
        return "", []
    table_images: list[dict] = []

    header_cells: list[str] = []
    for cell in rows[0].find_all(["th", "td"]):
        content, imgs = _process_table_cell(cell)
        header_cells.append(content)
        table_images.extend(imgs)

    data_rows: list[list[str]] = []
    for row in rows[1:] if header_cells else rows:
        row_cells = []
        for cell in row.find_all(["th", "td"]):
            content, imgs = _process_table_cell(cell)
            row_cells.append(content)
            table_images.extend(imgs)
        if row_cells:
            data_rows.append(row_cells)

    if not header_cells and not data_rows:
        return "", []

    if not header_cells:
        # First <tr> has no th/td but later rows do (reference :203-213):
        # the arity check evaluates ``len(header_cells if header_cells else
        # len(...))`` = ``len(int)`` → TypeError, swallowed by the outer
        # handler (:216-218) — so the ENTIRE table degrades to empty
        # content, images included.  Reproduced as an explicit raise.
        raise TypeError("reference no-header arity check: len(int)")

    lines: list[str] = []
    lines.append("| " + " | ".join(header_cells) + " |")
    lines.append("| " + " | ".join(["---"] * len(header_cells)) + " |")
    arity = len(header_cells)

    for row in data_rows:
        if len(row) == arity:  # mismatched-arity rows silently dropped (:211)
            lines.append("| " + " | ".join(row) + " |")

    return "\n".join(lines) + "\n\n", table_images


def _convert_math_to_markdown(el: Element, math_engine: str = "latex") -> str:
    """T6 (reference :276-342): LaTeX extraction + delimiter wrapping.

    *math_engine* selects the emitted representation (the T1 axis):
    ``latex`` → ``$…$``/``$$…$$`` (the pinned default), ``mathjax`` →
    ``\\(…\\)``/``\\[…\\]`` (pandoc --mathjax delimiters), ``mathml`` →
    the element's original markup, untouched (pandoc --mathml keeps MathML
    in the stream)."""
    if math_engine == "mathml":
        return str(el)
    latex = ""
    for attr in ("data-latex", "data-tex", "latex", "tex"):
        if attr in el.attrs:
            latex = el.attrs[attr]
            break
    if not latex:
        text = el.get_text(strip=True)
        if text:
            latex = _MATH_DELIM_RE.sub("", text).strip()
    if not latex:
        ann = el.find("annotation", encoding="application/x-tex")
        if ann is not None:
            latex = ann.get_text(strip=True)
    if latex:
        latex = latex.strip()
        if latex.startswith("$$") or latex.endswith("$$"):
            return latex
        if latex.startswith("$") or latex.endswith("$"):
            return latex
        display = "\n" in latex or len(latex) > 50
        if math_engine == "mathjax":
            return f"\\[\n{latex}\n\\]" if display else f"\\({latex}\\)"
        return f"$$\n{latex}\n$$" if display else f"${latex}$"
    return str(el)  # fallback: original HTML (:338)


def _math_class_filter(token) -> bool:
    # reference :373 — lambda x: x and 'math' in str(x).lower()
    return bool(token) and "math" in str(token).lower()


def _extract_special_elements(
    doc: Element,
    correct_image_path: str = "images",
    math_engine: str = "latex",
) -> tuple[dict, dict, list]:
    """T7 (reference :344-422). Mutates *doc* in place.

    Single-walk optimization: the reference performs four full-tree
    ``find_all`` passes (tables; class-matched math/span; all math; images).
    We snapshot all candidates in ONE walk, then filter each group by
    attachment at the moment the reference would have searched — a math/img
    detached by an earlier replacement (e.g. inside an extracted table) is
    skipped *before* enumeration, so placeholder numbering is byte-identical
    to the sequential-search original (pinned by the golden fixtures and the
    equivalence property test)."""
    table_placeholders: dict[str, str] = {}
    math_placeholders: dict[str, str] = {}
    image_list: list[dict] = []

    tables: list[Element] = []
    math_class_matched: list[Element] = []
    math_tags: list[Element] = []
    imgs: list[Element] = []
    for el in doc.iter_elements():
        tag = el.tag
        if tag == "table":
            tables.append(el)
        elif tag == "img":
            imgs.append(el)
        if tag in ("math", "span"):
            tokens = el.classes
            if (
                any(_math_class_filter(t) for t in tokens)
                if tokens
                else _math_class_filter(None)
            ):
                math_class_matched.append(el)
            if tag == "math":
                math_tags.append(el)

    for i, table in enumerate(tables):
        placeholder = f"___TABLE_PLACEHOLDER_{i}___"
        markdown_table, table_images = _convert_table_to_markdown(table)
        table_placeholders[placeholder] = markdown_table
        image_list.extend(table_images)
        table.replace_with(placeholder)

    # Dual-pass math find (reference :373-374): class-matched math/span first,
    # then ALL <math> tags — a <math class="…math…"> appears twice and the
    # second replace_with raises (quirk documented in the module docstring).
    math_elements = [m for m in math_class_matched if m.is_attached_to(doc)]
    math_elements.extend(m for m in math_tags if m.is_attached_to(doc))
    for i, math in enumerate(math_elements):
        placeholder = f"___MATH_PLACEHOLDER_{i}___"
        math_placeholders[placeholder] = _convert_math_to_markdown(
            math, math_engine
        )
        math.replace_with(placeholder)

    for img in (el for el in imgs if el.is_attached_to(doc)):
        src = img.get("src", "")
        if correct_image_path and src:
            src = f"{correct_image_path}/{_basename(src)}"  # T2 path normalize
        alt = img.get("alt", "")
        title = img.get("title", "")
        markdown_img = _image_markdown(alt, src, title)
        placeholder = f"___IMAGE_PLACEHOLDER_{len(image_list)}___"
        image_list.append(
            {
                "src": src,
                "alt": alt,
                "title": title,
                "filename": _basename(src),
                "markdown": markdown_img,
                "placeholder": placeholder,
            }
        )
        img.replace_with(placeholder)

    return table_placeholders, math_placeholders, image_list


def _restore_special_elements(
    markdown: str, tables: dict, maths: dict, images: list
) -> str:
    """T9 (reference :447-480)."""
    for placeholder, table_md in tables.items():
        markdown = markdown.replace(placeholder, f"\n{table_md}")
    for placeholder, math_md in maths.items():
        markdown = markdown.replace(placeholder, math_md)
    for info in images:
        if info.get("placeholder") and info.get("markdown"):
            markdown = markdown.replace(info["placeholder"], info["markdown"])
    return markdown


_CLEANUP_STEPS = (
    (re.compile(r"^>\s*", re.MULTILINE), ""),
    (re.compile(r"^\t+", re.MULTILINE), ""),
    (re.compile(r"^    ", re.MULTILINE), ""),
    (re.compile(r"\n{4,}"), "\n\n\n"),
    (re.compile(r"\n{3}(?=\n)"), "\n\n"),
    (re.compile(r"\n+(<table)"), r"\n\1"),
    (re.compile(r"(</table>)\n+"), r"\1\n\n"),
    (re.compile(r"\n+(<math)"), r"\n\1"),
    (re.compile(r"(</math>)\n+"), r"\1\n"),
)


def clean_markdown(content: str) -> str:
    """T10 (reference :482-509) — the ordered cleanup regex chain, verbatim.

    This sub-operator is SQL-expressible (chained regexp_replace + trim);
    see ``__spark_entry__.oracle_sql``'s ``t10_markdown_cleanup``.
    """
    for pattern, repl in _CLEANUP_STEPS:
        content = pattern.sub(repl, content)
    return content.strip()


def _compute_spans(text: str, tables: dict, maths: dict, images: list) -> list:
    """Character-span offsets of each restored element in the final text.

    Duplicate snippets are matched left-to-right (per-snippet cursor), so two
    identical math elements get two distinct spans.  Elements whose snippet
    was destroyed by cleanup (or never surfaced) are skipped.
    """
    spans: list[dict] = []
    cursor: dict[str, int] = {}

    def locate(kind: str, snippet: str) -> None:
        needle = snippet.strip()
        if not needle:
            return
        start = text.find(needle, cursor.get(needle, 0))
        if start < 0:
            return
        cursor[needle] = start + len(needle)
        spans.append({"kind": kind, "start": start, "end": start + len(needle)})

    for table_md in tables.values():
        locate("table", table_md)
    for math_md in maths.values():
        locate("math", math_md)
    for info in images:
        if info.get("placeholder"):
            locate("image", info["markdown"])
    spans.sort(key=lambda s: (s["start"], s["end"]))
    return spans


_WS_COLLAPSE = re.compile(r"[ \t\r\n\f\v]+")
# anything that makes the collapse non-identity: a non-space whitespace
# char, or two spaces in a row
_WS_PROBE = re.compile(r"[\t\r\n\f\v]|  ")
_BQ_PREFIX = re.compile(r">\s*(.*)", re.DOTALL)

_HEADING_TAGS = ("h1", "h2", "h3", "h4", "h5", "h6")


def _toc_block(doc: Element, toc_depth: int) -> str:
    """Markdown TOC: what pandoc --toc's <nav> of internal #links becomes
    under the pinned html2text config (skip_internal_links → bare heading
    texts in a nested bullet list, our list indent convention)."""
    from .linearize import _inline_text

    lines = []
    for el in doc.iter_elements():
        if el.tag in _HEADING_TAGS:
            level = int(el.tag[1])
            if level > toc_depth:
                continue
            inner = _inline_text(el)
            if inner:
                lines.append(" " * (2 + 4 * (level - 1)) + "* " + inner)
    return "\n".join(lines)


def convert_text(
    text: str | None,
    max_chars: int = MAX_TEXT_CHARS,
    options: ConvertOptions = DEFAULT_OPTIONS,
) -> ExtractionResult:
    """Full T2–T10 pipeline over one turn's text. Never raises (O4)."""
    if text is None:
        return ExtractionResult(None, error="null_input")
    if len(text) > max_chars:  # F3 size predicate → quarantine row
        return ExtractionResult(None, error=f"size_exceeded:{len(text)}")
    if "<" not in text and "&" not in text:
        # Plain-prose fast path: with no markup and no entities, the full
        # pipeline reduces to md-escaping of the single text node (html2text
        # escape_md_text: '>' still splits entity chunks that re-anchor ^,
        # line anchors seen pre-collapse) + whitespace collapse (T8 on a
        # bare text node) followed by the T10 cleanup chain — and on a
        # collapsed single-line string only T10's leading-"^>\s*" rule can
        # fire (no newlines, no tabs, no leading 4-space run, no
        # <table>/<math> literals survive the "<" guard).  Byte-identical
        # to the slow path (equivalence property-tested); skips DOM parse
        # entirely — the common case in real transcript corpora.
        # probe-gated collapse: ordinary prose has only single spaces
        # (no tabs/newlines, no double spaces), making the collapse sub
        # an identity that still rebuilds the string match by match —
        # one C-speed probe skips it (3× fast-path, probe-miss ⇒ sub
        # is the identity, fuzz-pinned in test_properties)
        esc = escape_md_text(text)
        collapsed = (
            _WS_COLLAPSE.sub(" ", esc) if _WS_PROBE.search(esc) else esc
        ).strip()
        if collapsed.startswith(">"):
            collapsed = _BQ_PREFIX.match(collapsed).group(1).strip()
        return ExtractionResult(
            extracted_text=collapsed, output_length=len(collapsed)
        )
    try:
        doc = parse_html(text)
        toc = (
            _toc_block(doc, options.toc_depth) if options.include_toc else ""
        )
        tables, maths, images = _extract_special_elements(
            doc, math_engine=options.math_engine
        )
        markdown = linearize(doc)
        markdown = _restore_special_elements(markdown, tables, maths, images)
        if toc:
            # pandoc places the TOC nav before the body; html2text renders
            # it as the document's first block
            markdown = toc + "\n\n" + markdown
        markdown = clean_markdown(markdown)
        return ExtractionResult(
            extracted_text=markdown,
            spans=_compute_spans(markdown, tables, maths, images),
            tables_count=len(tables),
            math_count=len(maths),
            images_count=len(images),
            output_length=len(markdown),
            images=[
                {
                    "src": i["src"],
                    "alt": i["alt"],
                    "title": i["title"],
                    "filename": i["filename"],
                    "in_table": bool(i.get("in_table", False)),
                }
                for i in images
            ],
        )
    except Exception as exc:  # mirrors reference :123-126 error containment
        return ExtractionResult(
            None, error=f"Error converting HTML to Markdown: {exc}"
        )


def convert_batch(
    texts,
    max_chars: int = MAX_TEXT_CHARS,
    options: ConvertOptions = DEFAULT_OPTIONS,
):
    """Arrow-batch kernel: ``pd.Series[str] -> pd.DataFrame`` (one call per
    record batch inside ``mapInPandas`` — zero per-row Python dispatch from
    Spark's side).

    Verbatim-repeat memo: agent corpora repeat turns byte-identically
    (system prompts re-sent every episode, echoed tool banners), and
    ``convert_text`` is pure, so identical inputs within a batch are
    converted once and the result row reused.  The memo is per-batch
    (options are fixed per call, lifetime bounded by the Arrow batch)
    and stops inserting past a size cap so a pathological all-distinct
    batch costs one dict probe per row and bounded memory."""
    import pandas as pd

    rows = []
    memo: dict = {}
    for value in texts:
        key = None if value is None or value is pd.NA else value
        row = memo.get(key)
        if row is None:
            r = convert_text(key, max_chars, options)
            row = (
                r.extracted_text,
                r.spans,
                r.tables_count,
                r.math_count,
                r.images_count,
                r.output_length,
                r.error,
                r.images,
            )
            if len(memo) < 65536:
                memo[key] = row
        rows.append(row)
    return pd.DataFrame(
        rows,
        columns=[
            "extracted_text",
            "spans",
            "tables_count",
            "math_count",
            "images_count",
            "output_length",
            "error",
            "images",
        ],
    )
