"""Main-content extraction via DOM heuristics (BASELINE.json north-star:
"HTML boilerplate stripping (tag-density + text-to-markup ratio DOM
heuristics a la readability/jusText)").

A deterministic jusText/readability-style classifier, self-contained on the
same stdlib DOM as the converter kernel (public-algorithm reimplementation
from the published descriptions — jusText: Pomikálek 2011 "Removing
boilerplate and duplicate content from web corpora"; readability's
link-density idea):

1. Segment the DOM into **blocks**: maximal text runs under block-level
   elements, splitting at nested block boundaries.
2. Per block compute:
   - ``text_len``        — characters of visible text
   - ``link_density``    — chars of text under <a> / text_len
   - ``tag_density``     — inline tag count / words (tag-density heuristic)
   - ``stopword_density``— stopword tokens / tokens
   - ``markup_ratio``    — text chars / (text chars + serialized markup
                            chars) (text-to-markup ratio)
3. Classify (context-free pass, jusText-style thresholds):
   - ``bad``  if link_density > 0.33, or text too markup-heavy
              (markup_ratio < 0.25), or tag_density > 1.0
   - ``good`` if text_len >= LONG_BLOCK and stopword_density >= 0.20
   - ``near_good`` if text_len >= SHORT_BLOCK and stopword_density >= 0.20
   - else ``short``
4. Context pass: ``near_good``/``short`` blocks adjacent to a ``good``
   block are promoted (jusText's neighbor smoothing, one iteration).
5. ``main_text`` = good+promoted blocks joined by blank lines; headings
   (h1–h6) are kept if any neighbor content survives.

Boilerplate in, prose out — nav menus, footer link farms, and tag-only
chrome are dropped.  Distributed via the same Arrow-batch pattern as the
converter kernel (``strip_boilerplate_batch``); per-row errors contained.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .dom import Element, parse_html

LONG_BLOCK = 80
SHORT_BLOCK = 20

STOPWORDS = frozenset(
    """a about above after again all also an and any are as at be because been
    but by can could did do does for from had has have he her his how i if in
    into is it its just like me more most my no not of on one only or other
    our out over she so some such than that the their them then there these
    they this to under up was we were what when where which while who will
    with would you your""".split()
)

_BLOCK_TAGS = frozenset(
    {
        "p", "div", "li", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6",
        "blockquote", "pre", "section", "article", "main", "aside", "header",
        "footer", "nav", "figure", "figcaption", "dd", "dt", "body", "html",
        "[document]", "ul", "ol", "table", "tr", "form",
    }
)
_SKIP_TAGS = frozenset({"script", "style", "head", "title", "noscript"})
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})


@dataclass
class Block:
    text: str
    tag: str
    link_chars: int
    inline_tags: int
    markup_chars: int
    label: str = "short"
    is_heading: bool = False

    @property
    def text_len(self) -> int:
        return len(self.text)

    @property
    def link_density(self) -> float:
        return self.link_chars / self.text_len if self.text_len else 1.0

    @property
    def stopword_density(self) -> float:
        toks = self.text.lower().split()
        if not toks:
            return 0.0
        return sum(1 for t in toks if t in STOPWORDS) / len(toks)

    @property
    def tag_density(self) -> float:
        words = max(len(self.text.split()), 1)
        return self.inline_tags / words

    @property
    def markup_ratio(self) -> float:
        total = self.text_len + self.markup_chars
        return self.text_len / total if total else 0.0


def _segment(doc: Element) -> list[Block]:
    """Walk the DOM collecting blocks (maximal inline runs)."""
    blocks: list[Block] = []

    def flush(buf, tag):
        text = " ".join("".join(buf["text"]).split())
        if text:
            blocks.append(
                Block(
                    text=text,
                    tag=tag,
                    link_chars=buf["link"],
                    inline_tags=buf["tags"],
                    markup_chars=buf["markup"],
                    is_heading=tag in _HEADING_TAGS,
                )
            )
        buf["text"], buf["link"], buf["tags"], buf["markup"] = [], 0, 0, 0

    def walk(el: Element, buf, in_link: bool, block_tag: str):
        for child in el.children:
            if isinstance(child, str):
                buf["text"].append(child)
                if in_link:
                    buf["link"] += len(" ".join(child.split()))
                continue
            if child.tag in _SKIP_TAGS:
                continue
            if child.tag in _BLOCK_TAGS:
                flush(buf, block_tag)
                walk(child, buf, in_link, child.tag)
                flush(buf, child.tag)
            else:
                buf["tags"] += 1
                buf["markup"] += 2 * len(child.tag) + 5  # <t></t> overhead
                walk(
                    child, buf, in_link or child.tag == "a", block_tag
                )

    buf = {"text": [], "link": 0, "tags": 0, "markup": 0}
    walk(doc, buf, False, "[document]")
    flush(buf, "[document]")
    return blocks


def _classify(blocks: list[Block], stopword_threshold: float = 0.20) -> None:
    """*stopword_threshold* = jusText's ``stopwords_high``; 0.0 selects the
    published language-independent mode (no stopword list: classification
    by link/tag density and length only) — the right setting for
    multilingual or non-natural-language corpora where an English stopword
    list would misclassify all main content as boilerplate."""
    for b in blocks:
        if b.is_heading:
            b.label = "heading"
        elif (
            b.link_density > 0.33
            or b.markup_ratio < 0.25
            or b.tag_density > 1.0
        ):
            b.label = "bad"
        elif b.text_len >= LONG_BLOCK and b.stopword_density >= stopword_threshold:
            b.label = "good"
        elif b.text_len >= SHORT_BLOCK and b.stopword_density >= stopword_threshold:
            b.label = "near_good"
        else:
            b.label = "short"

    # neighbor smoothing (one jusText-style pass)
    labels = [b.label for b in blocks]
    for i, b in enumerate(blocks):
        if b.label in ("near_good", "short"):
            prev_good = any(
                labels[j] == "good" for j in range(max(0, i - 1), i)
            )
            next_good = any(
                labels[j] == "good" for j in range(i + 1, min(len(blocks), i + 2))
            )
            if prev_good or next_good:
                b.label = "good" if b.label == "near_good" else b.label
    # headings survive if the following block is good
    for i, b in enumerate(blocks):
        if b.label == "heading":
            nxt = next(
                (x for x in blocks[i + 1 :] if x.label != "heading"), None
            )
            b.label = "good" if nxt is not None and nxt.label == "good" else "bad"


@dataclass
class BoilerplateResult:
    main_text: str | None
    n_blocks: int = 0
    n_good: int = 0
    boilerplate_ratio: float = 0.0
    blocks: list = field(default_factory=list)
    error: str | None = None


def strip_boilerplate(
    html: str | None,
    stopword_threshold: float = 0.20,
    want_blocks: bool = True,
) -> BoilerplateResult:
    """*want_blocks=False* skips materializing the per-block debug dicts
    (the batch/Arrow path discards them; they cost ~17% of kernel time)."""
    if html is None:
        return BoilerplateResult(None, error="null_input")
    try:
        doc = parse_html(html)
        blocks = _segment(doc)
        _classify(blocks, stopword_threshold)
        good = [b for b in blocks if b.label == "good"]
        total_chars = sum(b.text_len for b in blocks) or 1
        kept_chars = sum(b.text_len for b in good)
        return BoilerplateResult(
            main_text="\n\n".join(b.text for b in good),
            n_blocks=len(blocks),
            n_good=len(good),
            boilerplate_ratio=round(1.0 - kept_chars / total_chars, 4),
            blocks=[
                {
                    "text": b.text,
                    "label": b.label,
                    "link_density": round(b.link_density, 4),
                    "stopword_density": round(b.stopword_density, 4),
                    "tag_density": round(b.tag_density, 4),
                    "markup_ratio": round(b.markup_ratio, 4),
                }
                for b in blocks
            ]
            if want_blocks
            else [],
        )
    except Exception as exc:
        return BoilerplateResult(None, error=f"boilerplate_error: {exc}")


def strip_boilerplate_batch(texts, stopword_threshold: float = 0.20):
    """Arrow-batch wrapper (pd.Series -> pd.DataFrame), mapInPandas-ready."""
    import pandas as pd

    rows = []
    for value in texts:
        r = strip_boilerplate(
            None if value is None or value is pd.NA else value,
            stopword_threshold,
            want_blocks=False,
        )
        rows.append(
            (r.main_text, r.n_blocks, r.n_good, r.boilerplate_ratio, r.error)
        )
    return pd.DataFrame(
        rows,
        columns=["main_text", "n_blocks", "n_good", "boilerplate_ratio", "error"],
    )
