"""Minimal HTML DOM on stdlib ``html.parser``.

Self-contained replacement for the subset of BeautifulSoup behavior the
reference extraction core depends on (bs4 is not available in this
environment).  Mirrored behaviors, each pinned by the reference code:

- document-order ``find_all`` over tag names with an optional per-class-token
  callable filter (``app/core/html_processor.py:373``)
- ``get_text(strip=True)`` = strip each text node, drop empties, join with ``""``
  (``app/core/html_processor.py:267,300``)
- ``replace_with(text)`` detaches the node; calling it again on a detached node
  raises ``ValueError`` exactly like bs4 — the reference's duplicate-``<math>``
  quirk (``app/core/html_processor.py:373-374,378-382``) depends on this
- ``str(node)`` serializes back to HTML (math fallback,
  ``app/core/html_processor.py:338``)

Design note (scale): this module is pure Python and runs *inside* the Arrow
batch kernel on executors; it holds one document at a time and allocates
O(document size), never O(partition size).
"""

from __future__ import annotations

from html import escape
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

# Elements whose open tag implicitly closes a still-open element of the same
# (or listed) kind — enough leniency for sloppy real-world transcript HTML.
_IMPLICIT_CLOSERS = {
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "p": {"p"},
    "option": {"option"},
}


class Element:
    """One DOM element: tag, attrs (ordered), children (Element | str)."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list = []
        self.parent = parent

    # -- bs4-compatible surface -------------------------------------------

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    @property
    def classes(self) -> list[str]:
        raw = self.attrs.get("class")
        return raw.split() if raw else []

    def iter_elements(self):
        """Depth-first, document-order iteration over descendant Elements
        (iterative — no recursion, O(1) per element regardless of depth)."""
        stack = [iter(self.children)]
        while stack:
            for child in stack[-1]:
                if isinstance(child, Element):
                    yield child
                    stack.append(iter(child.children))
                    break
            else:
                stack.pop()

    def is_attached_to(self, root: "Element") -> bool:
        """True if *root* is reachable via the parent chain (i.e. this node
        has not been detached by replace_with somewhere above)."""
        node = self
        while node is not None:
            if node is root:
                return True
            node = node.parent
        return False

    def find_all(self, names, class_filter=None) -> list:
        """Document-order descendants with tag in *names*.

        *class_filter*, if given, is called once per class token (and with
        ``None`` when the element has no class attribute) — bs4's callable
        ``class_`` semantics.
        """
        if isinstance(names, str):
            names = (names,)
        names = frozenset(names)
        out = []
        for el in self.iter_elements():
            if el.tag not in names:
                continue
            if class_filter is not None:
                tokens = el.classes
                if tokens:
                    if not any(class_filter(t) for t in tokens):
                        continue
                else:
                    if not class_filter(None):
                        continue
            out.append(el)
        return out

    def find(self, name: str, **attr_eq):
        for el in self.iter_elements():
            if el.tag == name and all(el.attrs.get(k) == v for k, v in attr_eq.items()):
                return el
        return None

    def get_text(self, strip: bool = False) -> str:
        parts: list[str] = []
        self._collect_text(parts)
        if strip:
            return "".join(p.strip() for p in parts if p.strip())
        return "".join(parts)

    def _collect_text(self, parts: list) -> None:
        for child in self.children:
            if isinstance(child, Element):
                child._collect_text(parts)
            else:
                parts.append(child)

    def replace_with(self, replacement) -> None:
        if self.parent is None:
            # bs4 PageElement.replace_with raises exactly in this situation;
            # the reference's duplicate-<math> handling relies on it.
            raise ValueError(
                "Cannot replace one element with another when the "
                "element to be replaced is not part of a tree."
            )
        idx = self.parent.children.index(self)
        self.parent.children[idx] = replacement
        if isinstance(replacement, Element):
            replacement.parent = self.parent
        self.parent = None

    # -- serialization -----------------------------------------------------

    def __str__(self) -> str:
        return self.to_html()

    def to_html(self) -> str:
        attrs = "".join(
            f' {k}="{escape(v, quote=True)}"' for k, v in self.attrs.items()
        )
        if self.tag in VOID_ELEMENTS:
            return f"<{self.tag}{attrs}/>"
        inner = "".join(
            c.to_html() if isinstance(c, Element) else escape(c, quote=False)
            for c in self.children
        )
        return f"<{self.tag}{attrs}>{inner}</{self.tag}>"


# DOM depth cap: real documents stay < ~50; adversarial nesting beyond this
# would (a) blow Python's recursion limit in text collection — the same
# observable failure bs4-based code has — and (b) make nested-table
# conversion O(depth^3) (measured: depth 480 ≈ 37 s/doc, depth 150 ≈ 1 s).
# Fail fast at parse time instead (contained as a quarantine error row).
MAX_DOM_DEPTH = 150


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack = [self.root]

    def updatepos(self, i, j):
        # html.parser tracks (lineno, offset) for error reporting on every
        # chunk; this DOM never reads positions, so skip the line counting
        # (the return value still advances the parse cursor).
        return j

    def handle_starttag(self, tag, attrs):
        if len(self.stack) > MAX_DOM_DEPTH:
            raise RecursionError(
                f"maximum recursion depth exceeded (DOM depth > {MAX_DOM_DEPTH})"
            )
        closers = _IMPLICIT_CLOSERS.get(tag)
        if closers:
            while len(self.stack) > 1 and self.stack[-1].tag in closers:
                self.stack.pop()
        el = Element(
            tag,
            {k: (v if v is not None else "") for k, v in attrs} if attrs else {},
            None,
        )
        top = self.stack[-1]
        el.parent = top
        top.children.append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, {k: (v if v is not None else "") for k, v in attrs}, None)
        top = self.stack[-1]
        el.parent = top
        top.children.append(el)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # Unmatched close tag: ignore (lenient, like html.parser-backed bs4).

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(text: str) -> Element:
    """Parse *text* into a document Element.  Lenient for malformed markup;
    raises ``RecursionError`` only past ``MAX_DOM_DEPTH`` (callers contain
    it as an error row)."""
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    return builder.root
