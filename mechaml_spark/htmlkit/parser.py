"""HTML -> element tree on stdlib ``html.parser`` (bs4/lxml absent).

The tree gives each element: document-order index, tag, attrs,
parent / previous-element-sibling pointers, and mixed children
(elements + text chunks).  ``leaf_text`` mirrors Lambdasoup's
``Soup.leaf_text`` (used by the reference for link text, textarea
defaults and ``<option>`` text — src/page.ml:505-513, 556-559, 592):
skip whitespace-only text children; exactly one remaining child ->
recurse/return its text; zero or several -> None.

This module is pure Python: it runs inside Arrow-batched UDFs
(one parse per page per batch row) and in the sequential oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_BLOCK = frozenset(
    "address article aside blockquote div dl fieldset footer form h1 h2 h3 h4 "
    "h5 h6 header hr main nav ol p pre section table ul".split()
)

# opening tag T implicitly closes an open tag S when S in _IMPLIED_CLOSE[T]
_IMPLIED_CLOSE: dict[str, frozenset[str]] = {
    "li": frozenset({"li"}),
    "option": frozenset({"option"}),
    "optgroup": frozenset({"option", "optgroup"}),
    "dd": frozenset({"dd", "dt"}),
    "dt": frozenset({"dd", "dt"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "tr": frozenset({"td", "th", "tr"}),
    "tbody": frozenset({"td", "th", "tr", "thead"}),
}
for _b in _BLOCK:
    _IMPLIED_CLOSE.setdefault(_b, frozenset())
    _IMPLIED_CLOSE[_b] = _IMPLIED_CLOSE[_b] | {"p"}


@dataclass
class Element:
    idx: int
    tag: str
    attrs: dict[str, str]
    parent: "Element | None" = None
    prev_elt: "Element | None" = None
    children: list = field(default_factory=list)  # Element | str (text chunk)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.tag} #{self.idx} {self.attrs}>"

    def iter_subtree(self):
        """Document-order traversal of this element and its descendants."""
        yield self
        for c in self.children:
            if isinstance(c, Element):
                yield from c.iter_subtree()

    @property
    def element_children(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]


def leaf_text(node: "Element | str") -> str | None:
    """Lambdasoup ``Soup.leaf_text`` semantics (see module docstring)."""
    if isinstance(node, str):
        return node
    live = [
        c
        for c in node.children
        if isinstance(c, Element) or (isinstance(c, str) and c.strip())
    ]
    if len(live) != 1:
        return None
    return leaf_text(live[0])


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element(idx=-1, tag="#document", attrs={})
        self._stack: list[Element] = [self.root]
        self._n = 0

    # -- helpers -----------------------------------------------------------
    def _open(self, tag: str, attrs_list) -> Element:
        implied = _IMPLIED_CLOSE.get(tag)
        if implied:
            while self._stack[-1].tag in implied:
                self._stack.pop()
        parent = self._stack[-1]
        attrs: dict[str, str] = {}
        for k, v in attrs_list:
            if k not in attrs:  # first occurrence wins
                attrs[k] = "" if v is None else v
        prev = None
        for c in reversed(parent.children):
            if isinstance(c, Element):
                prev = c
                break
        el = Element(idx=self._n, tag=tag, attrs=attrs, parent=parent, prev_elt=prev)
        self._n += 1
        parent.children.append(el)
        return el

    # -- HTMLParser hooks ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        el = self._open(tag, attrs)
        if tag not in VOID_ELEMENTS:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # unmatched end tag: ignore (browser-style recovery)

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_html(html: str) -> Element:
    """Parse ``html`` and return the synthetic ``#document`` root."""
    b = _TreeBuilder()
    try:
        b.feed(html or "")
        b.close()
    except Exception:
        # best-effort recovery: keep whatever tree was built
        pass
    return b.root


def dom_stats(html: str) -> tuple[int, int, int]:
    """Structural page statistics over the parsed tree:
    ``(n_tags, max_depth, text_chars)`` — element count, deepest
    element depth (root's children = depth 1), and raw text length
    (every data chunk, script/style excluded).  The text-to-markup
    ratio built on these is a classic template/boilerplate-heaviness
    quality gate (a page that is 95% markup is chrome, not content).
    Pure function: runs inside Arrow batches and in oracles."""
    root = parse_html(html)
    n_tags = 0
    max_depth = 0
    text_chars = 0

    def walk(el: Element, depth: int) -> None:
        nonlocal n_tags, max_depth, text_chars
        for c in el.children:
            if isinstance(c, str):
                if el.tag not in ("script", "style"):
                    text_chars += len(c)
            else:
                n_tags += 1
                if depth + 1 > max_depth:
                    max_depth = depth + 1
                walk(c, depth + 1)

    walk(root, 0)
    return n_tags, max_depth, text_chars
