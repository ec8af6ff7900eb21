"""HTML → Markdown conversion for LLM training corpora.

Markdown is the de-facto pretraining format for web text (FineWeb /
Dolma / RedPajama pipelines all emit markdown-ish plain text, and
instruction-tuning corpora keep structure as markdown): headings,
emphasis, links, lists, code and tables carry signal that flat
``html_visible_text`` throws away.  This module converts fetched
bodies to a pinned CommonMark subset:

  * :func:`html_to_markdown` — pure function (Arrow batches, oracles,
    tests) over the same stdlib tree builder as the selector engine;
  * :func:`to_markdown` — the Spark stage (Arrow-batched
    ``pandas_udf``, map-only, zero shuffles).

Pinned rendering rules (documented, asserted in tests):

  * ``h1``-``h6`` → ``#``×n heading; ``p``/``div``/``section``/… →
    paragraph blocks joined by ONE blank line; inline whitespace is
    collapsed;
  * ``a`` → ``[text](href)`` (no ``href`` → bare text), ``img`` →
    ``![alt](src)``, ``strong``/``b`` → ``**…**``, ``em``/``i`` →
    ``*…*``, ``code`` → `` `…` ``, ``br`` → hard line break;
  * ``ul``/``ol`` → ``- `` / ``1.``-numbered items, nested lists
    indented two spaces;
  * ``pre`` → fenced code block preserving raw whitespace;
  * ``blockquote`` → every line ``> ``-prefixed;
  * ``hr`` → ``---``;
  * ``table`` → GitHub pipe table (first row is the header row iff it
    contains a ``th``; ``|`` in cells escaped); nested block
    structure inside cells flattens to inline text;
  * ``script``/``style``/``template``/``head``/``noscript`` are
    dropped.

Scale posture: map-only projection over bodies — parse once per page
inside the Arrow batch, no shuffle, no driver involvement.

Reference parity: the reference has no serialization surface beyond
``Page.to_string`` (page.ml); markdown conversion is engine-brief
breadth for the training-data tier.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from mechaml_spark.htmlkit.parser import Element, parse_html

__all__ = ["html_to_markdown", "to_markdown"]

_DROP = frozenset({"script", "style", "template", "head", "noscript", "title"})
_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_BLOCKISH = frozenset(
    "p div section article main aside header footer nav figure "
    "figcaption address dl dt dd".split()
)


# <br> renders as a sentinel so whitespace collapsing can preserve
# the hard break (a literal \n would be eaten by str.split()).
_BR = "\x00"


def _collapse(s: str) -> str:
    segs = [" ".join(seg.split()) for seg in s.split(_BR)]
    out = "\n".join(segs)
    return out.strip("\n")


def _inline_one(c: Element) -> str:
    """Markdown for ONE inline element (including its own markup)."""
    t = c.tag
    if t in _DROP:
        return ""
    if t == "br":
        return _BR
    if t in ("strong", "b"):
        inner = _collapse(_inline(c))
        return f"**{inner}**" if inner else ""
    if t in ("em", "i"):
        inner = _collapse(_inline(c))
        return f"*{inner}*" if inner else ""
    if t == "code":
        inner = _collapse(_inline(c))
        return f"`{inner}`" if inner else ""
    if t == "a":
        inner = _collapse(_inline(c))
        href = c.attrs.get("href")
        return f"[{inner}]({href})" if href else inner
    if t == "img":
        alt = _collapse(c.attrs.get("alt", ""))
        src = c.attrs.get("src", "")
        return f"![{alt}]({src})"
    return _inline(c)


def _inline(node: Element) -> str:
    """Inline rendering of a subtree's children (blocks & cells)."""
    parts: list[str] = []
    for c in node.children:
        if isinstance(c, str):
            parts.append(c)
        else:
            parts.append(_inline_one(c))
    return "".join(parts)


def _raw_text(node: Element) -> str:
    parts: list[str] = []
    for c in node.children:
        if isinstance(c, str):
            parts.append(c)
        elif c.tag not in _DROP:
            parts.append(_raw_text(c))
    return "".join(parts)


def _table_md(table: Element) -> str:
    rows: list[tuple[list[str], bool]] = []

    def trs(el):
        for c in el.children:
            if isinstance(c, Element):
                if c.tag == "tr":
                    yield c
                elif c.tag != "table":
                    yield from trs(c)

    for tr in trs(table):
        cells, has_th = [], False
        for c in tr.children:
            if isinstance(c, Element) and c.tag in ("td", "th"):
                has_th = has_th or c.tag == "th"
                cells.append(
                    _collapse(_inline(c).replace(_BR, " "))
                    .replace("|", "\\|")
                )
        if cells:
            rows.append((cells, has_th))
    if not rows:
        return ""
    width = max(len(c) for c, _ in rows)
    lines = []
    for i, (cells, has_th) in enumerate(rows):
        cells = cells + [""] * (width - len(cells))
        lines.append("| " + " | ".join(cells) + " |")
        if i == 0 and has_th:
            lines.append("|" + " --- |" * width)
    return "\n".join(lines)


def _list_md(el: Element, ordered: bool, depth: int) -> str:
    items = []
    n = 0
    for c in el.children:
        if isinstance(c, Element) and c.tag == "li":
            n += 1
            marker = f"{n}." if ordered else "-"
            inline_parts: list[str] = []
            sub_blocks: list[str] = []
            for cc in c.children:
                if isinstance(cc, Element) and cc.tag in ("ul", "ol"):
                    sub_blocks.append(
                        _list_md(cc, cc.tag == "ol", depth + 1)
                    )
                elif isinstance(cc, Element) and cc.tag in _BLOCKISH:
                    inline_parts.append(_inline(cc))
                elif isinstance(cc, str):
                    inline_parts.append(cc)
                elif isinstance(cc, Element):
                    inline_parts.append(_inline_one(cc))
            head = _collapse("".join(inline_parts))
            line = "  " * depth + f"{marker} {head}".rstrip()
            items.append("\n".join([line] + sub_blocks) if sub_blocks
                         else line)
    return "\n".join(items)


def _blocks(node: Element, out: list[str]) -> None:
    """Walk children, emitting finished markdown blocks into ``out``.
    Runs of inline content between blocks become paragraph blocks."""
    run: list[str] = []

    def flush():
        txt = _collapse("".join(run))
        run.clear()
        if txt:
            out.append(txt)

    for c in node.children:
        if isinstance(c, str):
            run.append(c)
            continue
        t = c.tag
        if t in _DROP:
            continue
        if t in _HEADINGS:
            flush()
            out.append("#" * _HEADINGS[t] + " " + _collapse(_inline(c)))
        elif t == "pre":
            flush()
            body = _raw_text(c).strip("\n")
            out.append(f"```\n{body}\n```")
        elif t in ("ul", "ol"):
            flush()
            md = _list_md(c, t == "ol", 0)
            if md:
                out.append(md)
        elif t == "blockquote":
            flush()
            inner: list[str] = []
            _blocks(c, inner)
            body = "\n\n".join(inner)
            if body:
                out.append(
                    "\n".join("> " + ln if ln else ">"
                              for ln in body.split("\n"))
                )
        elif t == "table":
            flush()
            md = _table_md(c)
            if md:
                out.append(md)
        elif t == "hr":
            flush()
            out.append("---")
        elif t in _BLOCKISH or t in ("html", "body", "form"):
            flush()
            _blocks(c, out)
        else:
            run.append(_inline_one(c))
    flush()


def html_to_markdown(html: str) -> str:
    """Render ``html`` to the pinned CommonMark subset (module
    docstring).  Blocks are joined by one blank line."""
    root = parse_html(html)
    out: list[str] = []
    _blocks(root, out)
    return "\n\n".join(out)


def to_markdown(body: Column) -> Column:
    """Arrow-batched markdown conversion of a body column."""

    @F.pandas_udf(StringType())
    def _md(b):
        import pandas as pd

        return pd.Series(
            [html_to_markdown(x) if x else "" for x in b], dtype=object
        )

    return _md(body)
