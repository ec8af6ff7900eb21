"""schema.org microdata extraction (``itemscope``/``itemtype``/
``itemprop``).

Microdata is the second structured-data channel on the web after
JSON-LD (which :mod:`mechaml_spark.metadata` already reads): product,
recipe, article and review markup that a training-data pipeline mines
for grounded (entity, property, value) triples.  This module extracts
it relationally:

  * :func:`extract_microdata_rows` — pure function (Arrow batches,
    oracles, tests) over the same stdlib tree builder as the selector
    engine;
  * :func:`extract_microdata` — the Spark stage (``mapInPandas``,
    map-only, zero shuffles).

Pinned semantics (HTML microdata spec subset, asserted in tests):

  * an ``itemscope`` element opens an item; items are numbered in
    document order per page; every item emits one ``@type`` row
    (value = ``itemtype``, NULL if untyped) so untyped/empty items
    still register;
  * an ``itemprop`` element contributes to the NEAREST enclosing
    item; the crawl continues through property elements (a property
    element's descendants can hold more properties of the same item)
    but properties inside a nested ``itemscope`` belong to the
    nested item;
  * an ``itemprop`` that is itself ``itemscope`` is a nested item:
    the parent gets a property row whose value is ``#item:<idx>``;
  * multiple whitespace-separated tokens in one ``itemprop`` emit one
    row each (spec: property name list);
  * property values follow the spec's per-tag table: ``meta`` →
    ``content``; ``a``/``area``/``link`` → ``href``; ``img``/
    ``audio``/``video``/``embed``/``iframe``/``source``/``track`` →
    ``src``; ``data`` → ``value``; ``object`` → ``data``; ``time`` →
    ``datetime`` falling back to text; anything else → whitespace-
    collapsed subtree text.  A missing value attribute yields ``''``
    (spec) — never NULL, NULL is reserved for untyped ``@type``;
  * ``itemprop`` outside any ``itemscope`` is ignored; ``itemref``
    is NOT supported (documented boundary — it needs cross-subtree
    id resolution and is vanishingly rare in the wild).

Scale posture: map-only Arrow-batched parse over bodies, zero
shuffles; output keys on (doc_id, item_idx) so per-item reassembly
shuffles on a fine-grained key.

Reference parity: no reference equivalent (links/images/forms only,
src/page.ml); engine-brief breadth for the training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mechaml_spark.htmlkit.parser import Element, parse_html

__all__ = ["extract_microdata_rows", "extract_microdata"]

_SRC_TAGS = frozenset(
    "img audio video embed iframe source track".split()
)


def _collapse_text(el: Element) -> str:
    parts: list[str] = []

    def walk(n: Element) -> None:
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag not in ("script", "style", "template"):
                walk(c)

    walk(el)
    return " ".join("".join(parts).split())


def _prop_value(el: Element) -> str:
    t = el.tag
    a = el.attrs
    if t == "meta":
        return a.get("content", "")
    if t in ("a", "area", "link"):
        return a.get("href", "")
    if t in _SRC_TAGS:
        return a.get("src", "")
    if t == "data":
        return a.get("value", "")
    if t == "object":
        return a.get("data", "")
    if t == "time":
        dt = a.get("datetime")
        return dt if dt is not None else _collapse_text(el)
    return _collapse_text(el)


def extract_microdata_rows(html: str) -> list[tuple]:
    """``[(item_idx, prop, value)]`` in document order: one ``@type``
    row per item plus one row per property token (see module
    docstring for the pinned value rules)."""
    root = parse_html(html)
    out: list[tuple] = []
    n_items = 0

    def walk(el: Element, cur: int | None) -> None:
        nonlocal n_items
        this = cur
        if "itemscope" in el.attrs:
            idx = n_items
            n_items += 1
            props = el.attrs.get("itemprop", "")
            if cur is not None:
                for p in props.split():
                    out.append((cur, p, f"#item:{idx}"))
            out.append((idx, "@type", el.attrs.get("itemtype")))
            this = idx
        else:
            props = el.attrs.get("itemprop", "")
            if props and cur is not None:
                val = _prop_value(el)
                for p in props.split():
                    out.append((cur, p, val))
        for c in el.children:
            if isinstance(c, Element):
                walk(c, this)

    for c in root.children:
        if isinstance(c, Element):
            walk(c, None)
    return out


_OUT_SCHEMA = "doc_id long, item_idx int, prop string, value string"


def extract_microdata(
    df: DataFrame, body_col: str = "body", id_col: str = "doc_id"
) -> DataFrame:
    """Spark stage: one row per microdata item/@type/property per
    page.  Map-only Arrow batches; pages without microdata contribute
    no rows."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for did, body in zip(pdf[id_col], pdf[body_col]):
                if not body:
                    continue
                for row in extract_microdata_rows(body):
                    recs.append((int(did),) + row)
            yield pd.DataFrame(
                recs, columns=["doc_id", "item_idx", "prop", "value"]
            )

    return df.select(id_col, body_col).mapInPandas(gen, schema=_OUT_SCHEMA)
