"""Page-parse stage: HTML body -> (base_uri, links[], images[], forms[]).

The reference parses lazily per page (``HttpResponse.page`` ->
``Page.from_string``, src/agent.ml:46-48, src/page.ml:79-82) and
re-walks the DOM per selector.  Spark-first we parse **once** per
page inside an Arrow-batched ``mapInPandas`` UDF and emit typed
arrays; every later selection is a JVM-side Column predicate over
the exploded arrays (no re-parse, column pruning drops ``body``
downstream automatically).

Each extracted node carries enough structure for the CSS-subset
combinators to run JVM-side:
  ``anc``  — ancestor chain parent-first, each ``struct<tag, attrs>``
  ``prev`` — previous element sibling, ``struct<tag, attrs>``

Form rows additionally carry the full typed ``inputs`` array and the
default-initialized ``state`` map (the reference initializes every
selected form with ``reset_all``, src/page.ml:615-616; defaults per
src/page.ml:410-417, 464-471, 528-535, 556-559).

Base URI: ``<base href>`` overrides the fetch location
(src/page.ml:69-77): ``base_uri = resolve(url, first base[href])``.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from html.parser import HTMLParser

from mechaml_spark import urlkit
from mechaml_spark.htmlkit.parser import Element, leaf_text, parse_html

# ------------------------------------------------------------------ schemas

ATTRS = T.MapType(T.StringType(), T.StringType())
ANC_T = T.ArrayType(
    T.StructType(
        [T.StructField("tag", T.StringType()), T.StructField("attrs", ATTRS)]
    )
)
PREV_T = T.StructType(
    [T.StructField("tag", T.StringType()), T.StructField("attrs", ATTRS)]
)

LINK_T = T.StructType(
    [
        T.StructField("pos", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("href", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("attrs", ATTRS),
        T.StructField("anc", ANC_T),
        T.StructField("prev", PREV_T),
    ]
)

IMAGE_T = T.StructType(
    [
        T.StructField("pos", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("src", T.StringType()),
        T.StructField("attrs", ATTRS),
        T.StructField("anc", ANC_T),
        T.StructField("prev", PREV_T),
    ]
)

OPTION_T = T.StructType(
    [
        T.StructField("value", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("selected", T.BooleanType()),
    ]
)

INPUT_T = T.StructType(
    [
        T.StructField("pos", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("itype", T.StringType()),  # `type` attr, null if absent
        T.StructField("name", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("checked", T.BooleanType()),
        T.StructField("multiple", T.BooleanType()),
        T.StructField("text", T.StringType()),  # leaf_text (textarea default)
        T.StructField("attrs", ATTRS),
        T.StructField("options", T.ArrayType(OPTION_T)),
    ]
)

STATE_T = T.MapType(T.StringType(), T.ArrayType(T.StringType()))

FORM_T = T.StructType(
    [
        T.StructField("pos", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("method", T.StringType()),  # 'POST' | 'GET'
        T.StructField("attrs", ATTRS),
        T.StructField("anc", ANC_T),
        T.StructField("prev", PREV_T),
        T.StructField("inputs", T.ArrayType(INPUT_T)),
        T.StructField("state", STATE_T),
    ]
)

PARSED_FIELDS = [
    T.StructField("base_uri", T.StringType()),
    T.StructField("links", T.ArrayType(LINK_T)),
    T.StructField("images", T.ArrayType(IMAGE_T)),
    T.StructField("forms", T.ArrayType(FORM_T)),
]


# ---------------------------------------------------------- pure extraction

def _node_ref(el: Element | None) -> dict | None:
    if el is None or el.tag == "#document":
        return None
    return {"tag": el.tag, "attrs": dict(el.attrs)}


def _ancestors(el: Element) -> list[dict]:
    out = []
    p = el.parent
    while p is not None and p.tag != "#document":
        out.append(_node_ref(p))
        p = p.parent
    return out


FIELD_TYPES = frozenset({"text", "password", "hidden"})  # src/page.ml:38-42


def _input_record(el: Element, pos: int) -> dict:
    itype = el.attrs.get("type")
    options = None
    if el.tag == "select":
        options = [
            {
                "value": o.attrs.get("value"),
                "text": leaf_text(o) or "",
                "selected": "selected" in o.attrs,
            }
            for o in el.iter_subtree()
            if o.tag == "option"
        ]
    return {
        "pos": pos,
        "tag": el.tag,
        "itype": itype,
        "name": el.attrs.get("name"),
        "value": el.attrs.get("value"),
        "checked": "checked" in el.attrs,
        "multiple": "multiple" in el.attrs,
        "text": leaf_text(el) if el.tag == "textarea" else None,
        "attrs": dict(el.attrs),
        "options": options,
    }


def option_value(opt: dict) -> str:
    """`value` attr defaulting to option text (src/page.ml:505-513)."""
    return opt["value"] if opt["value"] is not None else (opt["text"] or "")


def default_state(inputs: list[dict]) -> dict[str, list[str]]:
    """``Form.reset_all`` parity (src/page.ml:574-586): reset order is
    checkboxes -> radios -> selects -> fields; each reset recomputes
    the whole named group from attribute defaults."""
    state: dict[str, list[str]] = {}

    def checkboxes():
        return [i for i in inputs if i["tag"] == "input" and i["itype"] == "checkbox"]

    def radios():
        return [i for i in inputs if i["tag"] == "input" and i["itype"] == "radio"]

    # checkboxes: all `checked` in the group, value default "on"
    # (src/page.ml:410-419)
    for cb in checkboxes():
        name = cb["name"]
        if name is None:
            continue
        vals = [
            (c["value"] if c["value"] is not None else "on")
            for c in checkboxes()
            if c["name"] == name and c["checked"]
        ]
        if vals:
            state[name] = vals
        else:
            state.pop(name, None)
    # radios: FIRST `checked` in the group (src/page.ml:464-473)
    for rb in radios():
        name = rb["name"]
        if name is None:
            continue
        first = next(
            (
                (c["value"] if c["value"] is not None else "on")
                for c in radios()
                if c["name"] == name and c["checked"]
            ),
            None,
        )
        if first is not None:
            state[name] = [first]
        else:
            state.pop(name, None)
    # select lists: options with `selected`, document order
    # (src/page.ml:528-537)
    for sl in inputs:
        if sl["tag"] != "select" or sl["name"] is None:
            continue
        vals = [option_value(o) for o in (sl["options"] or []) if o["selected"]]
        if vals:
            state[sl["name"]] = vals
        else:
            state.pop(sl["name"], None)
    # fields: textarea leaf text / input `value` attr
    # (src/page.ml:543-561; field_filter src/page.ml:54-61)
    for fd in inputs:
        if fd["name"] is None:
            continue
        if fd["tag"] == "textarea":
            dv = fd["text"]
        elif fd["tag"] == "input" and fd["itype"] in FIELD_TYPES:
            dv = fd["value"]
        else:
            continue
        if dv is not None:
            state[fd["name"]] = [dv]
        else:
            state.pop(fd["name"], None)
    return state


def parse_page(url: str, body: str | bytes | None) -> dict:
    """Parse one page; returns {base_uri, links, images, forms}."""
    if body is None:
        body = ""
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", errors="replace")
    root = parse_html(body)

    base_uri = url or ""
    links: list[dict] = []
    images: list[dict] = []
    forms: list[dict] = []
    base_seen = False
    for el in root.iter_subtree():
        if el.tag == "#document":
            continue
        if el.tag == "base" and not base_seen and "href" in el.attrs:
            # first <base href> wins (Soup.select_one, src/page.ml:70-76)
            base_uri = urlkit.resolve(url or "", el.attrs["href"])
            base_seen = True
        elif el.tag == "a":
            links.append(
                {
                    "pos": len(links),
                    "tag": "a",
                    "href": el.attrs.get("href"),
                    "text": leaf_text(el),
                    "attrs": dict(el.attrs),
                    "anc": _ancestors(el),
                    "prev": _node_ref(el.prev_elt),
                }
            )
        elif el.tag == "img":
            images.append(
                {
                    "pos": len(images),
                    "tag": "img",
                    "src": el.attrs.get("src"),
                    "attrs": dict(el.attrs),
                    "anc": _ancestors(el),
                    "prev": _node_ref(el.prev_elt),
                }
            )
        elif el.tag == "form":
            inputs = []
            for sub in el.iter_subtree():
                if sub is el:
                    continue
                if sub.tag in ("input", "select", "textarea"):
                    inputs.append(_input_record(sub, len(inputs)))
            method_attr = (el.attrs.get("method") or "").strip().lower()
            forms.append(
                {
                    "pos": len(forms),
                    "tag": "form",
                    "name": el.attrs.get("name"),
                    "action": el.attrs.get("action"),
                    # 'post' -> POST, anything else incl. missing -> GET
                    # (src/page.ml:154-164)
                    "method": "POST" if method_attr == "post" else "GET",
                    "attrs": dict(el.attrs),
                    "anc": _ancestors(el),
                    "prev": _node_ref(el.prev_elt),
                    "inputs": inputs,
                    "state": default_state(inputs),
                }
            )
    return {"base_uri": base_uri, "links": links, "images": images, "forms": forms}


# ------------------------------------------------------------- Spark stage

def parse_pages(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Append ``base_uri, links, images, forms`` to ``df``.

    Arrow-batched ``mapInPandas``; all input columns pass through.
    """
    in_schema = df.schema
    out_schema = T.StructType(list(in_schema.fields) + PARSED_FIELDS)
    passthrough = [f.name for f in in_schema.fields]

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [
                parse_page(u, b) for u, b in zip(pdf[url_col], pdf[body_col])
            ]
            out = pdf[passthrough].copy()
            out["base_uri"] = [p["base_uri"] for p in parsed]
            out["links"] = [p["links"] for p in parsed]
            out["images"] = [p["images"] for p in parsed]
            out["forms"] = [p["forms"] for p in parsed]
            yield out

    return df.mapInPandas(run, schema=out_schema)


import re as _re
from html import unescape as _unescape

# Strict-grammar fast scan for the crawl's lean parse.  The grammar
# accepts ONLY well-formed tags (ASCII-alnum names, whitespace-
# separated attrs, quoted / bare / valueless values, optional
# self-close).  On bodies where EVERY "<" starts a strict tag and no
# hazard construct appears (comment / declaration / PI / script /
# style — the places html.parser switches tokenizer modes), the
# stdlib tokenizer provably yields the same start-tag stream, so the
# scan is a pure speedup (measured 0.95 -> 0.32 ms on the 3.8 KB
# bench page).  ANY deviation — a stray "<", a tag the grammar
# rejects, a hazard probe hit — falls back to the full _LeanParser.
_HAZARD_RE = _re.compile(r"<[!?]|<(?i:script|style)(?![a-zA-Z0-9])")
_STRICT_TAG_RE = _re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[^\s>/=]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>\"'`=<]+))?)*)"
    r"\s*(/?)>"
)
_STRICT_ATTR_RE = _re.compile(
    r"([^\s>/=]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"'`=<]+)))?"
)


def _fast_attrs(raw: str) -> list:
    """(name, value) pairs of a strict attr blob, html.parser parity:
    names lowercased, values entity-unescaped, valueless -> None."""
    out = []
    for m in _STRICT_ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        v = m.group(2)
        if v is None:
            v = m.group(3)
        if v is None:
            v = m.group(4)
        if v is not None and "&" in v:
            v = _unescape(v)
        out.append((name, v))
    return out


def _parse_page_fast(url: str, body: str):
    """Fast-path twin of ``_LeanParser``: (base, hrefs, imgs), or
    None when the body is not provably strict (caller falls back)."""
    if _HAZARD_RE.search(body):
        return None
    base = url or ""
    base_seen = False
    hrefs: list[str] = []
    imgs: list[dict] = []
    n_tags = 0
    for m in _STRICT_TAG_RE.finditer(body):
        n_tags += 1
        if m.group(1):  # closing tag
            continue
        tag = m.group(2).lower()
        if tag == "a":
            for k, v in _fast_attrs(m.group(3)):
                if k == "href":
                    hrefs.append("" if v is None else v)
                    break
        elif tag == "img":
            src = alt = None
            seen: set = set()
            for k, v in _fast_attrs(m.group(3)):
                if k not in seen:
                    seen.add(k)
                    if k == "src":
                        src = "" if v is None else v
                    elif k == "alt":
                        alt = "" if v is None else v
            imgs.append({"pos": len(imgs), "src": src, "alt": alt})
        elif tag == "base" and not base_seen:
            for k, v in _fast_attrs(m.group(3)):
                if k == "href":
                    base = urlkit.resolve(url or "", "" if v is None else v)
                    base_seen = True
                    break
    if n_tags != body.count("<"):
        # some "<" did not open a strict tag (stray text "<", a tag
        # form outside the grammar, "<" inside a quoted attr value):
        # the fast scan cannot vouch for parity — use the tokenizer
        return None
    return base, hrefs, imgs


class _LeanParser(HTMLParser):
    """Streaming crawl-path tokenizer: collects ``a[href]``,
    ``img[src,alt]`` and the first ``base[href]`` WITHOUT building an
    element tree.  Same stdlib tokenizer as :func:`parse_html` (same
    CDATA handling for script/style, same entity decoding, same
    start-tag stream for malformed input), so the harvested
    attributes are byte-identical to walking the built tree — at
    ~1.7x the speed (measured 1.29 -> 0.75 ms/page on the bench
    corpus).  Attr handling mirrors the tree builder's
    first-occurrence-wins (htmlkit/parser.py:_open)."""

    def __init__(self, url: str) -> None:
        super().__init__(convert_charrefs=True)
        self.url = url
        self.base = url or ""
        self.base_seen = False
        self.hrefs: list[str] = []
        self.imgs: list[dict] = []

    def handle_starttag(self, tag: str, attrs_list) -> None:
        if tag == "a":
            for k, v in attrs_list:
                if k == "href":
                    self.hrefs.append("" if v is None else v)
                    break
        elif tag == "img":
            src = alt = None
            seen: set = set()
            for k, v in attrs_list:
                if k not in seen:
                    seen.add(k)
                    if k == "src":
                        src = "" if v is None else v
                    elif k == "alt":
                        alt = "" if v is None else v
            self.imgs.append({"pos": len(self.imgs), "src": src, "alt": alt})
        elif tag == "base" and not self.base_seen:
            for k, v in attrs_list:
                if k == "href":
                    self.base = urlkit.resolve(
                        self.url or "", "" if v is None else v
                    )
                    self.base_seen = True
                    break


def parse_page_lean(url: str, body: str | bytes | None) -> tuple:
    """Crawl-path parse: only what link discovery + payload need
    (base-uri override, link hrefs, image src/alt) — no node tables,
    ancestors, or form state.  Same tokenizer, same ``<base href>``
    first-wins semantics (src/page.ml:70-76); the selector-rich
    :func:`parse_page` stays the extraction-API path."""
    if body is None:
        body = ""
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", errors="replace")
    fast = _parse_page_fast(url, body)
    if fast is not None:
        return fast
    p = _LeanParser(url)
    p.feed(body)
    return p.base, p.hrefs, p.imgs


LEAN_FIELDS = [
    T.StructField("base_uri", T.StringType()),
    T.StructField("hrefs", T.ArrayType(T.StringType())),
    T.StructField(
        "imgs",
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("pos", T.IntegerType()),
                    T.StructField("src", T.StringType()),
                    T.StructField("alt", T.StringType()),
                ]
            )
        ),
    ),
]


def parse_pages_lean(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Crawl-path variant of :func:`parse_pages`: appends
    ``base_uri, hrefs, imgs`` only.  ~2x less Python time and far less
    Arrow struct serialization per page than the full node tables —
    the crawl superstep never consumes selectors/forms."""
    in_schema = df.schema
    passthrough = [f.name for f in in_schema.fields if f.name != body_col]
    out_schema = T.StructType(
        [f for f in in_schema.fields if f.name != body_col] + LEAN_FIELDS
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [
                parse_page_lean(u, b)
                for u, b in zip(pdf[url_col], pdf[body_col])
            ]
            out = pdf[passthrough].copy()
            out["base_uri"] = [p[0] for p in parsed]
            out["hrefs"] = [p[1] for p in parsed]
            out["imgs"] = [p[2] for p in parsed]
            yield out

    return df.mapInPandas(run, schema=out_schema)


CRAWL_FIELDS = [
    T.StructField(
        "links",
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("url_norm", T.StringType()),
                    T.StructField("host", T.StringType()),
                ]
            )
        ),
    ),
    LEAN_FIELDS[2],  # imgs — identical shape to the lean parse
]


def parse_pages_crawl(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """The crawl superstep's fused page stage: parse + link
    resolution + canonicalization + http(s) filter + per-page dedup
    in ONE Arrow round trip.

    :func:`parse_pages_lean` returns raw ``hrefs`` that the scheduler
    then explodes and pushes through a SECOND pandas UDF
    (:func:`mechaml_spark.page.resolve_canon_host`) — at ~100 links
    per page that second hop Arrow-transfers the full link stream
    twice (out as (base, href), back as (url_norm, host)) and was
    the largest single cost in the fetch+parse stage.  Here the
    per-batch link stream never leaves the Python worker: resolution
    runs through the same memoized
    :func:`mechaml_spark.urlkit.resolve_canon_host_pairs` used
    everywhere else (identical results), non-http(s) schemes are
    dropped in-worker, and same-URL repeats within one page collapse
    (downstream semantics unchanged: the scheduler's pre-dedup
    ``groupBy(url_norm)`` with null-skipping ``min(depth)`` sees the
    same keys — all links of a page share one depth).

    Output: passthrough columns + ``links array<struct<url_norm,
    host>>`` + ``imgs`` (same shape as the lean parse; the payload
    path is untouched)."""
    in_schema = df.schema
    passthrough = [f.name for f in in_schema.fields if f.name != body_col]
    out_schema = T.StructType(
        [f for f in in_schema.fields if f.name != body_col] + CRAWL_FIELDS
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [
                parse_page_lean(u, b)
                for u, b in zip(pdf[url_col], pdf[body_col])
            ]
            # one vectorized resolve over the whole batch's links
            bases: list[str] = []
            refs: list[str] = []
            counts: list[int] = []
            for base, hrefs, _ in parsed:
                counts.append(len(hrefs))
                bases.extend([base] * len(hrefs))
                refs.extend(hrefs)
            urls, hosts = urlkit.resolve_canon_host_pairs(bases, refs)
            links_col: list[list] = []
            i = 0
            for n in counts:
                page_links: dict = {}
                for u, h in zip(urls[i : i + n], hosts[i : i + n]):
                    if u.startswith("http://") or u.startswith("https://"):
                        page_links.setdefault(u, (u, h))
                i += n
                links_col.append(list(page_links.values()))
            out = pdf[passthrough].copy()
            out["links"] = links_col
            out["imgs"] = [p[2] for p in parsed]
            yield out

    return df.mapInPandas(run, schema=out_schema)


# ------------------------------------------- visible-text extraction


def html_visible_text(body):
    """Visible text of an HTML column — pure Catalyst expressions.

    The scale path for text-pipeline stages (lang-id, quality, dedup)
    that want page TEXT, not markup: strips comments and
    script/style/noscript/template blocks, drops tags, decodes the
    common named entities (``&amp; &lt; &gt; &quot; &#39; &apos;
    &nbsp;`` — ``&amp;`` last so double-escapes survive; numeric
    entities are left as-is, documented boundary), and collapses
    whitespace.  Everything is regexp/replace over the string column,
    so the whole stage is one WholeStageCodegen project — no Python
    worker, ~10-100x less per-byte cost than a DOM parse, which is
    what a 100-TB text pipeline wants when it does not need structure
    (the structured path stays :func:`parse_pages`).
    """
    from pyspark.sql import functions as F

    x = F.regexp_replace(body, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(
        x, r"(?is)<(script|style|noscript|template|title)\b[^>]*>.*?</\1\s*>", " "
    )
    x = F.regexp_replace(x, r"<[^>]+>", " ")
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(x, r"\s+", " "))
