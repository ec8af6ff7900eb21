"""Main-content extraction (boilerplate removal) for the text pipeline.

A crawl's raw HTML is mostly chrome: navigation, headers, footers,
cookie banners, related-links sidebars.  Training-data pipelines strip
it with block-level segmentation + link-density heuristics (jusText,
Pomikálek 2011; Arc90 readability; trafilatura all share the shape).
This module implements that shape deterministically over the repo's
own stdlib DOM (:mod:`mechaml_spark.htmlkit.parser` — same parser the
selector engine uses, so segmentation agrees with extraction):

* **segment**: a block is a ``p/h1-h6/li/td/pre/blockquote`` element,
  or any block-level element with no block-level children (leaf divs
  are how CMSes wrap paragraphs; a ``nav`` of inline links is one
  unit); nested blocks segment into their own units.
* **score**: per block — visible-char count and link-density (chars
  under ``<a>`` / total chars).
* **classify**: drop when inside ``nav/footer/header/aside`` (HTML5
  semantic chrome), when link_density > 1/3 (menus, breadcrumb rows,
  "related articles"), or when shorter than ``min_chars`` (buttons,
  timestamps).  Kept blocks join with ``\\n`` as the main text.

The thresholds are fixed, documented constants — not tuned knobs — so
the operator is reproducible and oracle-checkable; swap the classifier
for a model later and the segmentation plumbing stays.

Scale posture: one ``mapInPandas`` pass, same stage shape as
:func:`mechaml_spark.extract.parse_pages`; bodies never shuffle — the
output is the (much smaller) main text plus counters.  For pipelines
that need TEXT ONLY without block structure, the expression-only
:func:`mechaml_spark.extract.html_visible_text` remains the cheaper
path; this stage is for when chrome must actually be removed.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from mechaml_spark.htmlkit.parser import Element, parse_html

__all__ = ["segment_blocks", "main_content", "extract_main_content"]

_PARA_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li td pre blockquote".split()
)
_BLOCKISH = _PARA_TAGS | frozenset(
    "div section article main aside nav header footer table ul ol tr "
    "dl dd dt form fieldset".split()
)
_CHROME = frozenset("nav footer header aside".split())
_SKIP = frozenset("script style noscript template title".split())

_WS = re.compile(r"\s+")

MIN_CHARS = 25
MAX_LINK_DENSITY = 1 / 3


def _subtree_text(el: Element, in_link: bool = False
                  ) -> tuple[str, int, int]:
    """Visible text of a subtree plus (total_chars, link_chars) of the
    non-whitespace character counts."""
    parts: list[str] = []
    total = link = 0
    for c in el.children:
        if isinstance(c, str):
            parts.append(c)
            n = len(_WS.sub("", c))
            total += n
            if in_link:
                link += n
        elif c.tag not in _SKIP:
            t, n, lk = _subtree_text(c, in_link or c.tag == "a")
            parts.append(t)
            total += n
            link += lk
    return " ".join(p for p in parts if p), total, link


def _has_block_child(el: Element) -> bool:
    return any(c.tag in _BLOCKISH for c in el.element_children)


def segment_blocks(html: str) -> list[dict]:
    """Block units of one page, document order: ``{text, n_chars,
    link_chars, chrome}`` — ``chrome`` marks a nav/footer/header/aside
    ancestor."""
    root = parse_html(html)
    blocks: list[dict] = []

    def walk(el: Element, chrome: bool) -> None:
        chrome = chrome or el.tag in _CHROME
        if el.tag in _SKIP:
            return
        is_unit = el.tag in _PARA_TAGS or (
            el.tag in _BLOCKISH and not _has_block_child(el)
        )
        if is_unit:
            text, total, lk = _subtree_text(el)
            text = _WS.sub(" ", text).strip()
            if text:
                blocks.append({
                    "text": text, "n_chars": total,
                    "link_chars": lk, "chrome": chrome,
                })
            if el.tag not in ("li", "td"):  # li/td may nest lists/tables
                return
            # fall through: nested blocks inside li/td segment too
        for c in el.element_children:
            walk(c, chrome)

    walk(root, False)
    return blocks


def main_content(html: str) -> dict:
    """Classify blocks and join the kept ones (see module docstring
    for the fixed rules).  Returns main_text + counters."""
    kept: list[str] = []
    dropped = 0
    for b in segment_blocks(html):
        good = (
            not b["chrome"]
            and b["n_chars"] >= MIN_CHARS
            and b["link_chars"] * 3 <= b["n_chars"]  # density <= 1/3
        )
        if good:
            kept.append(b["text"])
        else:
            dropped += 1
    return {
        "main_text": "\n".join(kept),
        "n_kept": len(kept),
        "n_dropped": dropped,
    }


MAIN_T = T.StructType([
    T.StructField("main_text", T.StringType()),
    T.StructField("n_kept", T.IntegerType()),
    T.StructField("n_dropped", T.IntegerType()),
])


def extract_main_content(
    df: DataFrame, body_col: str = "body"
) -> DataFrame:
    """Main-content stage: appends a ``main`` struct per Arrow batch.
    NULL/unparseable bodies yield an empty result row, never a task
    failure (the parser is crash-free by construction — same contract
    as parse_pages)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("main", MAIN_T)]
    )
    cols = df.columns
    empty = {"main_text": "", "n_kept": 0, "n_dropped": 0}

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out["main"] = [
                dict(empty) if b is None else main_content(str(b))
                for b in pdf[body_col]
            ]
            yield out

    return df.mapInPandas(run, schema=out_schema)
