"""Stdlib HTML parsing + CSS-subset selection (no bs4/lxml in-sandbox).

Parity target: the Lambdasoup surface exercised by the reference's
tests (yannham/mechaml test/test.ml:202-616) — see
:mod:`mechaml_spark.htmlkit.selector` for the supported grammar.
"""

from mechaml_spark.htmlkit.parser import Element, leaf_text, parse_html
from mechaml_spark.htmlkit.selector import (
    Compound,
    compile_selector,
    match_element,
    parse_selector,
    select,
    tag_selector,
)

__all__ = [
    "Element",
    "parse_html",
    "leaf_text",
    "Compound",
    "parse_selector",
    "compile_selector",
    "match_element",
    "select",
    "tag_selector",
]
