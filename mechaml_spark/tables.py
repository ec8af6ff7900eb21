"""HTML ``<table>`` extraction to relational rows.

Structured tables are a first-class training-data channel (WDC Web
Table Corpus, TaPas/TAPEX pretraining, fact-checking corpora): a
100-TB crawl yields billions of relational tables embedded in HTML,
and a pipeline needs them as ROWS — (table, row, col, cell) — not as
markup.  This module gives the engine that operator:

  * :func:`extract_table_cells` — pure function (runs inside the
    Arrow batch AND in oracles/tests): HTML string → list of grid
    cells via the same stdlib tree builder the selector engine uses
    (:mod:`mechaml_spark.htmlkit.parser`), so markup-soup recovery
    (implied ``</td>``/``</tr>``, unclosed tags) matches the rest of
    the engine;
  * :func:`extract_tables` — the Spark stage: ``mapInPandas`` over
    fetched bodies, one output row per grid cell.

Pinned semantics (documented, asserted in tests):

  * tables are indexed in document order of their ``<table>`` start
    tags; a nested table is its OWN table (its cells do not leak into
    the outer cell's text, and it gets the next ``table_idx``);
  * rows are the ``<tr>`` descendants whose nearest enclosing table
    is this table, in document order (a ``<tfoot>`` placed before
    ``<tbody>`` in source keeps its source position — document
    order, not CSS rendering order); ``section`` is the nearest
    ``thead``/``tbody``/``tfoot`` ancestor under the table, else
    ``''``;
  * ``colspan``/``rowspan`` expand via the standard grid-filling
    algorithm (each cell lands at the first free column of its row;
    spanned positions repeat the cell's text — the normalization
    pandas.read_html applies).  Spans are clamped to the HTML-spec
    maxima (colspan 1000, rowspan 65534) so adversarial markup cannot
    blow up a partition, and ``rowspan=0`` extends through the last
    row of the cell's section per the spec;
  * cell text is the whitespace-collapsed visible text of the cell
    subtree, skipping nested ``table``/``script``/``style``/
    ``template`` subtrees; ``is_header`` is ``tag == th``.

Scale posture: a map-only Arrow-batched parse over bodies — zero
shuffles; the output carries (doc_id, table_idx) so downstream
per-table aggregation shuffles on a fine-grained key (no page-level
hot keys).  Bodies are parsed once per page per batch, never
re-scanned per table.

Reference parity: the reference has no table operator (its ``Page``
surface is links/images/forms, src/page.ml); this is engine-brief
breadth for the training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mechaml_spark.htmlkit.parser import Element, parse_html

__all__ = ["extract_table_cells", "extract_tables"]

_SKIP_TEXT = frozenset({"table", "script", "style", "template"})
_SECTIONS = frozenset({"thead", "tbody", "tfoot"})
_MAX_COLSPAN = 1000
_MAX_ROWSPAN = 65534


def _own_descendants(el: Element, stop: str = "table"):
    """Descendants of ``el`` without entering nested ``stop`` tags."""
    for c in el.children:
        if isinstance(c, Element):
            yield c
            if c.tag != stop:
                yield from _own_descendants(c, stop)


def _cell_text(el: Element) -> str:
    parts: list[str] = []

    def walk(n: Element) -> None:
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag not in _SKIP_TEXT:
                walk(c)

    walk(el)
    return " ".join("".join(parts).split())


def _span(el: Element, attr: str, cap: int) -> int:
    raw = el.attrs.get(attr, "").strip()
    if not raw.isdigit():
        return 1
    return min(int(raw), cap)


def _section_of(tr: Element, table: Element) -> str:
    node = tr.parent
    while node is not None and node is not table:
        if node.tag in _SECTIONS:
            return node.tag
        node = node.parent
    return ""


def extract_table_cells(html: str) -> list[tuple]:
    """``[(table_idx, row_idx, col_idx, cell, is_header, section)]``
    for every grid cell of every table in ``html`` (see module
    docstring for the pinned grid semantics)."""
    root = parse_html(html)
    out: list[tuple] = []
    tables = [el for el in root.iter_subtree() if el.tag == "table"]
    for t_idx, table in enumerate(tables):
        rows = [e for e in _own_descendants(table) if e.tag == "tr"]
        if not rows:
            continue
        sections = [_section_of(tr, table) for tr in rows]
        # last row index of each section run (for rowspan=0)
        sec_end = [0] * len(rows)
        for i in range(len(rows) - 1, -1, -1):
            if i + 1 < len(rows) and sections[i + 1] == sections[i]:
                sec_end[i] = sec_end[i + 1]
            else:
                sec_end[i] = i
        grid: dict[tuple[int, int], tuple[str, bool]] = {}
        for r, tr in enumerate(rows):
            c = 0
            for cell in _own_descendants(tr, stop="table"):
                if cell.tag not in ("td", "th"):
                    continue
                # only cells whose nearest tr is THIS tr (markup soup
                # can bury a td under an inline wrapper — allowed; a
                # td under a nested tr is that tr's cell)
                anc = cell.parent
                while anc is not None and anc.tag != "tr":
                    anc = anc.parent
                if anc is not tr:
                    continue
                while (r, c) in grid:
                    c += 1
                cs = _span(cell, "colspan", _MAX_COLSPAN)
                raw_rs = cell.attrs.get("rowspan", "").strip()
                if raw_rs == "0":
                    rs = sec_end[r] - r + 1
                else:
                    rs = _span(cell, "rowspan", _MAX_ROWSPAN)
                rs = min(rs, len(rows) - r)
                val = (_cell_text(cell), cell.tag == "th")
                for dr in range(rs):
                    for dc in range(cs):
                        grid.setdefault((r + dr, c + dc), val)
                c += cs
        for (r, c), (txt, hdr) in sorted(grid.items()):
            out.append((t_idx, r, c, txt, hdr, sections[r]))
    return out


_OUT_SCHEMA = (
    "doc_id long, table_idx int, row_idx int, col_idx int, "
    "cell string, is_header boolean, section string"
)


def extract_tables(
    df: DataFrame, body_col: str = "body", id_col: str = "doc_id"
) -> DataFrame:
    """Spark stage: one output row per table grid cell per page.

    ``mapInPandas`` over ``(id_col, body_col)`` — map-only, Arrow
    batch transfer, parse once per page.  Pages without tables
    contribute no rows."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for did, body in zip(pdf[id_col], pdf[body_col]):
                if not body:
                    continue
                for cell in extract_table_cells(body):
                    recs.append((int(did),) + cell)
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "table_idx", "row_idx", "col_idx",
                    "cell", "is_header", "section",
                ],
            )

    return df.select(id_col, body_col).mapInPandas(gen, schema=_OUT_SCHEMA)
