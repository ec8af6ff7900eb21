"""Page-equivalent DataFrame transforms + Column selector compiler.

The reference's query language is "CSS-select nodes, lazily fold"
(src/page.ml:611-649, 90-127).  Spark-first, a parsed pages
DataFrame (see :mod:`mechaml_spark.extract`) is exploded once per
node family and the CSS selector is compiled into a **JVM-side
Column predicate** over the node struct — whole-stage-codegen'd, no
Python in the selection hot path.  ``tag_selector`` normalization
and the tag post-filter (src/page.ml:27-28, 63-67) are applied
exactly as the reference does.

Column-compiler contract (SURVEY.md §7):
  * combinator chains run right-to-left over the stored ancestor
    chain; ``>`` and descendant (whitespace) compose freely at any
    position (descendant = positional ``exists`` over the chain);
    ``+`` moves to the stored previous-sibling and may appear only
    adjacent to the target compound (the sibling shares the target's
    ancestor chain, so ancestor combinators continue left of it).
  * ``~`` and non-target-adjacent sibling combinators need sibling
    structure the node structs don't carry; ``_nodes_with`` falls
    back to the pure-Python matcher (htmlkit.selector, full surface)
    run Arrow-batched over the raw body for those — complete, but
    off the codegen fast path.

Lazy-seq parity (src/page.ml:90-127): ``first`` == ``.limit(1)``,
``nth n`` (1-based) == filter on ``pos == n-1``; both are LIMIT
pushdowns, never collect-then-head.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from mechaml_spark.htmlkit.selector import (
    Compound,
    SelectorError,
    parse_selector,
    tag_selector,
)

# ------------------------------------------------------- Column compilation


def _compound_pred(comp: Compound, tag: Column, attrs: Column) -> Column:
    pred = F.lit(True)
    if comp.tag and comp.tag != "*":
        pred = pred & (tag == F.lit(comp.tag))
    if comp.id is not None:
        pred = pred & (F.element_at(attrs, "id") == F.lit(comp.id))
    for cls in comp.classes:
        pred = pred & F.array_contains(
            F.split(F.coalesce(F.element_at(attrs, "class"), F.lit("")), r"\s+"),
            cls,
        )
    for name, op, value in comp.attrs:
        a = F.element_at(attrs, name)
        if op == "present":
            pred = pred & a.isNotNull()
        elif op == "=":
            pred = pred & (a == F.lit(value))
        elif op == "^=":
            pred = pred & a.startswith(value)
        elif op == "$=":
            pred = pred & a.endswith(value)
        elif op == "*=":
            pred = pred & a.contains(value)
        elif op == "~=":
            pred = pred & F.array_contains(F.split(a, r"\s+"), value)
        else:  # pragma: no cover
            raise SelectorError(f"unknown attr op {op!r}")
    return pred


def selector_column(css: str, node: Column, default_tag: str | None = None) -> Column:
    """Compile ``css`` (after ``tag_selector`` normalization against
    ``default_tag`` when given) to a boolean Column over a node struct
    with fields ``tag``, ``attrs`` and optionally ``anc``, ``prev``."""
    if default_tag is not None:
        css = tag_selector(default_tag, css)
    parsed = parse_selector(css)

    anc = node["anc"]

    def anc_pred(i: int, pos: Column) -> Column:
        """parsed[i] matches anc element at 1-based ``pos`` AND the
        whole chain parsed[0..i-1] matches above it."""
        a = F.try_element_at(anc, pos)
        p = a.isNotNull() & _compound_pred(parsed[i][1], a["tag"], a["attrs"])
        if i == 0:
            return p
        comb = parsed[i][0]  # combinator linking parsed[i-1] -> parsed[i]
        if comb == ">":
            return p & anc_pred(i - 1, pos + F.lit(1))
        if comb == " ":
            return p & exists_anc(i - 1, pos + F.lit(1))
        # '+' / '~' between two ANCESTOR compounds would need the
        # siblings of ancestors, which the node structs don't carry
        raise SelectorError(
            f"sibling combinator {comb!r} between non-target compounds "
            f"unsupported in the Spark compiler: {css!r}"
        )

    def exists_anc(i: int, start: Column) -> Column:
        """exists 1-based j >= start with anc_pred(i, j).  Guarded:
        Spark's ``sequence`` runs DESCENDING when stop < start, which
        would probe ancestors closer than allowed."""
        return F.when(
            F.size(anc) >= start,
            F.exists(
                F.sequence(start, F.size(anc)), lambda j: anc_pred(i, j)
            ),
        ).otherwise(F.lit(False))

    # rightmost compound applies to the node itself
    _, rightmost = parsed[-1]
    pred = _compound_pred(rightmost, node["tag"], node["attrs"])
    if len(parsed) == 1:
        return pred

    comb, i = parsed[-1][0], len(parsed) - 2
    if comb == "+":
        # target-adjacent sibling: stored prev struct; the sibling
        # shares the target's ancestor chain, so ancestor combinators
        # continue from the SAME chain at offset 0
        prev = node["prev"]
        pred = pred & prev.isNotNull() & _compound_pred(
            parsed[i][1], prev["tag"], prev["attrs"]
        )
        if i == 0:
            return pred
        comb, i = parsed[i][0], i - 1
        if comb == "+":
            raise SelectorError(
                f"chained adjacent-sibling combinators unsupported in "
                f"the Spark compiler (prev-of-prev not stored): {css!r}"
            )
    if comb == ">":
        pred = pred & anc_pred(i, F.lit(1))
    elif comb == " ":
        pred = pred & exists_anc(i, F.lit(1))
    else:
        raise SelectorError(
            f"combinator {comb!r} unsupported in the Spark compiler: {css!r}"
        )
    return pred


# ----------------------------------------------------------- Page-API views


def _nodes_with_pure(
    parsed_pages: DataFrame,
    array_col: str,
    default_tag: str,
    selector: str,
    page_cols: tuple[str, ...],
    body_col: str = "body",
) -> DataFrame:
    """Full-surface selector path: run the pure-Python matcher
    (htmlkit.selector — the same engine the goldens validate, incl.
    ``~`` and arbitrary sibling chains) Arrow-batched over the raw
    body, emitting the matching family positions per page; the
    exploded node rows are then filtered JVM-side on ``pos``.  Output
    schema identical to the fast path.  Slow path by design: one
    re-parse per page inside a pandas UDF — used only for selectors
    the Column compiler cannot express."""
    if body_col not in parsed_pages.columns:
        raise SelectorError(
            f"selector {selector!r} needs the pure-matcher fallback, "
            f"which requires the raw {body_col!r} column on the parsed "
            "pages DataFrame"
        )
    css = tag_selector(default_tag, selector)
    parse_selector(css)  # surface errors on the driver, not in tasks

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def _match_pos(bodies):
        import pandas as pd

        from mechaml_spark.htmlkit.parser import parse_html
        from mechaml_spark.htmlkit.selector import compile_selector

        pred = compile_selector(css)
        out = []
        for b in bodies:
            if b is None:
                b = ""
            if isinstance(b, (bytes, bytearray)):
                b = bytes(b).decode("utf-8", errors="replace")
            # family position = document order of the family tag,
            # exactly how extract.parse_page assigns ``pos``
            hits, pos = [], -1
            for el in parse_html(b).iter_subtree():
                if el.tag != default_tag:
                    continue
                pos += 1
                if pred(el):
                    hits.append(pos)
            out.append(hits)
        return pd.Series(out)

    node = F.explode(array_col).alias("node")
    df = parsed_pages.withColumn("_sel_pos", _match_pos(F.col(body_col)))
    df = df.select(*page_cols, "base_uri", "_sel_pos", node)
    return df.where(
        F.array_contains(F.col("_sel_pos"), F.col("node")["pos"])
    ).drop("_sel_pos")


def _nodes_with(
    parsed_pages: DataFrame,
    array_col: str,
    default_tag: str,
    selector: str,
    page_cols: tuple[str, ...],
) -> DataFrame:
    try:
        pred = selector_column(
            selector, F.col("node"), default_tag=default_tag
        )
    except SelectorError:
        # ``~`` / chained sibling combinators: full-surface fallback
        return _nodes_with_pure(
            parsed_pages, array_col, default_tag, selector, page_cols
        )
    node = F.explode(array_col).alias("node")
    df = parsed_pages.select(*page_cols, "base_uri", node)
    # tag post-filter (src/page.ml:27-28): selected node must BE the
    # default tag — constant-true on extracted arrays but kept for parity
    pred = pred & (F.col("node")["tag"] == default_tag)
    return df.where(pred)


def links_with(
    parsed_pages: DataFrame, selector: str = "", page_cols: tuple[str, ...] = ("url",)
) -> DataFrame:
    """Exploded link rows matching ``selector``; columns: page_cols +
    base_uri + node(struct) + resolved ``uri`` (src/page.ml:593-595)."""
    df = _nodes_with(parsed_pages, "links", "a", selector, page_cols)
    return df.withColumn("uri", resolve_col("base_uri", F.col("node")["href"]))


def images_with(
    parsed_pages: DataFrame, selector: str = "", page_cols: tuple[str, ...] = ("url",)
) -> DataFrame:
    df = _nodes_with(parsed_pages, "images", "img", selector, page_cols)
    return df.withColumn("uri", resolve_col("base_uri", F.col("node")["src"]))


def forms_with(
    parsed_pages: DataFrame, selector: str = "", page_cols: tuple[str, ...] = ("url",)
) -> DataFrame:
    df = _nodes_with(parsed_pages, "forms", "form", selector, page_cols)
    return df.withColumn("uri", resolve_col("base_uri", F.col("node")["action"]))


def first(df: DataFrame) -> DataFrame:
    """Seq ``first`` (src/page.ml:118) — LIMIT pushdown."""
    return df.limit(1)


def nth(df: DataFrame, n: int) -> DataFrame:
    """Seq ``nth`` — **1-based** (src/page.ml:110-116)."""
    return df.where(F.col("node")["pos"] == F.lit(n - 1)).limit(1)


# -------------------------------------------------------------- resolution


@F.pandas_udf(StringType())
def _resolve_udf(b, r):
    from mechaml_spark import urlkit

    return urlkit.resolve_series(b, r)


@F.pandas_udf(StringType())
def _canonicalize_udf(u):
    from mechaml_spark import urlkit

    return urlkit.canonicalize_series(u)


@F.pandas_udf(StringType())
def _host_udf(u):
    from mechaml_spark import urlkit

    return urlkit.host_series(u)


_RCH_T = "url_norm string, host string"


def resolve_canon_host(base: Column, ref: Column) -> Column:
    """Fused resolve -> canonicalize -> host in ONE Arrow round trip
    (the crawl's hottest per-link path; three separate UDFs would pay
    the Python transfer three times)."""
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("url_norm", StringType()), StructField("host", StringType())]
    )

    @F.pandas_udf(schema)
    def _rch(b, r):
        import pandas as pd

        from mechaml_spark import urlkit

        urls, hosts = urlkit.resolve_canon_host_pairs(b, r)
        return pd.DataFrame({"url_norm": urls, "host": hosts})

    return _rch(base, ref)


def resolve_col(base: str | Column, ref: Column) -> Column:
    """Vectorized RFC-3986 resolve (Arrow-batched pandas UDF)."""
    base_col = F.col(base) if isinstance(base, str) else base
    return _resolve_udf(base_col, ref)


def canonicalize_col(url: Column) -> Column:
    return _canonicalize_udf(url)


def host_col(url: Column) -> Column:
    return _host_udf(url)


# RFC 3986 appendix-B style split, reduced to the path component:
# optional scheme, optional //authority, then everything up to the
# first '?' or '#'.  Always matches, so regexp_extract never yields
# a surprise '' for a URL it "failed" on.
_PATH_RE = r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?(?://[^/?#]*)?([^?#]*)"


def path_col(url: Column) -> Column:
    """``urlsplit(url).path`` as a pure JVM expression ('' when absent
    or NULL).

    Deliberately NOT ``F.parse_url``: under Spark 4's default ANSI
    mode ``parse_url`` raises ``INVALID_URL`` for URLs ``java.net.URI``
    rejects (unencoded space, ``|``, bad %-escapes) — inputs the crawl
    itself produces from ordinary hrefs and that ``urlsplit`` (the
    normative semantics used by :func:`mechaml_spark.urlkit.path_of`
    and the sequential oracle) handles fine.  A regex never throws and
    keeps the robots/cookie matching byte-aligned with the oracle."""
    return F.coalesce(F.regexp_extract(url, _PATH_RE, 1), F.lit(""))
