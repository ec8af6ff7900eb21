"""Page-equivalent DataFrame transforms + Column selector compiler.

The reference's query language is "CSS-select nodes, lazily fold"
(src/page.ml:611-649, 90-127).  Spark-first, a parsed pages
DataFrame (see :mod:`mechaml_spark.extract`) is exploded once per
node family and the CSS selector is compiled into a **JVM-side
Column predicate** over the node struct — whole-stage-codegen'd, no
Python in the selection hot path.  ``tag_selector`` normalization
and the tag post-filter (src/page.ml:27-28, 63-67) are applied
exactly as the reference does.

Column-compiler contract (documented boundary, SURVEY.md §7):
  * combinator chains run right-to-left over the stored ancestor
    chain; ``+`` moves to the stored previous-sibling and may appear
    only adjacent to the target compound; ``~`` and non-leftmost
    descendant combinators are unsupported here (the pure-Python
    matcher in htmlkit.selector supports them; the reference's test
    surface needs neither).

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

    # rightmost compound applies to the node itself
    _, rightmost = parsed[-1]
    pred = _compound_pred(rightmost, node["tag"], node["attrs"])

    k = 0  # current ancestor offset: anc[k] is the parent of the
    # element the walk currently sits on (siblings share ancestors)
    for i in range(len(parsed) - 2, -1, -1):
        comb, comp = parsed[i + 1][0], parsed[i][1]
        if comb == ">":
            anc_i = F.try_element_at(node["anc"], F.lit(k + 1))
            pred = pred & anc_i.isNotNull() & _compound_pred(
                comp, anc_i["tag"], anc_i["attrs"]
            )
            k += 1
        elif comb == "+":
            if k != 0:
                raise SelectorError(
                    "adjacent-sibling combinator only supported on the "
                    f"target compound in the Spark compiler: {css!r}"
                )
            prev = node["prev"]
            pred = pred & prev.isNotNull() & _compound_pred(
                comp, prev["tag"], prev["attrs"]
            )
            # sibling: ancestor chain unchanged, but prev-of-prev is
            # not stored -> a further '+' is unsupported (caught by
            # the k!=0 check only for post-'>' chains); mark it:
            k = -1
        elif comb == " ":
            if i != 0:
                raise SelectorError(
                    f"descendant combinator must be leftmost in the Spark "
                    f"compiler: {css!r}"
                )
            start = max(k, 0) + 1
            rest = F.slice(
                node["anc"],
                F.lit(start),
                F.greatest(F.size(node["anc"]), F.lit(1)),
            )
            pred = pred & F.exists(
                rest, lambda a: _compound_pred(comp, a["tag"], a["attrs"])
            )
        else:
            raise SelectorError(
                f"combinator {comb!r} unsupported in the Spark compiler: {css!r}"
            )
    return pred


# ----------------------------------------------------------- Page-API views


def _nodes_with(
    parsed_pages: DataFrame,
    array_col: str,
    default_tag: str,
    selector: str,
    page_cols: tuple[str, ...],
) -> DataFrame:
    node = F.explode(array_col).alias("node")
    df = parsed_pages.select(*page_cols, "base_uri", node)
    pred = selector_column(selector, F.col("node"), default_tag=default_tag)
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
