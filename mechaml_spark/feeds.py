"""RSS 2.0 / Atom feed parsing — the second standard URL-discovery
channel (next to :mod:`mechaml_spark.sitemap`) a production crawler
consumes; for an image+caption pipeline, feed entries also carry
media enclosures (podcast art, article images) worth frontier seeds.

Expression-only, same design as the sitemap parser: entry blocks are
split with JVM-side ``regexp_extract_all`` + ``posexplode`` and field
extraction is regex + higher-order array functions, so a 100-TB sweep
over fetched feed bodies stays inside whole-stage codegen.  Extracted
links go through the frontier canonicalizer so feed-discovered URLs
dedupe against crawl-discovered ones by construction.

Field semantics (documented, asserted in tests):
  * kind is ``atom`` when the body carries an ``<feed`` root, else
    ``rss`` (``<item>`` blocks);
  * RSS entry link = ``<link>`` element TEXT; Atom entry link = the
    first ``<link>`` TAG whose ``rel`` is absent or ``alternate``
    (the spec default), via ``href``;
  * ``published`` = RSS ``<pubDate>``, Atom ``<published>`` else
    ``<updated>`` — kept as the raw trimmed string (date parsing is
    :mod:`mechaml_spark.formatting`'s job downstream);
  * ``enclosure_url`` = RSS ``<enclosure url=...>`` / Atom
    ``<link rel="enclosure" href=...>``, canonicalized; NULL when
    absent;
  * CDATA in titles is unwrapped (single level).

Discovery: :func:`feed_links` finds ``<link rel="alternate"
type="application/(rss|atom)+xml" href=...>`` declarations in HTML
heads — the crawl-bootstrap edge page -> feed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mechaml_spark import page

_ITEM_BLOCK = r"(?is)<item[\s>](.*?)</item>"
_ENTRY_BLOCK = r"(?is)<entry[\s>](.*?)</entry>"
_TITLE = r"(?is)<title[^>]*>\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*</title>"
_RSS_LINK = r"(?is)<link[^>]*>\s*(.*?)\s*</link>"
_PUBDATE = r"(?is)<pubDate[^>]*>\s*(.*?)\s*</pubDate>"
_PUBLISHED = r"(?is)<published[^>]*>\s*(.*?)\s*</published>"
_UPDATED = r"(?is)<updated[^>]*>\s*(.*?)\s*</updated>"
_LINK_TAG = r"(?is)<link\b[^>]*>"
_HREF = r'(?is)\bhref\s*=\s*["\']([^"\']*)["\']'
_ENCL_URL = r'(?is)<enclosure\b[^>]*\burl\s*=\s*["\']([^"\']*)["\']'
_REL = r'(?is)\brel\s*=\s*["\']([^"\']*)["\']'


def _nonempty(c: Column) -> Column:
    t = F.trim(c)
    return F.when(t != "", t)


def _atom_href(entry: Column, want_enclosure: bool) -> Column:
    """href of the first <link> tag in the entry matching the rel
    rule: ``rel`` absent/``alternate`` for the entry link, exactly
    ``enclosure`` for the enclosure — array filter + element_at, no
    second body scan."""
    tags = F.regexp_extract_all(entry, F.lit(_LINK_TAG), 0)
    rel = lambda t: F.regexp_extract(t, _REL, 1)  # noqa: E731
    if want_enclosure:
        keep = F.filter(tags, lambda t: F.lower(rel(t)) == "enclosure")
    else:
        keep = F.filter(
            tags,
            lambda t: (rel(t) == "") | (F.lower(rel(t)) == "alternate"),
        )
    # try_element_at: under ANSI mode element_at throws on the empty
    # filter result (entry with no matching <link>).
    first = F.try_element_at(keep, F.lit(1))
    return _nonempty(F.regexp_extract(first, _HREF, 1))


def parse_feeds(
    df: DataFrame, body_col: str = "body", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Explode feed XML into one row per entry.

    Output: ``keep_cols`` + ``kind`` ('rss' | 'atom'), ``pos``
    (document order), ``link`` (canonicalized), ``title``,
    ``published`` (raw string), ``enclosure_url`` (canonicalized,
    NULL when absent).  Entries with no resolvable link are dropped
    (they cannot seed the frontier)."""
    xml = F.col(body_col)
    is_atom = xml.rlike(r"(?is)<feed[\s>]")
    blocks = F.when(
        is_atom, F.regexp_extract_all(xml, F.lit(_ENTRY_BLOCK), 1)
    ).otherwise(F.regexp_extract_all(xml, F.lit(_ITEM_BLOCK), 1))
    kind = F.when(is_atom, F.lit("atom")).otherwise(F.lit("rss"))

    exploded = df.select(
        *[F.col(c) for c in keep_cols],
        kind.alias("kind"),
        F.posexplode(blocks).alias("pos", "entry"),
    )
    e = F.col("entry")
    atom = F.col("kind") == "atom"
    link = F.when(atom, _atom_href(e, want_enclosure=False)).otherwise(
        _nonempty(F.regexp_extract(e, _RSS_LINK, 1))
    )
    published = F.when(
        atom,
        F.coalesce(
            _nonempty(F.regexp_extract(e, _PUBLISHED, 1)),
            _nonempty(F.regexp_extract(e, _UPDATED, 1)),
        ),
    ).otherwise(_nonempty(F.regexp_extract(e, _PUBDATE, 1)))
    enclosure = F.when(atom, _atom_href(e, want_enclosure=True)).otherwise(
        _nonempty(F.regexp_extract(e, _ENCL_URL, 1))
    )
    return exploded.select(
        *keep_cols,
        "kind",
        "pos",
        page.canonicalize_col(link).alias("link"),
        _nonempty(F.regexp_extract(e, _TITLE, 1)).alias("title"),
        published.alias("published"),
        F.when(
            enclosure.isNotNull(), page.canonicalize_col(enclosure)
        ).alias("enclosure_url"),
    ).where(F.col("link").isNotNull())


_FEED_DECL = (
    r"(?is)<link\b[^>]*type\s*=\s*[\"']application/(?:rss|atom)\+xml[\"']"
    r"[^>]*>"
)


def feed_links(
    html_df: DataFrame, body_col: str = "body", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Feed-autodiscovery declarations from HTML pages: one row per
    ``<link type="application/rss+xml|atom+xml">``, href canonicalized
    into the frontier URL space."""
    exploded = html_df.select(
        *[F.col(c) for c in keep_cols],
        F.posexplode(
            F.regexp_extract_all(F.col(body_col), F.lit(_FEED_DECL), 0)
        ).alias("feed_pos", "tag"),
    )
    href = _nonempty(F.regexp_extract(F.col("tag"), _HREF, 1))
    return exploded.select(
        *keep_cols,
        "feed_pos",
        page.canonicalize_col(href).alias("feed_url"),
    ).where(F.col("feed_url").isNotNull())


def feed_seeds(entries: DataFrame) -> DataFrame:
    """Frontier-shaped seed rows: entry links + enclosure URLs,
    deduped on the canonical URL — a hash-partitioned groupBy, the
    same shape as :func:`mechaml_spark.sitemap.sitemap_seeds`."""
    links = entries.select(F.col("link").alias("url_norm"))
    encl = entries.where(F.col("enclosure_url").isNotNull()).select(
        F.col("enclosure_url").alias("url_norm")
    )
    return links.unionByName(encl).groupBy("url_norm").agg(
        F.count(F.lit(1)).alias("n_refs")
    )
