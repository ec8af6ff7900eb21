"""Sitemaps-protocol support (sitemaps.org, the public standard every
production crawler consumes alongside robots.txt).

Expression-only: ``<urlset>`` / ``<sitemapindex>`` documents are
split with JVM-side ``regexp_extract_all`` + ``posexplode`` — no
Python in the hot path, so a 100-TB sweep over fetched sitemap bodies
stays inside whole-stage codegen.  Extracted ``<loc>`` values are
canonicalized with the same :func:`mechaml_spark.page.canonicalize_col`
expression the frontier uses, so sitemap-discovered URLs dedupe
against crawl-discovered ones in the seen-set by construction.

Boundaries (documented, loud): gzipped ``sitemap.xml.gz`` bodies must
be decompressed upstream (the fetch layer owns transfer decoding);
entity-encoded ``&amp;`` in ``<loc>`` is unescaped here (the spec
requires escaping), other entities pass through.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mechaml_spark import page

_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_IDX_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
_PRIORITY = r"(?s)<priority>\s*(.*?)\s*</priority>"


def _field(entry: Column, pattern: str) -> Column:
    got = F.regexp_extract(entry, pattern, 1)
    return F.when(got != "", got)


def parse_sitemaps(
    df: DataFrame, xml_col: str = "body", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Explode sitemap XML into one row per entry.

    Output columns: ``keep_cols`` + ``kind`` ('url' for ``<urlset>``
    entries, 'sitemap' for ``<sitemapindex>`` children), ``pos``
    (document order), ``loc`` (canonicalized), ``lastmod`` and
    ``priority`` (null where absent — index entries carry no
    priority per the spec).
    """
    xml = F.col(xml_col)
    is_index = xml.contains("<sitemapindex")
    blocks = F.when(
        is_index, F.regexp_extract_all(xml, F.lit(_IDX_BLOCK), 1)
    ).otherwise(F.regexp_extract_all(xml, F.lit(_URL_BLOCK), 1))
    kind = F.when(is_index, F.lit("sitemap")).otherwise(F.lit("url"))

    exploded = df.select(
        *[F.col(c) for c in keep_cols],
        kind.alias("kind"),
        F.posexplode(blocks).alias("pos", "entry"),
    )
    raw_loc = _field(F.col("entry"), _LOC)
    loc = page.canonicalize_col(F.replace(raw_loc, F.lit("&amp;"), F.lit("&")))
    return exploded.select(
        *keep_cols,
        "kind",
        "pos",
        loc.alias("loc"),
        _field(F.col("entry"), _LASTMOD).alias("lastmod"),
        _field(F.col("entry"), _PRIORITY).cast("double").alias("priority"),
    ).where(F.col("loc").isNotNull())


_ROBOTS_SITEMAP = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"


def sitemap_urls_col(body: Column) -> Column:
    """``Sitemap:`` directives from a robots.txt body (RFC 9309 §2.3
    / sitemaps.org discovery): case-insensitive key, one URL per
    line, group-independent per the spec — so a single JVM-side
    ``regexp_extract_all`` is the complete parse.  Returns the array
    of raw URLs in file order; canonicalize per element downstream."""
    return F.regexp_extract_all(body, F.lit(_ROBOTS_SITEMAP), 1)


def robots_sitemap_discovery(
    robots_df: DataFrame, body_col: str = "body", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Explode each robots.txt into its declared sitemap URLs,
    canonicalized into the frontier URL space — the crawl-bootstrap
    edge robots -> sitemap.  Comment lines are dead per the robots
    line parse (a ``#`` line cannot match ``^sitemap:``)."""
    exploded = robots_df.select(
        *[F.col(c) for c in keep_cols],
        F.posexplode(sitemap_urls_col(F.col(body_col))).alias(
            "sm_pos", "raw"
        ),
    )
    return exploded.select(
        *keep_cols,
        "sm_pos",
        page.canonicalize_col(F.col("raw")).alias("sitemap_url"),
    )


def sitemap_seeds(entries: DataFrame) -> DataFrame:
    """Frontier-shaped seed rows from parsed entries: ``url`` kind
    only, deduped on the canonical loc, priority defaulted to the
    spec's 0.5, highest-priority copy kept per URL.  Shuffle carries
    (loc, priority) — a hash-partitioned groupBy, never a window over
    all rows."""
    urls = entries.where(F.col("kind") == "url").select(
        F.col("loc").alias("url_norm"),
        F.coalesce(F.col("priority"), F.lit(0.5)).alias("priority"),
    )
    return urls.groupBy("url_norm").agg(F.max("priority").alias("priority"))


# ------------------------------------------------------- gzipped sitemaps

def gunzip_text(
    df: DataFrame,
    bytes_col: str = "bytes",
    out_col: str = "body",
    max_bytes: int = 64 << 20,
) -> DataFrame:
    """Transparently decode sitemap payload bytes to text: gzip
    members (the ``sitemap.xml.gz`` convention — sitemaps.org allows
    gzip and caps the UNCOMPRESSED size, hence ``max_bytes``) or
    plain UTF-8.  The JVM has no gunzip Column expression, so this is
    an Arrow-batched ``pandas_udf`` (stdlib zlib, per-row pure work);
    undecodable rows yield NULL, never a task failure — the
    downstream regexp extraction treats NULL as an empty document.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _gunzip(s: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            raw = bytes(b)
            try:
                if raw[:2] == b"\x1f\x8b":
                    d = zlib.decompressobj(zlib.MAX_WBITS | 16)
                    out = d.decompress(raw, max_bytes)
                    if d.unconsumed_tail:
                        return None  # over the uncompressed cap
                    return out.decode("utf-8", errors="replace")
                return raw.decode("utf-8", errors="replace")
            except Exception:
                return None

        return s.map(one)

    return df.withColumn(out_col, _gunzip(F.col(bytes_col)))


# -------------------------------------------- Google video extension

_VID_BLOCK = r"(?s)<video:video>(.*?)</video:video>"
_VID_CONTENT = r"(?s)<video:content_loc>\s*(.*?)\s*</video:content_loc>"
_VID_THUMB = r"(?s)<video:thumbnail_loc>\s*(.*?)\s*</video:thumbnail_loc>"
_VID_TITLE = r"(?s)<video:title>\s*(.*?)\s*</video:title>"
_VID_DESC = r"(?s)<video:description>\s*(.*?)\s*</video:description>"
_VID_DURATION = r"(?s)<video:duration>\s*(\d+)\s*</video:duration>"


def parse_video_sitemaps(
    df: DataFrame, xml_col: str = "body", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Google video-sitemap extension: one row per ``<video:video>``
    inside each ``<url>`` — the channel through which sites
    EXPLICITLY hand crawlers video+description pairs (content URL,
    thumbnail, title, description, duration per the published spec),
    the video twin of :func:`parse_image_sitemaps` and the
    highest-precision discovery source a video-caption pipeline has.

    Output: ``keep_cols`` + ``page_loc``, ``vid_pos``,
    ``content_loc`` and ``thumbnail_loc`` (canonicalized),
    ``title`` / ``description`` (null where absent),
    ``duration_s`` (int, null where absent — the spec caps it at
    28800 s but out-of-range values are surfaced, not judged, so a
    policy stage can flag them).  Two-level explode, all fields JVM
    regexp — codegen end to end, no Python worker."""
    xml = F.col(xml_col)
    urls = df.select(
        *[F.col(c) for c in keep_cols],
        F.explode(F.regexp_extract_all(xml, F.lit(_URL_BLOCK), 1))
        .alias("entry"),
    )
    page_loc = page.canonicalize_col(
        F.replace(_field(F.col("entry"), _LOC), F.lit("&amp;"),
                  F.lit("&"))
    )
    vids = urls.select(
        *keep_cols,
        page_loc.alias("page_loc"),
        F.posexplode(
            F.regexp_extract_all(F.col("entry"), F.lit(_VID_BLOCK), 1)
        ).alias("vid_pos", "vid"),
    ).where(F.col("page_loc").isNotNull())
    v = F.col("vid")
    content = page.canonicalize_col(
        F.replace(_field(v, _VID_CONTENT), F.lit("&amp;"), F.lit("&"))
    )
    thumb = page.canonicalize_col(
        F.replace(_field(v, _VID_THUMB), F.lit("&amp;"), F.lit("&"))
    )
    return vids.select(
        *keep_cols,
        "page_loc",
        "vid_pos",
        content.alias("content_loc"),
        thumb.alias("thumbnail_loc"),
        _field(v, _VID_TITLE).alias("title"),
        _field(v, _VID_DESC).alias("description"),
        _field(v, _VID_DURATION).cast("int").alias("duration_s"),
    ).where(F.col("content_loc").isNotNull())


# -------------------------------------------- Google image extension

_IMG_BLOCK = r"(?s)<image:image>(.*?)</image:image>"
_IMG_LOC = r"(?s)<image:loc>\s*(.*?)\s*</image:loc>"
_IMG_CAPTION = r"(?s)<image:caption>\s*(.*?)\s*</image:caption>"
_IMG_TITLE = r"(?s)<image:title>\s*(.*?)\s*</image:title>"


def parse_image_sitemaps(
    df: DataFrame, xml_col: str = "body", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Google image-sitemap extension: one row per ``<image:image>``
    inside each ``<url>`` — the sitemap channel through which sites
    EXPLICITLY feed image+caption pairs to crawlers (up to 1000
    images per page per the published spec), i.e. the
    highest-precision discovery source an image-caption pipeline has.

    Output: ``keep_cols`` + ``page_loc`` (canonicalized), ``img_pos``
    (order within the page entry), ``img_loc`` (canonicalized),
    ``caption`` and ``title`` (null where absent).  Two-level
    explode, all fields via JVM regexp — codegen end to end, no
    Python worker."""
    xml = F.col(xml_col)
    urls = df.select(
        *[F.col(c) for c in keep_cols],
        F.explode(F.regexp_extract_all(xml, F.lit(_URL_BLOCK), 1))
        .alias("entry"),
    )
    page_loc = page.canonicalize_col(
        F.replace(_field(F.col("entry"), _LOC), F.lit("&amp;"),
                  F.lit("&"))
    )
    imgs = urls.select(
        *keep_cols,
        page_loc.alias("page_loc"),
        F.posexplode(
            F.regexp_extract_all(F.col("entry"), F.lit(_IMG_BLOCK), 1)
        ).alias("img_pos", "img"),
    ).where(F.col("page_loc").isNotNull())
    img_loc = page.canonicalize_col(
        F.replace(_field(F.col("img"), _IMG_LOC), F.lit("&amp;"),
                  F.lit("&"))
    )
    return imgs.select(
        *keep_cols,
        "page_loc",
        "img_pos",
        img_loc.alias("img_loc"),
        _field(F.col("img"), _IMG_CAPTION).alias("caption"),
        _field(F.col("img"), _IMG_TITLE).alias("title"),
    ).where(F.col("img_loc").isNotNull())
