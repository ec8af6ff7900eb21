"""Page-level metadata & image-caption pair extraction.

The crawl's payload is (image, caption) rows; this module owns the
WHERE-captions-come-from surface a production image-text pipeline
(LAION / DataComp style) needs:

  * OpenGraph / Twitter-card / ``<meta name=description>`` /
    ``<title>`` page metadata with a documented precedence chain;
  * JSON-LD (``application/ld+json``) captions via Spark's JVM-side
    ``get_json_object`` — no Python JSON parsing in the hot path;
  * per-``<img>`` candidates: ``srcset`` parsing (w/x descriptors,
    largest-candidate pick), ``alt`` text, and ``<figure>`` /
    ``<figcaption>`` pairing.

Everything here is expression-only (``regexp_extract[_all]`` +
``posexplode`` + higher-order array functions), so a 100-TB sweep over
fetched bodies stays inside whole-stage codegen; the only Python is
the shared memoized URL canonicalizer every other frontier stage uses
(:func:`mechaml_spark.page.canonicalize_col`), applied per extracted
URL.

Semantics notes (documented behavior, asserted in tests):
  * attribute order and quote style both vary in the wild — each meta
    key is matched in ``property/name``-first AND ``content``-first
    order, double- or single-quoted content;
  * extracted text values are whitespace-trimmed; an empty ``content``
    counts as absent (falls through the precedence chain);
  * ``srcset`` candidates are split on commas (a srcset URL cannot
    contain whitespace, and candidate separators are commas per the
    HTML spec); a missing descriptor means density ``1x``; the pick
    is the largest effective width (``Nw``, else ``Nx`` scaled by
    1000, first candidate wins ties) — the "biggest available asset"
    rule a training-data fetcher wants;
  * figcaption pairing joins figure-scoped imgs back to the exploded
    img rows on (row key, canonical URL) — an equi-join, never a
    positional re-scan of the body.

Reference parity: mechaml's ``Page.images`` exposes only ``src``
(page.ml:images); srcset/og/figcaption are engine-brief breadth on
top of that surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mechaml_spark import page

# ------------------------------------------------------------------ meta tags

# <meta ... property|name = "KEY" ... content = "VAL" ...> in either
# attribute order; four compiled variants (order x quote style).  The
# (?is) flags make '.' span newlines and match case-insensitively.
_META_FWD = (
    r'(?is)<meta\b[^>]*?(?:property|name)\s*=\s*["\']{key}["\']'
    r"[^>]*?\bcontent\s*=\s*{val}"
)
_META_REV = (
    r"(?is)<meta\b[^>]*?\bcontent\s*=\s*{val}"
    r'[^>]*?(?:property|name)\s*=\s*["\']{key}["\']'
)
_DQ = r'"([^"]*)"'
_SQ = r"'([^']*)'"


def _nonempty(c: Column) -> Column:
    t = F.trim(c)
    return F.when(t != "", t)


def meta_content_col(body: Column, key: str) -> Column:
    """``content`` of the first ``<meta>`` carrying ``key`` (as
    ``property`` or ``name``), trimmed; NULL when absent or empty.
    ``key`` is a literal (e.g. ``og:description``), regex-escaped."""
    import re as _re

    k = _re.escape(key)
    out = None
    for pat in (_META_FWD, _META_REV):
        for val in (_DQ, _SQ):
            got = _nonempty(F.regexp_extract(body, pat.format(key=k, val=val), 1))
            out = got if out is None else F.coalesce(out, got)
    return out


_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"


def title_col(body: Column) -> Column:
    """Trimmed ``<title>`` text; NULL when absent or empty."""
    return _nonempty(F.regexp_extract(body, _TITLE_RE, 1))


# ------------------------------------------------------------------ JSON-LD

_JSONLD_RE = (
    r'(?is)<script\b[^>]*type\s*=\s*["\']application/ld\+json["\']'
    r"[^>]*>(.*?)</script>"
)


def jsonld_caption_col(body: Column) -> Column:
    """Caption from the FIRST JSON-LD block: ``$.caption`` (schema.org
    ImageObject), else ``$.description``.  ``get_json_object`` is a
    JVM expression; malformed JSON yields NULL, never an error."""
    block = _nonempty(F.regexp_extract(body, _JSONLD_RE, 1))
    return F.coalesce(
        _nonempty(F.get_json_object(block, "$.caption")),
        _nonempty(F.get_json_object(block, "$.description")),
    )


# ------------------------------------------------------------ page-level meta

_CAPTION_CHAIN = (
    ("og", "og:description"),
    ("twitter", "twitter:description"),
    ("meta", "description"),
)


def extract_page_meta(
    df: DataFrame, body_col: str = "body", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """One row per page: ``caption`` via the documented precedence
    chain (og:description > twitter:description > meta description >
    JSON-LD caption/description > <title>), ``caption_source`` naming
    the winning rung, and the canonicalized ``og_image`` URL (the
    image half of the payload pair) — NULL-rowed, never dropped, so
    callers can count caption coverage."""
    body = F.col(body_col)
    rungs: list[tuple[str, Column]] = [
        (src, meta_content_col(body, key)) for src, key in _CAPTION_CHAIN
    ]
    rungs.append(("jsonld", jsonld_caption_col(body)))
    rungs.append(("title", title_col(body)))

    caption = F.coalesce(*[c for _, c in rungs])
    source = F.lit(None).cast("string")
    for name, col in reversed(rungs):
        source = F.when(col.isNotNull(), F.lit(name)).otherwise(source)

    og_image = meta_content_col(body, "og:image")
    return df.select(
        *keep_cols,
        caption.alias("caption"),
        source.alias("caption_source"),
        F.when(
            og_image.isNotNull(), page.canonicalize_col(og_image)
        ).alias("og_image"),
    )


# ------------------------------------------------------------ <img> / srcset

_IMG_TAG_RE = r"(?is)<img\b([^>]*)>"
_FIGURE_RE = r"(?is)<figure\b.*?</figure>"
_FIGCAPTION_RE = r"(?is)<figcaption[^>]*>(.*?)</figcaption>"

# srcset candidate: URL token, then optional descriptor.
_CAND_URL = r"^(\S+)"
_CAND_W = r"\s(\d+)w$"
_CAND_X = r"\s(\d+(?:\.\d+)?)x$"


def _attr(tag_attrs: Column, name: str) -> Column:
    out = None
    for val in (_DQ, _SQ):
        # (?<![-\w]) not \b: '-' is a non-word char, so \bsrc would
        # false-match the src inside a data-src attribute.
        got = _nonempty(
            F.regexp_extract(
                tag_attrs, r"(?is)(?<![-\w]){}\s*=\s*{}".format(name, val), 1
            )
        )
        out = got if out is None else F.coalesce(out, got)
    return out


def best_srcset_url(srcset: Column, src: Column) -> Column:
    """Largest-effective-width candidate from ``srcset``, else ``src``.

    Effective width: the ``Nw`` descriptor, else ``Nx`` density x1000
    (missing descriptor = ``1x`` = 1000 per the HTML spec default).
    First candidate wins ties (``>`` in the fold keeps the earlier
    one).  Pure array expressions — codegen, no UDF."""
    cands = F.transform(
        F.split(F.trim(srcset), r"\s*,\s*"),
        lambda c: F.struct(
            F.regexp_extract(F.trim(c), _CAND_URL, 1).alias("url"),
            F.coalesce(
                _nonempty(
                    F.regexp_extract(F.trim(c), _CAND_W, 1)
                ).cast("long"),
                (
                    _nonempty(
                        F.regexp_extract(F.trim(c), _CAND_X, 1)
                    ).cast("double")
                    * 1000
                ).cast("long"),
                F.lit(1000).cast("long"),
            ).alias("eff"),
        ),
    )
    best = F.aggregate(
        cands,
        F.struct(
            F.lit(None).cast("string").alias("url"),
            F.lit(-1).cast("long").alias("eff"),
        ),
        lambda acc, c: F.when(c["eff"] > acc["eff"], c).otherwise(acc),
    )
    return F.coalesce(_nonempty(best["url"]), src)


def img_candidates(
    df: DataFrame, body_col: str = "body", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Explode every ``<img>`` tag (document order) into
    ``keep_cols + (pos, url, alt)`` with ``url`` = canonicalized
    best-srcset pick (fallback ``src``); tags with neither attribute
    are dropped."""
    exploded = df.select(
        *[F.col(c) for c in keep_cols],
        F.posexplode(
            F.regexp_extract_all(F.col(body_col), F.lit(_IMG_TAG_RE), 1)
        ).alias("pos", "attrs"),
    )
    a = F.col("attrs")
    url = best_srcset_url(_attr(a, "srcset"), _attr(a, "src"))
    return exploded.select(
        *keep_cols,
        "pos",
        page.canonicalize_col(url).alias("url"),
        _attr(a, "alt").alias("alt"),
    ).where(url.isNotNull())


def figure_captions(
    df: DataFrame, body_col: str = "body", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(canonical img url, figcaption text) per ``<figure>`` block
    that contains both an ``<img>`` and a ``<figcaption>``."""
    blocks = df.select(
        *[F.col(c) for c in keep_cols],
        F.explode(
            F.regexp_extract_all(F.col(body_col), F.lit(_FIGURE_RE), 0)
        ).alias("figure"),
    )
    g = F.col("figure")
    tag = _nonempty(F.regexp_extract(g, _IMG_TAG_RE, 1))
    url = best_srcset_url(_attr(tag, "srcset"), _attr(tag, "src"))
    cap = _nonempty(F.regexp_extract(g, _FIGCAPTION_RE, 1))
    return (
        blocks.select(
            *keep_cols,
            page.canonicalize_col(url).alias("url"),
            cap.alias("figcaption"),
        )
        .where(F.col("url").isNotNull() & F.col("figcaption").isNotNull())
        .dropDuplicates([*keep_cols, "url"])
    )


def image_caption_pairs(
    df: DataFrame, body_col: str = "body", key_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """The payload-pair extractor: one row per ``<img>`` with the best
    asset URL and a caption chosen figcaption > alt > page caption
    (og/twitter/meta/JSON-LD/title chain).  ``caption_source`` names
    the rung.

    Plan shape: two expression-only scans of the body column (img
    explode + figure explode) joined on (key, url) — both sides hash-
    partitioned equi-joins; the page-level caption rides the img rows
    from the first scan, so no third scan.  At 100 TB every stage is
    codegen + one shuffle per join, no window over all imgs."""
    keep = list(key_cols)
    pm = extract_page_meta(
        df, body_col=body_col, keep_cols=(*keep, body_col)
    )
    imgs = img_candidates(pm, body_col=body_col, keep_cols=(
        *keep, "caption", "caption_source"
    ))
    figs = figure_captions(df, body_col=body_col, keep_cols=keep)
    joined = imgs.join(figs, on=[*keep, "url"], how="left")
    caption = F.coalesce(
        F.col("figcaption"), _nonempty(F.col("alt")), F.col("caption")
    )
    source = (
        F.when(F.col("figcaption").isNotNull(), F.lit("figcaption"))
        .when(_nonempty(F.col("alt")).isNotNull(), F.lit("alt"))
        .otherwise(F.col("caption_source"))
    )
    return joined.select(
        *keep,
        "pos",
        "url",
        caption.alias("caption"),
        F.when(caption.isNotNull(), source).alias("caption_source"),
    )


# ------------------------------------------------------------- rel=canonical

# <link rel="canonical" href="..."> in either attribute order; the
# same four-variant (order x quote) treatment as the meta extractors.
_LINK_FWD = (
    r'(?is)<link\b[^>]*?\brel\s*=\s*["\']canonical["\']'
    r"[^>]*?\bhref\s*=\s*{val}"
)
_LINK_REV = (
    r"(?is)<link\b[^>]*?\bhref\s*=\s*{val}"
    r'[^>]*?\brel\s*=\s*["\']canonical["\']'
)


def canonical_href_col(body: Column) -> Column:
    """``href`` of the first ``<link rel="canonical">``; NULL when the
    page declares none (or declares it empty).  Expression-only."""
    out = None
    for pat in (_LINK_FWD, _LINK_REV):
        for val in (_DQ, _SQ):
            got = _nonempty(F.regexp_extract(body, pat.format(val=val), 1))
            out = got if out is None else F.coalesce(out, got)
    return out


def canonical_urls(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Resolve each page's canonical URL: the declared
    ``rel=canonical`` href (absolute or relative, resolved against
    the page URL through the shared vectorized canonicalizer —
    :func:`mechaml_spark.page.resolve_canon_host`), else the
    canonicalized page URL itself.

    Adds ``canonical`` (string), ``has_tag`` (bool).  Dup-group
    membership is then a plain hash partition on ``canonical`` —
    the crawl uses it to collapse tracking-parameter / mirror
    variants of one logical page before indexing."""
    href = canonical_href_col(F.col(body_col))
    rc = page.resolve_canon_host(
        F.col(url_col), F.coalesce(href, F.col(url_col))
    )
    return df.withColumn("has_tag", href.isNotNull()).withColumn(
        "canonical", rc["url_norm"]
    )


# ------------------------------------------------------- robots directives

def robots_directives(body: Column, header: Column | None = None) -> Column:
    """Page-level robots directives merged from the ``<meta
    name="robots">`` tag and the ``X-Robots-Tag`` response header
    (both use the same comma-separated token grammar; Google's
    documented semantics): struct ``(noindex, nofollow)``.

    * tokens are case-insensitive and whitespace-trimmed;
    * ``none`` = ``noindex, nofollow``; ``all`` = no restriction;
    * unknown / parameterized tokens (``unavailable_after: ...``,
      ``max-snippet:-1``) are ignored;
    * merge is the RESTRICTIVE union — either source can turn a
      restriction on, neither can turn one off.

    Expression-only (regexp + split + array_contains): the directive
    check rides the parse projection as codegen, no extra pass."""
    sources = [meta_content_col(body, "robots")]
    if header is not None:
        sources.append(header)
    toks = F.transform(
        F.split(F.lower(F.concat_ws(",", *sources)), ","),
        lambda t: F.trim(t),
    )

    def has(name: str) -> Column:
        return F.array_contains(toks, name) | F.array_contains(toks, "none")

    return F.struct(
        has("noindex").alias("noindex"), has("nofollow").alias("nofollow")
    )


def rel_nofollow(rel: Column) -> Column:
    """True when a link's ``rel`` attribute carries the ``nofollow``
    token (space-separated list, case-insensitive).  ``ugc`` /
    ``sponsored`` are deliberately treated as followable — they are
    attribution hints, not crawl directives (documented choice)."""
    return F.array_contains(
        F.split(F.lower(F.coalesce(rel, F.lit(""))), r"\s+"), "nofollow"
    )


# ------------------------------------------------------- publish date

_TIME_DT_RE = r"(?is)<time\b[^>]*\bdatetime\s*=\s*[\"']([^\"']+)[\"']"
_URL_DATE_RE = r"/((?:19|20)\d{2})/(\d{2})(?:/(\d{2}))?/"
_ISO_DAY_RE = r"^\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$"


def published_date(body: Column, url: Column) -> Column:
    """Publish-date extraction with the documented precedence chain
    (trafilatura/htmldate shape): JSON-LD ``datePublished`` > ``<meta
    article:published_time>`` > first ``<time datetime=...>`` > a
    ``/YYYY/MM[/DD]/`` URL path segment (day defaults to 01).

    Every candidate is cut to its first 10 chars and must pass the
    pinned ISO-day grammar (month 01-12, day 01-31) or it falls
    through to the next rung — a malformed high-precedence tag never
    shadows a valid lower one.  Returns struct ``(pub_date, source)``,
    both NULL when no rung validates.  Expression-only: regexp +
    get_json_object, rides the parse projection as codegen."""

    def norm(c: Column) -> Column:
        d = F.substring(c, 1, 10)
        return F.when(d.rlike(_ISO_DAY_RE), d)

    block = _nonempty(F.regexp_extract(body, _JSONLD_RE, 1))
    rungs: list[tuple[str, Column]] = [
        ("jsonld", norm(F.get_json_object(block, "$.datePublished"))),
        ("meta", norm(meta_content_col(body, "article:published_time"))),
        ("time", norm(F.regexp_extract(body, _TIME_DT_RE, 1))),
    ]
    y = F.regexp_extract(url, _URL_DATE_RE, 1)
    m = F.regexp_extract(url, _URL_DATE_RE, 2)
    dd = F.regexp_extract(url, _URL_DATE_RE, 3)
    url_date = F.when(
        y != "",
        F.concat_ws(
            "-", y, m, F.when(dd == "", F.lit("01")).otherwise(dd)
        ),
    )
    rungs.append(("url", norm(url_date)))

    pub = F.coalesce(*[c for _, c in rungs])
    source = F.lit(None).cast("string")
    for name, col in reversed(rungs):
        source = F.when(col.isNotNull(), F.lit(name)).otherwise(source)
    return F.struct(pub.alias("pub_date"), source.alias("source"))


# ------------------------------------------------------- hreflang

_LINK_TAG_RE = r"(?is)<link\b[^>]*>"
_REL_ALT_RE = r"""(?is)\brel\s*=\s*["']alternate["']"""


def hreflang_alternates(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Explode every ``<link rel="alternate" hreflang=... href=...>``
    into one row per language alternate — the multilingual seed
    channel: a crawl targeting low-resource languages discovers the
    ``de``/``sw``/``x-default`` variants of known pages here, not by
    luck.  hreflang values are lowercased (BCP 47 is case-insensitive);
    hrefs resolve against the page URL through the shared vectorized
    canonicalizer, so alternates land in the frontier's URL space.

    Pages without alternates contribute no rows.  Expression-only
    tag scan (regexp_extract_all + higher-order filter/transform) —
    the per-tag attribute pulls reuse the srcset machinery."""
    body = F.col(body_col)
    tags = F.regexp_extract_all(body, F.lit(_LINK_TAG_RE), F.lit(0))
    alts = F.filter(
        tags,
        lambda t: t.rlike(_REL_ALT_RE)
        & _attr(t, "hreflang").isNotNull()
        & _attr(t, "href").isNotNull(),
    )
    pairs = F.transform(
        alts,
        lambda t: F.struct(
            F.lower(_attr(t, "hreflang")).alias("hreflang"),
            _attr(t, "href").alias("href"),
        ),
    )
    exploded = df.select("*", F.explode(pairs).alias("_alt"))
    rc = page.resolve_canon_host(
        F.col(url_col), F.col("_alt")["href"]
    )
    return exploded.select(
        "*",
        F.col("_alt")["hreflang"].alias("hreflang"),
        rc["url_norm"].alias("alt_url"),
    ).drop("_alt")


# --------------------------------------------------- meta refresh

_META_TAG_RE = r"(?is)<meta\b[^>]*>"


def meta_refresh(
    df: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Extract ``<meta http-equiv="refresh" content="N; url=...">``
    redirects — the HTML-level redirect channel a crawler must honor
    alongside 3xx (soft redirects are endemic on parked/migrated
    pages; Common Crawl treats them as first-class outlinks).

    Pinned WHATWG-subset parse of the shared declarative refresh
    steps (documented, asserted in tests):

      * a meta tag participates iff its ``http-equiv`` value is
        ``refresh`` (ASCII case-insensitive); ``name=refresh`` decoys
        do NOT;
      * ``content`` must start with an integer delay (whole seconds —
        fractional parts are not consumed); a delay followed by ``;``
        or ``,`` may carry a URL, with the optional case-insensitive
        ``url=`` keyword, single- or double-quoted (value runs to the
        matching quote) or bare (trailing whitespace trimmed);
      * the FIRST tag whose content parses wins (browser behavior);
        an unparseable content (``content="abc"``) contributes
        nothing;
      * a delay-only refresh (reload-self) yields a NULL target;
      * the target resolves against the page URL through the shared
        vectorized canonicalizer, so it lands in the frontier's URL
        space like any extracted link.

    Pages without a parseable refresh contribute no rows.  The tag
    scan and content parse are expression-only (regexp_extract_all +
    higher-order filter/transform — codegen); the single resolve is
    the same fused Arrow UDF every link takes.  Scale posture: a
    map-only projection over fetched bodies, zero shuffles."""
    body = F.col(body_col)
    tags = F.regexp_extract_all(body, F.lit(_META_TAG_RE), F.lit(0))
    refreshing = F.filter(
        tags, lambda t: F.lower(_attr(t, "http-equiv")) == "refresh"
    )
    parsed = F.transform(
        refreshing,
        lambda t: F.struct(
            F.regexp_extract(
                F.coalesce(_attr(t, "content"), F.lit("")),
                r"^\s*(\d+)", 1,
            ).alias("delay"),
            F.regexp_extract(
                F.coalesce(_attr(t, "content"), F.lit("")),
                r"(?is)^\s*\d+\s*[;,]\s*(?:url\s*=\s*)?(.*)$", 1,
            ).alias("rest"),
        ),
    )
    valid = F.filter(parsed, lambda p: p["delay"] != "")
    # try_element_at: NULL on empty (ANSI element_at throws)
    first = F.try_element_at(valid, F.lit(1))
    with_hit = df.select("*", first.alias("_mr")).where(
        F.col("_mr").isNotNull()
    )
    rest = F.col("_mr")["rest"]
    href = (
        F.when(
            rest.startswith('"'),
            F.regexp_extract(rest, r'^"([^"]*)', 1),
        )
        .when(
            rest.startswith("'"),
            F.regexp_extract(rest, r"^'([^']*)", 1),
        )
        .otherwise(F.trim(rest))
    )
    rc = page.resolve_canon_host(F.col(url_col), href)
    return with_hit.select(
        "*",
        F.col("_mr")["delay"].cast("int").alias("refresh_delay_s"),
        F.when(href != "", rc["url_norm"]).alias("refresh_target"),
    ).drop("_mr")


# ---------------------------------------------------------------------------
# Caption-quality rules (LAION / DataComp-style junk filters)
# ---------------------------------------------------------------------------

# Boilerplate phrases whose presence marks a caption as site chrome /
# stock-agency residue rather than a description of the image.  The
# published image-text curation pipelines (LAION-5B, DataComp) drop
# these before CLIP scoring; matching is lowercase substring.
CAPTION_BOILERPLATE = (
    "click to enlarge",
    "stock photo",
    "getty images",
    "shutterstock",
    "royalty free",
    "thumbnail for",
    "image may contain",
)

_FILENAME_CAPTION_RE = (
    r"(?i)^(img|dsc|dcim|pic|image|photo|untitled)[-_ ]?\d*"
    r"\.(jpe?g|png|gif|webp|bmp|tiff?)$"
)


def caption_quality_cols(caption: Column) -> list[Column]:
    """The caption half of image-text pair curation as pure
    expressions: token count, filename-like, URL-bearing, boilerplate,
    all-caps, digit share, too-short, and the combined ``keep`` gate.

    The reference stores captions verbatim (src/agent.ml save_image
    has no text side at all); these are the junk filters every
    published image-text pipeline runs before pair scoring.  All
    eight signals are single-pass regexp/length expressions over the
    caption column — whole-stage codegen end to end, zero shuffle,
    which is what lets the gate run inline in the fetch stage at
    10^10 rows.  Integer permille for the digit share (no floats —
    bit-stable across engines).  ``keep`` = no flag fired AND 3..64
    tokens."""
    cap = F.trim(caption)
    n_tokens = F.size(F.split(cap, r"\s+")).alias("n_tokens")
    letters = F.length(F.regexp_replace(cap, r"[^A-Za-z]", ""))
    uppers = F.length(F.regexp_replace(cap, r"[^A-Z]", ""))
    digits = F.length(F.regexp_replace(cap, r"[^0-9]", ""))
    total = F.length(cap)
    filename_like = cap.rlike(_FILENAME_CAPTION_RE).alias("filename_like")
    has_url = cap.rlike(r"(?i)(https?://|www\.)").alias("has_url")
    low = F.lower(cap)
    boilerplate = None
    for phrase in CAPTION_BOILERPLATE:
        hit = low.contains(phrase)
        boilerplate = hit if boilerplate is None else (boilerplate | hit)
    boilerplate = boilerplate.alias("boilerplate")
    all_caps = ((letters >= F.lit(6)) & (uppers == letters)).alias(
        "all_caps"
    )
    digit_permille = (
        F.when(total > 0, (digits * 1000).cast("long") / total)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("digit_permille")
    )
    too_short = ((total < 8) | (F.size(F.split(cap, r"\s+")) < 3)).alias(
        "too_short"
    )
    keep = (
        ~(
            cap.rlike(_FILENAME_CAPTION_RE)
            | cap.rlike(r"(?i)(https?://|www\.)")
            | F.coalesce(boilerplate, F.lit(False))
            | ((letters >= F.lit(6)) & (uppers == letters))
            | (total < 8)
        )
        & F.size(F.split(cap, r"\s+")).between(3, 64)
    ).alias("keep")
    return [
        n_tokens,
        filename_like,
        has_url,
        boilerplate,
        all_caps,
        digit_permille,
        too_short,
        keep,
    ]


def link_header_col(header: Column) -> Column:
    """RFC 8288 ``Link:`` response-header parse as pure expressions —
    ``array<struct<url:string, rel:string>>`` in header order.  The
    crawl cares about three rels: ``next``/``prev`` drive API and
    listing pagination where the HTML carries no anchors, and
    ``canonical`` joins the `canonical_urls` dedup signal; all other
    rels pass through for downstream filters.

    Pinned subset (documented): links split on commas followed by
    ``<`` (URLs inside ``<>`` cannot contain ``,`` per RFC 3986, so
    this is exact for conformant headers); the first ``rel`` param
    wins with optional quotes, case folded; a multi-token quoted
    rel ("next preload") keeps its FIRST token (RFC 8288 §3.3 says
    relation types are space-separated — the primary one leads);
    entries without a ``<url>`` are dropped.  Zero Python, zero
    shuffle."""
    parts = F.split(header, r",(?=\s*<)")

    def parse(p: Column) -> Column:
        url = F.regexp_extract(p, r"^\s*<([^>]*)>", 1)
        rel = F.lower(
            F.regexp_extract(
                p, r"""[;\s]rel\s*=\s*"?([A-Za-z0-9._-]+)""", 1
            )
        )
        return F.struct(url.alias("url"), rel.alias("rel"))

    return F.filter(
        F.transform(parts, parse), lambda s: s["url"] != ""
    )


def data_uri_cols(src: Column) -> list[Column]:
    """Inline ``data:`` asset split as pure expressions — crawled
    pages inline small images (tracking pixels, icons, lazy-load
    placeholders, sometimes real content images) as
    ``data:image/png;base64,...`` instead of fetchable URLs, and an
    image pipeline must route them into the same decode stages as
    fetched bytes.  Returns ``[is_data_uri, data_mime, data_bytes]``:
    base64 payloads decode JVM-side (``unbase64`` after whitespace
    strip — data URIs legally carry stray whitespace); non-base64
    payloads are percent-decoded text re-encoded as UTF-8 bytes;
    the mime defaults to ``text/plain`` per RFC 2397 when absent.
    Zero Python, zero shuffle."""
    m = F.regexp_extract(src, r"(?s)^data:([^,]*),(.*)$", 1)
    payload = F.regexp_extract(src, r"(?s)^data:([^,]*),(.*)$", 2)
    is_data = src.rlike(r"^data:")
    is_b64 = m.rlike(r"(?i);base64$")
    mime = F.regexp_replace(m, r"(?i);base64$", "")
    mime = F.regexp_replace(mime, r";.*$", "")  # drop charset params
    mime = F.when(mime == "", F.lit("text/plain")).otherwise(mime)
    decoded = F.when(
        is_b64, F.unbase64(F.regexp_replace(payload, r"\s+", ""))
    ).otherwise(F.url_decode(payload).cast("binary"))
    return [
        is_data.alias("is_data_uri"),
        F.when(is_data, F.lower(mime)).alias("data_mime"),
        F.when(is_data, decoded).alias("data_bytes"),
    ]


def css_image_urls_col(body: Column) -> Column:
    """CSS background-image URL discovery as pure expressions — the
    image-mining channel `<img>` extraction misses entirely (hero
    banners, galleries, and lazy-load libraries put content images
    in ``background-image``).  Pinned grammar: every ``url(...)``
    token inside a ``style="..."``/``style='...'`` attribute or a
    ``<style>...</style>`` block, quotes optional, whitespace
    tolerated; ``data:`` URLs are excluded here (they flow through
    :func:`data_uri_cols` instead).  Returns a deduplicated
    document-order array of URL strings.  Zero Python, zero
    shuffle."""
    url_re = r"""url\(\s*['"]?([^'"\)\s]+)['"]?\s*\)"""
    scopes = F.concat(
        F.array_join(
            F.regexp_extract_all(
                body, F.lit(r'(?is)\bstyle\s*=\s*"([^"]*)"'), 1
            ),
            " ",
        ),
        F.lit(" "),
        F.array_join(
            F.regexp_extract_all(
                body, F.lit(r"(?is)\bstyle\s*=\s*'([^']*)'"), 1
            ),
            " ",
        ),
        F.lit(" "),
        F.array_join(
            F.regexp_extract_all(
                body, F.lit(r"(?is)<style[^>]*>(.*?)</style>"), 1
            ),
            " ",
        ),
    )
    urls = F.regexp_extract_all(scopes, F.lit(url_re), 1)
    return F.array_distinct(
        F.filter(urls, lambda u: ~u.rlike(r"(?i)^data:"))
    )


def media_discovery_cols(body: Column) -> Column:
    """AV asset discovery as pure expressions — the `<video>` /
    `<audio>` / `<source>` / `<track>` channels a multimodal crawl
    mines next to images: returns an array of ``struct<channel,
    url>`` with channels ``video_src``, ``video_poster`` (an IMAGE
    — it joins the image pipeline), ``audio_src``, ``source_src``
    (codec-alternative children), and ``track_src`` (subtitle
    sidecars — feed :mod:`mechaml_spark.subtitles`).  Pinned
    grammar: double- or single-quoted attributes on the tag, any
    attribute order.  Zero Python, zero shuffle."""

    def tag_attr(tag: str, attr: str) -> Column:
        pats = [
            rf'(?is)<{tag}\b[^>]*\s{attr}\s*=\s*"([^"]*)"',
            rf"(?is)<{tag}\b[^>]*\s{attr}\s*=\s*'([^']*)'",
        ]
        arrs = [
            F.regexp_extract_all(body, F.lit(p), 1) for p in pats
        ]
        return F.concat(*arrs)

    def chan(name: str, urls: Column) -> Column:
        return F.transform(
            urls,
            lambda u: F.struct(
                F.lit(name).alias("channel"), u.alias("url")
            ),
        )

    return F.filter(
        F.concat(
            chan("video_src", tag_attr("video", "src")),
            chan("video_poster", tag_attr("video", "poster")),
            chan("audio_src", tag_attr("audio", "src")),
            chan("source_src", tag_attr("source", "src")),
            chan("track_src", tag_attr("track", "src")),
        ),
        lambda s: s["url"] != "",
    )
