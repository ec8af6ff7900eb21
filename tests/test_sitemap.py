"""Sitemaps-protocol (sitemaps.org) extraction tests."""

from pyspark.sql import functions as F

from mechaml_spark import sitemap

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> HTTP://Example.COM:80/a/./b/../c </loc>
    <lastmod>2026-05-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>http://example.com/q?x=1&amp;y=2</loc></url>
  <url><priority>0.3</priority></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://example.com/sitemap1.xml</loc>
    <lastmod>2026-04-01</lastmod></sitemap>
  <sitemap><loc>http://example.com/sitemap2.xml</loc></sitemap>
</sitemapindex>"""


def test_urlset_entries(spark):
    df = spark.createDataFrame([{"sid": 1, "body": URLSET}])
    rows = (
        sitemap.parse_sitemaps(df, keep_cols=("sid",))
        .orderBy("pos")
        .collect()
    )
    # the loc-less third <url> is dropped
    assert [(r["kind"], r["pos"]) for r in rows] == [("url", 0), ("url", 1)]
    r0, r1 = rows
    # canonicalized: lowercase host, default port stripped, dot segments
    assert r0["loc"] == "http://example.com/a/c"
    assert r0["lastmod"] == "2026-05-01"
    assert r0["priority"] == 0.8
    # &amp; unescaped, absent fields null
    assert r1["loc"] == "http://example.com/q?x=1&y=2"
    assert r1["lastmod"] is None and r1["priority"] is None


def test_sitemapindex_entries(spark):
    df = spark.createDataFrame([{"sid": 7, "body": INDEX}])
    rows = (
        sitemap.parse_sitemaps(df, keep_cols=("sid",))
        .orderBy("pos")
        .collect()
    )
    assert [r["kind"] for r in rows] == ["sitemap", "sitemap"]
    assert [r["loc"] for r in rows] == [
        "http://example.com/sitemap1.xml",
        "http://example.com/sitemap2.xml",
    ]
    assert rows[0]["lastmod"] == "2026-04-01" and rows[1]["lastmod"] is None
    assert all(r["priority"] is None for r in rows)


def test_sitemap_seeds_dedupe_and_priority(spark):
    body_a = URLSET
    # same URLs again with a higher priority on the first entry
    body_b = URLSET.replace("0.8", "0.9")
    df = spark.createDataFrame(
        [{"sid": 1, "body": body_a}, {"sid": 2, "body": body_b}]
    )
    entries = sitemap.parse_sitemaps(df, keep_cols=("sid",))
    seeds = {
        r["url_norm"]: r["priority"]
        for r in sitemap.sitemap_seeds(entries).collect()
    }
    # deduped to one row per canonical URL; max priority wins;
    # priority-less entries default to the spec's 0.5
    assert seeds == {
        "http://example.com/a/c": 0.9,
        "http://example.com/q?x=1&y=2": 0.5,
    }


def test_seeds_feed_the_frontier_seen_set(spark):
    """Sitemap-discovered URLs land in the same canonical space the
    crawl uses: a URL seen by the crawl's canonicalizer equals the
    sitemap loc, so the seen-set anti-join would drop it."""
    from mechaml_spark import page

    df = spark.createDataFrame([{"sid": 1, "body": URLSET}])
    entries = sitemap.parse_sitemaps(df, keep_cols=("sid",))
    crawl_side = spark.createDataFrame(
        [{"url": "HTTP://EXAMPLE.com:80/a/c"}]
    ).select(page.canonicalize_col(F.col("url")).alias("url_norm"))
    joined = sitemap.sitemap_seeds(entries).join(
        crawl_side, "url_norm", "inner"
    )
    assert joined.count() == 1


def test_robots_sitemap_discovery(spark):
    """Sitemap: directives in robots.txt — case-insensitive key,
    group-independent placement, comment lines dead, URLs
    canonicalized."""
    body = (
        "# sitemap: http://decoy.test/no.xml\n"
        "User-agent: googlebot\n"
        "Disallow: /\n"
        "SITEMAP: HTTP://Ex.COM:80/a.xml\n"
        "User-agent: *\n"
        "Allow: /\n"
        "  Sitemap:   http://ex.com/b.xml\n"
    )
    df = spark.createDataFrame([{"host": "ex.com", "body": body}])
    rows = (
        sitemap.robots_sitemap_discovery(df, keep_cols=("host",))
        .orderBy("sm_pos")
        .collect()
    )
    assert [(r["sm_pos"], r["sitemap_url"]) for r in rows] == [
        (0, "http://ex.com/a.xml"),
        (1, "http://ex.com/b.xml"),
    ]


def test_gunzip_text_mixed_and_corrupt(spark):
    from mechaml_spark import sitemap as sm
    from mechaml_spark.warc import gzip_member

    xml = "<urlset><url><loc>http://a.test/x</loc></url></urlset>"
    df = spark.createDataFrame(
        [
            (0, bytearray(gzip_member(xml.encode()))),
            (1, bytearray(xml.encode())),
            (2, bytearray(b"\x1f\x8b\x00corrupt")),
            (3, None),
        ],
        "doc_id long, bytes binary",
    )
    got = {r["doc_id"]: r["body"]
           for r in sm.gunzip_text(df).collect()}
    assert got[0] == xml and got[1] == xml
    assert got[2] is None and got[3] is None
    # decoded text feeds the normal parser
    rows = sm.parse_sitemaps(
        sm.gunzip_text(df), keep_cols=("doc_id",)
    ).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1]
