"""feeds.py — RSS/Atom parse, rel rules, discovery, seeds."""

from __future__ import annotations

from mechaml_spark import feeds


def _pages(spark, bodies):
    return spark.createDataFrame(
        [(i, b) for i, b in enumerate(bodies)], "doc_id long, body string"
    )


RSS = (
    '<?xml version="1.0"?><rss version="2.0"><channel>'
    "<title>chan</title><link>http://chan.test/</link>"
    "<item><title><![CDATA[first]]></title>"
    "<link> HTTP://Ex.COM:80/a/../one </link>"
    "<pubDate>Mon, 05 Jan 2026 00:00:00 GMT</pubDate>"
    '<enclosure url="http://ex.com/pic.jpg" type="image/jpeg"/></item>'
    "<item><title>second</title><link>http://ex.com/two</link></item>"
    "<item><title>no link</title></item>"
    "</channel></rss>"
)

ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom"><title>f</title>'
    '<link href="http://chan.test/"/>'
    '<entry><title>e0</title><link rel="enclosure" '
    'href="http://ex.com/art.png"/><link rel="self" '
    'href="http://ex.com/feed.xml"/>'
    '<link rel="alternate" href="http://ex.com/p0"/>'
    "<published>2026-01-01T00:00:00Z</published>"
    "<updated>2026-02-01T00:00:00Z</updated></entry>"
    '<entry><title>e1</title><link href="http://ex.com/p1"/>'
    "<updated>2026-02-02T00:00:00Z</updated></entry>"
    "</feed>"
)


def test_rss_items(spark):
    rows = feeds.parse_feeds(_pages(spark, [RSS]), keep_cols=("doc_id",))
    got = sorted(rows.collect(), key=lambda r: r["pos"])
    # channel-level <link> stays out; linkless item dropped
    assert [r["pos"] for r in got] == [0, 1]
    assert got[0]["kind"] == "rss"
    assert got[0]["link"] == "http://ex.com/one"  # canonicalized
    assert got[0]["title"] == "first"  # CDATA unwrapped
    assert got[0]["published"] == "Mon, 05 Jan 2026 00:00:00 GMT"
    assert got[0]["enclosure_url"] == "http://ex.com/pic.jpg"
    assert got[1]["enclosure_url"] is None
    assert got[1]["published"] is None


def test_atom_rel_rules(spark):
    rows = feeds.parse_feeds(_pages(spark, [ATOM]), keep_cols=("doc_id",))
    got = sorted(rows.collect(), key=lambda r: r["pos"])
    assert [r["kind"] for r in got] == ["atom", "atom"]
    # enclosure-first and rel=self links skipped for the entry link
    assert got[0]["link"] == "http://ex.com/p0"
    assert got[0]["enclosure_url"] == "http://ex.com/art.png"
    # published preferred over updated; fallback when absent
    assert got[0]["published"] == "2026-01-01T00:00:00Z"
    assert got[1]["published"] == "2026-02-02T00:00:00Z"
    assert got[1]["link"] == "http://ex.com/p1"  # rel absent = alternate


def test_feed_autodiscovery(spark):
    html = (
        "<html><head>"
        '<link rel="alternate" type="application/rss+xml" '
        'href=" HTTP://Ex.COM/feed.xml ">'
        '<link rel="stylesheet" href="http://ex.com/style.css">'
        '<link type="application/atom+xml" href="http://ex.com/atom">'
        "</head></html>"
    )
    got = feeds.feed_links(_pages(spark, [html]), keep_cols=("doc_id",))
    urls = [r["feed_url"] for r in got.orderBy("feed_pos").collect()]
    assert urls == ["http://ex.com/feed.xml", "http://ex.com/atom"]


def test_feed_seeds_dedup(spark):
    rows = feeds.parse_feeds(
        _pages(spark, [RSS, ATOM]), keep_cols=("doc_id",)
    )
    seeds = {
        r["url_norm"]: r["n_refs"] for r in feeds.feed_seeds(rows).collect()
    }
    assert seeds["http://ex.com/pic.jpg"] == 1  # enclosure seeds too
    assert seeds["http://ex.com/one"] == 1
    assert len(seeds) == 6
