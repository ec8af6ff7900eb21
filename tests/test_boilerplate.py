"""Boilerplate removal: block segmentation, link-density and chrome
classification, and the Spark stage contract."""

from mechaml_spark import boilerplate as bp

PAGE = """<!DOCTYPE html><html><head><title>T</title>
<style>p{}</style><script>var x = '<p>';</script></head><body>
<nav><a href="/">Home</a> <a href="/a">Products</a> <a href="/b">About
 us page</a> plus enough text to pass any length bar easily here</nav>
<header><div>SiteName corporation incorporated, established 1999,
all rights reserved worldwide</div></header>
<div id="content">
  <p>First real paragraph with plenty of visible characters in it.</p>
  <p>Second paragraph also long enough, and it cites
     <a href="/ref">one reference</a> inline without being a menu.</p>
  <div>A leaf div paragraph used by CMS wrappers, long enough too.</div>
  <p>ok</p>
  <p><a href="/x">Read more</a> <a href="/y">related articles</a>
     <a href="/z">more clickbait links</a> trailing here</p>
</div>
<footer><p>Copyright statement long enough to pass the length bar
easily but living inside footer chrome.</p></footer>
</body></html>"""


def test_segment_blocks_units_and_chrome():
    blocks = bp.segment_blocks(PAGE)
    texts = [b["text"] for b in blocks]
    assert any(t.startswith("First real paragraph") for t in texts)
    assert any(t.startswith("A leaf div paragraph") for t in texts)
    # nav and footer blocks flagged as chrome
    chrome = {b["text"][:8]: b["chrome"] for b in blocks}
    assert chrome.get("Home Pro") or any(
        b["chrome"] and "Home" in b["text"] for b in blocks
    )
    assert all(
        b["chrome"] for b in blocks if b["text"].startswith("Copyright")
    )


def test_main_content_rules():
    r = bp.main_content(PAGE)
    lines = r["main_text"].split("\n")
    assert len(lines) == 3
    assert lines[0].startswith("First real paragraph")
    assert lines[1].startswith("Second paragraph")
    assert lines[2].startswith("A leaf div paragraph")
    # dropped: nav (chrome), header div (chrome), "ok" (short),
    # link-farm p (density), footer p (chrome)
    assert r["n_kept"] == 3 and r["n_dropped"] == 5


def test_inline_link_below_density_threshold_kept():
    html = ("<p>" + "w " * 40
            + '<a href="/r">ref</a></p>')
    r = bp.main_content(html)
    assert r["n_kept"] == 1
    html_menu = '<p><a href="/a">aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa</a></p>'
    assert bp.main_content(html_menu)["n_kept"] == 0


def test_nested_list_segments_inside_li():
    html = ("<ul><li>Outer list item text long enough to be a block."
            "<ul><li>Inner nested item, also long enough to count.</li>"
            "</ul></li></ul>")
    blocks = bp.segment_blocks(html)
    starts = sorted(b["text"].split()[0] for b in blocks)
    assert starts == ["Inner", "Outer"]


def test_extract_main_content_stage(spark):
    df = spark.createDataFrame(
        [(0, PAGE), (1, None), (2, "<p>plain paragraph body long "
                                   "enough to keep around here</p>")],
        "doc_id long, body string",
    )
    out = {r["doc_id"]: r["main"]
           for r in bp.extract_main_content(df).select(
               "doc_id", "main").collect()}
    assert out[0]["n_kept"] == 3
    assert out[1]["main_text"] == "" and out[1]["n_kept"] == 0
    assert out[2]["n_kept"] == 1
