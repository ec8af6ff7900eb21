"""Golden fixture tests through the SPARK pipeline.

Same assertions as tests/test_htmlkit.py (ported from the reference
test/test.ml) but exercised end-to-end: fixture HTML -> parse_pages
mapInPandas -> explode -> JVM-side selector Column predicates.
All selector counts of one node family are evaluated in ONE Spark
job (a single agg of conditional sums) to keep the suite fast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mechaml_spark import extract, forms, page
from tests.test_htmlkit import FORM_CASES, IMAGE_CASES, LINK_CASES

PAGE_URL = "http://fixture.example/index.html"


@pytest.fixture(scope="module")
def parsed(spark, fixture_html):
    df = spark.createDataFrame(
        [(PAGE_URL, fixture_html)], "url string, body string"
    )
    out = extract.parse_pages(df).cache()
    out.count()
    yield out
    out.unpersist()


def _family_counts(parsed, array_col, tag, cases):
    node = F.explode(array_col).alias("node")
    df = parsed.select(node)
    aggs = []
    for i, (sel, _expected) in enumerate(cases):
        pred = page.selector_column(sel, F.col("node"), default_tag=tag)
        pred = pred & (F.col("node")["tag"] == tag)
        aggs.append(F.sum(pred.cast("int")).alias(f"c{i}"))
    row = df.agg(*aggs).collect()[0]
    return [row[f"c{i}"] for i in range(len(cases))]


def test_form_selector_counts(parsed):
    got = _family_counts(parsed, "forms", "form", FORM_CASES)
    assert got == [c for _s, c in FORM_CASES]


def test_link_selector_counts(parsed):
    got = _family_counts(parsed, "links", "a", LINK_CASES)
    assert got == [c for _s, c in LINK_CASES]


def test_image_selector_counts(parsed):
    got = _family_counts(parsed, "images", "img", IMAGE_CASES)
    assert got == [c for _s, c in IMAGE_CASES]


# golden input counts within form#form-one (test.ml:228-377 / FIXTURES.md §1.4)
INPUT_CASES = [
    ("checkbox", "[name=check1]", 3),
    ("checkbox", "[name=check1][value=choice1]", 1),
    ("checkbox", "[name=nothere]", 0),
    ("checkbox", "", 6),
    ("radio", "[name=radio1]", 3),
    ("radio", "[name=radio1][value=choice1]", 1),
    ("radio", "[name=nothere]", 0),
    ("radio", "", 6),
    ("select_list", "[name=select1]", 1),
    ("select_list", "[name=select2]", 1),
    ("select_list", "[name=nothere]", 0),
    ("select_list", "", 2),
    ("text", "[name=text1]", 1),
    ("text", "[name=text2]", 1),
    ("text", "[name=text-none]", 0),
    ("text", "", 2),
    ("field", "[name=text1]", 1),
    ("field", "[name=password1]", 1),
    ("field", "[name=area1]", 1),
    ("field", "", 6),  # 2 texts + 2 passwords + 2 textareas (field_filter)
    ("password", "[name=password1]", 1),
    ("password", "[name=password2]", 1),
    ("password", "[name=password-none]", 0),
    ("password", "", 2),
    ("textarea", "[name=area1]", 1),
    ("textarea", "[name=area2]", 1),
    ("textarea", "[name=area-none]", 0),
    ("textarea", "", 2),
]


def test_input_counts_form_one(parsed):
    form_one = page.forms_with(parsed, "[id=form-one]")
    inputs = form_one.select(F.explode(F.col("node")["inputs"]).alias("node"))
    aggs = []
    for i, (family, sel, _expected) in enumerate(INPUT_CASES):
        pred = forms.input_predicate(family, sel, F.col("node"))
        aggs.append(F.sum(pred.cast("int")).alias(f"c{i}"))
    row = inputs.agg(*aggs).collect()[0]
    got = [row[f"c{i}"] for i in range(len(INPUT_CASES))]
    assert got == [c for _f, _s, c in INPUT_CASES]


def test_fields_include_textareas(parsed):
    """fields_with 'textarea[name=area1]' finds the textarea; the bare
    ``fields`` seq over form-one has 2 texts + 2 passwords + 2 textareas."""
    form_one = page.forms_with(parsed, "[id=form-one]")
    inputs = form_one.select(F.explode(F.col("node")["inputs"]).alias("node"))
    n = inputs.where(
        forms.input_predicate("field", "textarea[name=area1]", F.col("node"))
    ).count()
    assert n == 1
    total = inputs.where(
        forms.input_predicate("field", "*", F.col("node"))
    ).count()
    assert total == 6


def test_default_state_form_two(parsed):
    """FIXTURES.md §1.6 (test.ml:393-442)."""
    form_two = page.forms_with(parsed, "[id=form-two]")
    (row,) = form_two.select(F.col("node")["state"].alias("state")).collect()
    state = {k: list(v) for k, v in row["state"].items()}
    assert state == {
        "hidden": ["hidden"],
        "check3": ["choice2", "choice3"],
        "radio3": ["choice1"],
        "select3": ["choice1", "choice2"],
        "text3": ["default"],
        "area3": ["default"],
    }


def test_form_one_default_state(parsed):
    """form-one has no checked/selected/value defaults, but its two
    textareas DO have leaf text, which ``Field.reset`` restores
    (src/page.ml:556-561) — so they appear in the default state."""
    (row,) = (
        page.forms_with(parsed, "[id=form-one]")
        .select(F.col("node")["state"].alias("state"))
        .collect()
    )
    state = {k: list(v) for k, v in row["state"].items()}
    assert set(state) == {"area1", "area2"}
    assert state["area1"][0].strip() == "This is a text area !"


def test_state_transitions_column_ops(parsed):
    """FIXTURES.md §1.5 state transitions via the Column algebra."""
    f1 = page.forms_with(parsed, "[id=form-one]").select(
        F.col("node")["state"].alias("s")
    )
    s = F.col("s")
    s = forms.checkbox_check(s, "check1", "choice1")
    s = forms.checkbox_check(s, "check1", "choice2")
    s = forms.radio_select(s, "radio1", "choice1")
    s = forms.radio_select(s, "radio1", "choice2")
    s = forms.select_list_select(s, "select1", "choice1", F.lit(False))
    s = forms.select_list_select(s, "select1", "choice2", F.lit(False))
    s = forms.select_list_select(s, "select2", "choice1", F.lit(True))
    s = forms.select_list_select(s, "select2", "choice2", F.lit(True))
    s = forms.state_set(s, "text1", "hello world")
    df = f1.select(
        forms.is_checked(s, "check1", "choice1").alias("c1"),
        forms.is_checked(s, "check1", "choice2").alias("c2"),
        forms.is_checked(forms.checkbox_uncheck(s, "check1", "choice2"),
                         "check1", "choice2").alias("c2_after_uncheck"),
        forms.is_checked(forms.checkbox_uncheck(s, "check1", "choice2"),
                         "check1", "choice1").alias("c1_after_uncheck"),
        forms.is_checked(s, "radio1", "choice1").alias("r1"),
        forms.is_checked(s, "radio1", "choice2").alias("r2"),
        forms.is_checked(s, "select1", "choice1").alias("s1_i1"),
        forms.is_checked(s, "select1", "choice2").alias("s1_i2"),
        forms.is_checked(s, "select2", "choice1").alias("s2_i1"),
        forms.is_checked(s, "select2", "choice2").alias("s2_i2"),
        forms.is_checked(s, "select2", "choice3").alias("s2_i3"),
        forms.state_get(s, "text1").alias("t1"),
        forms.current_value(forms.select_list_unselect(s, "select1"),
                            "select1").alias("s1_unsel"),
    )
    row = df.collect()[0]
    assert row["c1"] and row["c2"]
    assert not row["c2_after_uncheck"] and row["c1_after_uncheck"]
    assert not row["r1"] and row["r2"]  # radio exclusivity
    assert not row["s1_i1"] and row["s1_i2"]  # single select replaces
    assert row["s2_i1"] and row["s2_i2"] and not row["s2_i3"]  # multi keeps
    assert row["t1"] == "hello world"
    assert row["s1_unsel"] is None  # unselect removes the whole key


def test_submit_synthesis_py():
    state = {"b": ["2"], "a": ["1", "x y"]}
    # GET: query REPLACED, keys descending, values comma-joined
    m, url, body = forms.synthesize_submit_py(
        "http://h/act?old=1", "GET", state
    )
    assert (m, url, body) == ("GET", "http://h/act?b=2&a=1,x%20y", None)
    m, url, body = forms.synthesize_submit_py("http://h/act", "POST", state)
    assert (m, url, body) == ("POST", "http://h/act", "b=2&a=1,x%20y")


def test_submit_synthesis_udf(parsed, spark):
    f2 = page.forms_with(parsed, "[id=form-two]")
    req = f2.select(
        forms.synthesize_submit_udf(
            F.col("uri"), F.col("node")["method"], F.col("node")["state"]
        ).alias("req")
    ).collect()[0]["req"]
    assert req["method"] == "GET"
    # action resolved against the page URL; query from default state
    assert req["url"].startswith("http://fixture.example/action-two?")
    assert "text3=default" in req["url"]
    assert "check3=choice2,choice3" in req["url"]
    assert req["body"] is None


def test_base_href_and_resolution(spark):
    html = (
        '<html><head><base href="http://cdn.example/sub/"></head>'
        '<body><a href="x.png">x</a><img src="../up.png"></body></html>'
    )
    df = spark.createDataFrame(
        [("http://orig.example/page", html)], "url string, body string"
    )
    parsed = extract.parse_pages(df)
    (link,) = page.links_with(parsed).select("uri").collect()
    assert link["uri"] == "http://cdn.example/sub/x.png"
    (img,) = page.images_with(parsed).select("uri").collect()
    assert img["uri"] == "http://cdn.example/up.png"


def test_first_and_nth(parsed):
    links = page.links_with(parsed)
    assert page.first(links).collect()[0]["node"]["attrs"]["id"] == "a-one"
    # nth is 1-based (src/page.ml:110-116)
    assert page.nth(links, 2).collect()[0]["node"]["attrs"]["id"] == "a-two"
    assert page.nth(links, 4).collect() == []


# ------------------------------------------------- full selector surface
# Differential test for the round-2 Column-compiler rewrite: `>` and
# descendant compose freely at any position; `+` is target-adjacent
# with ancestor combinators continuing left of it; `~` and non-target
# sibling chains go through the pure-matcher fallback.  Ground truth
# is the pure-Python matcher (htmlkit.selector), itself validated by
# the reference-ported goldens.

SURFACE_HTML = """
<html><body id="top">
  <div id="outer" class="wrap">
    <h2>head</h2>
    <p id="p1">one <a href="/1" id="l1">x</a></p>
    <p id="p2">two <a href="/2" id="l2">y</a> <a href="/3" id="l3">z</a></p>
    <div id="inner">
      <p id="p3"><span><a href="/4" id="l4">deep</a></span></p>
      <a href="/5" id="l5">shallow</a><a href="/6" id="l6">next</a>
    </div>
  </div>
  <div id="side"><a href="/7" id="l7">side</a></div>
</body></html>
"""

SURFACE_SELECTORS = [
    # fast path: old surface
    "",
    "[href=/5]",
    "div a",
    "div > a",
    "p > a",
    "a + a",
    # fast path: surface lifted this round
    "body div a",                # chained descendants
    "div > p a",                 # descendant right of `>`
    "div p > a",                 # `>` right of descendant
    "div > div > a",
    "#outer > div a",
    "div > span > a",
    "div div > p a",             # mixed, 4 compounds
    "div > a + a",               # ancestor combinator left of `+`
    "div a + a",
    "#outer p a + a",
    # pure-matcher fallback (`~` / sibling chain off the target)
    "a ~ a",
    "h2 ~ p a",
    "h2 + p a",
    "p ~ p > a",
]


def _pure_count(html: str, default_tag: str, sel: str) -> int:
    from mechaml_spark.htmlkit.parser import parse_html
    from mechaml_spark.htmlkit.selector import compile_selector, tag_selector

    pred = compile_selector(tag_selector(default_tag, sel))
    return sum(
        1
        for el in parse_html(html).iter_subtree()
        if el.tag == default_tag and pred(el)
    )


@pytest.fixture(scope="module")
def surface_parsed(spark):
    df = spark.createDataFrame(
        [("http://surface.example/", SURFACE_HTML)], "url string, body string"
    )
    out = extract.parse_pages(df).cache()
    out.count()
    yield out
    out.unpersist()


@pytest.mark.parametrize("sel", SURFACE_SELECTORS)
def test_selector_surface_matches_pure(surface_parsed, sel):
    expected = _pure_count(SURFACE_HTML, "a", sel)
    got = page.links_with(surface_parsed, sel).count()
    assert got == expected, (sel, got, expected)


def test_fallback_selectors_raise_in_column_compiler():
    # the fallback cases must NOT silently take the fast path
    for sel in ("a ~ a", "h2 ~ p a", "h2 + p a", "p ~ p > a"):
        with pytest.raises(page.SelectorError):
            page.selector_column(sel, F.col("node"), default_tag="a")


def test_fallback_requires_body_column(surface_parsed):
    with pytest.raises(page.SelectorError, match="body"):
        page.links_with(surface_parsed.drop("body"), "a ~ a").count()


# ---------------------------------------------------- lean fast-path parity

def _lean_slow(url, body):
    from mechaml_spark import extract

    p = extract._LeanParser(url)
    p.feed(body)
    return p.base, p.hrefs, p.imgs


def test_lean_fast_path_covers_corpus_and_agrees():
    from mechaml_spark import extract
    from mechaml_spark.corpus import CorpusSpec, _page_html, page_url

    spec = CorpusSpec(
        n_hosts=8, pages_per_host=20, links_per_page=100, images_per_page=2
    )
    for i in range(8):
        for j in range(20):
            u, b = page_url(spec, i, j), _page_html(spec, i, j)
            f = extract._parse_page_fast(u, b)
            # every synthetic-corpus page must take the FAST path —
            # a silent fallback would be a crawl perf regression
            assert f is not None, (i, j)
            assert f == _lean_slow(u, b)


def test_lean_fast_path_adversarial_parity():
    """Markup-soup differential: wherever the strict scan claims
    eligibility it must equal the stdlib tokenizer; hazards and
    non-strict forms must fall back (None)."""
    import random

    from mechaml_spark import extract

    atoms = [
        '<a href="', "<a href=", "<img src='", '<base href="', '">x</a>',
        ">", "<", '"', "'", ' alt="A&amp;B"', " href", "<!-- c -->",
        '<script>var a="<a href=z>"</script>', '<A HREF="UP">', "text",
        "&lt;a", " ", "/>", "</a>", "=", '<a-b c="d">',
        '<div title="<a href=q>">', "<?pi?>", "<![CDATA[<a href=w>]]>",
        "<a href=a=b>", "<style>.x{}</style>", '<a\nhref="nl">',
        '<a  href = "sp" >', "<a href>", "<img>",
        '<base href="http://b.test/dir/">', '<a href="a&#38;b">',
        '<a href="a&ampx">',
    ]
    rng = random.Random(11)
    u = "http://h.test/p/q"
    eligible = 0
    for _ in range(8000):
        body = "".join(
            rng.choice(atoms) for _ in range(rng.randint(0, 12))
        )
        f = extract._parse_page_fast(u, body)
        if f is not None:
            eligible += 1
            assert f == _lean_slow(u, body), body
    assert eligible > 500  # the fast path must actually engage
    # hazard constructs always fall back
    for bad in (
        "<script>x</script>",
        "<!-- <a href=x> -->",
        "<!DOCTYPE html><a href='y'>",
        "<?php ?>",
        "<![CDATA[z]]>",
        "<STYLE>s</STYLE>",
    ):
        assert extract._parse_page_fast(u, bad) is None
    # scriptlike names are NOT hazards (html.parser treats them as
    # ordinary tags) and must stay on the fast path
    assert extract._parse_page_fast(u, "<scripty><a href='k'></scripty>") \
        == (u, ["k"], [])
