"""metadata.py — page metadata, srcset, figcaption edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from mechaml_spark import metadata as md


def _pages(spark, bodies):
    return spark.createDataFrame(
        [(i, b) for i, b in enumerate(bodies)], "doc_id long, body string"
    )


def _meta_rows(spark, bodies):
    df = md.extract_page_meta(_pages(spark, bodies), keep_cols=("doc_id",))
    return {r["doc_id"]: r for r in df.collect()}


def test_meta_attribute_orders_and_quotes(spark):
    rows = _meta_rows(spark, [
        '<meta property="og:description" content="fwd dq">',
        "<meta property='og:description' content='fwd sq'>",
        '<meta content="rev dq" property="og:description">',
        "<meta content='rev sq' name='og:description'>",
        '<META PROPERTY="OG:DESCRIPTION" CONTENT="upper">',
    ])
    assert [rows[i]["caption"] for i in range(5)] == [
        "fwd dq", "fwd sq", "rev dq", "rev sq", "upper",
    ]
    assert all(rows[i]["caption_source"] == "og" for i in range(5))


def test_precedence_chain_and_empty_content_falls_through(spark):
    rows = _meta_rows(spark, [
        # empty og:description -> twitter rung wins
        '<meta property="og:description" content="">'
        '<meta name="twitter:description" content="tw">',
        # whitespace-only meta description -> jsonld rung
        '<meta name="description" content="   ">'
        '<script type="application/ld+json">{"caption":"jc"}</script>',
        # jsonld $.description when no $.caption
        '<script type="application/ld+json">{"description":"jd"}</script>',
        # malformed JSON-LD -> title
        '<script type="application/ld+json">{nope</script>'
        "<title> t </title>",
        "<p>nothing</p>",
    ])
    assert (rows[0]["caption"], rows[0]["caption_source"]) == ("tw", "twitter")
    assert (rows[1]["caption"], rows[1]["caption_source"]) == ("jc", "jsonld")
    assert (rows[2]["caption"], rows[2]["caption_source"]) == ("jd", "jsonld")
    assert (rows[3]["caption"], rows[3]["caption_source"]) == ("t", "title")
    assert rows[4]["caption"] is None and rows[4]["caption_source"] is None


def test_og_description_key_does_not_match_plain_description(spark):
    # name="description" must NOT satisfy the og:description rung,
    # and property="og:description" must NOT satisfy the meta rung's
    # key "description" (quoted-key match, no substring bleed).
    rows = _meta_rows(spark, [
        '<meta name="description" content="plain">',
    ])
    assert rows[0]["caption_source"] == "meta"


def test_og_image_canonicalized(spark):
    rows = _meta_rows(spark, [
        '<meta property="og:image" content=" HTTP://Ex.COM:80/a/../b.png ">',
    ])
    assert rows[0]["og_image"] == "http://ex.com/b.png"


def _imgs(spark, bodies):
    df = md.img_candidates(_pages(spark, bodies), keep_cols=("doc_id",))
    return df.orderBy("doc_id", "pos").collect()


def test_srcset_largest_width_wins_and_x_default(spark):
    got = _imgs(spark, [
        '<img srcset="http://h/a.png 320w, http://h/b.png 640w" alt="x">',
        # 2x (=2000) beats 640w
        '<img srcset="http://h/a.png 640w, http://h/b.png 2x">',
        # bare candidate defaults to 1x=1000, loses to 1.5x
        '<img srcset="http://h/a.png, http://h/b.png 1.5x">',
        # tie on eff: first candidate kept
        '<img srcset="http://h/a.png 2x, http://h/b.png 2x">',
        # no srcset -> src; data-src must not leak in
        '<img data-src="http://h/no.png" src="http://h/a.png" alt="y">',
    ])
    assert [r["url"] for r in got] == [
        "http://h/b.png", "http://h/b.png", "http://h/b.png",
        "http://h/a.png", "http://h/a.png",
    ]
    assert got[0]["alt"] == "x"


def test_img_without_src_or_srcset_dropped(spark):
    got = _imgs(spark, ['<img alt="lonely"><img src="http://h/a.png">'])
    assert len(got) == 1 and got[0]["pos"] == 1


def test_figcaption_overrides_alt_and_empty_alt_falls_to_page(spark):
    body = (
        '<meta property="og:description" content="page cap">'
        '<img src="http://h/plain.png" alt="">'
        '<figure><img src="http://h/fig.png" alt="decoy">'
        "<figcaption> the real caption </figcaption></figure>"
    )
    df = md.image_caption_pairs(_pages(spark, [body]))
    got = {r["url"]: r for r in df.collect()}
    plain = got["http://h/plain.png"]
    fig = got["http://h/fig.png"]
    assert (plain["caption"], plain["caption_source"]) == ("page cap", "og")
    assert (fig["caption"], fig["caption_source"]) == (
        "the real caption", "figcaption",
    )
    assert [plain["pos"], fig["pos"]] == [0, 1]


def test_figure_without_figcaption_uses_alt(spark):
    body = '<figure><img src="http://h/f.png" alt="from alt"></figure>'
    df = md.image_caption_pairs(_pages(spark, [body]))
    r = df.collect()[0]
    assert (r["caption"], r["caption_source"]) == ("from alt", "alt")


def test_image_caption_pairs_plan_is_codegen_joins(spark):
    # expression-only: the physical plan must contain no Python
    # row-UDF evaluation (BatchEvalPython); the URL canonicalizer is
    # the only Arrow stage.
    body = '<img src="http://h/a.png" alt="a">'
    df = md.image_caption_pairs(_pages(spark, [body]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


# ------------------------------------------------------- robots directives

def _dirs(spark, body, header=None):
    df = spark.createDataFrame(
        [(body, header)], "body string, xrobots string"
    )
    d = md.robots_directives(F.col("body"), F.col("xrobots"))
    return df.select(d.alias("d")).collect()[0]["d"]


def test_robots_meta_tokens(spark):
    d = _dirs(spark, "<meta name='robots' content=' NOINDEX , nofollow '>")
    assert (d["noindex"], d["nofollow"]) == (True, True)
    d = _dirs(spark, '<meta name="robots" content="none">')
    assert (d["noindex"], d["nofollow"]) == (True, True)
    d = _dirs(spark, "<meta name='robots' content='all, max-snippet:-1'>")
    assert (d["noindex"], d["nofollow"]) == (False, False)
    d = _dirs(spark, "<p>no meta at all</p>")
    assert (d["noindex"], d["nofollow"]) == (False, False)


def test_robots_header_merges_restrictively(spark):
    # header alone restricts
    d = _dirs(spark, "<p></p>", "noindex, unavailable_after: 25 Jun 2026")
    assert (d["noindex"], d["nofollow"]) == (True, False)
    # meta 'all' cannot undo a header restriction
    d = _dirs(
        spark, "<meta name='robots' content='all'>", "nofollow"
    )
    assert (d["noindex"], d["nofollow"]) == (False, True)


def test_rel_nofollow_tokens(spark):
    df = spark.createDataFrame(
        [("NoFollow noopener",), ("ugc sponsored",), (None,)],
        "rel string",
    )
    got = [
        r["nf"]
        for r in df.select(
            md.rel_nofollow(F.col("rel")).alias("nf")
        ).collect()
    ]
    assert got == [True, False, False]


# ------------------------------------------------------- publish date

def _pub(spark, body, url="http://h.test/p"):
    df = spark.createDataFrame([(url, body)], "url string, body string")
    d = md.published_date(F.col("body"), F.col("url"))
    r = df.select(d.alias("d")).collect()[0]["d"]
    return (r["pub_date"], r["source"])


def test_pub_date_precedence(spark):
    jsonld = ('<script type="application/ld+json">'
              '{"datePublished": "2023-05-17T10:00:00Z"}</script>')
    meta = ("<meta property='article:published_time' "
            "content='2022-11-03'>")
    time_tag = "<time datetime='2021-07-04T08:00'>x</time>"
    assert _pub(spark, jsonld + meta + time_tag) == ("2023-05-17", "jsonld")
    assert _pub(spark, meta + time_tag) == ("2022-11-03", "meta")
    assert _pub(spark, time_tag) == ("2021-07-04", "time")
    assert _pub(spark, "<p>x</p>",
                "http://h.test/blog/2020/09/p1/") == ("2020-09-01", "url")
    assert _pub(spark, "<p>x</p>",
                "http://h.test/blog/2020/09/14/p1/") == ("2020-09-14", "url")
    assert _pub(spark, "<p>x</p>") == (None, None)


def test_pub_date_invalid_falls_through(spark):
    bad_meta = ("<meta property='article:published_time' "
                "content='2022-13-40'>")
    time_tag = "<time datetime='2019-01-31'>y</time>"
    assert _pub(spark, bad_meta + time_tag) == ("2019-01-31", "time")
    # invalid everywhere -> NULL, not a garbage date
    assert _pub(spark, bad_meta) == (None, None)
    # day 00 / 32 rejected by the grammar
    assert _pub(spark, "<time datetime='2019-01-00'>y</time>") == (None, None)
    assert _pub(spark, "<time datetime='2019-01-32'>y</time>") == (None, None)


# --------------------------------------------------- meta refresh


def _refresh_rows(spark, bodies, base="http://h.test/a/page"):
    df = spark.createDataFrame(
        [(i, base, b) for i, b in enumerate(bodies)], "i long, url string, body string"
    )
    out = md.meta_refresh(df).collect()
    return {r["i"]: (r["refresh_delay_s"], r["refresh_target"]) for r in out}


def test_meta_refresh_shapes_and_decoys(spark):
    got = _refresh_rows(spark, [
        # 0: bare relative url, instant
        '<meta http-equiv="refresh" content="0; url=/next">',
        # 1: uppercase keyword, double-quoted absolute inside SQ attr
        "<meta HTTP-EQUIV='REFRESH' CONTENT='5;URL=\"http://abs.test/x\"'>",
        # 2: comma separator, spaced url =, single-quoted relative
        '<meta http-equiv="refresh" content="3 ,url = \'p.html\'">',
        # 3: delay-only reload-self -> NULL target
        '<meta http-equiv="refresh" content="10">',
        # 4: name=refresh decoy -> no row
        '<meta name="refresh" content="5; url=/no">',
        # 5: unparseable delay -> no row
        '<meta http-equiv="refresh" content="abc; url=/no">',
        # 6: first PARSEABLE tag wins (bad one loses to later valid)
        '<meta http-equiv="refresh" content="oops">'
        '<meta http-equiv="refresh" content="7; url=/ok">',
        # 7: first-wins between two valid tags
        '<meta http-equiv="refresh" content="1; url=/first">'
        '<meta http-equiv="refresh" content="2; url=/second">',
    ])
    assert got == {
        0: (0, "http://h.test/next"),
        1: (5, "http://abs.test/x"),
        2: (3, "http://h.test/a/p.html"),
        3: (10, None),
        6: (7, "http://h.test/ok"),
        7: (1, "http://h.test/first"),
    }


def test_link_header_parse(spark):
    from mechaml_spark.metadata import link_header_col

    cases = [
        # (header, expected [(url, rel)])
        ('<https://a.test/p2>; rel="next"', [("https://a.test/p2", "next")]),
        ('<https://a.test/p0>;rel=prev , <https://a.test/c>; '
         'title="x"; rel="canonical"',
         [("https://a.test/p0", "prev"), ("https://a.test/c", "canonical")]),
        # multi-token quoted rel keeps its first token
        ('<https://cdn.test/s.css>; rel="alternate stylesheet"',
         [("https://cdn.test/s.css", "alternate")]),
        # rel-less entry kept with empty rel; no-url entry dropped
        ('<https://a.test/x>; type="text/html"', [("https://a.test/x", "")]),
        ('rel="next"; foo=bar', []),
        ("", []),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, h string"
    )
    from pyspark.sql import functions as F

    rows = (
        df.select("i", F.explode(link_header_col(F.col("h"))).alias("l"))
        .select("i", "l.url", "l.rel")
        .collect()
    )
    got: dict = {}
    for r in rows:
        got.setdefault(r["i"], []).append((r["url"], r["rel"]))
    for i, (_, want) in enumerate(cases):
        assert got.get(i, []) == want, (i, got.get(i), want)


def test_data_uri_cols(spark):
    import base64

    import numpy as np
    from pyspark.sql import functions as F

    from mechaml_spark.imaging import png_encode
    from mechaml_spark.metadata import data_uri_cols

    png = png_encode(np.full((2, 2, 3), 9, np.uint8))
    b64 = base64.b64encode(png).decode()
    rows = [
        (0, f"data:image/png;base64,{b64}"),
        (1, "data:text/plain;charset=utf-8,hello%20world"),
        (2, "data:,bare"),                      # RFC 2397 default mime
        (3, "http://x.test/a.png"),             # not a data URI
        (4, f"data:image/png;base64,{b64[:10]}\n{b64[10:]}"),  # stray ws
        (5, "data:IMAGE/PNG;base64," + b64),    # case-folded mime
    ]
    df = spark.createDataFrame(rows, "i int, src string")
    got = {
        r["i"]: r
        for r in df.select("i", *data_uri_cols(F.col("src"))).collect()
    }
    assert bytes(got[0]["data_bytes"]) == png
    assert got[0]["data_mime"] == "image/png"
    assert bytes(got[1]["data_bytes"]) == b"hello world"
    assert got[1]["data_mime"] == "text/plain"
    assert bytes(got[2]["data_bytes"]) == b"bare"
    assert got[2]["data_mime"] == "text/plain"
    assert not got[3]["is_data_uri"] and got[3]["data_bytes"] is None
    assert bytes(got[4]["data_bytes"]) == png
    assert got[5]["data_mime"] == "image/png"
    assert bytes(got[5]["data_bytes"]) == png


def test_css_image_urls_col(spark):
    from pyspark.sql import functions as F

    from mechaml_spark.metadata import css_image_urls_col

    cases = [
        # style attr, double quotes, unquoted url
        ('<div style="background: url(http://a.test/x.png)">', ["http://a.test/x.png"]),
        # style attr single quotes, quoted url
        ("<div style='background-image:url(\"http://a.test/y.jpg\")'>",
         ["http://a.test/y.jpg"]),
        # style block, whitespace, single quotes
        ("<style>.a{background:url( 'http://a.test/z.gif' );}</style>",
         ["http://a.test/z.gif"]),
        # data: urls excluded; duplicates collapsed
        ('<style>.a{background:url(data:image/png;base64,AA==)}</style>'
         '<div style="background:url(http://a.test/d.png);'
         'border-image:url(http://a.test/d.png)">', ["http://a.test/d.png"]),
        # url() in plain text is NOT a hit
        ("<p>see url(http://a.test/not.png) in text</p>", []),
        ("", []),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, body string"
    )
    got = {
        r["i"]: list(r["u"])
        for r in df.select(
            "i", css_image_urls_col(F.col("body")).alias("u")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_media_discovery_cols(spark):
    from pyspark.sql import functions as F

    from mechaml_spark.metadata import media_discovery_cols

    html = (
        '<video poster="http://m.test/p.jpg" src=\'http://m.test/v.mp4\'>'
        '<source src="http://m.test/v.webm">'
        "<track src='http://m.test/c.vtt' kind=\"captions\">"
        '</video><audio src="http://m.test/a.wav"></audio>'
        "<p>video src=\"http://not.test/x\" in text</p>"
    )
    df = spark.createDataFrame([(html,)], "body string")
    got = sorted(
        (r["m"]["channel"], r["m"]["url"])
        for r in df.select(
            F.explode(media_discovery_cols(F.col("body"))).alias("m")
        ).collect()
    )
    assert got == sorted([
        ("video_src", "http://m.test/v.mp4"),
        ("video_poster", "http://m.test/p.jpg"),
        ("source_src", "http://m.test/v.webm"),
        ("track_src", "http://m.test/c.vtt"),
        ("audio_src", "http://m.test/a.wav"),
    ])
    # empty body / no media
    df2 = spark.createDataFrame([("<p>none</p>",)], "body string")
    assert df2.select(
        F.size(media_discovery_cols(F.col("body"))).alias("n")
    ).collect()[0]["n"] == 0
