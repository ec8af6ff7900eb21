"""Driver-contract queries: engine operators over /root/testdata tables.

Each ``q_*`` function takes ``(spark, sf_dir)`` and returns a
DataFrame; ``ORACLES[name]`` is the equivalent DuckDB SQL over the
same parquet views.  Pairs are value-hash-compared by the driver at
sf=0.01 (CORRECTNESS_r{N}.json), so:

  * every computed column is aliased identically on both sides;
  * outputs avoid floating-point columns — monetary/metric sums are
    integer cents / quantized ints, so cross-engine float summation
    order can never flip a hash;
  * both sides use the same tokenization / hash (md5) / rounding.

The queries exercise the engine's operator inventory (SURVEY.md §2 +
§2.11): HTML extraction + CSS selectors, URL canonicalization,
cookie theta-join matching, politeness top-k, bloom+exact seen-set
dedup, form default state, Format scalars, and the training-data
ops (exact/minhash dedup, token stats, quality filter, language-ID,
embedding top-k / near-dup, sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mechaml_spark import charlm
from mechaml_spark import cookies as ck
from mechaml_spark import extract, formatting, page, textclean
from mechaml_spark.forms import is_checked, state_get
from mechaml_spark.frontier.seen import SeenSet


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ------------------------------------------------- HTML synthesis from docs

def _docs_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HTML per document row (pure Column exprs) — the
    extraction pipeline's input; the oracle derives expected counts
    straight from the columns."""
    d = _t(spark, sf_dir, "documents")
    ext = (
        F.when(d.doc_id % 3 == 0, F.lit("png"))
        .when(d.doc_id % 3 == 1, F.lit("jpg"))
        .otherwise(F.lit("gif"))
    )
    body = F.concat(
        F.lit("<html><body><a href='"),
        d.source,
        F.lit("/d"),
        d.doc_id,
        F.lit("'>t</a>"),
        F.when(
            d.n_chars > 200,
            F.concat(
                F.lit("<a class='long' href='http://x.test/long/"),
                d.doc_id,
                F.lit("'>l</a>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("<img src='http://img.test/i"),
        d.doc_id,
        F.lit("."),
        ext,
        F.lit("'/></body></html>"),
    )
    url = F.concat(F.lit("http://"), d.source, F.lit(".test/docs/"), d.doc_id)
    return d.select(
        d.doc_id, d.lang, url.alias("url"), body.alias("body")
    )


def q_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = extract.parse_pages(_docs_pages(spark, sf_dir))
    links = page.links_with(parsed, "", page_cols=("lang",))
    return links.groupBy("lang").agg(F.count("*").alias("n_links"))


def q_selector_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = extract.parse_pages(_docs_pages(spark, sf_dir))
    imgs = page.images_with(parsed, "[src$=.png]", page_cols=("lang",))
    return imgs.groupBy("lang").agg(F.count("*").alias("n_png"))


def q_selector_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = extract.parse_pages(_docs_pages(spark, sf_dir))
    links = page.links_with(parsed, ".long", page_cols=("lang",))
    return links.groupBy("lang").agg(F.count("*").alias("n_long"))


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("HTTP://Host"),
        d.doc_id % 5,
        F.lit(".TEST:80/a/./x/../d"),
        d.doc_id,
        F.lit("#frag"),
    )
    return d.select(
        d.doc_id, page.canonicalize_col(messy).alias("url_norm")
    )


def q_cookie_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    jar = n.select(
        F.lit("sess").alias("name"),
        F.col("n_name").alias("value"),
        F.lit(None).cast("long").alias("max_age"),
        F.concat(F.lit("n"), F.col("n_nationkey"), F.lit(".test")).alias("domain"),
        F.lit("").alias("path"),
        F.lit(False).alias("secure"),
    )
    c = _t(spark, sf_dir, "customer")
    host = (
        F.when(c.c_custkey % 5 == 0, F.lit("other.test"))
        .when(
            c.c_custkey % 2 == 0,
            F.concat(F.lit("n"), c.c_nationkey, F.lit(".test")),
        )
        .otherwise(F.concat(F.lit("sub.n"), c.c_nationkey, F.lit(".test")))
    )
    req = c.select(
        c.c_custkey, F.concat(F.lit("http://"), host, F.lit("/a")).alias("url")
    )
    # strategy="join": drive the scale path (host-suffix explode +
    # broadcast hash equi-join) through the oracle gate; the "scan"
    # strategy is pinned equal in tests/test_cookies.py
    return ck.add_to_headers(req, jar, strategy="join").select(
        "c_custkey", "cookie_header"
    )


def q_jar_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-crawl cookie-jar fold (:func:`cookies.fold_cookie_events`
    — the round-5 single-window replacement for the scheduler's
    per-epoch winner + jar_upsert chain, reference semantics
    src/cookiejar.ml repeated ``add`` + ``Max_age 0`` delete): parsed
    Set-Cookie EVENTS carrying (epoch, visit-order tuple, cookie)
    fold to the final jar in ONE window with epoch as the leading
    sort key; a winning ``max_age == 0`` deletes its key.

    Corpus: one closed-form event per doc (55 keys x ~9 touches,
    unique total order via the url tie-breaker); doc_id%17==0 rows
    are deletes, so some keys vanish iff their delete is the global
    winner.  Scale posture: the shuffle carries one row per
    Set-Cookie event partitioned by cookie key, and the plan is O(1)
    in epoch count — a 10^4-epoch crawl's jar reads the same
    single-window plan."""
    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 500
    )
    did = F.col("doc_id")
    events = d.select(
        (did % 3).cast("int").alias("epoch"),
        (did % 4).cast("int").alias("depth"),
        (did % 2).cast("int").alias("discovered_epoch"),
        F.concat(
            F.lit("http://h"), did % 7, F.lit(".test/p"), did
        ).alias("url_norm"),
        (did % 2).cast("int").alias("hop"),
        (did % 5).cast("int").alias("idx"),
        F.struct(
            F.concat(F.lit("c"), did % 5).alias("name"),
            F.concat(F.lit("v"), did).alias("value"),
            F.when(did % 17 == 0, F.lit(0))
            .when(did % 5 == 1, F.lit(7200))
            .cast("long")
            .alias("max_age"),
            F.concat(F.lit("d"), did % 11, F.lit(".test")).alias("domain"),
            F.lit("/").alias("path"),
            (did % 2 == 0).alias("secure"),
        ).alias("c"),
    )
    return ck.fold_cookie_events(ck.empty_jar(spark), events)


def q_politeness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    host = F.concat(F.lit("h"), o.o_custkey % 20)
    w = Window.partitionBy(host).orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("host", host)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .select("o_orderkey", "host")
    )


def q_login_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auth-wall detection — the gate that keeps login forms,
    signup walls, and paywall interstitials out of a training corpus
    (their boilerplate is dense, duplicated, and content-free).
    Signals: a password input ON THE REAL PARSE PATH
    (parse_pages -> forms_with -> input family scan), a login-path
    URL (/login, /signin, /account per the pinned list), and
    paywall phrases in the text ("subscribe to continue" et al.);
    the gate is their union.  Four closed-form page classes per
    doc_id%4: login form (password input), paywall interstitial,
    login-path URL with an ordinary form, plain article.  Scale
    posture: the parse is the shared crawl stage; the flags are
    codegen expressions over its output; one explode-free boolean
    aggregate per page."""
    import pandas as _pd

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 600
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                cls = did % 4
                if cls == 0:
                    body = (
                        "<html><body><form action='/auth'>"
                        "<input type='text' name='user'>"
                        "<input type='password' name='pw'>"
                        "</form></body></html>"
                    )
                    url = f"http://s{did % 9}.test/members"
                elif cls == 1:
                    body = (
                        "<html><body><p>Subscribe to continue "
                        f"reading article {did}.</p></body></html>"
                    )
                    url = f"http://s{did % 9}.test/story{did % 50}"
                elif cls == 2:
                    body = (
                        "<html><body><form action='/search'>"
                        "<input type='text' name='q'></form>"
                        "</body></html>"
                    )
                    url = f"http://s{did % 9}.test/login"
                else:
                    body = (
                        f"<html><body><p>plain article {did} text"
                        "</p></body></html>"
                    )
                    url = f"http://s{did % 9}.test/a{did % 50}"
                rows.append({"doc_id": did, "url": url, "body": body})
            yield _pd.DataFrame(rows, columns=["doc_id", "url", "body"])

    pages = d.mapInPandas(
        gen, schema="doc_id long, url string, body string"
    )
    parsed = extract.parse_pages(pages)
    forms = page.forms_with(parsed, "", page_cols=("doc_id",))
    has_pw = (
        forms.select(
            "doc_id",
            F.exists(
                F.col("node")["inputs"],
                lambda i: F.lower(i["itype"]) == "password",
            ).alias("pw"),
        )
        .groupBy("doc_id")
        .agg(F.max("pw").alias("has_password"))
    )
    flags = (
        pages.join(F.broadcast(has_pw), "doc_id", "left")
        .withColumn(
            "has_password", F.coalesce(F.col("has_password"), F.lit(False))
        )
        .withColumn(
            "login_path",
            F.col("url").rlike(
                r"(?i)/(login|signin|sign-in|account|members?)(/|$|\?)"
            ),
        )
        .withColumn(
            "paywall_text",
            F.col("body").rlike(
                r"(?i)(subscribe to continue|already a subscriber|"
                r"create a free account to|sign in to read)"
            ),
        )
    )
    return flags.select(
        "doc_id",
        "has_password",
        "login_path",
        "paywall_text",
        (
            F.col("has_password")
            | F.col("login_path")
            | F.col("paywall_text")
        ).alias("auth_walled"),
    )


def q_robots_agent_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 §2.2.1 user-agent GROUP SELECTION (the piece beyond
    `robots_rfc`'s ``*``-only reading): a crawler with a product
    token obeys the most specific matching group — ``mybot-images``
    groups beat ``mybot`` groups beat ``*``, all groups at the
    winning specificity merge, and ``*`` applies only when nothing
    matched.  Per doc, a closed-form robots body with three groups;
    three agents evaluate it (otherbot -> ``*``, mybot, mybot-images)
    and two paths decide through the REAL matcher
    (robots.parse_robots(agent=...) + robots_allowed).  The oracle
    states rule counts and decisions literally.  Scale posture:
    pure-Python parse inside an Arrow stage, same shape as the
    robots fetch path; zero shuffle."""
    import pandas as _pd

    from mechaml_spark.frontier.robots import parse_robots, robots_allowed

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 450
    )

    def run(batches):
        agents = ["otherbot", "mybot", "mybot-images"]
        for pdf in batches:
            out = {"doc_id": [], "agent": [], "n_rules": [],
                   "allowed_ok": [], "allowed_z": []}
            for did in pdf["doc_id"]:
                did = int(did)
                k = did % 5
                body = (
                    f"User-agent: *\nDisallow: /a{k}\n\n"
                    f"User-agent: mybot\nDisallow: /b{k}\n"
                    f"Allow: /b{k}/ok\n\n"
                    f"User-agent: MyBot-Images\nDisallow: /c{k}\n"
                )
                agent = agents[did % 3]
                rules = parse_robots(body, agent=agent)
                out["doc_id"].append(did)
                out["agent"].append(agent)
                out["n_rules"].append(len(rules))
                out["allowed_ok"].append(
                    robots_allowed(f"/b{k}/ok/x", rules)
                )
                out["allowed_z"].append(
                    robots_allowed(f"/b{k}/z", rules)
                )
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        run,
        schema=(
            "doc_id long, agent string, n_rules int, "
            "allowed_ok boolean, allowed_z boolean"
        ),
    )


def q_anim_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animation metadata WITHOUT pixel decode (mediaprobe.gif/apng/
    webp_anim_probe): frame count, total duration, loop count from
    block/chunk walks alone — the "skip 10-minute GIFs before
    decoding" gate; image data bytes are length-skipped, never
    LZW/inflate/VP8L-touched.  Each doc writes a real animation in
    its doc_id%3 container (GIF via the LZW encoder, APNG via
    fcTL/fdAT, WebP via ANMF) with F = 2 + doc_id%3 frames and
    delays 100+10k ms; every reported field is the stated closed
    form (GIF loop is NULL — the fixture writes no NETSCAPE
    extension; APNG/WebP loop = doc_id%4).  Scale posture:
    header-walk in mapInPandas, 6 small columns out, zero
    shuffle."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark import mediaprobe as _mp
    from mechaml_spark import webp as _wp

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 450
    )

    def gen(batches):
        for pdf in batches:
            out = {"doc_id": [], "fmt": [], "w": [], "h": [],
                   "n_frames": [], "total_ms": [], "loop": []}
            for did in pdf["doc_id"]:
                did = int(did)
                nf = 2 + did % 3
                delays = [100 + 10 * k for k in range(nf)]
                px = [
                    _np.full((4, 6, 3), (did * 7 + 31 * k) % 251,
                             _np.uint8)
                    for k in range(nf)
                ]
                fmt = ("gif", "apng", "webp")[did % 3]
                if fmt == "gif":
                    data = _im.gif_encode_animated(px, delays)
                    got = _mp.gif_anim_probe(data)
                elif fmt == "apng":
                    fcs = []
                    for k in range(nf):
                        rgba = _np.empty((4, 6, 4), _np.uint8)
                        rgba[..., :3] = px[k]
                        rgba[..., 3] = 255
                        fcs.append(
                            {"x": 0, "y": 0, "px": rgba,
                             "delay_ms": delays[k]}
                        )
                    data = _im.apng_encode_ext(
                        6, 4, fcs, num_plays=did % 4
                    )
                    got = _mp.apng_anim_probe(data)
                else:
                    data = _wp.webp_encode_anim(
                        [(delays[k], 0, 0, px[k], False, False)
                         for k in range(nf)],
                        canvas_wh=(6, 4),
                        loop=did % 4,
                    )
                    got = _mp.webp_anim_probe(data)
                out["doc_id"].append(did)
                out["fmt"].append(fmt)
                out["w"].append(got["w"])
                out["h"].append(got["h"])
                out["n_frames"].append(got["n_frames"])
                out["total_ms"].append(got["total_ms"])
                out["loop"].append(got["loop"])
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        gen,
        schema=(
            "doc_id long, fmt string, w int, h int, n_frames int, "
            "total_ms int, loop int"
        ),
    )


def q_bitext_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext candidate mining from URL structure — the
    WMT/ParaCrawl-style first stage: pages whose URLs differ ONLY by
    a language path segment (``/en/page7`` vs ``/de/page7``) are
    translation-pair candidates, found by collapsing the segment and
    grouping.  A leading path segment from the pinned lang list
    folds to ``/_L_``; groupBy (host, collapsed path) aggregates
    variant count and the sorted distinct lang set — downstream
    alignment fetches only groups with >= 2 langs.  Two closed-form
    families: pages < 25 carry all three langs (12 URLs each), pages
    >= 25 only English (4 URLs).  Scale posture: expression-only
    collapse + ONE partial-agg groupBy (collect_set of langs is
    bounded by the lang list, never by URL count); no self-join, no
    pair explosion at the candidate stage."""
    did = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        did < 600
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
        (did % 3 + 1).cast("int"),
    )
    page_no = did % 50
    rows = d.select(
        F.concat(
            F.lit("http://www.test/"), lang, F.lit("/page"), page_no
        ).alias("url"),
    ).where((page_no < 25) | (did % 3 == 0))
    path = F.regexp_extract(F.col("url"), r"^https?://[^/]+(/.*)$", 1)
    host = F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1)
    lang_seg = F.regexp_extract(
        path, r"^/(en|de|fr|es|it|pt|ru|ja|zh|ko|ar)(/|$)", 1
    )
    collapsed = F.when(
        lang_seg != "",
        F.regexp_replace(
            path, r"^/(en|de|fr|es|it|pt|ru|ja|zh|ko|ar)(/|$)", "/_L_$2"
        ),
    ).otherwise(path)
    return (
        rows.select(
            host.alias("host"),
            collapsed.alias("path_norm"),
            lang_seg.alias("lang"),
        )
        .groupBy("host", "path_norm")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.array_join(
                F.array_sort(F.collect_set("lang")), ","
            ).alias("langs"),
            (F.size(F.collect_set("lang")) >= 2).alias("bitext"),
        )
    )


def q_webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar shards — the delivery format the image-caption
    training stack consumes (adjacent ``{key}.jpg`` + ``{key}.txt``
    members in streamable tars) — driven through the REAL sink and
    source (webdataset.to_webdataset_shards /
    parse_webdataset_shards): constant-plane q95 JPEG pairs shard
    out one-tar-per-partition (byte-deterministic: sorted keys,
    pinned mtime/uid), parse back, and the images decode through the
    repo codec to their closed-form means.  Scale posture: bytes
    shuffle exactly once (the sharding repartition at real scale —
    here the input partitioning), then stream; one tar per task both
    ways."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import webdataset as _wd
    from mechaml_spark.jpeg import jpeg_decode as _jdec
    from mechaml_spark.jpeg import jpeg_encode as _jenc

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                v = (did * 17) % 251
                rows.append(
                    {
                        "key": f"img{did:06d}",
                        "image": _jenc(
                            _np.full((8, 8, 3), v, _np.uint8),
                            quality=95,
                        ),
                        "caption": f"a photo of item {did % 40}",
                    }
                )
            yield _pd.DataFrame(rows, columns=["key", "image", "caption"])

    pairs = d.mapInPandas(
        gen, schema="key string, image binary, caption string"
    )
    shards = _wd.to_webdataset_shards(pairs)
    back = _wd.parse_webdataset_shards(shards)

    def feats(batches):
        for pdf in batches:
            out = {"doc_id": [], "caption": [], "mean_r": []}
            for key, img, cap in zip(
                pdf["key"], pdf["image"], pdf["caption"]
            ):
                out["doc_id"].append(int(str(key)[3:]))
                out["caption"].append(str(cap))
                out["mean_r"].append(
                    int(_jdec(bytes(img))[..., 0].mean())
                )
            yield _pd.DataFrame(out)

    return back.mapInPandas(
        feats, schema="doc_id long, caption string, mean_r int"
    )


def q_media_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AV asset discovery (metadata.media_discovery_cols): the
    `<video>`/`<audio>`/`<source>`/`<track>` channels of a
    multimodal crawl — video posters join the image pipeline, track
    sidecars feed the subtitle parser, source children list the
    codec alternatives.  Closed-form HTML per doc (video with
    poster + two sources, audio with src, a track sidecar, mixed
    quote styles); one row per (doc_id, channel, url).  Scale
    posture: expression-only regexp channels + one explode; zero
    Python, zero shuffle."""
    from mechaml_spark.metadata import media_discovery_cols

    did = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        did < 400
    )
    body = F.concat(
        F.lit('<html><body><video poster="http://m'), did % 6,
        F.lit('.test/poster.jpg" controls><source src="http://m'),
        did % 6, F.lit(".test/clip"), did % 4,
        F.lit(".mp4\" type=\"video/mp4\"><source src='http://m"),
        did % 6, F.lit(".test/clip"), did % 4,
        F.lit(".webm'><track src=\"http://m"), did % 6,
        F.lit(".test/cap"), did % 3,
        F.lit('.vtt" kind="captions"></video><audio src="http://m'),
        did % 6, F.lit(".test/pod"), did % 5,
        F.lit('.wav"></audio></body></html>'),
    )
    return d.select(
        "doc_id", F.explode(media_discovery_cols(body)).alias("m")
    ).select(
        "doc_id",
        F.col("m")["channel"].alias("channel"),
        F.col("m")["url"].alias("url"),
    )


def q_image_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image URL discovery across ALL the channels a real page uses
    — plain ``src``, lazy-load attributes (``data-src`` et al.,
    which SHADOW the placeholder src the way lazy-load libraries
    mean them to), best-candidate ``srcset``, and CSS
    ``background-image`` (style attributes + ``<style>`` blocks via
    metadata.css_image_urls_col) — the completeness layer of
    image+caption mining; `<img src>` alone misses hero banners and
    every lazy-loaded gallery.  HTML is closed-form per doc; the
    page goes through the REAL parse path for the img channels.
    Output one row per (doc_id, channel, url).  Scale posture: parse
    once; all channel extraction is expression-only; explode is the
    only row expansion; zero Python beyond the shared parse stage."""
    import pandas as _pd

    from mechaml_spark.metadata import css_image_urls_col

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                body = (
                    "<html><head><style>"
                    f".hero {{ background: url('http://c{did % 7}"
                    ".test/hero.jpg') no-repeat; }}"
                    "</style></head><body>"
                    f'<img src="http://i{did % 9}.test/plain.png">'
                    f'<img src="http://i{did % 9}.test/blank.gif" '
                    f'data-src="http://i{did % 9}.test/real{did % 5}'
                    '.jpg">'
                    f'<img srcset="http://i{did % 9}.test/a.jpg 1x, '
                    f'http://i{did % 9}.test/b{did % 3}.jpg 2x">'
                    f'<div style="background-image: url(http://c'
                    f'{did % 7}.test/div{did % 4}.png)">x</div>'
                    "</body></html>"
                )
                rows.append(
                    {"doc_id": did,
                     "url": f"http://s.test/d{did}", "body": body}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "url", "body"])

    pages = d.mapInPandas(
        gen, schema="doc_id long, url string, body string"
    )
    from mechaml_spark.metadata import best_srcset_url

    imgs = page.images_with(
        extract.parse_pages(pages), "", page_cols=("doc_id",)
    )
    a = F.col("node")["attrs"]
    lazy = F.coalesce(
        a["data-src"], a["data-lazy-src"], a["data-original"]
    )
    img_rows = imgs.select(
        "doc_id",
        F.when(lazy.isNotNull(), F.lit("lazy"))
        .when(
            a["srcset"].isNotNull(), F.lit("srcset")
        )
        .otherwise(F.lit("src"))
        .alias("channel"),
        F.coalesce(
            lazy,
            best_srcset_url(a["srcset"], F.col("node")["src"]),
        ).alias("img_url"),
    ).where(F.col("img_url").isNotNull())
    css_rows = pages.select(
        "doc_id",
        F.lit("css").alias("channel"),
        F.explode(css_image_urls_col(F.col("body"))).alias("img_url"),
    )
    return img_rows.unionByName(css_rows)


def q_data_uri_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline data:-URI image mining (metadata.data_uri_cols):
    crawled pages inline small images as base64 ``data:`` URLs, and
    the pipeline routes them into the SAME decode stages as fetched
    bytes.  Each doc's HTML carries one base64 PNG (own codec,
    constant plane v = doc_id*13 %% 251), one percent-encoded
    text/plain data URI, and one ordinary fetchable img URL; the
    page goes through the REAL parse path (parse_pages ->
    images_with), the split/unbase64 happens JVM-side, and the PNG
    decodes through the real codec back to its closed-form mean.
    Scale posture: expression-only split (codegen, unbase64 on the
    JVM); only the decode of actual image payloads touches an Arrow
    stage; zero shuffle."""
    import base64 as _b64

    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark.metadata import data_uri_cols

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                v = (did * 13) % 251
                png = _im.png_encode(
                    _np.full((4, 4, 3), v, dtype=_np.uint8)
                )
                b64 = _b64.b64encode(png).decode()
                body = (
                    "<html><body>"
                    f'<img src="data:image/png;base64,{b64}">'
                    f'<img src="data:,note%20{did}">'
                    f'<img src="http://img{did % 9}.test/x.png">'
                    "</body></html>"
                )
                rows.append(
                    {"doc_id": did,
                     "url": f"http://s.test/d{did}",
                     "body": body}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "url", "body"])

    pages = d.mapInPandas(
        gen, schema="doc_id long, url string, body string"
    )
    imgs = page.images_with(
        extract.parse_pages(pages), "", page_cols=("doc_id",)
    )
    split = imgs.select(
        "doc_id",
        F.col("node")["src"].alias("src"),
        *data_uri_cols(F.col("node")["src"]),
    )

    def decode(batches):
        for pdf in batches:
            out = {"doc_id": [], "mime": [], "mean_r": [],
                   "text_payload": []}
            for _, r in pdf.iterrows():
                mime = r["data_mime"]
                mean_r = None
                text = None
                if mime == "image/png":
                    px = _im.png_decode(bytes(r["data_bytes"]))
                    mean_r = int(px[..., 0].mean())
                elif mime is not None:
                    text = bytes(r["data_bytes"]).decode("utf-8")
                out["doc_id"].append(int(r["doc_id"]))
                out["mime"].append(mime)
                out["mean_r"].append(mean_r)
                out["text_payload"].append(text)
            yield _pd.DataFrame(out)

    return (
        split.where(F.col("is_data_uri"))
        .mapInPandas(
            decode,
            schema=(
                "doc_id long, mime string, mean_r int, "
                "text_payload string"
            ),
        )
    )


def q_pdf_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF figure mining (pdfkit.pdf_extract_images): embedded
    DCTDecode image XObjects come back as verbatim JPEG streams and
    decode with the repo's codec — the PDF half of an image+caption
    corpus (figure + caption text from the same page).  Each doc
    writes a 2-page PDF with two constant-plane q95 JPEGs (exact
    decode — the `image_jpeg_features` argument) and caption text;
    Spark runs the real object-table walk + JPEG decode and pairs
    the first caption line; every output is a closed form.  Scale
    posture: object walk + decode in mapInPandas, bytes never
    shuffle; 6 small columns out."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import pdfkit as _pk
    from mechaml_spark.jpeg import jpeg_decode as _jdec
    from mechaml_spark.jpeg import jpeg_encode as _jenc

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def mine(batches):
        for pdf in batches:
            out = {"doc_id": [], "img_no": [], "w": [], "h": [],
                   "mean_r": [], "caption": []}
            for did in pdf["doc_id"]:
                did = int(did)
                v1, v2 = (did * 7) % 251, (did * 11) % 251
                doc = _pk.pdf_write(
                    [[f"figure {did} caption"], ["page 2"]],
                    images=[
                        (8, 8, _jenc(
                            _np.full((8, 8, 3), v1, _np.uint8),
                            quality=95,
                        )),
                        (16, 8, _jenc(
                            _np.full((8, 16, 3), v2, _np.uint8),
                            quality=95,
                        )),
                    ],
                )
                cap = _pk.pdf_extract_text(doc).splitlines()[0]
                for k, (_n, w, h, filt, payload) in enumerate(
                    _pk.pdf_extract_images(doc)
                ):
                    assert filt == "DCTDecode"
                    px = _jdec(payload)
                    out["doc_id"].append(did)
                    out["img_no"].append(k)
                    out["w"].append(w)
                    out["h"].append(h)
                    out["mean_r"].append(int(px[..., 0].mean()))
                    out["caption"].append(cap)
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        mine,
        schema=(
            "doc_id long, img_no int, w int, h int, mean_r int, "
            "caption string"
        ),
    )


def q_jpeg_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG stream-structure probe (jpeg.jpeg_sof_probe): progressive
    flag + chroma subsampling in J:a:b notation from the SOF marker
    alone — the curation signal next to `jpeg_quality` (gate heavy
    4:2:0 under a quality bar) with zero entropy decode.  Four
    classes per doc_id%4: baseline 4:4:4, progressive 4:4:4 (both
    real own-encoder streams), and 4:2:0 / 4:2:2 header variants
    (SOF sampling factors patched — probe-only streams, the
    subsampled DECODE path is separately exercised by the codec
    tests).  Scale posture: first-marker walk in mapInPandas,
    5 small columns out, zero shuffle."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark.jpeg import (
        jpeg_encode,
        jpeg_encode_progressive,
        jpeg_sof_probe,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def probe(batches):
        for pdf in batches:
            out = {"doc_id": [], "progressive": [], "w": [], "h": [],
                   "n_components": [], "subsampling": []}
            for did in pdf["doc_id"]:
                did = int(did)
                q = 50 + did % 45
                px = _np.full(
                    (16, 16, 3), (did * 31) % 251, dtype=_np.uint8
                )
                if did % 4 == 1:
                    data = jpeg_encode_progressive(px, quality=q)
                else:
                    data = jpeg_encode(px, quality=q)
                    if did % 4 >= 2:
                        b = bytearray(data)
                        i = data.index(b"\xff\xc0")
                        b[i + 11] = 0x22 if did % 4 == 2 else 0x21
                        data = bytes(b)
                prog, w, h, nc, sub = jpeg_sof_probe(data)
                out["doc_id"].append(did)
                out["progressive"].append(prog)
                out["w"].append(w)
                out["h"].append(h)
                out["n_components"].append(nc)
                out["subsampling"].append(sub)
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        probe,
        schema=(
            "doc_id long, progressive boolean, w int, h int, "
            "n_components int, subsampling string"
        ),
    )


def q_warc_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full WARC capture pairs (warc.to_warc_segments_paired): each
    fetched row archives as a ``request`` record (real
    ``msgtype=request`` block: method, path+query target, Host)
    linked Common-Crawl-style via ``WARC-Concurrent-To`` to the
    ``response`` that follows it.  The whole sink/parse chain is
    REAL — write paired segments, re-parse, join requests to
    responses on the link, and parse the request block back.
    Methods alternate GET/POST by doc_id; the oracle states
    method/target/pairing arithmetically.  Scale posture: one
    segment per partition both ways (Common Crawl sharding shape);
    the pairing join is records-to-records on record id."""
    import pandas as _pd

    from mechaml_spark import warc as _warc

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rows.append(
                    {
                        "uri": (
                            f"http://h{did % 20}.test/p{did}"
                            f"?q={did % 7}"
                        ),
                        "body": f"body-{did}",
                        "date": "2026-01-02T03:04:05Z",
                        "method": "POST" if did % 3 == 0 else "GET",
                    }
                )
            yield _pd.DataFrame(
                rows, columns=["uri", "body", "date", "method"]
            )

    pages = d.mapInPandas(
        gen, schema="uri string, body string, date string, method string"
    )
    segs = _warc.to_warc_segments_paired(pages, method_col="method")
    recs = _warc.parse_warc_segments(segs)

    def link(batches):
        # one partition = one segment's records, but Arrow may split
        # them across batches: accumulate the partition first
        all_pdf = _pd.concat(list(batches), ignore_index=True)
        for pdf in ([all_pdf] if len(all_pdf) else []):
            by_id = {}
            reqs = []
            for _, r in pdf.iterrows():
                if r["warc_type"] == "response":
                    by_id[r["record_id"]] = r
                elif r["warc_type"] == "request":
                    reqs.append(r)
            out = {"doc_id": [], "method": [], "target": [],
                   "paired": [], "resp_body": []}
            for r in reqs:
                m, target, hdrs, _b = _warc.parse_http_request(
                    bytes(r["block"])
                )
                resp = by_id.get(r["concurrent_to"])
                paired = (
                    resp is not None and resp["uri"] == r["uri"]
                )
                body = None
                if resp is not None:
                    _s, _h, rb = _warc.parse_http_response(
                        bytes(resp["block"])
                    )
                    body = rb.decode("utf-8")
                did = int(r["uri"].split("/p")[1].split("?")[0])
                out["doc_id"].append(did)
                out["method"].append(m)
                out["target"].append(target)
                out["paired"].append(paired)
                out["resp_body"].append(body)
            yield _pd.DataFrame(out)

    return recs.mapInPandas(
        link,
        schema=(
            "doc_id long, method string, target string, "
            "paired boolean, resp_body string"
        ),
    )


def q_politeness_by_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness by resolved-SERVER group, not hostname — the
    virtual-hosting reality at 10^10 frontier scale: thousands of
    hostnames resolve to one server, and a per-host budget alone
    would still hammer it.  Hosts map to a simulated DNS A-record
    (first md5 byte mod 8 — deterministic, engine-portable) and the
    REAL salted two-phase top-B (frontier.scheduler.politeness_split,
    the exact operator the crawl runs) selects budget=4 per server
    group over the total key (depth, url_norm).  The oracle is the
    provably-equal naive window per group.  Scale posture: identical
    to the crawl's politeness stage — two bounded windows, hot
    groups split across salt shards, no single-task skew."""
    from mechaml_spark.frontier.scheduler import politeness_split

    o = _t(spark, sf_dir, "orders")
    host = F.concat(F.lit("h"), o.o_custkey % 40, F.lit(".test"))
    frontier = o.select(
        F.concat(
            F.lit("http://h"), o.o_custkey % 40, F.lit(".test/p"),
            o.o_orderkey,
        ).alias("url_norm"),
        host.alias("real_host"),
        (o.o_orderkey % 5).cast("int").alias("depth"),
    ).withColumn(
        "host",
        (
            F.conv(F.substring(F.md5(F.col("real_host")), 1, 2), 16, 10)
            .cast("long") % 8
        ).cast("string"),
    )
    selected, _rest = politeness_split(
        frontier, 4, key_cols=("depth", "url_norm")
    )
    return selected.select(
        F.col("host").alias("server_group"), "real_host", "depth",
        "url_norm",
    )


def q_seen_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered exact URL-seen dedup (the crawl's operator)."""
    o = _t(spark, sf_dir, "orders")
    seeds = o.select(
        F.concat(
            F.lit("http://h"), o.o_custkey % 50, F.lit(".test/p"), o.o_orderkey % 1000
        ).alias("url_norm"),
        F.concat(F.lit("h"), o.o_custkey % 50, F.lit(".test")).alias("host"),
    ).distinct()
    e = _t(spark, sf_dir, "events")
    cands = e.select(
        F.concat(
            F.lit("http://h"), e.user_id % 50, F.lit(".test/p"), e.event_id % 1000
        ).alias("url_norm"),
        F.concat(F.lit("h"), e.user_id % 50, F.lit(".test")).alias("host"),
    ).distinct()
    seen = SeenSet(spark, n_shards=8, n_bits=1 << 18).add(seeds)
    return seen.filter_new(cands).agg(F.count("*").alias("n_new"))


def q_seen_dedupe_cuckoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuckoo-filter URL-seen backend (north rule names "bloom/cuckoo"):
    add seeds, DELETE a revisit subset — the operation the bloom backend
    cannot express — then dedup candidates against the remaining
    membership.  Same sharded-cogroup plan shape as ``seen_dedupe``."""
    from mechaml_spark.frontier.seen import CuckooSeenSet

    o = _t(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("http://h"), o.o_custkey % 50, F.lit(".test/p"), o.o_orderkey % 1000
    )
    host = F.concat(F.lit("h"), o.o_custkey % 50, F.lit(".test"))
    seeds = o.select(url.alias("url_norm"), host.alias("host")).distinct()
    revisit = (
        o.where(o.o_orderkey % 7 == 0)
        .select(url.alias("url_norm"), host.alias("host"))
        .distinct()
    )
    e = _t(spark, sf_dir, "events")
    cands = e.select(
        F.concat(
            F.lit("http://h"), e.user_id % 50, F.lit(".test/p"), e.event_id % 1000
        ).alias("url_norm"),
        F.concat(F.lit("h"), e.user_id % 50, F.lit(".test")).alias("host"),
    ).distinct()
    seen = CuckooSeenSet(spark, n_shards=8, n_bits=1 << 18).add(seeds)
    seen = seen.delete(revisit)
    return seen.filter_new(cands).agg(F.count("*").alias("n_new"))


def q_form_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    body = F.concat(
        F.lit("<html><body><form id='f' action='/a'>"),
        F.lit("<input type='checkbox' name='c' value='v'"),
        F.when(p.p_size % 2 == 0, F.lit(" checked")).otherwise(F.lit("")),
        F.lit("/><input type='text' name='b' value='"),
        p.p_brand,
        F.lit("'/></form></body></html>"),
    )
    pages = p.select(
        p.p_partkey,
        F.concat(F.lit("http://parts.test/"), p.p_partkey).alias("url"),
        body.alias("body"),
    )
    forms_df = page.forms_with(
        extract.parse_pages(pages), "", page_cols=("p_partkey",)
    )
    st = F.col("node")["state"]
    return forms_df.select(
        "p_partkey",
        is_checked(st, "c", "v").alias("checked"),
        state_get(st, "b").alias("brand_default"),
    )


def q_format_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        p.p_partkey,
        formatting.color(
            p.p_size % 256, (p.p_size * 7) % 256, (p.p_size * 11) % 256
        ).alias("color_valid"),
        formatting.color((p.p_size * 3) % 300, p.p_size % 256, p.p_size % 256).alias(
            "color_maybe"
        ),
        formatting.date(
            p.p_size % 35, (p.p_partkey % 14).cast("int"), 1900 + p.p_size
        ).alias("date_s"),
        formatting.time(
            p.p_size % 30, (p.p_partkey % 60).cast("int"), (p.p_size * 7) % 61
        ).alias("time_s"),
    )


def q_submit_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """submit -> fetch end-to-end against a METHOD-SENSITIVE corpus:
    HTML forms are synthesized per ``part`` row (POST for even keys,
    GET for odd), parsed by the real extraction pipeline, submitted
    through :func:`mechaml_spark.agent.submit` (request synthesis per
    src/agent.ml:119-130 — GET replaces the query string, POST keeps
    the URL and carries the encoded body), and fetched through a
    corpus whose response rows key on (url, method).  Decoy rows sit
    at the POST URLs under GET: an engine that silently degraded a
    form POST to a GET (the round-1 gap) would fetch the decoy and
    hash-mismatch the oracle."""
    from mechaml_spark import agent

    p = _t(spark, sf_dir, "part")
    even = p.p_partkey % 2 == 0
    meth = F.when(even, F.lit("post")).otherwise(F.lit("get"))
    body = F.concat(
        F.lit('<html><body><form action="/submit/'),
        p.p_partkey,
        F.lit('" method="'),
        meth,
        F.lit('"><input type="text" name="q" value="'),
        p.p_partkey,
        F.lit('"/></form></body></html>'),
    )
    pages = p.select(
        F.concat(F.lit("http://parts.test/pg"), p.p_partkey).alias("url"),
        body.alias("body"),
    )
    forms_df = page.forms_with(extract.parse_pages(pages), "")

    empty_sc = F.expr("CAST(array() AS array<string>)")
    submit_url = F.concat(F.lit("http://parts.test/submit/"), p.p_partkey)

    def resp(url, meth_lit, body_col):
        return [
            url.alias("url_norm"),
            F.lit(200).alias("status"),
            F.lit(None).cast("string").alias("location"),
            empty_sc.alias("set_cookie"),
            body_col.alias("body"),
            F.lit(meth_lit).alias("method"),
        ]

    post_rows = p.where(even).select(
        *resp(submit_url, "POST", F.concat(F.lit("got:POST:q="), p.p_partkey))
    )
    decoy_rows = p.where(even).select(
        *resp(submit_url, "GET", F.lit("got:DEGRADED"))
    )
    get_rows = p.where(~even).select(
        *resp(
            F.concat(submit_url, F.lit("?q="), p.p_partkey),
            "GET",
            F.concat(F.lit("got:GET:q="), p.p_partkey),
        )
    )
    # one materialization: every hop branch of the bounded fetch loop
    # joins this corpus — without the checkpoint each of the 6 branches
    # re-scans part and rebuilds the 3-way union at run time
    corpus = (
        post_rows.unionByName(decoy_rows)
        .unionByName(get_rows)
        .localCheckpoint(eager=False)
    )
    # adaptive: the corpus answers every submit with a 200, so the
    # redirect stream dries up at hop 0 — without the probe the five
    # dead hop branches cost a Catalyst compile + an empty-join job
    # each (~4s of the query's 7.5s at sf0.1)
    fr = agent.submit(forms_df, agent.CorpusFetcher(corpus), adaptive=True)
    return fr.finals.select("url_norm", "method", "status", "body")


# ------------------------------------------------- training-data pipeline

def _toks(col):
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.countDistinct("text").alias("n_unique"),
        F.count("*").alias("n_total"),
    )


def minhash_band_cols(text) -> list:
    """The MinHash band signature stage as reusable columns — shared
    verbatim by the batch ``dedup_minhash`` query and the streaming
    crawl's incremental near-dup index (streaming.py), so the two
    modes cannot drift."""
    toks = _toks(text)
    sig = lambda salt: F.array_min(  # noqa: E731
        F.transform(toks, lambda w: F.md5(F.concat(w, F.lit(salt)).cast("binary")))
    )
    return [sig("s0").alias("sig0"), sig("s1").alias("sig1")]


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash bucket join: docs sharing a (sig0, sig1) band bucket."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(*minhash_band_cols(d.text))
        .groupBy("sig0", "sig1")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


def q_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash near-dup buckets: per-token md5-derived 16-bit
    hash, per-bit +1/-1 vote over the token multiset, sign -> bit.
    Both engines unroll the 16 bits over a precomputed hash array."""
    d = _t(spark, sf_dir, "documents")
    h16 = lambda w: F.conv(F.substring(F.md5(w.cast("binary")), 1, 4), 16, 10).cast(  # noqa: E731
        "int"
    )
    base = d.select(
        "doc_id", F.transform(_toks(d.text), h16).alias("hs")
    )
    bit_sum = lambda b: F.aggregate(  # noqa: E731
        "hs",
        F.lit(0),
        lambda acc, h: acc
        + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
    )
    sim = None
    for b in range(16):
        term = F.when(bit_sum(b) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return (
        base.select(sim.cast("long").alias("simhash"))
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard >= 0.5 on minhash-bucket candidate pairs
    (integer cross-multiplied compare: 3|I| >= |A|+|B|).

    Candidate generation is a 2-hash MinHash band over the SHINGLE
    set (P[collision per hash] = Jaccard), so bucket sizes track true
    near-dup groups.  Minhashing the token set instead (tiny shared
    vocabulary) puts most of the corpus into one bucket and the pair
    join goes quadratic — measured 218s vs 0.9s at sf0.1 in DuckDB.
    At 100 TB the equi-join on (sig0, sig1) shuffles near-dup groups
    only; no skewed hot bucket, no cross join."""
    d = _t(spark, sf_dir, "documents")
    base = d.select("doc_id", _toks(d.text).alias("toks")).where(
        F.size("toks") >= 3
    )
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i + 1),
                F.element_at(F.col("toks"), i + 2),
                F.element_at(F.col("toks"), i + 3),
            ),
        )
    )
    sig = lambda salt: F.array_min(  # noqa: E731
        F.transform(
            F.col("sh"), lambda s: F.md5(F.concat(s, F.lit(salt)).cast("binary"))
        )
    )
    t = (
        base.select("doc_id", sh.alias("sh"))
        .select("doc_id", "sh", sig("s0").alias("sig0"), sig("s1").alias("sig1"))
        # materialize once before the self-join: without this the whole
        # shingle+md5 expression tree is duplicated on both sides and
        # re-optimized/re-executed (measured 51s -> 5s at sf0.1); at
        # cluster scale this is the classic "stage reuse" cut — on a
        # real pipeline the signature table would be a persisted
        # intermediate (exchange reuse does not fire across the
        # asymmetric self-join condition)
        .localCheckpoint(eager=False)
    )
    a, b = t.alias("a"), t.alias("b")
    j = a.join(
        b,
        (F.col("a.sig0") == F.col("b.sig0"))
        & (F.col("a.sig1") == F.col("b.sig1"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    total = F.size(F.col("a.sh")) + F.size(F.col("b.sh"))
    return (
        j.where(3 * inter >= total)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.cast("long").alias("n_common"),
            (total - inter).cast("long").alias("n_union"),
        )
    )


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline over testdata with a CLOSED-FORM oracle:
    deterministic constant-plane PNGs keyed by doc_id -> real decode
    -> real resize -> real feature extraction.  Pixels are generated
    arithmetically (channel c of doc d is the constant
    ``(d * prime_c) % 251``), so the decoded means are exact in SQL
    while the Spark side still exercises the full mapInPandas
    decode/resize/feature stages of the payload pipeline."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _imaging
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )
    gen_schema = "doc_id long, bytes binary, fmt string"

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.empty((8, 8, 3), dtype=_np.uint8)
                px[..., 0] = (did * 7) % 251
                px[..., 1] = (did * 11) % 251
                px[..., 2] = (did * 13) % 251
                rows.append(
                    {"doc_id": did, "bytes": _imaging.png_encode(px),
                     "fmt": "png"}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema=gen_schema)
    feats = multimodal.image_features(
        multimodal.resize_images(media, 4, 4, out_col="resized")
        .drop("bytes")
        .withColumnRenamed("resized", "bytes")
    )
    return feats.select(
        "doc_id",
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_image_colorhist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized color histogram + dominant-color gate
    (multimodal.color_histogram) with a closed-form oracle: each 8x8
    PNG is two vertical half-planes — color A = ((d*7)%251, (d*11)%251,
    (d*13)%251) on the left, its 255-complement on the right — so the
    two occupied 2-bit bins, their 32/32 counts (or one 64 bin when A
    and its complement quantize together), the pinned lowest-id
    dominant bin, and the x1000 dominant fraction are all pure
    integer arithmetic in SQL while Spark runs the real decode."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _imaging
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                a = _np.array(
                    [(did * 7) % 251, (did * 11) % 251, (did * 13) % 251],
                    dtype=_np.uint8,
                )
                px = _np.empty((8, 8, 3), dtype=_np.uint8)
                px[:, :4, :] = a
                px[:, 4:, :] = 255 - a
                rows.append(
                    {"doc_id": did, "bytes": _imaging.png_encode(px),
                     "fmt": "png"}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    ch = multimodal.color_histogram(media)
    # hist is serialized to a comma-joined string: the driver's pandas
    # canonicalization lexsorts rows and cannot factorize list cells, so
    # no queries() entry may emit array/map/struct columns (pinned by
    # tests/test_driver_contract.py::test_no_complex_output_columns).
    return ch.select(
        "doc_id",
        F.col("colorhist")["n_px"].alias("n_px"),
        F.concat_ws(
            ",",
            F.transform(F.col("colorhist")["hist"], lambda x: x.cast("string")),
        ).alias("hist"),
        F.col("colorhist")["dom_bin"].alias("dom_bin"),
        F.col("colorhist")["dom_milli"].alias("dom_milli"),
    )


def _phash_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 9x8 PNGs whose dHash is closed-form in SQL.

    Pixel (y, x) of doc d is the constant-gray value
    ``bit((d % 10000) >> ((x + y) % 16)) * 255``; at dHash's native
    9x8 geometry the block-mean downscale is the identity, so
    ``phash`` bit ``y*8+x`` is exactly ``bit(s) < bit(s+1)`` with
    ``s = x+y`` — pure integer bit arithmetic both engines share.
    ``key < 16384`` keeps bits 14/15 clear so bit 63 is always 0 (no
    int64 sign gymnastics in SQL)."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _imaging

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 1000
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                key = did % 10000
                px = _np.empty((8, 9, 3), dtype=_np.uint8)
                for y in range(8):
                    for x in range(9):
                        px[y, x, :] = ((key >> ((x + y) % 16)) & 1) * 255
                rows.append(
                    {"doc_id": did, "bytes": _imaging.png_encode(px),
                     "fmt": "png"}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    return d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")


def q_image_webp_lossy_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy (VP8) WebP through the REAL decode path: conformant
    flat-color VP8 keyframes (vp8.vp8_encode_flat, libwebp-verified
    writer) -> RFC 6386 arithmetic decode -> BT.601 RGB ->
    image_features means.  DC tokens (vy, vu, vv) and the quantizer
    index derive from doc_id, so the whole pipeline — dc_qlookup
    dequant, inverse-WHT DC distribution, IDCT DC path, 128-plane
    prediction, YUV->RGB — is a closed-form integer expression the
    DuckDB oracle re-derives from scratch (incl. the full 128-entry
    quantizer table, exercised via qi = doc_id % 128)."""
    import pandas as _pd

    from mechaml_spark import multimodal
    from mechaml_spark.webp import webp_encode_lossy_flat

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rows.append(
                    {
                        "doc_id": did,
                        "bytes": webp_encode_lossy_flat(
                            16, 16,
                            (did * 7) % 256,
                            (did * 11) % 200,
                            (did * 13) % 200,
                            did % 128,
                        ),
                        "fmt": "webp",
                    }
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    feats = multimodal.image_features(media)
    return feats.select(
        "doc_id",
        F.col("features")["w"].alias("w"),
        F.col("features")["h"].alias("h"),
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_webm_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebM/Matroska Cluster expansion to per-frame byte ranges
    (mediaprobe.mkv_blocks — the mp4_samples twin: slice a video
    file's frames WITHOUT any codec touch).  Deterministic fixtures:
    one cluster per doc with 3..6 SimpleBlocks whose sizes, relative
    timecodes, and keyframe flags derive from doc_id, so the EBML
    layout arithmetic (every varint width is pinned by construction;
    first frame's payload starts at byte 103) is a pure closed form
    the DuckDB oracle recomputes with a running sum."""
    import pandas as _pd

    from mechaml_spark import mediaprobe as _mp

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 3 + did % 4
                ctc = 1000 + (did % 9) * 1000
                blocks = [
                    {"track": 1, "rel_tc": i * 40,
                     "keyframe": i % 3 == 0,
                     "payload": bytes([65 + i % 26])
                     * (40 + ((did * 7 + i * 13) % 50))}
                    for i in range(n)
                ]
                data = _mp.mkv_write_clusters([(ctc, blocks)])
                for i, r in enumerate(_mp.mkv_blocks(data)):
                    rows.append(
                        {"doc_id": did, "block": i, "track": r["track"],
                         "timecode": r["timecode"],
                         "keyframe": r["keyframe"],
                         "offset": r["offset"], "size": r["size"]}
                    )
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "block", "track", "timecode",
                         "keyframe", "offset", "size"],
            )

    return d.mapInPandas(
        gen,
        schema=(
            "doc_id long, block int, track long, timecode long, "
            "keyframe boolean, offset long, size long"
        ),
    )


def q_mp3_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 frame-accurate byte ranges (mediaprobe.mp3_frames — the
    slice-without-decode contract extended to Layer-III audio, the
    mp4_samples / webm_blocks twin).  Fixtures: deterministic CBR/VBR
    streams with doc_id-derived frame counts, bitrate ladders,
    alternating padding, and ID3v2 preambles; the DuckDB oracle
    recomputes every frame's length (144*br*1000 // sr + pad) and
    cumulative offset from the ISO 11172-3 bitrate/samplerate tables
    inlined as SQL."""
    import pandas as _pd

    from mechaml_spark import mediaprobe as _mp

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                data = _mp.mp3_write(
                    3 + did % 5,
                    bitrate_idx=1 + did % 14,
                    sr_idx=did % 3,
                    id3v2_size=(did % 4) * 10,
                    vbr_step=did % 2,
                    id3v1=(did % 5 == 0),
                )
                for r in _mp.mp3_frames(data):
                    rows.append(
                        {"doc_id": did, "idx": r["idx"],
                         "offset": r["offset"], "size": r["size"],
                         "bitrate_kbps": r["bitrate_kbps"],
                         "samplerate": r["samplerate"],
                         "padded": r["padded"]}
                    )
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "idx", "offset", "size",
                         "bitrate_kbps", "samplerate", "padded"],
            )

    return d.mapInPandas(
        gen,
        schema=(
            "doc_id long, idx int, offset long, size long, "
            "bitrate_kbps int, samplerate int, padded boolean"
        ),
    )


def q_webm_vp8_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-codec frame pixels out of a WebM container with no
    external library: mkv_blocks slices the V_VP8 track's SimpleBlock
    keyframes by byte range, and each frame decodes through the
    from-scratch RFC 6386 VP8 decoder (vp8.py, bit-exact vs libwebp).
    Fixtures: per-doc WebM files whose 2..4 keyframes are conformant
    flat VP8 streams (vp8_encode_flat) with doc_id+frame-derived DC
    tokens, so every decoded frame's RGB is the same closed-form
    integer expression the image_webp_lossy_features oracle uses."""
    import pandas as _pd

    from mechaml_spark import mediaprobe as _mp
    from mechaml_spark import vp8 as _vp8

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 2 + did % 3
                blocks = [
                    {"track": 1, "rel_tc": i * 33, "keyframe": True,
                     "payload": _vp8.vp8_encode_flat(
                         16, 16,
                         (did * 7 + i * 31) % 256,
                         (did * 11 + i * 17) % 200,
                         (did * 13 + i * 23) % 200,
                         did % 128,
                     )}
                    for i in range(n)
                ]
                data = _mp.mkv_write_clusters(
                    [(0, blocks)], video=("V_VP8", 16, 16)
                )
                for i, b in enumerate(_mp.mkv_blocks(data)):
                    frame = data[b["offset"]:b["offset"] + b["size"]]
                    rgb = _vp8.vp8_decode_rgb(frame)
                    rows.append(
                        {"doc_id": did, "frame": i,
                         "timecode": b["timecode"],
                         "keyframe": b["keyframe"],
                         "w": rgb.shape[1], "h": rgb.shape[0],
                         "r": int(rgb[0, 0, 0]), "g": int(rgb[0, 0, 1]),
                         "b": int(rgb[0, 0, 2])}
                    )
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "frame", "timecode", "keyframe",
                         "w", "h", "r", "g", "b"],
            )

    return d.mapInPandas(
        gen,
        schema=(
            "doc_id long, frame int, timecode long, keyframe boolean, "
            "w int, h int, r int, g int, b int"
        ),
    )


def q_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patch extraction (multimodal.patchify): decode ->
    4x4 tiling -> one row per patch with grid position and exact
    x1000 per-channel means — the tiling stage in front of a vision
    encoder, over the REAL PNG decode path.  Fixtures: 16x16 PNGs
    whose every 4x4 tile is a flat color derived from (doc_id,
    patch_row, patch_col), so each patch mean is the pixel value
    x1000 and the oracle is pure integer arithmetic."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _imaging
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.empty((16, 16, 3), _np.uint8)
                for pr in range(4):
                    for pc in range(4):
                        base = (did * 3 + pr * 4 + pc) * 17
                        px[pr * 4:pr * 4 + 4, pc * 4:pc * 4 + 4] = (
                            base % 256, (base + 85) % 256,
                            (base + 170) % 256,
                        )
                rows.append(
                    {"doc_id": did, "bytes": _imaging.png_encode(px),
                     "fmt": "png"}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    return multimodal.patchify(media, 4)


def q_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual hash (dHash) through the REAL decode path: PNG bytes
    -> pixels -> 9x8 block-mean -> 64 comparison bits (input_hint's
    ``phash`` column).  The oracle recomputes the same bits from
    doc_id arithmetic (see :func:`_phash_media`)."""
    from mechaml_spark import multimodal

    media = _phash_media(spark, sf_dir)
    return media.select(
        "doc_id", multimodal.dhash64_udf()("bytes", "fmt").alias("phash")
    )


def q_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup candidate buckets: band the 64-bit dHash into
    4 x 16-bit bands and group on (band, value) — the same banded
    equi-join shape as ``dedup_minhash``, so candidate generation at
    10^10 images is a shuffle on the band key only (re-encoded or
    lightly-edited images agree on most bands; a content hash over
    bytes would never collide).  Output: buckets holding >1 image."""
    from mechaml_spark import multimodal

    ph = _phash_media(spark, sf_dir).select(
        "doc_id", multimodal.dhash64_udf()("bytes", "fmt").alias("phash")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright("phash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(
                    "val"
                ),
            )
            for i in range(4)
        ]
    )
    return (
        ph.select(F.explode(bands).alias("b"))
        .select(F.col("b")["band"].alias("band"), F.col("b")["val"].alias("val"))
        .groupBy("band", "val")
        .agg(F.count("*").alias("n_imgs"))
        .where(F.col("n_imgs") > 1)
    )


def q_image_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LOSSY codec, oracle-checked: constant-plane JPEGs (q95)
    keyed by doc_id -> REAL baseline-JPEG encode -> REAL decode ->
    features.  A constant 8x8 plane is DC-only; at quality 95 the DC
    quantization step is 2 and the DC coefficient 8*(v-128) is always
    divisible by 2 after rounding, so the reconstructed YCbCr error
    is <= 0.125 per channel and the RGB inverse lands strictly within
    0.5 of the original integers — the decode is EXACT and the means
    are the same closed form as `image_features`."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import multimodal
    from mechaml_spark.jpeg import jpeg_encode as _jenc

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.empty((8, 8, 3), dtype=_np.uint8)
                px[..., 0] = (did * 7) % 251
                px[..., 1] = (did * 11) % 251
                px[..., 2] = (did * 13) % 251
                rows.append(
                    {
                        "doc_id": did,
                        "bytes": _jenc(px, quality=95),  # DC step 2: exact
                        "fmt": "jpg",
                    }
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    feats = multimodal.image_features(media)
    return feats.select(
        "doc_id",
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_mp4_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 (ISO BMFF) sample-table expansion — how a video pipeline
    locates per-frame byte ranges, decode timestamps, and keyframe
    sync points WITHOUT touching a codec (the downstream GPU decode
    seeks straight to keyframe offsets; ISO 14496-12 §8.6-8.7).
    Each doc writes a real BMFF stream (mediaprobe.mp4_write_sampled)
    with 6 samples in chunks of [2,3,1], two stts delta runs, per-doc
    sizes, and stss=[1,4]; Spark parses the real boxes back
    (mediaprobe.mp4_samples).  The fixture shape is constant, so the
    mdat payload base is the constant 680 the oracle states (pinned
    by tests/test_mp4_samples.py) and offsets are base + a window
    cumsum of the closed-form sizes.  Scale posture: header-only box
    walk in mapInPandas — mdat bytes never parse; 5 small columns
    per sample leave the worker; zero shuffle."""
    import pandas as _pd

    from mechaml_spark.mediaprobe import mp4_samples, mp4_write_sampled

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def expand(batches):
        for pdf in batches:
            out = {"doc_id": [], "sample_no": [], "offset": [],
                   "size": [], "dts": [], "keyframe": []}
            for did in pdf["doc_id"]:
                did = int(did)
                d1 = 400 + (did % 5) * 20
                d2 = 900 + (did % 3) * 100
                sizes = [16 + (did + i) % 9 for i in range(6)]
                data = mp4_write_sampled(
                    64, 48, [d1] * 3 + [d2] * 3, sizes, [2, 3, 1],
                    sync=[1, 4],
                )
                got = mp4_samples(data)
                assert got["timescale"] == 30000
                for i, (o, sz, dts, key) in enumerate(got["samples"]):
                    out["doc_id"].append(did)
                    out["sample_no"].append(i)
                    out["offset"].append(o)
                    out["size"].append(sz)
                    out["dts"].append(dts)
                    out["keyframe"].append(key)
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        expand,
        schema=(
            "doc_id long, sample_no int, offset long, size long, "
            "dts long, keyframe boolean"
        ),
    )


def q_subtitle_cues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRT / WebVTT subtitle-cue parsing (subtitles.cues_col) — the
    caption-alignment stage of a video-text pipeline (pair sampled
    frames with the cue text overlapping them).  Each doc synthesizes
    a 3-cue subtitle file closed-form from doc_id: even docs SRT
    (numeric index lines, comma milliseconds), odd docs WebVTT
    (header block, dot milliseconds, cue settings after the arrow);
    docs%4==0 append a malformed no-arrow block the parser must
    drop.  Spark BUILDS the text and runs the real expression-only
    grammar; the oracle states start/end/text arithmetically.  Scale
    posture: split/transform/filter/regexp under whole-stage codegen
    — zero Python, zero shuffle; explode is the only row-expansion."""
    from mechaml_spark.subtitles import cues_col

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 600
    )
    did = F.col("doc_id")
    two = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    vtt = did % 2 == 1
    sep = F.when(vtt, ".").otherwise(",")
    mmm = F.lpad(((did % 10) * 100).cast("string"), 3, "0")

    def cue(i: int):
        s = (did % 50) * 3 + 4 * i
        e = s + 2 + i
        start = F.concat(
            F.lit("00:"), two((s / 60).cast("int")), F.lit(":"),
            two(s % 60), sep, mmm,
        )
        end = F.concat(
            F.lit("00:"), two((e / 60).cast("int")), F.lit(":"),
            two(e % 60), sep, mmm,
        )
        idx = F.when(vtt, F.lit("")).otherwise(
            F.concat(F.lit(f"{i + 1}"), F.lit("\n"))
        )
        settings = F.when(vtt, F.lit(" align:start")).otherwise(F.lit(""))
        body = (
            F.concat(F.lit("item "), did, F.lit(f" cue {i}\nextra"))
            if i == 0
            else F.concat(F.lit("item "), did, F.lit(f" cue {i}"))
        )
        return F.concat(idx, start, F.lit(" --> "), end, settings,
                        F.lit("\n"), body)

    header = F.when(vtt, F.lit("WEBVTT\n\n")).otherwise(F.lit(""))
    junk = F.when(did % 4 == 0, F.lit("\n\njunk block\nno arrow")).otherwise(
        F.lit("")
    )
    doc = F.concat(
        header, cue(0), F.lit("\n\n"), cue(1), F.lit("\n\n"), cue(2), junk,
        F.lit("\n"),
    )
    return (
        d.select("doc_id", F.posexplode(cues_col(doc)).alias("cue_no", "c"))
        .select(
            "doc_id",
            F.col("cue_no").cast("int").alias("cue_no"),
            F.col("c")["start_ms"].alias("start_ms"),
            F.col("c")["end_ms"].alias("end_ms"),
            F.col("c")["text"].alias("text"),
        )
    )


def q_pair_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text PAIR dedup on the north-rule input table shape
    (image_id, bytes, w, h, fmt, caption, phash): LAION-style
    (caption, phash) exact-pair grouping with keep-highest-resolution
    — re-crawls and mirrors yield the same caption+perceptual-hash
    pair at many sizes, and the curated set keeps one row per pair:
    the max (w*h, doc_id) member (struct-order max, pinned
    tie-break).  Table synthesized closed-form from doc_id (40 pair
    groups x 20 members with varying dims).  Scale posture: ONE
    partial-agg groupBy on (caption, phash) — max/count combine
    map-side, bytes never shuffle (the keeper's bytes are fetched by
    a later semi-join on doc_id at real scale); no window, no skew
    beyond ordinary key balance."""
    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 800
    )
    g = F.col("doc_id") % 40
    pairs = d.select(
        "doc_id",
        F.concat(F.lit("img"), F.col("doc_id")).alias("image_id"),
        (64 * (1 + F.col("doc_id") % 8)).cast("int").alias("w"),
        (64 * (1 + F.col("doc_id") % 5)).cast("int").alias("h"),
        F.element_at(
            F.array(F.lit("jpg"), F.lit("png"), F.lit("webp")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("fmt"),
        F.concat(F.lit("a photo of item "), g).alias("caption"),
        (g * F.lit(2654435761)).cast("long").alias("phash"),
    )
    kept = (
        pairs.withColumn(
            "area", (F.col("w").cast("long") * F.col("h")).alias("area")
        )
        .groupBy("caption", "phash")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.max(F.struct("area", "doc_id")).alias("k"),
        )
        .select(
            "caption",
            "phash",
            "n_pairs",
            F.col("k")["doc_id"].alias("keep_doc"),
            F.col("k")["area"].alias("keep_area"),
        )
    )
    return kept


def q_pipeline_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule IMAGE pipeline composed in ONE Catalyst plan:
    caption junk gate (the real regexp rule set) -> (caption, phash)
    pair-dedup keeper (struct-order max) -> SDXL aspect-bucket
    histogram of the survivors — crawl-to-trainer prep as a single
    lazy DataFrame, proving the image-side operators chain with no
    materialization barriers (the text-side twin is
    `pipeline_compose`).  Synthesis is the pair_dedup/aspect_buckets
    closed form with junk captions injected at doc_id%7 (filename)
    and %11 (URL); the SQL mirror runs the same three stages.  Scale
    posture: gate is a codegen filter fused into the scan; dedup is
    ONE partial-agg groupBy; bucket assignment is expression-only on
    the ~|groups| keeper rows; final histogram is a second tiny
    groupBy."""
    from mechaml_spark.metadata import caption_quality_cols
    from mechaml_spark.multimodal import aspect_bucket_expr

    did = F.col("doc_id")
    g = did % 40
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(did < 1200)
        .select(
            "doc_id",
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit("IMG_"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                    F.lit(".JPG"),
                ),
            )
            .when(
                did % 11 == 0,
                F.concat(
                    F.lit("see http://ex"),
                    (did % 9).cast("string"),
                    F.lit(".test/p now"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("a photo of item "), g,
                    F.lit(" on a wooden table"),
                )
            )
            .alias("caption"),
            (F.lit(128) + (did * 97) % 1920).cast("int").alias("w"),
            (F.lit(128) + (did * 53) % 1080).cast("int").alias("h"),
            (g * F.lit(2654435761)).cast("long").alias("phash"),
        )
    )
    gated = d.withColumn(
        "keep", caption_quality_cols(F.col("caption"))[-1]
    ).where(F.col("keep"))
    keepers = (
        gated.withColumn(
            "area", F.col("w").cast("long") * F.col("h")
        )
        .groupBy("caption", "phash")
        .agg(F.max(F.struct("area", "doc_id", "w", "h")).alias("k"))
        .select(
            F.col("k")["w"].alias("w"), F.col("k")["h"].alias("h")
        )
    )
    ok = (
        (F.col("w").cast("long") * F.col("h") >= 262144)
        & (
            F.greatest("w", "h").cast("long")
            <= 4 * F.least("w", "h").cast("long")
        )
    )
    best = aspect_bucket_expr("w", "h")
    assigned = keepers.where(ok).select(
        best["i"].alias("bucket_i"),
        best["w"].alias("bucket_w"),
        best["h"].alias("bucket_h"),
    )
    return assigned.groupBy("bucket_i", "bucket_w", "bucket_h").agg(
        F.count("*").cast("long").alias("n_pairs")
    )


def q_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence segmentation (multimodal.silence_stats) — the trim
    and dead-air gate of an audio corpus, run through the REAL WAV
    codec both ways.  Doc d synthesizes 8 kHz int16 mono with
    L = d%3 leading silent 100 ms windows, M = 2 + d%2 loud windows
    (alternating +/-8000), T = 1 + d%2 trailing silent windows, and
    docs%5==0 append a ragged 50 ms silent tail; every reported
    count/duration is the stated closed form.  Scale posture:
    decode + windowed integer means in mapInPandas, 4 ints out,
    zero shuffle."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import multimodal as _mm

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 500
    )

    def gen(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_windows": [], "n_silent": [],
                   "lead_ms": [], "trail_ms": []}
            for did in pdf["doc_id"]:
                did = int(did)
                lead, loud, tr = did % 3, 2 + did % 2, 1 + did % 2
                win = 800  # 100 ms at 8 kHz
                sig = _np.zeros((lead + loud + tr) * win, _np.int16)
                a = lead * win
                loud_seg = _np.tile(
                    _np.array([8000, -8000], _np.int16), loud * win // 2
                )
                sig[a : a + loud * win] = loud_seg
                if did % 5 == 0:
                    sig = _np.concatenate(
                        [sig, _np.zeros(400, _np.int16)]
                    )
                data = _mm.wav_encode(sig.reshape(-1, 1), 8000)
                rate, decoded = _mm.wav_decode(data)
                nw, ns, lm, tm = _mm.silence_stats(decoded, rate)
                out["doc_id"].append(did)
                out["n_windows"].append(nw)
                out["n_silent"].append(ns)
                out["lead_ms"].append(lm)
                out["trail_ms"].append(tm)
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        gen,
        schema=(
            "doc_id long, n_windows int, n_silent int, "
            "lead_ms int, trail_ms int"
        ),
    )


def q_image_posterize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posterization probe (imaging.posterize_stats): distinct-color
    count (capped) + exact gcd quantization step over the value
    levels — the screenshots/charts-vs-photos router of an
    image-caption corpus.  Three closed-form 16x16 classes per
    doc_id%3: a 32-step quantized gradient (8 levels per channel,
    step 32, 8 distinct colors), a 2-color checker (2 distinct,
    step = the level gap 190+(did%10) gcd'd with the dark level
    spacing — stated arithmetically), and a dense ramp with step 1
    (256 distinct gray levels capped by the 16x16 = 256-pixel
    frame).  ``graphics`` gate = distinct <= 64.  Scale posture:
    decode + unique in mapInPandas, 2 ints + flag; zero shuffle."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 600
    )

    def gen(batches):
        for pdf in batches:
            out = {"doc_id": [], "distinct_colors": [], "step": []}
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.empty((16, 16, 3), dtype=_np.uint8)
                cols = _np.arange(16)
                if did % 3 == 0:
                    # 32-step quantized gradient: levels 0,32,...,224
                    px[:, :, :] = (32 * (cols // 2))[None, :, None]
                elif did % 3 == 1:
                    v0 = 20 + did % 10
                    px[:, :, :] = (v0 + 190 * (cols % 2))[None, :, None]
                else:
                    # dense ramp: 256 distinct gray levels over 256 px
                    g = _np.arange(256, dtype=_np.uint8).reshape(16, 16)
                    px[..., 0] = px[..., 1] = px[..., 2] = g
                dc, step = _im.posterize_stats(
                    _im.png_decode(_im.png_encode(px))
                )
                out["doc_id"].append(did)
                out["distinct_colors"].append(dc)
                out["step"].append(step)
            yield _pd.DataFrame(out)

    scored = d.mapInPandas(
        gen, schema="doc_id long, distinct_colors int, step int"
    )
    return scored.withColumn("graphics", F.col("distinct_colors") <= 64)


def q_image_otsu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scanned-document detection (imaging.otsu_stats): exact-integer
    Otsu threshold over the BT.601 luma histogram (cross-multiplied
    rational objective, lowest-maximizer tie-break), ink permille,
    and horizontal black/white transition permille — the gate that
    routes rendered-text/scan images to OCR instead of captioning.
    Three closed-form 16x16 gray classes per doc_id%3: period-2
    column stripes (threshold = dark level, ink 500, transitions
    1000 -> scanlike), constant (degenerate: ink 1000, transitions
    0), half-split (transitions 1000*16//240 = 66).  Spark decodes
    real PNGs and runs the real estimator (differentially tested vs
    float Otsu over 300 random images); the oracle states the class
    table.  Scale posture: decode + histogram in mapInPandas, 3 ints
    + flag out; flag is codegen; zero shuffle."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 600
    )

    def gen(batches):
        for pdf in batches:
            out = {"doc_id": [], "threshold": [], "ink_pm": [],
                   "trans_pm": []}
            for did in pdf["doc_id"]:
                did = int(did)
                v0 = 20 + did % 10
                px = _np.empty((16, 16, 3), dtype=_np.uint8)
                cols = _np.arange(16)
                if did % 3 == 0:
                    px[:, :, :] = (v0 + 190 * (cols % 2))[None, :, None]
                elif did % 3 == 1:
                    px[:, :, :] = 100 + did % 100
                else:
                    px[:, :8, :] = v0
                    px[:, 8:, :] = v0 + 190
                t, ink, tr = _im.otsu_stats(
                    _im.png_decode(_im.png_encode(px))
                )
                out["doc_id"].append(did)
                out["threshold"].append(t)
                out["ink_pm"].append(ink)
                out["trans_pm"].append(tr)
            yield _pd.DataFrame(out)

    scored = d.mapInPandas(
        gen, schema="doc_id long, threshold int, ink_pm int, trans_pm int"
    )
    return scored.withColumn(
        "scanlike",
        F.col("ink_pm").between(200, 800) & (F.col("trans_pm") >= 300),
    )


def q_exif_gps_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-side PII compliance: surgical GPS scrub
    (exif.exif_strip_gps) that removes ONLY the location sub-IFD
    while Orientation / dims / Make / DateTime survive — the
    text-side twin is `pii_scrub`.  Three fixture classes per
    doc_id%3: full EXIF WITH GPS (alternating II/MM byte order),
    EXIF without GPS (must come back byte-identical), no EXIF.
    Spark builds real APP1 payloads, scrubs, and RE-PARSES the
    scrubbed bytes to prove the GPS is gone and the keepers kept;
    the oracle states the class table.  Scale posture: header-only
    segment surgery in mapInPandas — pixels never re-encode, no
    entropy decode; zero shuffle."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import exif as _ex
    from mechaml_spark.jpeg import jpeg_encode as _jenc

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 500
    )

    def scrub(batches):
        base = _jenc(_np.full((8, 8, 3), 77, dtype=_np.uint8), quality=90)
        for pdf in batches:
            out = {"doc_id": [], "had_gps": [], "gps_after": [],
                   "orientation": [], "make": [], "unchanged": []}
            for did in pdf["doc_id"]:
                did = int(did)
                cls = did % 3
                tags = {"Make": "Cam", "Orientation": 1 + did % 8}
                if cls == 0:
                    tags.update(
                        GPSLatitudeRef="N",
                        GPSLatitude=[(52, 1), (did % 60, 1), (0, 1)],
                        GPSLongitudeRef="E",
                        GPSLongitude=[(13, 1), (did % 60, 1), (30, 1)],
                    )
                if cls == 2:
                    src = base
                else:
                    order = "II" if did % 2 == 0 else "MM"
                    src = _ex.jpeg_set_exif(
                        base, _ex.exif_payload(tags, byte_order=order)
                    )
                scrubbed, had = _ex.exif_strip_gps(src)
                after = _ex.exif_parse(scrubbed)
                out["doc_id"].append(did)
                out["had_gps"].append(had)
                out["gps_after"].append(
                    any(k.startswith("GPS") for k in after)
                )
                out["orientation"].append(after.get("Orientation"))
                out["make"].append(after.get("Make"))
                out["unchanged"].append(scrubbed == src)
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        scrub,
        schema=(
            "doc_id long, had_gps boolean, gps_after boolean, "
            "orientation int, make string, unchanged boolean"
        ),
    )


def q_text_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlay-text detection by per-third horizontal edge density
    (imaging.edge_density_thirds): caption banners / subtitle strips
    put a high-frequency band in one third of an otherwise-flat
    image, so the gate is bottom-third permille >= 300 with quiet
    upper thirds (<= 50) — uniformly busy photos (all thirds hot)
    pass.  Three closed-form 18x24 classes per doc_id%3: flat (no
    edges), bottom-third period-2 stripes (the overlay shape:
    bottom = 1000*64//136 = 470 exactly), full-frame period-1
    stripes (all thirds 1000, NOT flagged).  Spark encodes + decodes
    real PNGs and counts real luma edges; the oracle states the
    arithmetic.  Scale posture: decode + count inside mapInPandas,
    3 ints + a bool leave the worker; the flag is a codegen
    expression; zero shuffle."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 600
    )

    def gen(batches):
        for pdf in batches:
            out = {"doc_id": [], "top_pm": [], "mid_pm": [], "bot_pm": []}
            for did in pdf["doc_id"]:
                did = int(did)
                v0 = (did * 23) % 200
                px = _np.full((24, 18, 3), v0, dtype=_np.uint8)
                cols = _np.arange(18)
                if did % 3 == 1:  # bottom-third period-2 stripes
                    stripe = v0 + 55 * ((cols // 2) % 2)
                    px[16:, :, :] = stripe[None, :, None].astype(_np.uint8)
                elif did % 3 == 2:  # full-frame period-1 stripes
                    stripe = v0 + 55 * (cols % 2)
                    px[:, :, :] = stripe[None, :, None].astype(_np.uint8)
                t, m, b = _im.edge_density_thirds(
                    _im.png_decode(_im.png_encode(px))
                )
                out["doc_id"].append(did)
                out["top_pm"].append(t)
                out["mid_pm"].append(m)
                out["bot_pm"].append(b)
            yield _pd.DataFrame(out)

    scored = d.mapInPandas(
        gen, schema="doc_id long, top_pm int, mid_pm int, bot_pm int"
    )
    return scored.withColumn(
        "text_overlay",
        (F.col("bot_pm") >= 300)
        & (F.col("top_pm") <= 50)
        & (F.col("mid_pm") <= 50),
    )


def q_jpeg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG quality-factor estimation from the quantization tables —
    the standard LAION-style curation gate (drop images encoded below
    a quality threshold, no decode needed).  Each doc encodes a tiny
    plane at quality 35 + (doc_id*7 mod 61), even docs baseline
    (SOF0), odd docs PROGRESSIVE (SOF2, the libjpeg scan script);
    Spark walks the real marker stream (:func:`jpeg.parse_dqt`) and
    inverts the IJG Annex-K scaling (:func:`jpeg.quality_estimate`,
    exact for all q in 1..100 — proven by the round-trip test over
    the full range).  The oracle states q arithmetically.  Scale
    posture: mapInPandas over the first ~600 header bytes' worth of
    parse work per image — no entropy decode, no pixels; 3 small
    columns leave the worker; zero shuffle."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark.jpeg import (
        jpeg_encode,
        jpeg_encode_progressive,
        quality_estimate,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def est(batches):
        for pdf in batches:
            out = {"doc_id": [], "q_est": [], "exact": [], "n_tables": []}
            for did in pdf["doc_id"]:
                did = int(did)
                q = 35 + (did * 7) % 61
                px = _np.full((8, 8, 3), (did * 29) % 251, dtype=_np.uint8)
                enc = jpeg_encode_progressive if did % 2 else jpeg_encode
                qe, exact, nt = quality_estimate(enc(px, quality=q))
                out["doc_id"].append(did)
                out["q_est"].append(qe)
                out["exact"].append(exact)
                out["n_tables"].append(nt)
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        est, schema="doc_id long, q_est int, exact boolean, n_tables int"
    )


def q_image_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive (SOF2) JPEG decode, oracle-checked: 16x16 images
    of four constant 8x8 quadrants keyed by doc_id — even docs encode
    baseline (SOF0), odd docs encode PROGRESSIVE with the libjpeg-
    shaped scan script (spectral selection + successive approximation,
    EOBn runs across the four blocks) — then the REAL decoder + the
    shared mapInPandas feature stage.  Constant blocks at q95 decode
    exactly (DC step 2, the `image_jpeg_features` argument, which the
    progressive stream inherits because it carries bitwise-identical
    quantized coefficients), so mean*1000 = 250 * (sum of the four
    quadrant values) is a closed form DuckDB shares."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import multimodal
    from mechaml_spark.jpeg import jpeg_encode, jpeg_encode_progressive

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.empty((16, 16, 3), dtype=_np.uint8)
                for q in range(4):
                    ys, xs = (q // 2) * 8, (q % 2) * 8
                    px[ys : ys + 8, xs : xs + 8, 0] = (did * 7 + q * 17) % 251
                    px[ys : ys + 8, xs : xs + 8, 1] = (did * 11 + q * 17) % 251
                    px[ys : ys + 8, xs : xs + 8, 2] = (did * 13 + q * 17) % 251
                enc = jpeg_encode if did % 2 == 0 else jpeg_encode_progressive
                rows.append(
                    {"doc_id": did, "bytes": enc(px, quality=95), "fmt": "jpg"}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    feats = multimodal.image_features(media)
    return feats.select(
        "doc_id",
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_image_png_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG decode breadth, oracle-checked: per doc_id one of the four
    real-web PNG shapes — doc_id % 4 = 0: 8-bit grayscale; 1: 4-bit
    palette (8 entries, index (x+y)%8 so each entry covers exactly 32
    of the 256 pixels); 2: RGBA (alpha dropped by decode); 3: RGB
    Adam7-interlaced with four constant quadrants — through the same
    mapInPandas feature stage.  All lossless, so means are exact
    closed forms DuckDB mirrors (gray: v; palette: sum(entries)/8;
    rgba: v; interlaced: sum(quadrants)/4)."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        yy, xx = _np.mgrid[0:16, 0:16]
        idx = ((yy + xx) % 8).astype(_np.uint8)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                m = did % 4
                if m == 0:
                    g = _np.full((16, 16), (did * 7) % 251, _np.uint8)
                    data = _im.png_encode_ext(g, 0)
                elif m == 1:
                    pal = _np.stack(
                        [
                            _np.array(
                                [(did * f + k * 5) % 251 for k in range(8)],
                                _np.uint8,
                            )
                            for f in (7, 11, 13)
                        ],
                        axis=1,
                    )
                    data = _im.png_encode_ext(idx, 3, bit_depth=4, palette=pal)
                elif m == 2:
                    px = _np.empty((16, 16, 4), _np.uint8)
                    px[..., 0] = (did * 7) % 251
                    px[..., 1] = (did * 11) % 251
                    px[..., 2] = (did * 13) % 251
                    px[..., 3] = did % 256
                    data = _im.png_encode_ext(px, 6)
                else:
                    px = _np.empty((16, 16, 3), _np.uint8)
                    for q in range(4):
                        ys, xs = (q // 2) * 8, (q % 2) * 8
                        px[ys : ys + 8, xs : xs + 8, 0] = (did * 7 + q * 17) % 251
                        px[ys : ys + 8, xs : xs + 8, 1] = (did * 11 + q * 17) % 251
                        px[ys : ys + 8, xs : xs + 8, 2] = (did * 13 + q * 17) % 251
                    data = _im.png_encode_ext(px, 2, interlace=1)
                rows.append({"doc_id": did, "bytes": data, "fmt": "png"})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    feats = multimodal.image_features(media)
    return feats.select(
        "doc_id",
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_image_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata pipeline, oracle-checked end to end: JPEGs carry
    a REAL APP1 Exif segment (TIFF IFD0 + Exif + GPS sub-IFDs, built
    by :func:`mechaml_spark.exif.exif_payload` — even docs
    little-endian II, odd docs big-endian MM, so both wire orders are
    exercised), parsed back by the header-only ``exif_metadata``
    stage, then privacy-scrubbed with ``strip_exif`` and re-parsed to
    prove the GPS tags are gone.  Every tag value is a closed form of
    doc_id, so DuckDB mirrors the whole row without parsing a byte."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import exif as _exif
    from mechaml_spark import multimodal
    from mechaml_spark.jpeg import jpeg_encode as _jenc

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.full((16, 16, 3), (did * 7) % 251, _np.uint8)
                tags = {
                    "Make": f"cam{did % 5}",
                    "Model": f"m{did % 7}",
                    "Orientation": 1 + did % 8,
                    "DateTime": "2021:01:01 00:00:00",
                    "PixelXDimension": 16,
                    "PixelYDimension": 16,
                    "GPSLatitudeRef": "N" if did % 2 == 0 else "S",
                    "GPSLatitude": [
                        (did % 90, 1),
                        (did % 60, 1),
                        ((did * 37) % 6000, 100),
                    ],
                    "GPSLongitudeRef": "E" if did % 3 == 0 else "W",
                    "GPSLongitude": [
                        (did % 180, 1),
                        ((did * 3) % 60, 1),
                        ((did * 41) % 6000, 100),
                    ],
                }
                payload = _exif.exif_payload(
                    tags, byte_order="II" if did % 2 == 0 else "MM"
                )
                data = _exif.jpeg_set_exif(_jenc(px, quality=95), payload)
                rows.append({"doc_id": did, "bytes": data, "fmt": "jpg"})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    parsed = multimodal.exif_metadata(media)
    scrubbed = multimodal.exif_metadata(
        multimodal.strip_exif(parsed), bytes_col="scrubbed", out_col="post"
    )
    return scrubbed.select(
        "doc_id",
        F.col("exif")["has_exif"].alias("has_exif"),
        F.col("exif")["orientation"].alias("orientation"),
        F.col("exif")["make"].alias("make"),
        F.col("exif")["model"].alias("model"),
        F.col("exif")["px_w"].alias("px_w"),
        F.col("exif")["px_h"].alias("px_h"),
        F.col("exif")["lat_ref"].alias("lat_ref"),
        F.col("exif")["lat_deg"].alias("lat_deg"),
        F.col("exif")["lat_min"].alias("lat_min"),
        F.col("exif")["lat_sec_num"].alias("lat_sec_num"),
        F.col("exif")["lat_sec_den"].alias("lat_sec_den"),
        F.col("post")["has_exif"].alias("scrub_has_exif"),
    )


def q_image_tiff_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncompressed-TIFF decode through the shared feature stage:
    even docs 8-bit grayscale (decode expands to RGB), odd docs RGB —
    both constant planes, so means are exact closed forms.  The IFD
    walk is the same code path the EXIF parser uses, pinned here
    against real strip-based TIFF bytes."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    px = _np.full((12, 16), (did * 7) % 251, _np.uint8)
                else:
                    px = _np.empty((12, 16, 3), _np.uint8)
                    px[..., 0] = (did * 7) % 251
                    px[..., 1] = (did * 11) % 251
                    px[..., 2] = (did * 13) % 251
                rows.append(
                    {"doc_id": did, "bytes": _im.tiff_encode(px),
                     "fmt": "tiff"}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    feats = multimodal.image_features(media)
    return feats.select(
        "doc_id",
        F.col("features")["w"].alias("w"),
        F.col("features")["h"].alias("h"),
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_image_ico_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windows ICO (favicon) decode through the shared feature stage:
    even docs the classic doubled-height 24-bit DIB entry, odd docs a
    PNG-compressed entry (Vista+ form) — both constant planes, so
    means are exact closed forms.  Every crawl fetches favicons, so
    the 9th real image container rides the same mapInPandas stage."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.empty((12, 16, 3), _np.uint8)
                px[..., 0] = (did * 7) % 251
                px[..., 1] = (did * 11) % 251
                px[..., 2] = (did * 13) % 251
                inner = "bmp" if did % 2 == 0 else "png"
                rows.append(
                    {"doc_id": did, "bytes": _im.ico_encode(px, inner=inner),
                     "fmt": "ico"}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    feats = multimodal.image_features(media)
    return feats.select(
        "doc_id",
        F.col("features")["w"].alias("w"),
        F.col("features")["h"].alias("h"),
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_image_qoi_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QOI (qoiformat.org) decode through the shared feature stage.
    Gradient content (R ramps along x, G along y, B constant) streams
    through the DIFF/LUMA/RGB op mix rather than degenerate runs; the
    per-channel means are exact closed forms (base + 7.5 / base + 5.5
    / base), so the oracle is pure SQL.  Tenth real image container
    on the same mapInPandas stage."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                yy, xx = _np.mgrid[0:12, 0:16]
                px = _np.empty((12, 16, 3), _np.uint8)
                px[..., 0] = (did * 7) % 200 + xx
                px[..., 1] = (did * 11) % 200 + yy
                px[..., 2] = (did * 13) % 251
                rows.append(
                    {"doc_id": did, "bytes": _im.qoi_encode(px),
                     "fmt": "qoi"}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    feats = multimodal.image_features(media)
    return feats.select(
        "doc_id",
        F.col("features")["w"].alias("w"),
        F.col("features")["h"].alias("h"),
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_image_webp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless WebP (VP8L, :mod:`mechaml_spark.webp`) decode through
    the shared feature stage — the eleventh image container on the
    same mapInPandas shape.  Gradient content (R ramps along x, G
    along y, B constant, 192 distinct colors) is encoded with the
    color-indexing transform for even doc_ids and subtract-green for
    odd ones, so BOTH transform paths cross the oracle; VP8L is
    lossless, so the per-channel means are the same closed forms as
    the QOI query."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import multimodal
    from mechaml_spark.webp import webp_encode

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        yy, xx = _np.mgrid[0:12, 0:16]
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.empty((12, 16, 3), _np.uint8)
                px[..., 0] = (did * 7) % 200 + xx
                px[..., 1] = (did * 11) % 200 + yy
                px[..., 2] = (did * 13) % 251
                mode = "palette" if did % 2 == 0 else "subtract-green"
                rows.append(
                    {"doc_id": did, "bytes": webp_encode(px, mode=mode),
                     "fmt": "webp"}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    feats = multimodal.image_features(media)
    return feats.select(
        "doc_id",
        F.col("features")["w"].alias("w"),
        F.col("features")["h"].alias("h"),
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_image_tiff_compressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-TIFF decode through the shared feature stage: the
    QOI gradient content in LZW / Deflate / PackBits TIFFs (doc_id%3),
    horizontal predictor on for doc_id%2==0, multi-strip for
    doc_id%5==0 — nine parse-path combinations, one closed-form
    oracle.  The LZW early-change convention is pinned against the
    real libtiff in tests/test_imaging.py."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        yy, xx = _np.mgrid[0:12, 0:16]
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.empty((12, 16, 3), _np.uint8)
                px[..., 0] = (did * 7) % 200 + xx
                px[..., 1] = (did * 11) % 200 + yy
                px[..., 2] = (did * 13) % 251
                comp = (5, 8, 32773)[did % 3]
                data = _im.tiff_encode(
                    px,
                    compression=comp,
                    predictor=2 if did % 2 == 0 else 1,
                    rows_per_strip=4 if did % 5 == 0 else None,
                )
                rows.append({"doc_id": did, "bytes": data, "fmt": "tiff"})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    feats = multimodal.image_features(media)
    return feats.select(
        "doc_id",
        F.col("features")["w"].alias("w"),
        F.col("features")["h"].alias("h"),
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_image_pixel_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-format pixel-exact image dedup — the pipeline op a
    content hash over ENCODED bytes cannot do: the same pixels saved
    as PNG vs BMP vs PPM vs TIFF vs QOI hash differently as bytes but
    identically after decode.  Stage shape at 100 TB: decode inside
    mapInPandas (bytes never shuffle), emit a 32-byte canonical-pixel
    digest, then a hash-partitioned groupBy on the digest — the
    shuffle carries (digest, doc_id, fmt), never pixels.

    Corpus: doc_id < 280, pixel content keyed by gid = doc_id % 60,
    container cycling with doc_id // 60, so gids < 40 exist in all
    five formats and gids >= 40 in four — group sizes the oracle
    states in closed form."""
    import hashlib as _hashlib

    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im

    fmts = ["png", "bmp", "ppm", "tiff", "qoi"]
    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 280
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                gid = did % 60
                yy, xx = _np.mgrid[0:12, 0:16]
                px = _np.empty((12, 16, 3), _np.uint8)
                px[..., 0] = (gid * 7) % 200 + xx
                px[..., 1] = (gid * 11) % 200 + yy
                px[..., 2] = (gid * 13) % 251
                fmt = fmts[did // 60]
                rows.append(
                    {"doc_id": did, "bytes": _im.encode(px, fmt), "fmt": fmt}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")

    def keyed(batches):
        for pdf in batches:
            keys = []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                px = _im.decode(bytes(data), fmt)
                h = _hashlib.sha256()
                h.update(_np.int64(px.shape[0]).tobytes())
                h.update(_np.int64(px.shape[1]).tobytes())
                h.update(_np.ascontiguousarray(px).tobytes())
                keys.append(h.hexdigest())
            yield _pd.DataFrame(
                {"doc_id": pdf["doc_id"], "fmt": pdf["fmt"], "pxkey": keys}
            )

    hashed = media.mapInPandas(
        keyed, schema="doc_id long, fmt string, pxkey string"
    )
    return (
        hashed.groupBy("pxkey")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.concat_ws(",", F.sort_array(F.collect_set("fmt"))).alias("fmts"),
        )
        .select(
            "keeper_doc_id",
            "n_copies",
            F.size(F.split("fmts", ",")).alias("n_formats"),
            "fmts",
        )
    )


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC 1.1 sink -> source roundtrip (mechaml_spark.warc): each
    document becomes a ``response`` record wrapping a minimal HTTP
    response; segments are one-per-partition (no shuffle — the
    Common Crawl sharding shape), then parsed back by Content-Length
    framing.  The WARC Content-Length is a closed form over the body
    byte length (63 fixed header bytes + the digits of the length +
    the body), so the oracle is pure SQL."""
    from mechaml_spark import warc as _warc

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 300)
        .select(
            F.col("doc_id"),
            F.concat(F.lit("http://docs.test/"), F.col("doc_id")).alias("uri"),
            F.col("text").alias("body"),
            F.lit("2026-01-01T00:00:00Z").alias("date"),
        )
    )
    segs = _warc.to_warc_segments(d)
    recs = _warc.parse_warc_segments(segs)
    block_s = F.col("block").cast("string")
    return recs.select(
        F.element_at(F.split("uri", "/"), -1).cast("long").alias("doc_id"),
        "warc_type",
        "content_length",
        F.substring(block_s, 10, 3).cast("int").alias("status"),
        F.substring(F.split(block_s, "\r\n\r\n", 2)[1], 1, 12).alias(
            "body_prefix"
        ),
    )


def q_sitemap_gz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzipped sitemaps (the sitemap.xml.gz convention): even docs
    carry gzip-member bytes, odd docs plain UTF-8 XML — BOTH flow
    through the one transparent decode stage (sitemap.gunzip_text,
    magic-byte dispatch) into the same urlset parser; a corrupt-gzip
    class (doc_id%7==0, even) decodes to NULL and contributes no
    rows.  The oracle lists the expected entries closed-form."""
    import pandas as _pd

    from mechaml_spark import sitemap as _sm
    from mechaml_spark.warc import gzip_member

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                xml = (
                    '<?xml version="1.0"?><urlset>'
                    f"<url><loc>http://gz{did % 10}.test/a{did}</loc>"
                    "<priority>0.5</priority></url>"
                    f"<url><loc> HTTP://GZ{did % 10}.TEST:80/b{did} "
                    "</loc></url></urlset>"
                ).encode("utf-8")
                if did % 2 == 0:
                    b = (
                        b"\x1f\x8b\x00corrupt"
                        if did % 7 == 0
                        else gzip_member(xml)
                    )
                else:
                    b = xml
                rows.append({"doc_id": did, "bytes": b})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary")
    decoded = _sm.gunzip_text(media)
    return _sm.parse_sitemaps(decoded, keep_cols=("doc_id",)).select(
        "doc_id", "kind", F.col("pos").cast("long").alias("pos"),
        "loc", "priority",
    )


def q_sitemap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemaps-protocol extraction (mechaml_spark.sitemap): even
    docs carry a ``<urlset>`` (3 entries exercising canonicalization
    — uppercase scheme/host, default :80, dot segments, ``&amp;`` —
    plus absent lastmod/priority fields), odd docs a
    ``<sitemapindex>`` (2 children).  Parsing is regexp_extract_all +
    posexplode, JVM-side; locs go through the frontier's
    canonicalizer so they dedupe against crawl-discovered URLs."""
    from mechaml_spark import sitemap as _sm

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    h = F.col("doc_id") % 20
    dd = F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
    base = F.concat(F.lit("http://host"), h, F.lit(".test"))
    urlset = F.concat(
        F.lit('<?xml version="1.0"?><urlset '
              'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
              "<url><loc> HTTP://Host"),
        h,
        F.lit(".TEST:80/s"),
        F.col("doc_id"),
        F.lit("/p0 </loc><lastmod>2026-01-"),
        dd,
        F.lit("</lastmod><priority>0.1</priority></url>\n<url><loc>"),
        base,
        F.lit("/s"),
        F.col("doc_id"),
        F.lit("/p1?a=1&amp;b=2</loc><priority>0.9</priority></url>\n"
              "<url><loc>"),
        base,
        F.lit("/s"),
        F.col("doc_id"),
        F.lit("/x/../p2</loc><lastmod>2026-02-"),
        dd,
        F.lit("</lastmod></url>\n</urlset>"),
    )
    index = F.concat(
        F.lit('<?xml version="1.0"?><sitemapindex '
              'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
              "<sitemap><loc>"),
        base,
        F.lit("/sitemaps/"),
        F.col("doc_id"),
        F.lit("-0.xml</loc><lastmod>2026-03-"),
        dd,
        F.lit("</lastmod></sitemap>\n<sitemap><loc>"),
        base,
        F.lit("/sitemaps/"),
        F.col("doc_id"),
        F.lit("-1.xml</loc><lastmod>2026-03-"),
        dd,
        F.lit("</lastmod></sitemap>\n</sitemapindex>"),
    )
    pages = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, urlset).otherwise(index).alias(
            "body"
        ),
    )
    return _sm.parse_sitemaps(pages, keep_cols=("doc_id",))


def q_image_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF-orientation normalization (multimodal.normalize_
    orientation): every doc is a 16x16 four-quadrant-constant JPEG
    (q95 round-trips bit-exact on 8x8-aligned constant blocks) whose
    pixels are stored DISTORTED per its EXIF Orientation tag
    (1 + doc_id % 8 — all eight dihedral elements), so only the
    correct upright transform restores the canonical quadrant layout.
    The oracle states the restored corners in closed form; a wrong
    (or identity) transform permutes them and hash-mismatches.  Also
    proves the baked-out bytes carry no EXIF anymore."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import exif as _exif
    from mechaml_spark import multimodal
    from mechaml_spark.jpeg import jpeg_decode as _jdec
    from mechaml_spark.jpeg import jpeg_encode as _jenc

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 240
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                tag = 1 + did % 8
                up = _np.empty((16, 16, 3), _np.uint8)
                up[:8, :8] = (did * 7) % 200 + 10
                up[:8, 8:] = (did * 11) % 200 + 20
                up[8:, :8] = (did * 13) % 200 + 5
                up[8:, 8:] = (did * 17) % 200 + 15
                stored = _np.ascontiguousarray(
                    multimodal.ORIENT_DISTORT[tag](up)
                )
                data = _exif.jpeg_set_exif(
                    _jenc(stored, quality=95),
                    _exif.exif_payload({"Orientation": tag}),
                )
                rows.append({"doc_id": did, "bytes": data})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary")
    fixed = multimodal.normalize_orientation(media)

    def corners(batches):
        for pdf in batches:
            rows = []
            for did, up in zip(pdf["doc_id"], pdf["upright"]):
                px = _jdec(bytes(up["bytes"]))
                rows.append(
                    {
                        "doc_id": int(did),
                        "orientation": int(up["orientation"]),
                        "w": int(up["w"]),
                        "h": int(up["h"]),
                        "tl": int(px[0, 0, 0]),
                        "tr": int(px[0, 15, 0]),
                        "bl": int(px[15, 0, 0]),
                        "br": int(px[15, 15, 0]),
                        "exif_gone": not _exif.exif_parse(
                            bytes(up["bytes"])
                        ),
                    }
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "orientation", "w", "h",
                    "tl", "tr", "bl", "br", "exif_gone",
                ],
            )

    return fixed.mapInPandas(
        corners,
        schema=(
            "doc_id long, orientation int, w int, h int, "
            "tl int, tr int, bl int, br int, exif_gone boolean"
        ),
    )


def q_image_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail preprocessing chain (multimodal.thumbnail_images):
    decode -> exact 2x2 box-filter downsample -> center crop 8x8 ->
    re-encode, cycling PNG/BMP/QOI containers.  Source images are
    32x32 four-quadrant constants, so the downsample is exact, the
    crop corners land one per quadrant, and the whole row is a
    closed form the oracle states directly."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark import multimodal

    fmts = ["png", "bmp", "qoi"]
    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 240
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.empty((32, 32, 3), _np.uint8)
                px[:16, :16] = (did * 7) % 200 + 10
                px[:16, 16:] = (did * 11) % 200 + 20
                px[16:, :16] = (did * 13) % 200 + 5
                px[16:, 16:] = (did * 17) % 200 + 15
                fmt = fmts[did % 3]
                rows.append(
                    {"doc_id": did, "bytes": _im.encode(px, fmt), "fmt": fmt}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    thumbed = multimodal.thumbnail_images(media, 2, 2, 8, 8)

    def corners(batches):
        for pdf in batches:
            rows = []
            for did, fmt, tb in zip(
                pdf["doc_id"], pdf["fmt"], pdf["thumb"]
            ):
                px = _im.decode(bytes(tb), str(fmt))
                rows.append(
                    {
                        "doc_id": int(did),
                        "fmt": str(fmt),
                        "w": int(px.shape[1]),
                        "h": int(px.shape[0]),
                        "tl": int(px[0, 0, 0]),
                        "tr": int(px[0, 7, 0]),
                        "bl": int(px[7, 0, 0]),
                        "br": int(px[7, 7, 0]),
                    }
                )
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "fmt", "w", "h", "tl", "tr", "bl", "br"],
            )

    return thumbed.mapInPandas(
        corners,
        schema="doc_id long, fmt string, w int, h int, "
        "tl int, tr int, bl int, br int",
    )


def q_robots_sitemap_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-bootstrap discovery chain, end to end: robots.txt
    ``Sitemap:`` directives (mixed case, comment decoys, URL needing
    canonicalization) -> declared sitemap URLs -> per-sitemap
    ``<urlset>`` bodies -> seed URLs.  Everything expression-only;
    even hosts declare two sitemaps, odd hosts one, each sitemap
    listing two pages — all closed forms."""
    from mechaml_spark import sitemap as _sm

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    h = F.col("doc_id")
    robots = F.concat(
        F.lit("# Sitemap: http://decoy.test/ignored.xml\n"
              "User-agent: *\nDisallow: /private\n"
              "SiteMap: HTTP://Host"),
        h,
        F.lit(".TEST:80/sm/main.xml\n"),
        F.when(
            h % 2 == 0,
            F.concat(
                F.lit("sitemap: http://host"), h, F.lit(".test/sm/extra.xml\n")
            ),
        ).otherwise(F.lit("")),
    )
    discovered = _sm.robots_sitemap_discovery(
        d.select("doc_id", robots.alias("body")), keep_cols=("doc_id",)
    )
    sm_name = F.regexp_extract("sitemap_url", r"sm/(\w+)\.xml", 1)
    xml = F.concat(
        F.lit("<urlset><url><loc>http://host"),
        F.col("doc_id"),
        F.lit(".test/"),
        sm_name,
        F.lit("/p0</loc></url><url><loc>http://host"),
        F.col("doc_id"),
        F.lit(".test/"),
        sm_name,
        F.lit("/p1</loc></url></urlset>"),
    )
    sitemaps = discovered.select("doc_id", "sm_pos", xml.alias("body"))
    return _sm.parse_sitemaps(
        sitemaps, keep_cols=("doc_id", "sm_pos")
    ).select("doc_id", "sm_pos", "pos", "loc")


def q_image_resize_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear resize (multimodal.resize_images method='bilinear',
    fixed-point half-pixel centers): 16x16 even-slope ramps downscale
    2x to exactly a + 2 + 4*(ox + oy) at every output pixel, so all
    four corners are closed forms; a wrong convention (corner-aligned
    sampling, nearest fallback) shifts them."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 240
    )

    def gen(batches):
        yy, xx = _np.mgrid[0:16, 0:16]
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                a = (did * 7) % 190
                px = _np.empty((16, 16, 3), _np.uint8)
                px[...] = (a + 2 * xx + 2 * yy)[..., None]
                rows.append(
                    {"doc_id": did, "bytes": _im.png_encode(px),
                     "fmt": "png"}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    resized = multimodal.resize_images(media, 8, 8, method="bilinear")

    def corners(batches):
        for pdf in batches:
            rows = []
            for did, rb in zip(pdf["doc_id"], pdf["resized"]):
                px = _im.png_decode(bytes(rb))
                rows.append(
                    {
                        "doc_id": int(did),
                        "w": int(px.shape[1]),
                        "h": int(px.shape[0]),
                        "tl": int(px[0, 0, 0]),
                        "tr": int(px[0, 7, 0]),
                        "bl": int(px[7, 0, 0]),
                        "br": int(px[7, 7, 0]),
                    }
                )
            yield _pd.DataFrame(
                rows, columns=["doc_id", "w", "h", "tl", "tr", "bl", "br"]
            )

    return resized.mapInPandas(
        corners,
        schema="doc_id long, w int, h int, tl int, tr int, bl int, br int",
    )


def q_pdf_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text extraction (:mod:`mechaml_spark.pdfkit`) — the web's
    second document format through a real parse: two-page PDFs with
    escape-needing text (parens, backslash), FlateDecode-compressed
    streams for even docs and plain for odd, extracted inside
    mapInPandas.  The expected text is a closed form the oracle
    rebuilds with string concatenation."""
    import pandas as _pd

    from mechaml_spark.pdfkit import extract_pdf_text_stage, pdf_write

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                pages = [
                    [f"Doc {did} (report) \\ draft",
                     f"Value: {(did * 7) % 100}"],
                    [f"Appendix {did % 5}"],
                ]
                rows.append({
                    "doc_id": did,
                    "bytes": pdf_write(pages, compress=did % 2 == 0),
                })
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary")
    out = extract_pdf_text_stage(media)
    return out.select(
        "doc_id",
        F.col("pdf_text").alias("text"),
        F.length("pdf_text").alias("n_chars"),
    )


def q_span_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-SPAN exact-substring dedup (the Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better"
    operator, at window size 8): every 8-token sliding window is
    hashed; windows occurring in >1 document are duplicated spans,
    and every token covered by a flagged window is dropped.

    Corpus: docs carry a unique prefix (3+d%3 tokens) and suffix
    (2+d%2), plus — when (d%20)%4 < 2 — a 10-token span shared by all
    20 docs with the same d%20.  Exactly the 3 windows fully inside
    the span duplicate, covering exactly the 10 span tokens, so
    kept/dropped counts are closed forms.

    Scale shape: explode windows -> groupBy(xxhash64(window)) count
    (shuffle carries an 8-byte hash, never text) -> hash join back ->
    per-doc coverage via a higher-order filter over the token array.
    No window function over the corpus, no all-pairs comparison."""
    W = 8
    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )
    did = F.col("doc_id")
    shared = (did % 20 % 4) < 2
    prefix = F.transform(
        F.sequence(F.lit(0), (2 + did % 3).cast("int")),
        lambda i: F.concat(F.lit("u"), did, F.lit("_"), i),
    )
    span = F.when(
        shared,
        F.transform(
            F.sequence(F.lit(0), F.lit(9)),
            lambda i: F.concat(F.lit("s"), did % 20, F.lit("_"), i),
        ),
    ).otherwise(F.array().cast("array<string>"))
    suffix = F.transform(
        F.sequence(F.lit(0), (1 + did % 2).cast("int")),
        lambda i: F.concat(F.lit("v"), did, F.lit("_"), i),
    )
    docs = d.select(
        "doc_id", F.concat(prefix, span, suffix).alias("toks")
    )
    wins = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= W,
                F.sequence(F.lit(0), F.size("toks") - W),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("wstart"),
        F.col("toks"),
    ).select(
        "doc_id",
        "wstart",
        F.xxhash64(
            F.array_join(F.slice("toks", F.col("wstart") + 1, W), " ")
        ).alias("wh"),
    )
    dup = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("wh")
    )
    flagged = (
        wins.join(dup, "wh")
        .groupBy("doc_id")
        .agg(
            F.collect_set("wstart").alias("flags"),
            F.count(F.lit(1)).alias("n_dup_windows"),
        )
    )
    joined = docs.join(flagged, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce("flags", F.array().cast("array<int>")).alias("flags"),
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
    )
    kept = F.filter(
        F.col("toks"),
        lambda _t_, i: ~F.exists(
            F.col("flags"), lambda s: (i >= s) & (i < s + W)
        ),
    )
    return joined.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
        F.size(kept).alias("n_kept"),
    )


def q_revisit_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl freshness scheduling
    (:func:`mechaml_spark.frontier.revisit.revisit_schedule`, the Cho
    & Garcia-Molina change-rate-proportional policy): synthesized
    per-URL fetch histories — doc d fetched K=2+d%4 times every
    T=60+d%60 ticks, content hash changing every J=1+d%3 fetches —
    flow through the real window-lag transition count + per-URL agg;
    next_due = last_ts + clamp(span//(changes+1), 100, 10000), due
    vs now=5000.  Everything integer and expression-only, so the
    oracle is pure SQL."""
    from mechaml_spark.frontier.revisit import revisit_schedule

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )
    base = d.select(
        "doc_id",
        (2 + F.col("doc_id") % 4).alias("kk"),
        (60 + F.col("doc_id") % 60).alias("t"),
        (1 + F.col("doc_id") % 3).alias("j"),
        (F.col("doc_id") % 97).alias("t0"),
    )
    hist = base.select(
        "doc_id", "t", "j", "t0",
        F.explode(F.sequence(F.lit(0), F.col("kk") - 1)).alias("k"),
    ).select(
        F.concat(
            F.lit("http://host"), F.col("doc_id") % 40,
            F.lit(".test/p"), F.col("doc_id"),
        ).alias("url"),
        (F.col("t0") + F.col("k") * F.col("t")).alias("ts"),
        F.concat(
            F.lit("h"), F.floor(F.col("k") / F.col("j"))
        ).alias("content_hash"),
    )
    return revisit_schedule(
        hist, now_ts=5000, min_interval=100, max_interval=10000
    )


def q_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational table extraction (:func:`mechaml_spark.tables.
    extract_tables`): every page carries a thead/tbody table with a
    colspan=2 cell and a NESTED table (own table_idx, text excluded
    from the outer cell), every 3rd page a leading EMPTY table that
    still consumes an index, every 2nd page a rowspan=2 table — so
    the oracle enumerates the exact grid (spanned positions repeat
    the cell text) with a closed-form index offset.  Grid semantics
    drift (span fill, section attribution, nested-table leakage) is
    a hash miss."""
    from mechaml_spark.tables import extract_tables

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 500
    )
    i = d.doc_id
    body = F.concat(
        F.when(i % 3 == 0, F.lit("<p>decoy</p><table></table>"))
        .otherwise(F.lit("")),
        F.lit('<table><thead><tr><th>H0</th><th>H1 '), i,
        F.lit('</th></tr></thead><tbody><tr><td colspan="2">w '), i,
        F.lit("</td></tr><tr><td>a "), i,
        F.lit("</td><td><table><tr><td>n "), i,
        F.lit("</td></tr></table> x "), i,
        F.lit("</td></tr></tbody></table>"),
        F.when(
            i % 2 == 0,
            F.concat(
                F.lit('<table><tr><td rowspan="2">r '), i,
                F.lit("</td><td>b "), i,
                F.lit("</td></tr><tr><td>c "), i,
                F.lit("</td></tr></table>"),
            ),
        ).otherwise(F.lit("")),
    )
    pages = d.select("doc_id", body.alias("body"))
    return extract_tables(pages)


_HTML_TABLES_ORACLE = """
    WITH d AS (
        SELECT doc_id, CAST(doc_id % 3 = 0 AS INT) AS t
        FROM documents WHERE doc_id < 500
    )
    SELECT doc_id, t AS table_idx, 0 AS row_idx, 0 AS col_idx,
           'H0' AS cell, TRUE AS is_header, 'thead' AS section FROM d
    UNION ALL SELECT doc_id, t, 0, 1, 'H1 ' || doc_id, TRUE, 'thead' FROM d
    UNION ALL SELECT doc_id, t, 1, 0, 'w ' || doc_id, FALSE, 'tbody' FROM d
    UNION ALL SELECT doc_id, t, 1, 1, 'w ' || doc_id, FALSE, 'tbody' FROM d
    UNION ALL SELECT doc_id, t, 2, 0, 'a ' || doc_id, FALSE, 'tbody' FROM d
    UNION ALL SELECT doc_id, t, 2, 1, 'x ' || doc_id, FALSE, 'tbody' FROM d
    UNION ALL SELECT doc_id, t + 1, 0, 0, 'n ' || doc_id, FALSE, '' FROM d
    UNION ALL SELECT doc_id, t + 2, 0, 0, 'r ' || doc_id, FALSE, ''
        FROM d WHERE doc_id % 2 = 0
    UNION ALL SELECT doc_id, t + 2, 0, 1, 'b ' || doc_id, FALSE, ''
        FROM d WHERE doc_id % 2 = 0
    UNION ALL SELECT doc_id, t + 2, 1, 0, 'r ' || doc_id, FALSE, ''
        FROM d WHERE doc_id % 2 = 0
    UNION ALL SELECT doc_id, t + 2, 1, 1, 'c ' || doc_id, FALSE, ''
        FROM d WHERE doc_id % 2 = 0
"""


def q_microdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema.org microdata triples (:func:`mechaml_spark.microdata.
    extract_microdata`): every page carries a Product item exercising
    each per-tag value rule (text span, img src, multi-token
    ``itemprop="url brand"`` on an ``<a>``, meta content, time
    datetime) plus a NESTED Offer item (``#item:`` linkage), every
    2nd page an untyped item (NULL ``@type``), and an orphan
    ``itemprop`` decoy outside any scope that must be ignored.  The
    oracle enumerates the exact triple set."""
    from mechaml_spark.microdata import extract_microdata

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )
    i = d.doc_id
    body = F.concat(
        F.lit('<div itemscope itemtype="https://schema.org/Product">'
              '<span itemprop="name">Widget '), i,
        F.lit('</span><img itemprop="image" src="/i'), i,
        F.lit('.png"><a itemprop="url brand" href="/p'), i,
        F.lit('">go</a><meta itemprop="sku" content="S'), i,
        F.lit('"><time itemprop="released" datetime="2021-07-0'),
        i % 9 + 1,
        F.lit('">July</time><div itemprop="offers" itemscope '
              'itemtype="https://schema.org/Offer">'
              '<span itemprop="price">'), i % 90,
        F.lit(".99</span></div></div>"
              '<span itemprop="orphan">ignored</span>'),
        F.when(
            i % 2 == 0,
            F.concat(F.lit('<div itemscope><b itemprop="x">untyped '),
                     i, F.lit("</b></div>")),
        ).otherwise(F.lit("")),
    )
    pages = d.select("doc_id", body.alias("body"))
    return extract_microdata(pages)


_MICRODATA_ORACLE = """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 400)
    SELECT doc_id, 0 AS item_idx, '@type' AS prop,
           'https://schema.org/Product' AS value FROM d
    UNION ALL SELECT doc_id, 0, 'name', 'Widget ' || doc_id FROM d
    UNION ALL SELECT doc_id, 0, 'image', '/i' || doc_id || '.png' FROM d
    UNION ALL SELECT doc_id, 0, 'url', '/p' || doc_id FROM d
    UNION ALL SELECT doc_id, 0, 'brand', '/p' || doc_id FROM d
    UNION ALL SELECT doc_id, 0, 'sku', 'S' || doc_id FROM d
    UNION ALL SELECT doc_id, 0, 'released',
        '2021-07-0' || (doc_id % 9 + 1) FROM d
    UNION ALL SELECT doc_id, 0, 'offers', '#item:1' FROM d
    UNION ALL SELECT doc_id, 1, '@type', 'https://schema.org/Offer' FROM d
    UNION ALL SELECT doc_id, 1, 'price', (doc_id % 90) || '.99' FROM d
    UNION ALL SELECT doc_id, 2, '@type', CAST(NULL AS VARCHAR)
        FROM d WHERE doc_id % 2 = 0
    UNION ALL SELECT doc_id, 2, 'x', 'untyped ' || doc_id
        FROM d WHERE doc_id % 2 = 0
"""


def q_html_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→Markdown conversion (:func:`mechaml_spark.markdown.
    to_markdown`): pages exercise the whole pinned subset in one
    body — heading, paragraph with bold + link around documents
    text, unordered list, fenced pre, blockquote, pipe table with
    header row — and the oracle is the exact expected markdown
    string (chr(10)-joined closed form), so any rendering drift
    (block joining, inline markup, fence, quote prefix, pipe
    layout) is a hash miss."""
    from mechaml_spark.markdown import to_markdown

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 400
    )
    i = d.doc_id
    body = F.concat(
        F.lit("<html><head><title>T</title><style>p{}</style></head>"
              "<body><h1>Doc "), i,
        F.lit("</h1><p>"), d.text,
        F.lit(" with <b>bold "), i,
        F.lit('</b> and <a href="/l'), i,
        F.lit('">go</a>.</p><ul><li>alpha '), i,
        F.lit("</li><li>beta "), i,
        F.lit("</li></ul><pre>code("), i,
        F.lit(")</pre><blockquote><p>quote "), i,
        F.lit("</p></blockquote><table><tr><th>K</th><th>V</th></tr>"
              "<tr><td>k"), i,
        F.lit("</td><td>v"), i,
        F.lit("</td></tr></table></body></html>"),
    )
    pages = d.select("doc_id", body.alias("body"))
    return pages.select(
        "doc_id", to_markdown(F.col("body")).alias("md")
    )


_HTML_MARKDOWN_ORACLE = """
    SELECT doc_id,
           '# Doc ' || doc_id || chr(10) || chr(10)
           || text || ' with **bold ' || doc_id || '** and [go](/l'
           || doc_id || ').' || chr(10) || chr(10)
           || '- alpha ' || doc_id || chr(10)
           || '- beta ' || doc_id || chr(10) || chr(10)
           || '```' || chr(10) || 'code(' || doc_id || ')' || chr(10)
           || '```' || chr(10) || chr(10)
           || '> quote ' || doc_id || chr(10) || chr(10)
           || '| K | V |' || chr(10) || '| --- | --- |' || chr(10)
           || '| k' || doc_id || ' | v' || doc_id || ' |' AS md
    FROM documents WHERE doc_id < 400
"""


def q_html_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visible-text extraction from full HTML pages, expression-only
    (:func:`mechaml_spark.extract.html_visible_text`).  Pages are
    built around documents text with every hazard the extractor must
    survive — comments, <style>, a <script> whose body contains raw
    ``<``/``>``/``&&``, nested tags, and all the named entities — so
    the oracle is the closed form ``'menu ' || text || <entity tail>``
    and any regression (block not stripped, entity order wrong,
    whitespace not collapsed) is a hash miss."""
    import pandas as _pd

    from mechaml_spark.extract import html_visible_text

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                html = (
                    "<!DOCTYPE html><html><head>"
                    f"<title>T{did}</title>"
                    "<style>p { color: red; }</style>"
                    "<script>if (a<b && c>d) { x['<p>']=1; }</script>"
                    "</head><body><!-- hidden --><nav>\n menu </nav>"
                    f"<div><p>{text}</p>\n"
                    "<p>A &amp; B &lt;tag&gt; &quot;q&quot; "
                    "&#39;s&#39; x&nbsp;y</p></div></body></html>"
                )
                rows.append({"doc_id": did, "body": html})
            yield _pd.DataFrame(rows, columns=["doc_id", "body"])

    pages = d.mapInPandas(gen, schema="doc_id long, body string")
    return pages.select(
        "doc_id", html_visible_text(F.col("body")).alias("text_out")
    )


def q_robots_rfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots matching end-to-end: a literal robots.txt body
    goes through :func:`frontier.robots.parse_robots` +
    ``compile_rules`` once, then the SAME distributed ``mark_blocked``
    stage the crawl scheduler uses (broadcast hash join + codegen'd
    longest-match fold) classifies one URL per document.  doc_id % 6
    picks a path exercising every RFC feature — no-match, plain
    Disallow, longer-Allow override, anchored-wildcard Disallow,
    allow-wins-tie, and a ``$`` anchor that must NOT match mid-path —
    so the oracle is the closed form blocked = m IN (1, 3)."""
    from mechaml_spark.frontier.robots import (
        ROBOTS_T,
        compile_rules,
        mark_blocked,
        parse_robots,
    )

    rules = parse_robots(
        "User-agent: *\nDisallow: /d\nAllow: /d/ok\nDisallow: /*/no$\n"
        "Allow: /p\nDisallow: /p\n"
    )
    rules_df = spark.createDataFrame(
        [("h.test", compile_rules(rules))], ROBOTS_T
    )
    m = F.col("doc_id") % 6
    path = (
        F.when(m == 0, F.concat(F.lit("/open"), F.col("doc_id")))
        .when(m == 1, F.concat(F.lit("/d/x"), F.col("doc_id")))
        .when(m == 2, F.concat(F.lit("/d/ok/x"), F.col("doc_id")))
        .when(m == 3, F.concat(F.lit("/d/ok"), F.col("doc_id"), F.lit("/no")))
        .when(m == 4, F.concat(F.lit("/p"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("/x"), F.col("doc_id"), F.lit("/no_t")))
    )
    reqs = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.concat(F.lit("http://h.test"), path).alias("url_norm"),
            F.lit("h.test").alias("host"),
        )
    )
    return mark_blocked(reqs, rules_df).select(
        "doc_id", F.col("url_norm").alias("url"), F.col("_blocked").alias("blocked")
    )


def q_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content sniffing over REAL bytes from every codec the engine
    owns: doc_id % 12 picks PNG / JPEG / GIF / BMP / TIFF / PPM / WAV
    / MJPEG-AVI / HTML (with a ``<meta charset>``) / XML / raw junk /
    BOM text, generated by the repo's encoders inside mapInPandas —
    then :func:`mechaml_spark.sniff.sniff_mime` and ``sniff_charset``
    classify them as PURE Catalyst expressions (one codegen project,
    no Python worker).  The oracle is the doc_id % 12 closed form,
    so a sniffer regression on any signature shows as a hash miss."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark import multimodal, sniff

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 240
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                m = did % 12
                px = _np.full((8, 8, 3), (did * 7) % 251, _np.uint8)
                if m == 0:
                    data = _im.png_encode(px)
                elif m == 1:
                    data = _im.encode(px, "jpg")
                elif m == 2:
                    data = _im.gif_encode(px)
                elif m == 3:
                    data = _im.bmp_encode(px)
                elif m == 4:
                    data = _im.tiff_encode(px)
                elif m == 5:
                    data = _im.ppm_encode(px)
                elif m == 6:
                    data = multimodal.wav_encode(
                        _np.zeros(64, dtype="<i2"), 8000
                    )
                elif m == 7:
                    data = multimodal.avi_mjpeg_encode([px])
                elif m == 8:
                    data = (
                        '\n <!DOCTYPE html><html><head><meta charset='
                        f'"windows-1252"></head><body>d{did}</body></html>'
                    ).encode("ascii")
                elif m == 9:
                    data = f"<?xml version='1.0'?><d id='{did}'/>".encode()
                elif m == 10:
                    data = bytes([1, 2, did % 256, 255, 0, 7])
                else:
                    data = b"\xef\xbb\xbf" + f"text {did}".encode()
                rows.append({"doc_id": did, "bytes": data})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary")
    return media.select(
        "doc_id",
        sniff.sniff_mime(F.col("bytes")).alias("mime"),
        sniff.sniff_charset(F.col("bytes")).alias("charset"),
    )


def q_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniff + decode of non-UTF-8 crawl text — the step
    between fetch and every text operator (real pages are ~2-5%
    legacy-encoded).  Bytes are documents text re-encoded per
    doc_id % 4 as UTF-8 / BOM'd UTF-8 / UTF-16LE / Latin-1 (with a
    ``<meta>`` hint), sniffed and decoded back ENTIRELY in Catalyst
    expressions; the oracle checks the decoded text equals the
    original, which only holds if both stages are right."""
    import pandas as _pd

    from mechaml_spark import sniff

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                m = did % 4
                if m == 0:
                    data = text.encode("utf-8")
                elif m == 1:
                    data = b"\xef\xbb\xbf" + text.encode("utf-8")
                elif m == 2:
                    data = b"\xff\xfe" + text.encode("utf-16le")
                else:
                    data = (
                        '<meta charset="iso-8859-1">' + text
                    ).encode("latin-1", errors="replace")
                rows.append({"doc_id": did, "bytes": data})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary")
    cs = sniff.sniff_charset(F.col("bytes"))
    return media.select(
        "doc_id",
        cs.alias("charset"),
        sniff.decode_text(F.col("bytes"), cs).alias("text_out"),
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio pipeline with a CLOSED-FORM oracle: deterministic mono
    16-bit PCM WAV square waves keyed by doc_id -> REAL stdlib
    ``wave`` encode -> REAL decode -> feature extraction
    (:func:`mechaml_spark.multimodal.decode_audio`).

    Doc d gets a square wave of amplitude ``A = 1000 + (d%30)*500``
    flipping sign every ``H = 4 + d%5`` frames over
    ``N = 16*(500 + d%50)`` frames at 16 kHz, so every feature is
    exact integer arithmetic both engines share: RMS = A (all samples
    are +/-A), duration_ms = N/16, zero crossings = (N-1)//H (one per
    block boundary).  The Spark side still pushes real RIFF bytes
    through the full mapInPandas decode stage."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 16 * (500 + did % 50)
                amp = 1000 + (did % 30) * 500
                h = 4 + did % 5
                sign = 1 - 2 * ((_np.arange(n) // h) % 2)
                rows.append(
                    {
                        "doc_id": did,
                        "bytes": multimodal.wav_encode(
                            (sign * amp).astype("<i2"), 16000
                        ),
                        "fmt": "wav",
                    }
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    a = multimodal.decode_audio(media)
    return a.select(
        "doc_id",
        F.col("audio")["sample_rate"].alias("sample_rate"),
        F.col("audio")["n_samples"].alias("n_samples"),
        F.col("audio")["duration_ms"].alias("duration_ms"),
        F.col("audio")["rms_x1000"].alias("rms_x1000"),
        F.col("audio")["peak"].alias("peak"),
        F.col("audio")["zero_crossings"].alias("zero_crossings"),
    )


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video pipeline with a CLOSED-FORM oracle: deterministic
    animated GIFs keyed by doc_id -> REAL GIF encode (shared-palette
    multi-frame) -> REAL frame sampling (LZW decode + compositing +
    GCE-delay tick sampling) -> REAL PNG decode + feature extraction.

    Doc d gets ``F = 2 + d%3`` solid-color 4x4 frames; frame k's
    channels are ``((d*P + k*Q) % 251)`` for primes (7,31), (11,37),
    (13,41).  Every frame displays 100 ms and sampling ticks every
    100 ms, so tick k shows exactly frame k — frame means are pure
    integer arithmetic both engines share."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _imaging
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                nf = 2 + did % 3
                frames = []
                for k in range(nf):
                    px = _np.empty((4, 4, 3), dtype=_np.uint8)
                    px[..., 0] = (did * 7 + k * 31) % 251
                    px[..., 1] = (did * 11 + k * 37) % 251
                    px[..., 2] = (did * 13 + k * 41) % 251
                    frames.append(px)
                rows.append(
                    {
                        "media_id": str(did),
                        "bytes": _imaging.gif_encode_animated(
                            frames, [100] * nf
                        ),
                        "fmt": "gif",
                    }
                )
            yield _pd.DataFrame(rows, columns=["media_id", "bytes", "fmt"])

    media = d.mapInPandas(
        gen, schema="media_id string, bytes binary, fmt string"
    )
    sampled = multimodal.sample_video_frames(media, every_ms=100)
    feats = multimodal.image_features(
        sampled.withColumnRenamed("frame", "bytes").withColumn(
            "fmt", F.lit("png")
        )
    )
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        "frame_idx",
        "ts_ms",
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_audio_g711_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-audio pipeline (G.711) with a CLOSED-FORM oracle:
    square waves whose amplitude is an EXACTLY-representable G.711
    magnitude — mu-law for even docs (``A = (((m<<3)+132)<<e)-132``,
    m = 1+d%15, e = d%8), A-law for odd (segment/mantissa form) —
    synthesized directly as code bytes, wrapped in real RIFF/WAVE
    containers (fmt tag 7/6 + fact), then decoded by the REAL G.711
    tables inside the decode_audio mapInPandas stage.  Every feature
    is exact integer arithmetic the SQL oracle replays: N = 8*(400 +
    d%40) frames at 8 kHz flipping sign every H = 4+d%5."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 8 * (400 + did % 40)
                h = 4 + did % 5
                m = 1 + did % 15
                pos = ((_np.arange(n) // h) % 2) == 0
                if did % 2 == 0:
                    e = did % 8
                    cp = multimodal.g711_ulaw_code(True, e, m)
                    cn = multimodal.g711_ulaw_code(False, e, m)
                    tag = 7
                else:
                    seg = did % 8
                    cp = multimodal.g711_alaw_code(True, seg, m)
                    cn = multimodal.g711_alaw_code(False, seg, m)
                    tag = 6
                codes = _np.where(pos, cp, cn).astype(_np.uint8)
                rows.append(
                    {
                        "doc_id": did,
                        "bytes": multimodal.wav_encode_compressed(
                            tag, 1, 8000, 8, 1, codes.tobytes(), n
                        ),
                        "fmt": "wav",
                    }
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    a = multimodal.decode_audio(media)
    return a.select(
        "doc_id",
        F.col("audio")["sample_rate"].alias("sample_rate"),
        F.col("audio")["n_samples"].alias("n_samples"),
        F.col("audio")["duration_ms"].alias("duration_ms"),
        F.col("audio")["rms_x1000"].alias("rms_x1000"),
        F.col("audio")["peak"].alias("peak"),
        F.col("audio")["zero_crossings"].alias("zero_crossings"),
    )


def q_audio_container_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio CONTAINER breadth with a CLOSED-FORM oracle: the same
    square-wave scheme as the G.711 query, carried by Sun AU and
    AIFF instead of RIFF/WAVE.  Even docs: AU encoding 1 (mu-law —
    the RFC 2046 audio/basic payload), exactly-representable
    amplitude ``((m*8+132)<<e)-132``; odd docs: 16-bit PCM with
    amplitude 500+(d%64)*100 in plain big-endian AIFF (d%4==1) or
    AIFC 'sowt' little-endian (d%4==3), so all three container parse
    paths cross one oracle.  N = 8*(400+d%40) frames at 8 kHz
    flipping sign every H = 4+d%5."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 8 * (400 + did % 40)
                h = 4 + did % 5
                pos = ((_np.arange(n) // h) % 2) == 0
                if did % 2 == 0:
                    m, e = 1 + did % 15, did % 8
                    cp = multimodal.g711_ulaw_code(True, e, m)
                    cn = multimodal.g711_ulaw_code(False, e, m)
                    codes = _np.where(pos, cp, cn).astype(_np.uint8)
                    data, fmt = multimodal.au_encode(
                        8000, None, encoding=1, codes=codes.tobytes()
                    ), "au"
                else:
                    a = 500 + (did % 64) * 100
                    sq = _np.where(pos, a, -a).astype(_np.int32)[:, None]
                    sowt = did % 4 == 3
                    data, fmt = multimodal.aiff_encode(
                        8000, sq, sowt=sowt
                    ), ("aifc" if sowt else "aiff")
                rows.append({"doc_id": did, "bytes": data, "fmt": fmt})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    a = multimodal.decode_audio(media)
    return a.select(
        "doc_id",
        F.col("audio")["sample_rate"].alias("sample_rate"),
        F.col("audio")["n_samples"].alias("n_samples"),
        F.col("audio")["duration_ms"].alias("duration_ms"),
        F.col("audio")["rms_x1000"].alias("rms_x1000"),
        F.col("audio")["peak"].alias("peak"),
        F.col("audio")["zero_crossings"].alias("zero_crossings"),
    )


def q_audio_adpcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMA-ADPCM pipeline with a CLOSED-FORM oracle: blocks whose
    nibble area is all zero keep the predictor constant (step 7 >> 3
    = 0), so a stream of B = 3+d%4 blocks with alternating-sign
    predictors A = 1000+(d%30)*500 decodes to an exact
    block-granularity square wave — while still exercising the real
    block-header parse, nibble unpack, and stepping loop.  Mono,
    block_align 256 -> 505 samples/block."""
    import pandas as _pd

    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )
    BA, SPB = 256, 505

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                amp = 1000 + (did % 30) * 500
                nb = 3 + did % 4
                payload = b"".join(
                    int(amp if b % 2 == 0 else -amp).to_bytes(
                        2, "little", signed=True
                    )
                    + bytes((0, 0))
                    + b"\x00" * (BA - 4)
                    for b in range(nb)
                )
                rows.append(
                    {
                        "doc_id": did,
                        "bytes": multimodal.wav_encode_compressed(
                            0x11, 1, 8000, 4, BA, payload, nb * SPB,
                            samples_per_block=SPB,
                        ),
                        "fmt": "wav",
                    }
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    a = multimodal.decode_audio(media)
    return a.select(
        "doc_id",
        F.col("audio")["n_samples"].alias("n_samples"),
        F.col("audio")["duration_ms"].alias("duration_ms"),
        F.col("audio")["rms_x1000"].alias("rms_x1000"),
        F.col("audio")["peak"].alias("peak"),
        F.col("audio")["zero_crossings"].alias("zero_crossings"),
    )


def q_video_frames_apng(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-PNG pipeline with a CLOSED-FORM oracle covering the
    APNG-specific machinery: per-frame REGIONS, dispose_op PREVIOUS,
    and integer Porter-Duff OVER blending.

    Doc d, 4x4 canvas, 3 frames every 100 ms (ticks land on frames):
    frame 0 = solid c0; frame 1 = 2x2 patch c1 at (1,1), blend
    SOURCE, dispose PREVIOUS (canvas reverts to c0 after emit);
    frame 2 = 2x2 patch c2 with alpha 128 at (2,2), blend OVER onto
    the restored c0.  Every per-channel mean is pure integer
    arithmetic both engines share: tick 1 mean*1000 = (3*c0+c1)*250,
    tick 2 uses the exact rounded blend (255*(128*c2+127*c0)+32512)
    // 65025."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _imaging
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                c0 = [(did * p) % 251 for p in (7, 11, 13)]
                c1 = [(did * p) % 251 for p in (17, 19, 23)]
                c2 = [(did * p) % 251 for p in (29, 31, 37)]
                full = _np.empty((4, 4, 4), _np.uint8)
                full[..., :3] = _np.array(c0, _np.uint8)
                full[..., 3] = 255
                p1 = _np.empty((2, 2, 4), _np.uint8)
                p1[..., :3] = _np.array(c1, _np.uint8)
                p1[..., 3] = 255
                p2 = _np.empty((2, 2, 4), _np.uint8)
                p2[..., :3] = _np.array(c2, _np.uint8)
                p2[..., 3] = 128
                data = _imaging.apng_encode_ext(4, 4, [
                    {"x": 0, "y": 0, "px": full, "delay_ms": 100},
                    {"x": 1, "y": 1, "px": p1, "delay_ms": 100,
                     "dispose": 2},
                    {"x": 2, "y": 2, "px": p2, "delay_ms": 100,
                     "blend": 1},
                ])
                rows.append(
                    {"media_id": str(did), "bytes": data, "fmt": "apng"}
                )
            yield _pd.DataFrame(rows, columns=["media_id", "bytes", "fmt"])

    media = d.mapInPandas(
        gen, schema="media_id string, bytes binary, fmt string"
    )
    sampled = multimodal.sample_video_frames(media, every_ms=100)
    feats = multimodal.image_features(
        sampled.withColumnRenamed("frame", "bytes").withColumn(
            "fmt", F.lit("png")
        )
    )
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        "frame_idx",
        "ts_ms",
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_video_frames_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-WebP pipeline with a CLOSED-FORM oracle covering the
    ANMF machinery: sub-frame offsets, no-blend overwrite,
    dispose-to-ANIM-background, and integer alpha blending — through
    the REAL VP8L codec both ways (fixtures written by the repo's
    encoder, decoded by the spec decoder).

    Doc d, 4x4 canvas in 2x2 quadrants, 4 frames every 100 ms:
    f0 full c0 opaque; f1 = c1 at Q10 with dispose-to-bg; f2 = c2 at
    Q01 overwrite; f3 = c3 ALPHA 128 at Q11 blended over c0 —
    blended channel = (128*c3 + 127*c0 + 127) // 255 exactly (the
    decoder's integer Porter-Duff).  Per-tick mean*1000 values are
    the shared closed forms."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import multimodal
    from mechaml_spark.webp import webp_encode_anim

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                c0 = [(did * p) % 251 for p in (7, 11, 13)]
                c1 = [(did * p) % 251 for p in (17, 19, 23)]
                c2 = [(did * p) % 251 for p in (29, 31, 37)]
                c3 = [(did * p) % 251 for p in (41, 43, 47)]
                bg = tuple((did * p) % 251 for p in (53, 59, 61)) + (255,)

                def solid(c, a=None):
                    ch = 4 if a is not None else 3
                    px = _np.empty((2, 2, ch), _np.uint8)
                    px[..., :3] = _np.array(c, _np.uint8)
                    if a is not None:
                        px[..., 3] = a
                    return px

                f0 = _np.empty((4, 4, 3), _np.uint8)
                f0[..., :] = _np.array(c0, _np.uint8)
                data = webp_encode_anim(
                    [
                        (100, 0, 0, f0, False, False),
                        (100, 2, 0, solid(c1), True, False),
                        (100, 0, 2, solid(c2), False, False),
                        (100, 2, 2, solid(c3, a=128), False, True),
                    ],
                    canvas_wh=(4, 4),
                    bg=bg,
                )
                rows.append(
                    {"media_id": str(did), "bytes": data, "fmt": "webp"}
                )
            yield _pd.DataFrame(rows, columns=["media_id", "bytes", "fmt"])

    media = d.mapInPandas(
        gen, schema="media_id string, bytes binary, fmt string"
    )
    sampled = multimodal.sample_video_frames(media, every_ms=100)
    feats = multimodal.image_features(
        sampled.withColumnRenamed("frame", "bytes").withColumn(
            "fmt", F.lit("png")
        )
    )
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        "frame_idx",
        "ts_ms",
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


def q_video_frames_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MJPEG-in-AVI pipeline with a CLOSED-FORM oracle: deterministic
    AVI containers keyed by doc_id — ``F = 2 + d%3`` constant-plane
    8x8 JPEG frames at q95 (DC quant step 2 -> bit-exact decode, the
    image_jpeg_features trick) at 10 fps — REAL RIFF parse + REAL
    baseline JPEG decode per sampled frame
    (:func:`mechaml_spark.multimodal.avi_mjpeg_frames` +
    :mod:`mechaml_spark.jpeg`) -> PNG frames -> feature extraction.
    Frame k of doc d has channels ``((d*P + k*Q) % 251)`` for primes
    (7,31), (11,37), (13,41); 100 ms per frame and 100 ms ticks mean
    tick k shows exactly frame k."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                nf = 2 + did % 3
                frames = []
                for k in range(nf):
                    px = _np.empty((8, 8, 3), dtype=_np.uint8)
                    px[..., 0] = (did * 7 + k * 31) % 251
                    px[..., 1] = (did * 11 + k * 37) % 251
                    px[..., 2] = (did * 13 + k * 41) % 251
                    frames.append(px)
                rows.append(
                    {
                        "media_id": str(did),
                        "bytes": multimodal.avi_mjpeg_encode(
                            frames, usec_per_frame=100_000, quality=95
                        ),
                        "fmt": "avi",
                    }
                )
            yield _pd.DataFrame(rows, columns=["media_id", "bytes", "fmt"])

    media = d.mapInPandas(
        gen, schema="media_id string, bytes binary, fmt string"
    )
    sampled = multimodal.sample_video_frames(media, every_ms=100)
    feats = multimodal.image_features(
        sampled.withColumnRenamed("frame", "bytes").withColumn(
            "fmt", F.lit("png")
        )
    )
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        "frame_idx",
        "ts_ms",
        F.col("features")["mean_r"].alias("mean_r"),
        F.col("features")["mean_g"].alias("mean_g"),
        F.col("features")["mean_b"].alias("mean_b"),
    )


# BPE-ish pretokenizer: letter runs / digit runs / single
# non-alnum-non-space marks — the GPT-2-style pretoken split reduced
# to a class-portable core (identical semantics under Java regex and
# DuckDB's RE2, so the oracle can run the SAME pattern)
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both directive flavors: whitespace tokens and a
    BPE-ish regex pretoken count — pure codegen expressions, the
    shuffle carries one partial-agg row per lang."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(F.size(_toks(d.text)).cast("long")).alias("n_tokens"),
        F.sum(
            F.size(F.regexp_extract_all(d.text, F.lit(_BPE_RE), F.lit(0)))
            .cast("long")
        ).alias("n_subtokens"),
        F.sum("n_chars").alias("n_chars_total"),
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = _toks(d.text)
    stops = F.filter(toks, lambda x: x.isin("the", "a", "and", "of"))
    q = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(stops).cast("long").alias("n_stop"),
        "n_chars",
    )
    return q.where(
        (F.col("n_chars") >= 100)
        & (F.col("n_chars") <= 400)
        & (F.col("n_tokens") >= 20)
        & (20 * F.col("n_stop") >= F.col("n_tokens"))
    ).select("doc_id", "n_tokens", "n_stop")


_MARKERS = [("the", "w_the"), ("scan", "w_scan"), ("join", "w_join"), ("data", "w_data")]


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram marker heuristic (deterministic argmax with fixed tie
    order) — parity of the heuristic, not linguistic accuracy."""
    d = _t(spark, sf_dir, "documents")

    def cnt(m):
        pad = f" {m} "
        return (
            (F.length(d.text) - F.length(F.replace(d.text, F.lit(pad))))
            / len(pad)
        ).cast("long")

    c = {lbl: cnt(m) for m, lbl in _MARKERS}
    guess = (
        F.when(
            (c["w_the"] >= c["w_scan"])
            & (c["w_the"] >= c["w_join"])
            & (c["w_the"] >= c["w_data"]),
            F.lit("the"),
        )
        .when(
            (c["w_scan"] >= c["w_join"]) & (c["w_scan"] >= c["w_data"]), F.lit("scan")
        )
        .when(c["w_join"] >= c["w_data"], F.lit("join"))
        .otherwise(F.lit("data"))
    )
    return d.select("doc_id", guess.alias("guess"))


def q_line_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line-level dedup (the CCNet-style boilerplate
    killer: a line is dropped when it occurs in >= 10 documents).
    Bodies are synthesized expression-only — a per-host copyright
    line (40 docs each), a universal cookie banner, a unique content
    line, a 5-doc promo line, and a 1-in-3 newsletter line — so kept
    vs dropped is a closed form.

    Scale shape: explode lines -> groupBy(xxhash64(line)) count (the
    shuffle carries an 8-byte hash + count, never bodies) -> hash
    join back on the hash -> per-doc reassembly via sorted
    collect_list.  No window over the corpus, no broadcast of the
    (huge) line-frequency table."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    body = F.concat(
        F.lit("(c) host"), F.col("doc_id") % 10,
        F.lit(" - all rights reserved\naccept cookies to continue\ndoc "),
        F.col("doc_id"), F.lit(" "), F.substring("text", 1, 40),
        F.lit("\npromo code "), F.col("doc_id") % 80,
        F.when(
            F.col("doc_id") % 3 == 0, F.lit("\nsubscribe to our newsletter")
        ).otherwise(F.lit("")),
    )
    lines = d.select(
        "doc_id", F.posexplode(F.split(body, "\n")).alias("pos", "line")
    ).withColumn("lh", F.xxhash64("line"))
    counts = lines.groupBy("lh").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    tagged = lines.join(counts, "lh").withColumn(
        "boiler", F.col("n_docs") >= 10
    )
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("boiler").cast("long")).alias("n_boiler"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("boiler"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("kept"),
    )


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals, per document: most
    frequent token count, most frequent token-2-gram count, and the
    repetition flag (top-unigram fraction > 0.3 or top-bigram
    fraction > 0.2, integer arithmetic only).  Expression-only
    2-gram construction (sequence + element_at), then two
    partial-aggregating groupBys — shuffles carry (doc_id, term hash)
    pairs, never documents."""
    d = _t(spark, sf_dir, "documents")
    toks = _toks(d.text)
    base = d.select("doc_id", toks.alias("t"))
    grams = base.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.explode(
            F.concat(
                F.transform(F.col("t"), lambda x: F.concat(F.lit("1:"), x)),
                F.when(
                    F.size("t") >= 2,
                    F.transform(
                        # guard: sequence(1, 0) would DESCEND in Spark
                        F.sequence(F.lit(1), F.size("t") - 1),
                        lambda i: F.concat(
                            F.lit("2:"),
                            F.element_at(F.col("t"), i),
                            F.lit(" "),
                            F.element_at(F.col("t"), i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("term"),
    )
    per_term = grams.groupBy(
        "doc_id", "n_tokens", F.substring("term", 1, 1).alias("order"), "term"
    ).count()
    per_doc = per_term.groupBy("doc_id", "n_tokens").agg(
        F.max(F.when(F.col("order") == "1", F.col("count"))).alias(
            "top_tok_n"
        ),
        F.max(F.when(F.col("order") == "2", F.col("count"))).alias(
            "top_bigram_n"
        ),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "top_tok_n",
        "top_bigram_n",
        (
            (10 * F.col("top_tok_n") > 3 * F.col("n_tokens"))
            | (5 * F.col("top_bigram_n") > F.col("n_tokens") - 1)
        ).alias("flagged"),
    )


def q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus cleaning (Raffel et al. 2020 §2.2) through the
    real ``textclean.c4_clean`` path: line rules (terminal
    punctuation, >=5 words, no "javascript") + document rules (>=3
    surviving lines, no "lorem ipsum", no "{").  Pages are
    synthesized so every rule fires on its own modulus class and the
    lorem-ipsum line is itself line-rule-clean (doc rule must catch
    it).  Expression-only: one codegen project, zero shuffle — the
    shape a filter that sees every fetched page needs at 100 TB."""
    d = _t(spark, sf_dir, "documents")
    toks = _toks(d.text)
    nl = F.lit("\n")

    def opt(cond, *parts):
        return F.when(cond, F.concat(nl, *parts)).otherwise(F.lit(""))

    text = F.concat(
        F.lit("alpha "),
        F.element_at(toks, 1),
        F.lit(" beta gamma delta."),
        nl,
        F.lit("tiny line."),
        nl,
        F.lit("five good words without terminal punct"),
        opt(
            d.doc_id % 2 == 0,
            F.lit("second good line with "),
            F.element_at(toks, 2),
            F.lit(" tail."),
        ),
        opt(d.doc_id % 3 == 0, F.lit("third good line stays here today.")),
        opt(
            d.doc_id % 7 == 0,
            F.lit("Please enable JavaScript to continue viewing."),
        ),
        opt(d.doc_id % 11 == 0, F.lit("Lorem Ipsum dolor sit amet.")),
        opt(d.doc_id % 13 == 3, F.lit("var x = { a: 1 };")),
    )
    pages = d.select("doc_id", text.alias("text"))
    return textclean.c4_clean(pages).select(
        "doc_id", "n_lines", "n_kept", "keep_doc", "cleaned_text"
    )


def q_charlm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (charlm.py): a char-trigram
    model trained distributed on the even-doc_id half of the corpus,
    every doc scored by mean trigram familiarity in exact integer
    ppm units.  Every 5th doc is char-reversed before scoring — its
    trigrams fall out of the model, so it scores near zero (the
    gibberish/wrong-language discrimination CCNet's perplexity
    filter performs).  Model broadcast, pre-divided denominator
    (int64-safe at any corpus size); DuckDB recomputes identically."""
    from mechaml_spark import charlm

    d = _t(spark, sf_dir, "documents")
    model = charlm.train_char_lm(d.where(d.doc_id % 2 == 0))
    scored_in = d.select(
        "doc_id",
        F.when(d.doc_id % 5 == 4, F.reverse(d.text))
        .otherwise(d.text)
        .alias("text"),
    )
    return charlm.score_docs(scored_in, model)


_BPE_MERGES = [
    ("t h", "th"), ("th e", "the"), ("the </w>", "the</w>"),
    ("i n", "in"), ("a n", "an"), ("e r", "er"), ("a t", "at"),
    ("o n", "on"),
]


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge APPLICATION (bpe.encode_tokens) with a pinned 8-merge
    list over the real corpus words: per doc, word count, symbol
    count before merges (chars + </w>), token count after.  The
    encode is a leading-separator replace chain — pure codegen — and
    the oracle runs the IDENTICAL replace chain in SQL, so any
    boundary bug (cross-symbol match, broken adjacency) hash-fails."""
    from mechaml_spark import bpe

    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(charlm.normalize_col(d.text), " "),
                lambda w: w != "",
            )
        ).alias("word"),
    )
    toks = bpe.encode_tokens(F.col("word"), _BPE_MERGES)
    per_word = words.select(
        "doc_id",
        (F.length("word") + 1).alias("before"),
        F.size(toks).alias("after"),
    )
    return per_word.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("before").cast("long").alias("n_sym_before"),
        F.sum("after").cast("long").alias("n_tokens"),
    )


def _bpe_encode_oracle_sql(merges: list[tuple[str, str]]) -> str:
    expr = "regexp_replace(word, '(.)', ' \\1', 'g') || ' </w>'"
    for pair, joined in merges:
        a, b = pair.split(" ")
        expr = f"replace({expr}, ' {a} {b}', ' {joined}')"
    return f"""
        WITH w AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(
                       trim(regexp_replace(lower(text),
                                           '[^a-z]+', ' ', 'g')), ' '),
                       x -> x <> '')) AS word
            FROM documents)
        SELECT doc_id, COUNT(*) AS n_words,
               CAST(SUM(strlen(word) + 1) AS BIGINT) AS n_sym_before,
               CAST(SUM(len(string_split(ltrim({expr}), ' ')))
                    AS BIGINT) AS n_tokens
        FROM w GROUP BY doc_id
    """


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode normalization (textclean.normalize_unicode): NFC
    composition (e + combining acute -> precomposed), zero-width /
    control / soft-hyphen strip, CRLF -> LF, over per-doc hazard
    strings.  The one pandas_udf text op (JVM has no NFC); DuckDB
    runs the identical pipeline via nfc_normalize + RE2 class."""
    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        # decomposed e + COMBINING ACUTE, ZWSP, BEL, SOFT HYPHEN, CRLF
        F.lit("Ae\u0301\u200bb\x07\u00ad x\r\ny "),
        F.element_at(_toks(d.text), 1),
        F.lit("\u200d\ufeff."),  # ZWJ + BOM before the final dot
    )
    docs = d.select("doc_id", raw.alias("text"))
    return textclean.normalize_unicode(docs).select("doc_id", "norm_text")


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, the corpus-statistics half (bpe.py):
    word frequencies -> frequency-weighted adjacent symbol-pair
    counts with the </w> marker -> top-20 merge candidates under the
    pinned (cnt desc, pair asc) tie-break.  The two groupBys are the
    only corpus-scale work in BPE training; merges then iterate on
    the compact word table.  Expression-only pair generation (substr
    arithmetic, no per-char explode)."""
    from mechaml_spark import bpe

    d = _t(spark, sf_dir, "documents")
    return bpe.top_merge_candidates(
        bpe.pair_counts(bpe.word_freqs(d)), k=20
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force max-inner-product top-5 on integer-quantized
    embeddings (quantization keeps the cross-engine compare exact;
    the scale path is the same plan with an LSH/IVF prefilter)."""
    e = _t(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding", lambda x: F.round(x * 1000).cast("long")
    )
    q = e.where(e.vec_id < 3).select(
        F.col("vec_id").alias("query_id"), qv.alias("qv")
    )
    c = e.where(e.vec_id >= 3).select(
        F.col("vec_id").alias("neighbor_id"), qv.alias("cv")
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    j = c.crossJoin(F.broadcast(q)).withColumn("dot", dot)
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), "neighbor_id")
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select(
            "query_id", F.col("rnk").cast("long").alias("rnk"), "neighbor_id", "dot"
        )
    )


def q_embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-5 — the scale path for `embedding_topk`:
    a 4-bit sign hash (axis-aligned hyperplanes over dims 0-3) buckets
    both sides, so candidate generation is an equi-JOIN on `bucket`
    (shuffle/bucket join, broadcast-able query side) instead of the
    brute-force crossJoin; exact quantized dot only within the probed
    bucket.  At 10^10 rows the bucket key is also the natural
    partition/cluster column for the candidate table."""
    e = _t(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding", lambda x: F.round(x * 1000).cast("long")
    )
    bucket = F.lit(0).cast("long")
    for i in range(4):
        bucket = bucket * 2 + F.when(
            F.get("embedding", i) > 0, F.lit(1)
        ).otherwise(F.lit(0))
    q = e.where(e.vec_id < 3).select(
        F.col("vec_id").alias("query_id"), bucket.alias("bucket"),
        qv.alias("qv"),
    )
    c = e.where(e.vec_id >= 3).select(
        F.col("vec_id").alias("neighbor_id"), bucket.alias("bucket"),
        qv.alias("cv"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    j = c.join(F.broadcast(q), "bucket").withColumn("dot", dot)
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), "neighbor_id")
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select(
            "query_id", F.col("rnk").cast("long").alias("rnk"),
            "neighbor_id", "dot",
        )
    )


def q_embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer: k-means (2 Lloyd
    iterations, deterministic init = vec_id < 8) -> inverted lists ->
    nprobe=2 probe.

    Lloyd at scale: assignment is a broadcast join of the k-row
    centroid table against the corpus (argmax inner product,
    deterministic cid tie-break); the update is a
    ``posexplode -> groupBy(cid, pos)`` partial-aggregated sum/count
    (map-side combine — the shuffle carries k x dim cells, never
    vectors), re-assembled with ``collect_list``+``array_sort``.
    Centroid components are integer floor-means
    (``(s - pmod(s, n)) / n``) so both engines agree bit-for-bit —
    no float division anywhere.  Empty clusters drop out (both
    engines).  Probe plan: every data vector joins its trained
    max-inner-product centroid; each query probes its 2 nearest
    lists; candidates rank by exact integer-quantized dot.  The
    candidate join is EQUI on ``cid`` — at 10^10 rows the shuffle
    carries only probed lists, never a cross join."""
    e = _t(spark, sf_dir, "embeddings")
    qv = F.transform("embedding", lambda x: F.round(x * 1000).cast("long"))
    cent = e.where(e.vec_id < 8).select(
        F.col("vec_id").alias("cid"), qv.alias("cv_cent")
    )
    data = e.where(e.vec_id >= 16).select(
        F.col("vec_id").alias("neighbor_id"), qv.alias("cv")
    )
    qry = e.where((e.vec_id >= 8) & (e.vec_id < 16)).select(
        F.col("vec_id").alias("query_id"), qv.alias("qv")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wa = Window.partitionBy("neighbor_id").orderBy(F.desc("cdot"), "cid")

    def assign_to(cent_df: DataFrame) -> DataFrame:
        return (
            data.crossJoin(F.broadcast(cent_df))
            .withColumn("cdot", dot("cv", "cv_cent"))
            .withColumn("_rk", F.row_number().over(wa))
            .where(F.col("_rk") == 1)
            .select("neighbor_id", "cid", "cv")
        )

    def lloyd_update(assigned: DataFrame) -> DataFrame:
        ex = assigned.select("cid", F.posexplode("cv").alias("pos", "v"))
        agg = ex.groupBy("cid", "pos").agg(
            F.sum("v").alias("s"), F.count("*").alias("n")
        )
        comp = agg.select(
            "cid",
            "pos",
            ((F.col("s") - F.pmod(F.col("s"), F.col("n"))) / F.col("n"))
            .cast("long")
            .alias("cv_i"),
        )
        return (
            comp.groupBy("cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "cv_i"))).alias("ps")
            )
            .select(
                "cid", F.transform("ps", lambda x: x["cv_i"]).alias("cv_cent")
            )
        )

    for _ in range(2):  # Lloyd iterations (unrolled in the oracle too)
        cent = lloyd_update(assign_to(cent)).localCheckpoint(eager=False)

    assign = assign_to(cent)
    wp = Window.partitionBy("query_id").orderBy(F.desc("qdot"), "cid")
    probes = (
        qry.crossJoin(F.broadcast(cent))
        .withColumn("qdot", dot("qv", "cv_cent"))
        .withColumn("_rk", F.row_number().over(wp))
        .where(F.col("_rk") <= 2)
        .select("query_id", "cid", "qv")
    )
    # probes (queries x nprobe) is tiny vs the inverted lists —
    # broadcast it so the candidate join never shuffles `assign`
    cand = assign.join(F.broadcast(probes), "cid")
    wr = Window.partitionBy("query_id").orderBy(F.desc("dot"), "neighbor_id")
    return (
        cand.withColumn("dot", dot("qv", "cv"))
        .withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= 5)
        .select(
            "query_id", F.col("rnk").cast("long").alias("rnk"),
            "neighbor_id", "dot",
        )
    )


def q_embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jegou et al. 2011) — the compression half
    of IVF-PQ, what makes billion-vector ANN fit in memory: vectors
    split into m=2 subspaces, a k=4 codebook per subspace TRAINED by
    one deterministic Lloyd iteration (same integer floor-mean /
    cid-tie-break discipline as the IVF coarse quantizer), data
    encoded as m byte-sized codes, queries scored by ADC (asymmetric
    distance computation): per-query lookup tables of
    query-sub x centroid dots, approximate dot = sum over subspaces.

    Scale posture: codebooks are m*k rows (broadcast); encoding is a
    broadcast join; the per-query LUT is m*k entries per query
    (broadcast); the ADC reduce is ONE partial-agg
    groupBy(query, neighbor) over code rows — vectors themselves
    never shuffle after the sub-split projection.  64x compression
    here (64 longs -> 2 codes); the exact-dot rerank of the ADC
    top-k is the documented precision path (embedding_topk's plan)."""
    e = _t(spark, sf_dir, "embeddings")
    d2 = 32
    qv = F.transform("embedding", lambda x: F.round(x * 1000).cast("long"))

    def subs(df, key_out: str):
        both = F.array(
            F.struct(
                F.lit(0).alias("sub"), F.slice("v", 1, d2).alias("sv")
            ),
            F.struct(
                F.lit(1).alias("sub"),
                F.slice("v", d2 + 1, d2).alias("sv"),
            ),
        )
        return (
            df.select(F.col("vec_id").alias(key_out), qv.alias("v"))
            .select(key_out, F.explode(both).alias("s"))
            .select(key_out, F.col("s")["sub"].alias("sub"),
                    F.col("s")["sv"].alias("sv"))
        )

    cent = subs(e.where(e.vec_id < 4), "cid").withColumnRenamed("sv", "cv")
    data = subs(e.where(e.vec_id >= 16), "neighbor_id")
    qry = subs(e.where((e.vec_id >= 8) & (e.vec_id < 16)), "query_id")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wa = Window.partitionBy("neighbor_id", "sub").orderBy(
        F.desc("cdot"), "cid"
    )

    def encode(cent_df: DataFrame) -> DataFrame:
        return (
            data.join(F.broadcast(cent_df), "sub")
            .withColumn("cdot", dot("sv", "cv"))
            .withColumn("_rk", F.row_number().over(wa))
            .where(F.col("_rk") == 1)
            .select("neighbor_id", "sub", "cid", "sv")
        )

    # one Lloyd iteration per subspace (unrolled in the oracle too)
    ex = encode(cent).select(
        "sub", "cid", F.posexplode("sv").alias("pos", "x")
    )
    agg = ex.groupBy("sub", "cid", "pos").agg(
        F.sum("x").alias("s"), F.count("*").alias("n")
    )
    cent = (
        agg.select(
            "sub",
            "cid",
            "pos",
            ((F.col("s") - F.pmod(F.col("s"), F.col("n"))) / F.col("n"))
            .cast("long")
            .alias("cv_i"),
        )
        .groupBy("sub", "cid")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "cv_i"))).alias("ps")
        )
        .select(
            "sub", "cid", F.transform("ps", lambda x: x["cv_i"]).alias("cv")
        )
        .localCheckpoint(eager=False)
    )
    codes = encode(cent).select("neighbor_id", "sub", "cid")
    lut = (
        qry.join(F.broadcast(cent), "sub")
        .withColumn("ldot", dot("sv", "cv"))
        .select("query_id", "sub", "cid", "ldot")
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub", "cid"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("ldot").alias("adc"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), "neighbor_id"
    )
    return (
        adc.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= 5)
        .select(
            "query_id", F.col("rnk").cast("long").alias("rnk"),
            "neighbor_id", "adc",
        )
    )


def _pq_oracle_sql(d2: int = 32) -> str:
    """DuckDB mirror of q_embedding_pq: the same sub-split, one
    Lloyd iteration with integer floor-means, encode, and ADC."""
    dot = (
        "list_sum(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i] * {b}[i]))"
    )

    def assign(name: str, cent: str) -> str:
        d = dot.format(a="d.sv", b="c.cv")
        return f"""{name} AS (
            SELECT neighbor_id, sub, cid, sv FROM (
                SELECT d.neighbor_id, d.sub, c.cid, d.sv,
                       row_number() OVER (
                           PARTITION BY d.neighbor_id, d.sub
                           ORDER BY {d} DESC, c.cid) AS rk
                FROM data d JOIN {cent} c ON d.sub = c.sub)
            WHERE rk = 1)"""

    ldot = dot.format(a="qy.sv", b="c.cv")
    return f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(x * 1000) AS BIGINT)) AS v
            FROM embeddings),
        subs AS (
            SELECT vec_id, 0 AS sub, v[1:{d2}] AS sv FROM q
            UNION ALL
            SELECT vec_id, 1, v[{d2 + 1}:{2 * d2}] FROM q),
        cent0 AS (SELECT sub, vec_id AS cid, sv AS cv
                  FROM subs WHERE vec_id < 4),
        data AS (SELECT vec_id AS neighbor_id, sub, sv
                 FROM subs WHERE vec_id >= 16),
        qry AS (SELECT vec_id AS query_id, sub, sv
                FROM subs WHERE vec_id >= 8 AND vec_id < 16),
        {assign('a0', 'cent0')},
        cent1 AS (
            SELECT sub, cid, list(cv_i ORDER BY pos) AS cv FROM (
                SELECT sub, cid, pos,
                       (s - ((s % n) + n) % n) // n AS cv_i FROM (
                    SELECT sub, cid, pos, sum(x) AS s, count(*) AS n
                    FROM (SELECT sub, cid,
                                 unnest(range(1, len(sv) + 1)) AS pos,
                                 unnest(sv) AS x
                          FROM a0)
                    GROUP BY sub, cid, pos))
            GROUP BY sub, cid),
        {assign('codes', 'cent1')},
        lut AS (
            SELECT qy.query_id, qy.sub, c.cid, {ldot} AS ldot
            FROM qry qy JOIN cent1 c ON qy.sub = c.sub),
        adc AS (
            SELECT l.query_id, k.neighbor_id, SUM(l.ldot) AS adc
            FROM codes k
            JOIN lut l ON k.sub = l.sub AND k.cid = l.cid
            GROUP BY 1, 2)
        SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id,
               CAST(adc AS BIGINT) AS adc
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY adc DESC, neighbor_id) AS rnk
              FROM adc)
        WHERE rnk <= 5
    """


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-quantization bucket near-dup candidates (LSH-bucket
    pattern: same plan shape as a banded signature join)."""
    e = _t(spark, sf_dir, "embeddings")
    b = lambda i: F.round(F.get("embedding", i) * 10).cast("long")  # noqa: E731
    return (
        e.select(
            b(0).alias("b1"), b(1).alias("b2"), b(2).alias("b3"), b(3).alias("b4")
        )
        .groupBy("b1", "b2", "b3", "b4")
        .agg(F.count("*").alias("n_vecs"))
        .where(F.col("n_vecs") > 1)
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by winnowing (Schleimer et al., SIGMOD
    2003): hash every K-char gram, slide a W-gram window, keep each
    window's minimum hash; distinct minima are the document's
    fingerprints.  Output: fingerprints shared by >1 document (the
    near-dup evidence table).

    Scale path: all expression-level (whole-stage codegen, no Python);
    at 100 TB swap the md5 gram hash for a true rolling hash inside a
    pandas UDF — the winnow/groupBy shape is unchanged.  The groupBy
    key is the fingerprint itself, so the shuffle carries only
    (fp, doc_id) pairs pruned by ``array_distinct`` per doc."""
    K, W = 16, 8
    d = _t(spark, sf_dir, "documents")
    gram = lambda i: F.conv(  # noqa: E731
        F.substring(F.md5(F.substring("text", i, K).cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    grams = F.transform(
        F.sequence(F.lit(1), F.length("text") - K + 1), lambda i: gram(i)
    )
    g = d.where(F.length("text") >= K).select(
        "doc_id", grams.alias("gs")
    )
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("gs") - W + 1),
            lambda j: F.array_min(F.slice(F.col("gs"), j, W)),
        )
    )
    return (
        g.where(F.size("gs") >= W)
        .select("doc_id", F.explode(fps).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the parquet; session TZ is pinned UTC so
    # the cast matches DuckDB's naive epoch_us exactly
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(micros).over(w)
    new_sess = F.when(
        prev.isNull() | (micros - prev > 1_800_000_000), 1
    ).otherwise(0)
    return (
        e.withColumn("_n", new_sess)
        .groupBy("user_id")
        .agg(F.sum("_n").cast("long").alias("n_sessions"))
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped agg (integer cents to keep hashes exact)."""
    li = _t(spark, sf_dir, "lineitem")
    filtered = li.where(li.l_shipdate <= F.lit("1998-09-02").cast("timestamp"))
    cents = lambda c: F.round(c * 100).cast("long")  # noqa: E731
    return filtered.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(cents(F.col("l_quantity"))).alias("sum_qty_cents"),
        F.sum(
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue_cents"),
        F.count("*").alias("count_order"),
    )


def q_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ffprobe-style container metadata with a CLOSED-FORM oracle:
    header-only ISO-BMFF and MPEG-Layer-III probing, no decode — the
    routing stage a 100-TB multimodal pipeline runs on every fetched
    media row before deciding what (if anything) to decode.  Even
    docs: MP4 with movie timescale 1000 (duration stored exactly),
    avc1/hev1 visual entry, an mp4a audio trak on every 3rd doc,
    exercising tkhd/mdhd/hdlr/stsd walks.  Odd docs: CBR MP3 at
    sr [44.1k/48k/32k][d%3], bitrate table index 1+d%14, 50+d%50
    frames with alternating padding bits, an ID3v2 tag every 5th doc
    and an ID3v1 trailer every 7th — all skipped by the frame walk,
    so duration is sample-exact: frames*1152*1000//sr.  d%4==3 docs:
    Ogg (CRC-validated page walk) — Vorbis id header at
    [44.1k/48k/32k][d%3] with granule = rate*(2+d%9) (exact whole
    seconds), or OpusHead every other one (d%8==7) where the granule
    includes the 312-sample preskip (RFC 7845 §4), so duration is
    20*(10+d%20) ms exactly.  d%8==2 docs: FLAC STREAMINFO
    (20-bit-rate/36-bit-total packing + a PADDING block the walk must
    cross), total = rate*(3+d%6).  d%8==6 docs: WebM/Matroska —
    EBML varint walk, TimecodeScale 10^6 with a float Duration of
    4000+d*9 ms stored exactly, VP9/AV1 track dims, an A_OPUS track
    every 3rd doc."""
    import pandas as _pd

    from mechaml_spark import mediaprobe

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 8 == 2:
                    rate = (32000, 44100, 48000)[did % 3]
                    data = mediaprobe.flac_write(
                        rate, 1 + did % 2,
                        total_samples=rate * (3 + did % 6),
                        n_padding=did % 32,
                    )
                    fmt = "flac"
                elif did % 8 == 6:
                    data = mediaprobe.mkv_write(
                        4000 + did * 9,
                        doctype="webm",
                        video=(
                            "V_VP9" if did % 16 == 6 else "V_AV1",
                            32 * (1 + did % 10), 32 * (1 + did % 6),
                        ),
                        audio=(
                            ("A_OPUS", 48000, 2) if did % 3 == 0 else None
                        ),
                    )
                    fmt = "webm"
                elif did % 2 == 0:
                    data = mediaprobe.mp4_write(
                        16 * (2 + did % 20),
                        16 * (1 + did % 12),
                        3000 + did * 7,
                        video_codec=b"avc1" if did % 8 == 0 else b"hev1",
                        audio=(
                            (b"mp4a", 44100 if did % 24 == 0 else 48000)
                            if did % 3 == 0 else None
                        ),
                        largesize_mdat=did % 16 == 0,
                    )
                    fmt = "mp4"
                elif did % 4 == 1:
                    data = mediaprobe.mp3_write(
                        50 + did % 50,
                        bitrate_idx=1 + did % 14,
                        sr_idx=did % 3,
                        id3v2_size=(64 + did % 64) if did % 5 == 0 else 0,
                        id3v1=did % 7 == 0,
                    )
                    fmt = "mp3"
                elif did % 8 == 7:
                    data = mediaprobe.ogg_write(
                        "opus", 48000, 2,
                        granule_end=312 + 960 * (10 + did % 20),
                        preskip=312,
                    )
                    fmt = "ogg"
                else:
                    rate = (44100, 48000, 32000)[did % 3]
                    data = mediaprobe.ogg_write(
                        "vorbis", rate, 1 + did % 2,
                        granule_end=rate * (2 + did % 9),
                    )
                    fmt = "ogg"
                rows.append({"doc_id": did, "bytes": data, "fmt": fmt})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    p = mediaprobe.probe_media(media)
    return p.select(
        "doc_id",
        F.col("probe")["container"].alias("container"),
        F.col("probe")["duration_ms"].alias("duration_ms"),
        F.col("probe")["n_tracks"].alias("n_tracks"),
        F.col("probe")["video_codec"].alias("video_codec"),
        F.col("probe")["width"].alias("width"),
        F.col("probe")["height"].alias("height"),
        F.col("probe")["audio_codec"].alias("audio_codec"),
        F.col("probe")["audio_rate"].alias("audio_rate"),
        F.col("probe")["bitrate_kbps"].alias("bitrate_kbps"),
        F.col("probe")["n_frames"].alias("n_frames"),
    )


def q_warc_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX indexing over .warc.gz segments with a CLOSED-FORM oracle:
    documents become response records (mixed-case URLs, default :443
    ports, unsorted query params — all normalized by the SURT key),
    archived as per-record gzip members, then indexed.  Every
    SQL-expressible CDX field (SURT, 14-digit timestamp, url, mime,
    status, sha256 digest, payload length) is a pure function of
    doc_id; the seek fields (offset/length into the gzip stream) are
    compression-dependent and pinned by test_warc.py's seek-contract
    test instead."""
    import pandas as _pd

    from mechaml_spark import warc

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 500
    )

    def gen(batches):
        for pdf in batches:
            rows = [
                {
                    "uri": (
                        f"HTTPS://W{did % 7}.Example.COM:443/P/{did}"
                        f"?b=2&a={did % 5}"
                    ),
                    "body": f"doc-{did}-" + "x" * (did % 97),
                    "date": "2026-08-18T12:34:56Z",
                }
                for did in (int(x) for x in pdf["doc_id"])
            ]
            yield _pd.DataFrame(rows, columns=["uri", "body", "date"])

    media = d.mapInPandas(gen, schema="uri string, body string, date string")
    segs = warc.to_warc_segments(media, compress=True)
    return warc.cdx_index(segs).select(
        "surt", "ts", "url", "mime", "status", "digest", "payload_length"
    )


def q_image_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-only probes for the modern web image containers the
    engine cannot (and at 100 TB should not, pre-routing) decode:
    AVIF (ISO-BMFF ftyp + ispe walk), lossy WebP (VP8 frame header),
    lossless WebP (VP8L dims read from REAL bytes produced by the
    repo's own encoder), and bare JPEG XL (small-form SizeHeader bit
    parse).  Same bounded-per-row mapInPandas stage as media_probe;
    every dimension is a closed form over doc_id."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import mediaprobe as _mp
    from mechaml_spark import webp as _webp

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                k = did % 4
                if k == 0:
                    b, fmt = _mp.avif_write(320 + did % 16, 200 + did % 8), "avif"
                elif k == 1:
                    b, fmt = _mp.webp_write_lossy(640 + did % 16, 480), "webp"
                elif k == 2:
                    px = _np.zeros((2 + did % 7, 3 + did % 5, 3), _np.uint8)
                    b, fmt = _webp.webp_encode(px), "webp"
                else:
                    b, fmt = _mp.jxl_write(8 * (1 + did % 32),
                                           8 * (1 + did % 16)), "jxl"
                rows.append({"doc_id": did, "bytes": b, "fmt": fmt})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    p = _mp.probe_media(media)
    return p.select(
        "doc_id",
        F.col("probe")["container"].alias("container"),
        F.col("probe")["brand"].alias("brand"),
        F.col("probe")["video_codec"].alias("video_codec"),
        F.col("probe")["width"].alias("width"),
        F.col("probe")["height"].alias("height"),
    )


def q_pagerank_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-authority frontier prioritization with an EXACT oracle:
    3 iterations of integer fixed-point PageRank (linkgraph.pagerank)
    over a deterministic 500-node graph derived from doc_ids — two
    affine out-edges per doc plus a hub edge to node 0 from every
    10th doc (skew: the hub's in-degree is ~10x any other node's,
    exercising the partial-agg/AQE-skew path).  Because every
    division is an integer floor in a pinned order, the DuckDB oracle
    unrolls the identical formula and matches bit-for-bit — float
    PageRank could never survive the hash compare."""
    from mechaml_spark.linkgraph import pagerank

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 1500
    )
    m = 500
    e1 = d.select(
        (F.col("doc_id") % m).alias("src"),
        ((F.col("doc_id") * 7 + 1) % m).alias("dst"),
    )
    e2 = d.select(
        (F.col("doc_id") % m).alias("src"),
        ((F.col("doc_id") * 13 + 5) % m).alias("dst"),
    )
    e3 = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") % m).alias("src"),
        F.lit(0).cast("long").alias("dst"),
    )
    return pagerank(e1.union(e2).union(e3), n_iter=3)


def _pagerank_oracle_sql(n_iter: int = 3) -> str:
    """DuckDB mirror of q_pagerank_frontier: the same integer
    fixed-point update unrolled ``n_iter`` times."""
    parts = ["""
        WITH e AS (
            SELECT DISTINCT src, dst FROM (
                SELECT doc_id % 500 AS src, (doc_id * 7 + 1) % 500 AS dst
                FROM documents WHERE doc_id < 1500
                UNION
                SELECT doc_id % 500, (doc_id * 13 + 5) % 500
                FROM documents WHERE doc_id < 1500
                UNION
                SELECT doc_id % 500, 0
                FROM documents WHERE doc_id < 1500 AND doc_id % 10 = 0
            )
        ), nodes AS (
            SELECT src AS node FROM e UNION SELECT dst FROM e
        ), meta AS (SELECT COUNT(*) AS n FROM nodes),
        outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        r0 AS (
            SELECT node, CAST(1000000000 // n AS BIGINT) AS rank
            FROM nodes, meta
        )"""]
    for i in range(1, n_iter + 1):
        parts.append(f""",
        c{i} AS (
            SELECT e.dst AS node, SUM(r.rank // o.outdeg) AS insum
            FROM e JOIN r{i - 1} r ON e.src = r.node
                   JOIN outdeg o ON e.src = o.src
            GROUP BY e.dst
        ), d{i} AS (
            SELECT COALESCE(SUM(rank), 0) AS dm FROM r{i - 1}
            WHERE node NOT IN (SELECT src FROM e)
        ), r{i} AS (
            SELECT node,
                   CAST((150000000 // n)
                        + (85 * (COALESCE(insum, 0) + dm // n)) // 100
                        AS BIGINT) AS rank
            FROM nodes CROSS JOIN meta CROSS JOIN d{i}
            LEFT JOIN c{i} USING (node)
        )""")
    parts.append(f"\n        SELECT node, rank FROM r{n_iter}")
    return "".join(parts)


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (linkgraph.hits) over the SAME
    deterministic 500-node skewed graph as pagerank_frontier — node 0
    is a 10x-in-degree authority, every 10th doc the hub pointing at
    it.  Integer fixed-point with pinned pre-divided L1
    normalization, so the DuckDB oracle unrolls the identical
    formula bit-for-bit (float HITS could never hash-match)."""
    from mechaml_spark.linkgraph import hits

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 1500
    )
    m = 500
    e1 = d.select(
        (F.col("doc_id") % m).alias("src"),
        ((F.col("doc_id") * 7 + 1) % m).alias("dst"),
    )
    e2 = d.select(
        (F.col("doc_id") % m).alias("src"),
        ((F.col("doc_id") * 13 + 5) % m).alias("dst"),
    )
    e3 = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") % m).alias("src"),
        F.lit(0).cast("long").alias("dst"),
    )
    return hits(e1.union(e2).union(e3), n_iter=3)


def _hits_oracle_sql(n_iter: int = 3, scale: int = 10**6) -> str:
    """DuckDB mirror of q_hits_scores: the same integer fixed-point
    half-updates unrolled ``n_iter`` times."""
    parts = [f"""
        WITH e AS (
            SELECT DISTINCT src, dst FROM (
                SELECT doc_id % 500 AS src, (doc_id * 7 + 1) % 500 AS dst
                FROM documents WHERE doc_id < 1500
                UNION
                SELECT doc_id % 500, (doc_id * 13 + 5) % 500
                FROM documents WHERE doc_id < 1500
                UNION
                SELECT doc_id % 500, 0
                FROM documents WHERE doc_id < 1500 AND doc_id % 10 = 0
            )
        ), nodes AS (
            SELECT src AS node FROM e UNION SELECT dst FROM e
        ),
        h0 AS (SELECT node, CAST({scale} AS BIGINT) AS hub FROM nodes)"""]
    for i in range(1, n_iter + 1):
        parts.append(f""",
        ar{i} AS (
            SELECT e.dst AS node, SUM(h.hub) AS raw
            FROM e JOIN h{i - 1} h ON e.src = h.node GROUP BY e.dst
        ), at{i} AS (SELECT COALESCE(SUM(raw), 0) AS tot FROM ar{i}),
        a{i} AS (
            SELECT n.node,
                   CAST(COALESCE(raw, 0)
                        // GREATEST(1, tot // {scale}) AS BIGINT) AS auth
            FROM nodes n CROSS JOIN at{i} LEFT JOIN ar{i} USING (node)
        ), hr{i} AS (
            SELECT e.src AS node, SUM(a.auth) AS raw
            FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src
        ), ht{i} AS (SELECT COALESCE(SUM(raw), 0) AS tot FROM hr{i}),
        h{i} AS (
            SELECT n.node,
                   CAST(COALESCE(raw, 0)
                        // GREATEST(1, tot // {scale}) AS BIGINT) AS hub
            FROM nodes n CROSS JOIN ht{i} LEFT JOIN hr{i} USING (node)
        )""")
    parts.append(
        f"\n        SELECT node, hub, auth FROM h{n_iter} "
        f"JOIN a{n_iter} USING (node)"
    )
    return "".join(parts)


def q_opic_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC frontier prioritization (:func:`mechaml_spark.linkgraph.
    opic`, Abiteboul/Preda/Cobena WWW 2003) with an EXACT oracle: 3
    synchronous cash/history steps over a deterministic 400-node
    graph — two affine out-edges per doc plus a hub edge to node 1
    from every 8th doc, and srcs drawn mod 380 so nodes 380-399 are
    pure sinks exercising the dangling (virtual-root) path.  Every
    division is an integer floor in a pinned order, so the DuckDB
    oracle unrolls the identical formula bit-for-bit."""
    from mechaml_spark.linkgraph import opic

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 1200
    )
    e1 = d.select(
        (F.col("doc_id") % 380).alias("src"),
        ((F.col("doc_id") * 11 + 3) % 400).alias("dst"),
    )
    e2 = d.select(
        (F.col("doc_id") % 380).alias("src"),
        ((F.col("doc_id") * 17 + 9) % 400).alias("dst"),
    )
    e3 = d.where(F.col("doc_id") % 8 == 0).select(
        (F.col("doc_id") % 380).alias("src"),
        F.lit(1).cast("long").alias("dst"),
    )
    return opic(e1.union(e2).union(e3), n_iter=3)


def _opic_oracle_sql(n_iter: int = 3, scale: int = 10**9) -> str:
    """DuckDB mirror of q_opic_scores: the same integer fixed-point
    cash/history update unrolled ``n_iter`` times."""
    parts = [f"""
        WITH e AS (
            SELECT DISTINCT src, dst FROM (
                SELECT doc_id % 380 AS src, (doc_id * 11 + 3) % 400 AS dst
                FROM documents WHERE doc_id < 1200
                UNION
                SELECT doc_id % 380, (doc_id * 17 + 9) % 400
                FROM documents WHERE doc_id < 1200
                UNION
                SELECT doc_id % 380, 1
                FROM documents WHERE doc_id < 1200 AND doc_id % 8 = 0
            )
        ), nodes AS (
            SELECT src AS node FROM e UNION SELECT dst FROM e
        ), meta AS (SELECT COUNT(*) AS n FROM nodes),
        outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        s0 AS (
            SELECT node, CAST({scale} // n AS BIGINT) AS cash,
                   CAST(0 AS BIGINT) AS history
            FROM nodes, meta
        )"""]
    for i in range(1, n_iter + 1):
        parts.append(f""",
        c{i} AS (
            SELECT e.dst AS node, SUM(s.cash // o.outdeg) AS insum
            FROM e JOIN s{i - 1} s ON e.src = s.node
                   JOIN outdeg o ON e.src = o.src
            GROUP BY e.dst
        ), d{i} AS (
            SELECT COALESCE(SUM(cash), 0) AS dm FROM s{i - 1}
            WHERE node NOT IN (SELECT src FROM e)
        ), s{i} AS (
            SELECT node,
                   CAST(COALESCE(insum, 0) + dm // n AS BIGINT) AS cash,
                   CAST(history + cash AS BIGINT) AS history
            FROM s{i - 1} CROSS JOIN meta CROSS JOIN d{i}
            LEFT JOIN c{i} USING (node)
        )""")
    parts.append(
        f"\n        SELECT node, cash, history,"
        f" CAST(history + cash AS BIGINT) AS importance FROM s{n_iter}"
    )
    return "".join(parts)


def q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal with a CLOSED-FORM oracle: synthesized
    pages carry four chrome/junk blocks every real page has — a nav
    link bar (semantic-chrome drop), a sub-25-char stub (length
    drop), a link-farm paragraph (density drop), a footer (chrome
    drop) — around 2+d%3 content paragraphs whose text is a pure
    function of (doc_id, i).  The kept text, kept count, and dropped
    count are exact closed forms; any classifier drift (threshold,
    segmentation, whitespace) is a hash miss."""
    import pandas as _pd

    from mechaml_spark.boilerplate import extract_main_content

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 600
    )

    def para(did: int, i: int) -> str:
        return (
            f"Doc {did} paragraph {i} holds enough visible "
            "characters to stay."
        )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in (int(x) for x in pdf["doc_id"]):
                paras = "".join(
                    f"<p>{para(did, i)}</p>" for i in range(2 + did % 3)
                )
                html = (
                    "<html><body>"
                    '<nav><a href="/">Home</a> <a href="/p">Products'
                    '</a> <a href="/a">About this site</a></nav>'
                    f"<div id=main>{paras}<p>ok</p>"
                    '<p><a href="/x">Read more</a> <a href="/y">related '
                    'articles</a> <a href="/z">more clickbait links</a> '
                    "trailing here</p></div>"
                    "<footer><p>Copyright boilerplate long enough to "
                    "pass the length bar but inside footer chrome."
                    "</p></footer></body></html>"
                )
                rows.append({"doc_id": did, "body": html})
            yield _pd.DataFrame(rows, columns=["doc_id", "body"])

    pages = d.mapInPandas(gen, schema="doc_id long, body string")
    out = extract_main_content(pages)
    return out.select(
        "doc_id",
        F.col("main")["main_text"].alias("main_text"),
        F.col("main")["n_kept"].alias("n_kept"),
        F.col("main")["n_dropped"].alias("n_dropped"),
    )


def q_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval scoring over the REAL documents text (no
    synthesized fixture) in the oracle-exact rational mode
    (retrieval.bm25, k1=6/5, b=3/4, log-free idf surrogate with one
    pinned floor division per term) — DuckDB runs the identical
    integer formula over the same parquet and matches bit-for-bit.
    The float ln-idf mode shares this exact plan (test_retrieval pins
    it against an independent per-row computation)."""
    from mechaml_spark.retrieval import bm25

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 400
    )
    return bm25(d, ["join", "vector", "slow"], idf="rational")


def q_url_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier URL-hygiene flags with a CLOSED-FORM oracle: URLs
    synthesized so each heuristic fires on its own modulus class —
    d%11 a 220-char pad (long), d%5 seven query params (faceted
    trap), d%6 a phpsessid key (session alias), d%7 a /cal/cal/
    repeat (calendar loop), d%9 ten path segments (deep), d%13 a
    20-digit segment (auto-ids; masked when the d%11 pad dilutes the
    digit ratio — the oracle encodes exactly that interaction).  The
    flags themselves are computed by the REAL expression-only
    heuristics (urlkit.hygiene_flags, zero Python in the plan)."""
    import pandas as _pd

    from mechaml_spark.urlkit import hygiene_flags

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 1000
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in (int(x) for x in pdf["doc_id"]):
                parts = ["pa", "pb"]
                if did % 7 == 0:
                    parts += ["cal", "cal"]
                if did % 9 == 0:
                    parts += ["s" + c for c in "abcdefgh"]
                if did % 13 == 0:
                    parts += ["12345678901234567890"]
                if did % 11 == 0:
                    parts += ["x" * 220]
                qp = []
                if did % 5 == 0:
                    qp.append("&".join(f"a{i}=1" for i in range(7)))
                if did % 6 == 0:
                    qp.append(f"phpsessid=s{did}")
                url = (
                    f"http://h{did % 50}.test/" + "/".join(parts)
                    + ("?" + "&".join(qp) if qp else "")
                )
                rows.append({"doc_id": did, "url": url})
            yield _pd.DataFrame(rows, columns=["doc_id", "url"])

    u = d.mapInPandas(gen, schema="doc_id long, url string")
    return u.select(
        "doc_id", *[c for _n, c in hygiene_flags(F.col("url"))]
    )


def q_caption_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-metadata caption extraction (mechaml_spark.metadata):
    six deterministic page shapes exercise the whole precedence chain
    (og:description in both attribute orders / quote styles >
    twitter:description > meta description > JSON-LD caption >
    <title>), each with a DECOY on a lower rung whose text differs,
    so a precedence or attribute-order bug flips the hash.  og:image
    goes through the frontier canonicalizer (case/port/dot-segment
    quirks on v0).  Expression-only parse — codegen at 100 TB."""
    from mechaml_spark import metadata as _md

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    v = F.col("doc_id") % 6
    h = F.col("doc_id") % 20
    win = F.expr("substring(text, 1, CAST(doc_id % 23 + 8 AS INT))")
    decoy = F.expr("substring(text, 5, CAST(doc_id % 23 + 8 AS INT))")
    img_canon = F.concat(
        F.lit("http://host"), h, F.lit(".test/img"), F.col("doc_id"),
        F.lit(".png"),
    )
    img_quirky = F.concat(
        F.lit(" HTTP://Host"), h, F.lit(".TEST:80/im/../img"),
        F.col("doc_id"), F.lit(".png "),
    )
    q = F.lit('"')
    body = (
        F.when(v == 0, F.concat(
            F.lit("<html><head><title>"), decoy,
            F.lit('</title><meta property="og:description" content='), q,
            win, q,
            F.lit('><meta property="og:image" content='), q, img_quirky, q,
            F.lit("></head><body>x</body></html>"),
        ))
        .when(v == 1, F.concat(
            F.lit("<head><meta content='"), win,
            F.lit("' property='og:description'>"
                  '<meta name="description" content='), q, decoy, q,
            F.lit("></head>"),
        ))
        .when(v == 2, F.concat(
            F.lit('<head><meta name="description" content='), q, win, q,
            F.lit("><meta content="), q, img_canon, q,
            F.lit(' property="og:image"><title>'), decoy,
            F.lit("</title></head>"),
        ))
        .when(v == 3, F.concat(
            F.lit('<head><meta name="twitter:description" content='), q,
            win, q,
            F.lit('><meta name="description" content='), q, decoy, q,
            F.lit("></head>"),
        ))
        .when(v == 4, F.concat(
            F.lit('<head><script type="application/ld+json">'
                  '{"@type":"ImageObject","caption":"'), win,
            F.lit('"}</script><title>'), decoy, F.lit("</title></head>"),
        ))
        .otherwise(F.concat(F.lit("<head><title>"), win,
                            F.lit("</title></head>")))
    )
    pages = d.select("doc_id", body.alias("body"))
    return _md.extract_page_meta(pages, keep_cols=("doc_id",))


def q_image_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payload-pair extractor end-to-end (metadata.image_caption_
    pairs): per page three <img> shapes — plain src (canonicalization
    quirks) + alt; srcset mixing w and x descriptors where the 2x
    candidate must beat 640w (largest-effective-width rule) with
    empty alt falling back to the page og:description; and a <figure>
    whose figcaption overrides a decoy alt via the (doc_id, url)
    equi-join.  Oracle is closed-form over doc_id + text."""
    from mechaml_spark import metadata as _md

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    h = F.col("doc_id") % 20
    base = F.concat(F.lit("http://host"), h, F.lit(".test/i"),
                    F.col("doc_id"))
    pagecap = F.expr("substring(text, 2, CAST(doc_id % 23 + 8 AS INT))")
    alt0 = F.expr("substring(text, 1, CAST(doc_id % 19 + 6 AS INT))")
    fc = F.expr("substring(text, 3, CAST(doc_id % 17 + 6 AS INT))")
    alt_decoy = F.expr("substring(text, 6, 5)")
    q = F.lit('"')
    body = F.concat(
        F.lit('<html><head><meta property="og:description" content='), q,
        pagecap, q, F.lit("></head><body><img src="), q,
        F.lit(" HTTP://Host"), h, F.lit(".TEST:80/a/../i"),
        F.col("doc_id"), F.lit("-0.png "), q, F.lit(" alt="), q, alt0, q,
        F.lit("><p>filler</p><img srcset="), q,
        base, F.lit("-1a.png 320w, "), base, F.lit("-1b.png 640w, "),
        base, F.lit("-1c.png 2x"), q, F.lit(' alt=""><figure><img srcset='),
        q, base, F.lit("-2a.png 1.5x, "), base, F.lit("-2b.png"), q,
        F.lit(" alt="), q, alt_decoy, q, F.lit("><figcaption> "), fc,
        F.lit(" </figcaption></figure></body></html>"),
    )
    pages = d.select("doc_id", body.alias("body"))
    return _md.image_caption_pairs(pages, key_cols=("doc_id",))


def q_feed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed parsing (mechaml_spark.feeds): even docs carry an
    RSS 2.0 channel (CDATA titles, canonicalization quirks in <link>,
    an <enclosure> on entry 1), odd docs an Atom feed whose entries
    test the rel rule — a rel="self" link that must be skipped, an
    enclosure link listed FIRST that must not become the entry link,
    and published-vs-updated fallback.  Expression-only parse; links
    go through the frontier canonicalizer."""
    from mechaml_spark import feeds as _fd

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    h = F.col("doc_id") % 20
    host = F.concat(F.lit("http://host"), h, F.lit(".test"))
    dd = F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")

    def title(k: int):
        return F.expr(
            f"substring(text, {k + 1}, CAST(doc_id % 13 + 5 AS INT))"
        )

    def rss_item(k: int):
        parts = [
            F.lit("<item><title><![CDATA["), title(k),
            F.lit("]]></title><link>"),
        ]
        if k == 0:
            parts += [
                F.lit(" HTTP://Host"), h, F.lit(".TEST:80/r"),
                F.col("doc_id"), F.lit("/x/../e0 "),
            ]
        else:
            parts += [host, F.lit("/r"), F.col("doc_id"), F.lit(f"/e{k}")]
        parts += [
            F.lit("</link><pubDate>Mon, "), dd,
            F.lit(" Jan 2026 00:00:00 GMT</pubDate>"),
        ]
        if k == 1:
            parts += [
                F.lit('<enclosure url="'), host, F.lit("/img"),
                F.col("doc_id"),
                F.lit('.jpg" type="image/jpeg" length="1"/>'),
            ]
        parts.append(F.lit("</item>\n"))
        return F.concat(*parts)

    def atom_entry(k: int):
        parts = [F.lit("<entry><title>"), title(k), F.lit("</title>")]
        if k == 2:
            parts += [
                F.lit('<link rel="enclosure" href="'), host, F.lit("/art"),
                F.col("doc_id"), F.lit('.png"/>'),
            ]
        parts += [
            F.lit('<link rel="self" href="'), host, F.lit('/feed.xml"/>'),
            F.lit('<link href="'), host, F.lit("/a"), F.col("doc_id"),
            F.lit(f'/e{k}"/>'),
        ]
        if k == 0:
            parts += [
                F.lit("<published>2026-01-"), dd,
                F.lit("T00:00:00Z</published>"),
            ]
        parts += [
            F.lit("<updated>2026-02-"), dd, F.lit("T00:00:00Z</updated>"),
            F.lit("</entry>\n"),
        ]
        return F.concat(*parts)

    rss = F.concat(
        F.lit('<?xml version="1.0"?><rss version="2.0"><channel>'
              "<title>chan</title><link>http://chan.test/</link>\n"),
        rss_item(0), rss_item(1), rss_item(2),
        F.lit("</channel></rss>"),
    )
    atom = F.concat(
        F.lit('<?xml version="1.0"?>'
              '<feed xmlns="http://www.w3.org/2005/Atom">'
              '<title>feed</title><link href="http://chan.test/"/>\n'),
        atom_entry(0), atom_entry(1), atom_entry(2),
        F.lit("</feed>"),
    )
    pages = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, rss).otherwise(atom).alias("body"),
    )
    return _fd.parse_feeds(pages, keep_cols=("doc_id",))


def q_image_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style image quality gates (multimodal.image_quality)
    with a CLOSED-FORM oracle: each doc is a vertical-stripe PNG
    (gray columns alternating va / va+d, so integer luma == the gray
    value exactly).  For period-2 stripes the stats are algebraic:
    brightness = (va+vb)/2, luma variance = d^2/4, and the interior
    4-neighbour Laplacian is +-2d with mean 0, so its variance is
    exactly 4*d^2 — all x1000 fixed-point ints in SQL.  The blur /
    dark / low-contrast flags use thresholds both engines share."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _imaging
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 10 if did % 2 == 0 else 16
                va = (did * 3) % 120
                vb = va + did % 40
                px = _np.empty((8, w, 3), dtype=_np.uint8)
                px[:, 0::2, :] = va
                px[:, 1::2, :] = vb
                rows.append(
                    {"doc_id": did, "bytes": _imaging.png_encode(px),
                     "fmt": "png"}
                )
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes", "fmt"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary, fmt string")
    qd = multimodal.image_quality(media)
    qs = F.col("quality")
    return qd.select(
        "doc_id",
        qs["w"].alias("w"),
        qs["h"].alias("h"),
        qs["aspect_milli"].alias("aspect_milli"),
        qs["brightness_milli"].alias("brightness_milli"),
        qs["var_milli"].alias("var_milli"),
        qs["lap_var_milli"].alias("lap_var_milli"),
        (qs["lap_var_milli"] < 640000).alias("blurry"),
        (qs["brightness_milli"] < 60000).alias("dark"),
        (qs["var_milli"] < 10000).alias("low_contrast"),
    )


def q_caption_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score-style image<->caption similarity gate (the LAION
    filter: keep pairs with cosine >= 0.28) in EXACT integer
    arithmetic: on x1000-quantized embeddings,
    ``cos >= t  <=>  dot > 0 AND dot^2 * 10000 >= 784 * |a|^2 *|b|^2``
    (t^2 = 0.0784), so no sqrt / float ever crosses the engine
    boundary.  int64-safe at dim 64: dot <= ~1.8e7, dot^2 * 1e4 <=
    ~3.2e18 < 2^63.

    Pairs are synthesized by the (vec_id, vec_id+7) self-equi-join;
    in a real pipeline both embeddings arrive in the SAME row (the
    encoder writes them side by side), so the production plan is a
    pure per-row map — embarrassingly parallel, zero shuffle at
    100 TB."""
    e = _t(spark, sf_dir, "embeddings")
    qv = F.transform("embedding", lambda x: F.round(x * 1000).cast("long"))
    img = e.select(F.col("vec_id").alias("pair_id"), qv.alias("iv"))
    txt = e.select((F.col("vec_id") - 7).alias("pair_id"), qv.alias("tv"))
    j = img.join(txt, "pair_id")

    def _ssum(col):
        return F.aggregate(
            col, F.lit(0).cast("long"), lambda acc, x: acc + x
        )

    dot = _ssum(F.zip_with("iv", "tv", lambda a, b: a * b))
    na2 = _ssum(F.transform("iv", lambda a: a * a))
    nb2 = _ssum(F.transform("tv", lambda b: b * b))
    out = j.select(
        "pair_id",
        dot.alias("dot"),
        na2.alias("na2"),
        nb2.alias("nb2"),
    )
    keep = (F.col("dot") > 0) & (
        F.col("dot") * F.col("dot") * 10000
        >= 784 * F.col("na2") * F.col("nb2")
    )
    return out.withColumn("keep", keep)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over near-dup pairs (linkgraph.connected_
    components — hash-min + pointer jumping): vertex v belongs to
    group v div 6; even groups are PATHS (diameter 5, stresses the
    O(log d) jump), odd groups are STARS around the group min
    (diameter 2, the common near-dup shape).  Either way the
    component label is the group min, so the oracle is pure
    arithmetic.  3 rounds suffice for diameter 5 with jumping
    (ceil(log2 5) + 1); the fixpoint is asserted in tests."""
    from mechaml_spark import linkgraph as _lg

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 600
    )
    g = F.expr("doc_id div 6")
    star = g % 2 == 1
    edges = d.select(
        F.when(star, g * 6).otherwise(F.col("doc_id")).alias("src"),
        F.when(star, F.col("doc_id")).otherwise(F.col("doc_id") + 1).alias(
            "dst"
        ),
        F.when(star, F.col("doc_id") % 6 > 0).otherwise(
            F.col("doc_id") % 6 < 5
        ).alias("keep"),
    ).where("keep").drop("keep")
    return _lg.connected_components(edges, n_iter=3)


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear text-classifier INFERENCE at corpus scale — the
    fastText-style serving shape every corpus pipeline runs for
    quality/topic/toxicity gates (Joulin et al. 2016): tokens hash
    into a fixed feature space (16-bit md5 bucket % 256, the
    cross-engine idiom `simhash_buckets` proved), each bucket joins a
    BROADCAST (bucket → per-class weight) table — real deployments
    swap in trained parameters, here the weights are a deterministic
    integer stand-in so the oracle mirrors them arithmetically — and
    one partial-agg groupBy(doc) sums per-class scores; prediction is
    argmax with lowest-class tie-break.  Integer weights/sums keep
    both engines bit-exact.

    Scale posture at 10^10 docs: the weight table is O(buckets×
    classes) — always broadcastable; the explode→join→groupBy chain
    shuffles one partial-aggregated row per doc, never the token
    stream (map-side combine collapses tokens before the exchange);
    no Python anywhere."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select("doc_id", F.explode(_toks(F.col("text"))).alias("w"))
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("w").cast("binary")), 1, 4), 16, 10
        ).cast("long")
        % 256
    ).cast("int")
    wt = spark.range(256).select(
        F.col("id").cast("int").alias("b"),
        *[
            (((F.col("id") * 131 + 17 * c) % 201) - 100)
            .cast("long")
            .alias(f"w{c}")
            for c in range(3)
        ],
    )
    scored = tok.select("doc_id", bucket.alias("b")).join(
        F.broadcast(wt), "b"
    )
    s = scored.groupBy("doc_id").agg(
        F.sum("w0").alias("score0"),
        F.sum("w1").alias("score1"),
        F.sum("w2").alias("score2"),
    )
    pred = (
        F.when(
            (F.col("score0") >= F.col("score1"))
            & (F.col("score0") >= F.col("score2")),
            0,
        )
        .when(F.col("score1") >= F.col("score2"), 1)
        .otherwise(2)
        .cast("int")
    )
    return s.select("doc_id", "score0", "score1", "score2", pred.alias("pred"))


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540) as a composition of the repo's distributed
    stages: k-means coarse clustering (the exact integer Lloyd of
    `embedding_ann_ivf` — broadcast k-row centroids, posexplode →
    partial-agg updates, the shuffle carries k×dim cells) bounds the
    O(n²) similarity search to WITHIN-cluster pairs (equi-join on
    cluster id — never a cross join), an exact integer cosine
    threshold (`caption_similarity`'s overflow-safe form, cos ≥ 0.95
    as dot²·10⁴ ≥ 9025·|a|²·|b|², all int64 within bounds) yields
    near-dup edges, hash-min connected components with pointer
    jumping (linkgraph.connected_components) labels the dup groups,
    and the keeper per group is the component min.

    Input geometry (expression-only, no Python): 128 vectors in
    dim 8, 32 groups of 4 — group g on primary axis g%8 (weight
    1000) with a same-axis-group-distinct secondary axis (weight
    350) and a small per-member tertiary offset (40·m).  Verified
    offline: min within-group cos 0.9936, max cross-group cos
    0.8923, so near-dup components == groups exactly, and the
    integer Lloyd (init = first member of the first 8 groups, one
    per axis) keeps every group whole in one cluster (group g →
    cluster init id 4·(g%8)), so the cluster bound loses no edges.
    The oracle is therefore closed-form over doc_id while the Spark
    side runs the full trained pipeline.

    Scale posture at 10^10 vectors: every stage is an equi-join or a
    partial-agg groupBy; the cluster size bounds the quadratic term
    (SemDeDup's core idea), and CC converges in O(log diameter)
    rounds."""
    from mechaml_spark import linkgraph as _lg

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 128
    )
    grp = F.expr("doc_id div 4")
    a = grp % 8
    s = (a + 1 + F.expr("(doc_id div 4) div 8")) % 8
    t = (a + 6) % 8
    m = F.col("doc_id") % 4
    vecs = d.select(
        F.col("doc_id").cast("long").alias("neighbor_id"),
        F.array(
            *[
                (
                    F.when(a == i, 1000).otherwise(0)
                    + F.when(s == i, 350).otherwise(0)
                    + F.when(t == i, m * 40).otherwise(0)
                )
                .cast("long")
                for i in range(8)
            ]
        ).alias("cv"),
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda u, v: u * v),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    cent = vecs.where(
        (F.pmod("neighbor_id", F.lit(4)) == 0) & (F.col("neighbor_id") < 32)
    ).select(F.col("neighbor_id").alias("cid"), F.col("cv").alias("cv_cent"))
    wa = Window.partitionBy("neighbor_id").orderBy(F.desc("cdot"), "cid")

    def assign_to(cent_df: DataFrame) -> DataFrame:
        return (
            vecs.crossJoin(F.broadcast(cent_df))
            .withColumn("cdot", dot("cv", "cv_cent"))
            .withColumn("_rk", F.row_number().over(wa))
            .where(F.col("_rk") == 1)
            .select("neighbor_id", "cid", "cv")
        )

    def lloyd_update(assigned: DataFrame) -> DataFrame:
        ex = assigned.select("cid", F.posexplode("cv").alias("pos", "v"))
        agg = ex.groupBy("cid", "pos").agg(
            F.sum("v").alias("s"), F.count("*").alias("n")
        )
        comp = agg.select(
            "cid",
            "pos",
            ((F.col("s") - F.pmod(F.col("s"), F.col("n"))) / F.col("n"))
            .cast("long")
            .alias("cv_i"),
        )
        return (
            comp.groupBy("cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "cv_i"))).alias(
                    "ps"
                )
            )
            .select(
                "cid", F.transform("ps", lambda x: x["cv_i"]).alias("cv_cent")
            )
        )

    for _ in range(2):
        cent = lloyd_update(assign_to(cent)).localCheckpoint(eager=False)
    assign = assign_to(cent).localCheckpoint(eager=False)
    norms = assign.withColumn("n2", dot("cv", "cv"))
    la = norms.select(
        F.col("neighbor_id").alias("src"),
        F.col("cid").alias("cida"),
        F.col("cv").alias("acv"),
        F.col("n2").alias("na2"),
    )
    lb = norms.select(
        F.col("neighbor_id").alias("dst"),
        F.col("cid").alias("cidb"),
        F.col("cv").alias("bcv"),
        F.col("n2").alias("nb2"),
    )
    pairs = la.join(
        lb, (F.col("cida") == F.col("cidb")) & (F.col("src") < F.col("dst"))
    ).withColumn("pdot", dot("acv", "bcv"))
    edges = pairs.where(
        (F.col("pdot") > 0)
        & (
            F.col("pdot") * F.col("pdot") * 10000
            >= 9025 * F.col("na2") * F.col("nb2")
        )
    ).select("src", "dst")
    comp = _lg.connected_components(edges, n_iter=3)
    keep = F.coalesce(F.col("component"), F.col("neighbor_id"))
    return assign.join(
        comp, assign["neighbor_id"] == comp["node"], "left"
    ).select(
        F.col("neighbor_id").alias("vec_id"),
        F.col("cid").cast("long").alias("cid"),
        keep.alias("component"),
        (keep == F.col("neighbor_id")).alias("kept"),
    )


def q_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection through the REAL video path (multimodal.
    select_keyframes after GIF decode + tick sampling): the same
    closed-form animated GIFs as `video_frames` (solid frame k of doc
    d has channels (d*P + k*Q) % 251), so consecutive-frame luma
    diffs are exact integer arithmetic in SQL via the shared
    77/150/29 >> 8 luma."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _imaging
    from mechaml_spark import multimodal

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                nf = 2 + did % 3
                frames = []
                for k in range(nf):
                    px = _np.empty((4, 4, 3), dtype=_np.uint8)
                    px[..., 0] = (did * 7 + k * 31) % 251
                    px[..., 1] = (did * 11 + k * 37) % 251
                    px[..., 2] = (did * 13 + k * 41) % 251
                    frames.append(px)
                rows.append(
                    {
                        "media_id": str(did),
                        "bytes": _imaging.gif_encode_animated(
                            frames, [100] * nf
                        ),
                        "fmt": "gif",
                    }
                )
            yield _pd.DataFrame(rows, columns=["media_id", "bytes", "fmt"])

    media = d.mapInPandas(
        gen, schema="media_id string, bytes binary, fmt string"
    )
    sampled = multimodal.sample_video_frames(media, every_ms=100)
    kf = multimodal.select_keyframes(sampled, threshold_milli=30_000)
    return kf.select(
        F.col("media_id").cast("long").alias("doc_id"),
        "frame_idx",
        "ts_ms",
        "diff_milli",
        "is_keyframe",
    )


def q_warc_wet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Common Crawl WET product end-to-end: hazard HTML (the
    `html_text` corpus — comments, style, hostile script, entities)
    -> WARC response segments -> parse -> expression-only WET
    conversion (warc.wet_conversion) -> REAL conversion-record
    segments with WARC-Refers-To -> parse back.  The oracle rebuilds
    the text closed-form and the refers_to id from md5 (record ids
    are md5-derived urn:uuids both engines can compute)."""
    import pandas as _pd

    from mechaml_spark import warc as _warc

    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                html = (
                    "<!DOCTYPE html><html><head>"
                    f"<title>T{did}</title>"
                    "<style>p { color: red; }</style>"
                    "<script>if (a<b && c>d) { x['<p>']=1; }</script>"
                    "</head><body><!-- hidden --><nav>\n menu </nav>"
                    f"<div><p>{text}</p>\n"
                    "<p>A &amp; B &lt;tag&gt; &quot;q&quot; "
                    "&#39;s&#39; x&nbsp;y</p></div></body></html>"
                )
                rows.append(
                    {
                        "uri": f"http://docs.test/{did}",
                        "body": html,
                        "date": "2026-01-01T00:00:00Z",
                    }
                )
            yield _pd.DataFrame(rows, columns=["uri", "body", "date"])

    pages = d.mapInPandas(gen, schema="uri string, body string, date string")
    segs = _warc.to_warc_segments(pages, content_type="text/html")
    recs = _warc.parse_warc_segments(segs)
    wet = _warc.wet_conversion(recs)
    back = _warc.parse_warc_segments(_warc.to_wet_segments(wet))
    return back.select(
        F.element_at(F.split("uri", "/"), -1).cast("long").alias("doc_id"),
        "warc_type",
        F.col("block").cast("string").alias("text"),
        "refers_to",
        "content_length",
    )


def q_warc_wat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Common Crawl WAT product end-to-end: synthesized pages
    (title + links in both quote styles) -> WARC response segments ->
    parse -> expression-only WAT metadata (warc.wat_metadata, JSON
    envelope with HTTP status/content-type + title/links) -> REAL
    metadata-record segments with WARC-Refers-To -> parse back ->
    from_json field extraction.  The oracle rebuilds every field
    closed-form, incl. the md5-derived refers_to id."""
    import pandas as _pd

    from mechaml_spark import warc as _warc

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                extra = (
                    f"<a class='x' href='http://l.test/c{did}'>c</a>"
                    if did % 3 == 0
                    else ""
                )
                html = (
                    f"<html><head><title>T{did}</title></head><body>"
                    f'<a href="http://l.test/a{did}">a</a>'
                    f"<a href='http://l.test/b{did}'>b</a>{extra}"
                    "</body></html>"
                )
                rows.append(
                    {
                        "uri": f"http://docs.test/{did}",
                        "body": html,
                        "date": "2026-01-01T00:00:00Z",
                    }
                )
            yield _pd.DataFrame(rows, columns=["uri", "body", "date"])

    pages = d.mapInPandas(gen, schema="uri string, body string, date string")
    segs = _warc.to_warc_segments(pages, content_type="text/html")
    recs = _warc.parse_warc_segments(segs)
    wat = _warc.wat_metadata(recs)
    back = _warc.parse_warc_segments(_warc.to_wat_segments(wat))
    env = F.from_json(
        F.col("block").cast("string"),
        "http struct<status:int, content_type:string>, "
        "html struct<title:string, links:array<string>>",
    )
    return back.select(
        F.element_at(F.split("uri", "/"), -1).cast("long").alias("doc_id"),
        "warc_type",
        env["http"]["status"].alias("status"),
        env["http"]["content_type"].alias("content_type"),
        env["html"]["title"].alias("title"),
        F.size(env["html"]["links"]).cast("long").alias("n_links"),
        F.element_at(env["html"]["links"], 1).alias("first_link"),
        "refers_to",
    )


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota capping (sampling.cap_per_group): 20 synthetic
    registered domains of ~25 docs each, capped at 10 per domain by
    salted-md5 order (retry-stable, engine-portable — DuckDB
    recomputes the identical md5 ranking, so kept rows AND ranks
    hash-match bit-for-bit)."""
    from mechaml_spark import sampling

    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        F.concat(F.lit("site"), d.doc_id % 20, F.lit(".com")).alias(
            "domain"
        ),
    )
    return sampling.cap_per_group(
        docs, "domain", 10, "doc_id", "cap-v1"
    ).select("doc_id", "domain", "grp_rank")


def q_warc_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive payload dedup via WARC revisit records
    (warc.mark_revisits + to_warc_segments_dedup): 300 fetches over
    100 distinct payloads; the pinned-minimum (date, uri) occurrence
    of each payload writes a full response record (with
    WARC-Payload-Digest), the other two write identical-payload-digest
    revisit records — empty block, WARC-Refers-To the kept record,
    WARC-Refers-To-Target-URI its URI.  Round-trips through the real
    segment sink/parse; the oracle recomputes sha-256 digests, the
    md5-derived refers_to ids, and the exact response block lengths."""
    from mechaml_spark import warc as _warc

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )
    pages = d.select(
        F.concat(
            F.lit("http://docs.test/"),
            F.lpad(F.col("doc_id").cast("string"), 3, "0"),
        ).alias("uri"),
        F.concat(F.lit("payload "), F.col("doc_id") % 100).alias("body"),
        F.lit("2026-01-01T00:00:00Z").alias("date"),
    )
    marked = _warc.mark_revisits(pages)
    back = _warc.parse_warc_segments(_warc.to_warc_segments_dedup(marked))
    return back.select(
        F.element_at(F.split("uri", "/"), -1).cast("long").alias("doc_id"),
        "warc_type",
        "payload_digest",
        "refers_to",
        "refers_to_target_uri",
        "profile",
        "content_length",
    )


def q_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling + train/val/test assignment
    (mechaml_spark.sampling): keep 50% of en, 25% of de, 12.5% of
    everything else via salted-md5 uniforms (retry-stable, engine-
    portable — the oracle recomputes the identical md5), then assign
    disjoint splits at 80/10/10 under a different salt.  Pure codegen
    filter — no rand(), no shuffle."""
    from mechaml_spark import sampling as _sm

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = _sm.stratified_sample(
        d, "lang", {"en": 0.5, "de": 0.25}, "doc_id", "docs-v1",
        default_rate=0.125,
    )
    return kept.select(
        "doc_id",
        "lang",
        _sm.hash_uniform_col(F.col("doc_id"), "docs-v1").alias("u"),
        _sm.split_column(
            F.col("doc_id"), "split-v1",
            {"train": 0.8, "val": 0.9, "test": 1.0},
        ).alias("split"),
    )


def q_link_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 8288 ``Link:`` header parse (metadata.link_header_col) —
    rel=next/prev drive pagination discovery where the HTML carries
    no anchors (APIs, Link-paginated listings), rel=canonical joins
    the canonical-URL dedup signal.  Headers are a closed form of
    doc_id (next/prev/canonical + an every-3rd preload with a
    multi-token quoted rel keeping its first token); the oracle
    states every (url, rel) arithmetically.  Scale posture: one
    split-on-comma-lookahead + per-element regexp projection under
    whole-stage codegen; explode is the only row expansion; zero
    Python, zero shuffle."""
    from mechaml_spark.metadata import link_header_col

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 700
    )
    did = F.col("doc_id")
    h = F.concat(F.lit("h"), (did % 20).cast("string"), F.lit(".test"))
    header = F.concat(
        F.lit("<https://"), h, F.lit("/page"), (did % 50 + 1),
        F.lit('>; rel="next", <https://'), h, F.lit("/page"),
        (did % 50 - 1), F.lit(">;rel=prev , <https://"), h,
        F.lit("/canon"), (did % 50),
        F.lit('>; title="c"; rel="canonical"'),
        F.when(
            did % 3 == 0,
            F.lit(', <https://cdn.test/s.css>; rel="alternate stylesheet"'),
        ).otherwise(F.lit("")),
    )
    return (
        d.select(
            "doc_id",
            F.posexplode(link_header_col(header)).alias("pos", "l"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("pos"),
            F.col("l")["url"].alias("url"),
            F.col("l")["rel"].alias("rel"),
        )
    )


def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixing (alpha=0.5) — the
    head-flattening resample (sampling.temperature_mixture) LLM
    training pipelines run over sources/languages so a 100x-larger
    domain only contributes 10x more documents.  Domains are a
    geometric-skew closed form of doc_id (bit-length of doc_id%63+1:
    sizes 1,2,4,8,16,32 per 63-block); weights, integer thresholds,
    and the salted-md5 draw are exact integer arithmetic the oracle
    replays bit-for-bit.  Returns the per-domain mixture table
    (n_docs, weight, threshold, kept).  Scale posture: one partial-agg
    groupBy + broadcast rate table + codegen filter — no window,
    no skew, hot domains just filter harder."""
    from mechaml_spark import sampling as _sm

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn(
            "domain",
            F.length(
                F.conv((F.col("doc_id") % 63 + 1).cast("string"), 10, 2)
            ).cast("int"),
        )
    )
    _, mixture = _sm.temperature_mixture(d, "domain", "doc_id", "mix-v1", 300)
    return mixture.select("domain", "n_docs", "weight", "threshold", "kept")


def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation — the classic off-page relevance signal
    (anchor words describe the TARGET; search/caption pipelines index
    them against it).  Goes through the REAL parse path
    (extract.parse_pages -> page.links_with), then groupBy(target):
    ref count, distinct-anchor count, and the sorted-distinct anchor
    join.  Scale posture: one hash-partitioned groupBy on the target
    URL; partial aggregation flattens hub fan-in map-side, and at web
    scale the collect_set gets a per-target cap + salt (the
    "everybody links to the homepage" key is the textbook skew case —
    same two-phase top-B treatment the politeness window uses)."""
    d = _t(spark, sf_dir, "documents")
    a1 = F.expr("trim(substring(text, 1, CAST(doc_id % 7 + 4 AS INT)))")
    body = F.concat(
        F.lit("<html><body><a href='http://t.test/p"),
        d.doc_id % 50,
        F.lit("'>"),
        a1,
        F.lit("</a><a href='http://t.test/p"),
        (d.doc_id * 3) % 50,
        F.lit("'>see "),
        d.doc_id,
        F.lit("</a></body></html>"),
    )
    pages = d.select(
        d.doc_id,
        F.concat(F.lit("http://s.test/d"), d.doc_id).alias("url"),
        body.alias("body"),
    )
    links = page.links_with(extract.parse_pages(pages), "", page_cols=())
    anchors = links.select(
        F.col("uri").alias("url"),
        F.trim(F.col("node")["text"]).alias("anchor"),
    )
    return anchors.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.size(F.collect_set("anchor")).cast("long").alias("n_unique"),
        F.concat_ws("|", F.sort_array(F.collect_set("anchor"))).alias(
            "anchors"
        ),
    )


def q_public_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain (eTLD+1) extraction with full publicsuffix.org
    semantics (domains.registered_domain): multi-label rules (co.uk),
    private-domain rules (github.io), the wildcard/exception pair
    (*.ck / !www.ck), the implicit default rule, and bare-suffix hosts
    (registered_domain NULL).  Scale: broadcast rule table, bounded
    suffix explode, ONE partial-agg groupBy per row — the ownership
    key every politeness/blocklist/dedup stage downstream joins on."""
    from mechaml_spark import domains

    d = _t(spark, sf_dir, "documents")
    k = d.doc_id % 10
    host = (
        F.when(d.doc_id % 7 == 0, F.concat(F.lit("www.site"), k, F.lit(".co.uk")))
        .when(d.doc_id % 7 == 1, F.concat(F.lit("deep.a.site"), k, F.lit(".com")))
        .when(d.doc_id % 7 == 2, F.concat(F.lit("b.foo"), k, F.lit(".ck")))
        .when(d.doc_id % 7 == 3, F.lit("www.ck"))
        .when(d.doc_id % 7 == 4, F.concat(F.lit("host"), k, F.lit(".unknowntld")))
        .when(d.doc_id % 7 == 5, F.lit("co.uk"))
        .otherwise(F.concat(F.lit("sub.x"), k, F.lit(".github.io")))
    )
    hosts = d.select("doc_id", host.alias("host"))
    return domains.registered_domain(
        hosts, "host", "doc_id", domains.rule_table(spark)
    ).select("doc_id", "host", "public_suffix", "registered_domain")


def q_pub_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish-date extraction (metadata.published_date): six page
    shapes — JSON-LD datePublished, article:published_time meta,
    <time datetime>, URL /YYYY/MM/ path (day defaults), an INVALID
    meta date (2022-13-40) that must fall through to a valid <time>
    rung, and a dateless page (NULL row kept).  Day-of-month varies
    with doc_id so the grammar check sees the full 01-28 range.
    Expression-only — one codegen project over (url, body)."""
    from mechaml_spark import metadata as md

    d = _t(spark, sf_dir, "documents")
    m6 = d.doc_id % 6
    day = F.lpad((d.doc_id % 28 + 1).cast("string"), 2, "0")
    body = (
        F.when(
            m6 == 0,
            F.concat(
                F.lit(
                    '<script type="application/ld+json">'
                    '{"datePublished": "2023-05-'
                ),
                day,
                F.lit('T10:00:00Z"}</script>'),
            ),
        )
        .when(
            m6 == 1,
            F.concat(
                F.lit("<meta property='article:published_time' "
                      "content='2022-11-"),
                day,
                F.lit("'>"),
            ),
        )
        .when(
            m6 == 2,
            F.concat(
                F.lit("<time datetime='2021-07-"), day, F.lit("'>x</time>")
            ),
        )
        .when(
            m6 == 4,
            F.concat(
                F.lit("<meta property='article:published_time' "
                      "content='2022-13-40'>"
                      "<time datetime='2019-01-"),
                day,
                F.lit("'>y</time>"),
            ),
        )
        .otherwise(F.lit("<p>plain</p>"))
    )
    url = F.when(
        m6 == 3,
        F.concat(F.lit("http://s.test/blog/2020/09/d"), d.doc_id, F.lit("/")),
    ).otherwise(F.concat(F.lit("http://s.test/d"), d.doc_id))
    pages = d.select("doc_id", url.alias("url"), body.alias("body"))
    pd_ = md.published_date(F.col("body"), F.col("url"))
    return pages.select(
        "doc_id",
        pd_["pub_date"].alias("pub_date"),
        pd_["source"].alias("source"),
    )


def q_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based sentence splitting (textclean.split_sentences):
    terminal-punct + whitespace + capital/open-quote boundary, with
    abbreviation (Dr./Mr.) and decimal (3.14) guards.  Synthesized
    5-or-6-sentence docs where every guard fires; the oracle lists
    the expected (sid, sentence) rows closed-form — RE2 has no
    lookbehind, so DuckDB could not run the regex itself."""
    d = _t(spark, sf_dir, "documents")
    text = F.concat(
        F.lit("Alpha doc "),
        d.doc_id,
        F.lit(" starts here. Dr. Who met Mr. Smith. Pi is 3.14 "
              'exactly! Is it done? "Yes" it said.'),
        F.when(
            d.doc_id % 3 == 0,
            F.concat(F.lit(" Extra tail "), d.doc_id, F.lit(" ends.")),
        ).otherwise(F.lit("")),
    )
    docs = d.select("doc_id", text.alias("text"))
    return textclean.sentences(docs, "doc_id").select(
        "doc_id", F.col("sid").cast("long").alias("sid"), "sentence"
    )


def q_hreflang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hreflang alternate extraction (metadata.hreflang_alternates):
    absolute + relative hrefs (resolved through the shared
    canonicalizer), BCP-47 case folding (DE-de -> de-de), x-default,
    and two decoy shapes that must NOT match — rel=alternate without
    hreflang (RSS autodiscovery) and rel=stylesheet.  Pages without
    alternates contribute no rows."""
    from mechaml_spark import metadata as md

    d = _t(spark, sf_dir, "documents")
    m4 = d.doc_id % 4
    body = F.concat(
        F.lit("<head><link rel='stylesheet' href='/s.css'>"),
        F.when(
            m4 == 0,
            F.concat(
                F.lit('<link rel="alternate" hreflang="en" '
                      'href="http://x.test/en/d'),
                d.doc_id,
                F.lit('"><link rel=\'alternate\' hreflang=\'DE-de\' '
                      "href='/de/d"),
                d.doc_id,
                F.lit("'>"),
            ),
        )
        .when(
            m4 == 1,
            F.concat(
                F.lit('<link hreflang="x-default" rel="alternate" '
                      'href="http://alt.test/d'),
                d.doc_id,
                F.lit('">'),
            ),
        )
        .when(
            m4 == 2,
            F.lit('<link rel="alternate" type="application/rss+xml" '
                  'href="/feed">'),
        )
        .otherwise(F.lit("")),
        F.lit("</head>"),
    )
    url = F.concat(
        F.lit("http://h"), d.doc_id % 5, F.lit(".test/pages/d"), d.doc_id
    )
    pages = d.select("doc_id", url.alias("url"), body.alias("body"))
    return md.hreflang_alternates(pages).select(
        "doc_id", "hreflang", "alt_url"
    )


def q_meta_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML meta-refresh soft redirects (metadata.meta_refresh): the
    WHATWG-subset content parse over every quoting/keyword shape —
    bare relative url, single-quoted absolute inside ``URL=`` (case
    folded), comma separator + spaced ``url =`` + quoted relative,
    delay-only reload-self (NULL target) — plus the decoys that must
    NOT match (``name=refresh``, unparseable delay, and an
    unparseable first tag that must lose to a later valid one).
    Targets resolve through the shared canonicalizer.  Pages without
    a parseable refresh contribute no rows."""
    from mechaml_spark import metadata as md

    d = _t(spark, sf_dir, "documents")
    m6 = d.doc_id % 6
    body = F.concat(
        F.lit("<head><meta charset='utf-8'>"),
        F.when(
            m6 == 0,
            F.concat(
                F.lit('<meta http-equiv="refresh" content="0; url=/next'),
                d.doc_id,
                F.lit('"><meta http-equiv="refresh" '
                      'content="9; url=/second">'),
            ),
        )
        .when(
            m6 == 1,
            F.concat(
                F.lit("<meta HTTP-EQUIV='REFRESH' "
                      "CONTENT='5;URL=\"http://abs.test/x"),
                d.doc_id,
                F.lit("\"'>"),
            ),
        )
        .when(
            m6 == 2,
            F.concat(
                F.lit('<meta http-equiv="refresh" content="oops">'
                      '<meta http-equiv="refresh" '
                      "content=\"3 ,url = 'p"),
                d.doc_id,
                F.lit(".html'\">"),
            ),
        )
        .when(
            m6 == 3,
            F.lit('<meta http-equiv="refresh" content="10">'),
        )
        .when(
            m6 == 4,
            F.lit('<meta name="refresh" content="5; url=/no">'
                  '<meta http-equiv="refresh" content="abc; url=/no">'),
        )
        .otherwise(F.lit("")),
        F.lit("</head>"),
    )
    url = F.concat(
        F.lit("http://h"), d.doc_id % 5, F.lit(".test/pages/d"), d.doc_id
    )
    pages = d.select("doc_id", url.alias("url"), body.alias("body"))
    return md.meta_refresh(pages).select(
        "doc_id", "refresh_delay_s", "refresh_target"
    )


def q_robots_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-level robots directives + link-level nofollow — the
    crawl-side counterpart of robots.txt: ``<meta name=robots>`` and
    the ``X-Robots-Tag`` response header merge restrictively
    (``none`` = noindex+nofollow; parameterized tokens ignored), and
    ``rel=nofollow`` links are excluded from the followable frontier
    when the page itself allows following.  Links go through the REAL
    parse path (extract.parse_pages -> page.links_with, rel read from
    the node attrs map); directives are expression-only and ride the
    same projection.  Scale: one groupBy(doc_id) with partial agg —
    the directive check adds zero shuffles to the crawl loop."""
    from mechaml_spark import metadata as md

    d = _t(spark, sf_dir, "documents")
    m5 = d.doc_id % 5
    meta = (
        F.when(m5 == 0, F.lit("<meta name='robots' content='noindex, NOFOLLOW'>"))
        .when(m5 == 1, F.lit('<meta name="robots" content="NONE">'))
        .when(m5 == 3, F.lit("<meta name='robots' content='all, max-snippet:-1'>"))
        .otherwise(F.lit(""))
    )
    xrobots = F.when(
        m5 == 2, F.lit("nofollow, unavailable_after: 25 Jun 2026")
    ).cast("string")
    body = F.concat(
        F.lit("<html><head>"),
        meta,
        F.lit("</head><body><a href='http://x.test/a"),
        d.doc_id,
        F.lit("'>a</a><a rel='NoFollow noopener' href='http://x.test/b"),
        d.doc_id,
        F.lit("'>b</a>"),
        F.when(
            d.doc_id % 3 == 0,
            F.concat(
                F.lit("<a rel='ugc' href='http://x.test/c"),
                d.doc_id,
                F.lit("'>c</a>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = d.select(
        d.doc_id,
        F.concat(F.lit("http://s.test/d"), d.doc_id).alias("url"),
        body.alias("body"),
        xrobots.alias("xrobots"),
    )
    dirs = md.robots_directives(F.col("body"), F.col("xrobots"))
    page_dirs = pages.select(
        "doc_id",
        dirs["noindex"].alias("noindex"),
        dirs["nofollow"].alias("nofollow"),
    )
    links = page.links_with(
        extract.parse_pages(pages), "", page_cols=("doc_id",)
    )
    rel = F.element_at(F.col("node")["attrs"], "rel")
    per_doc = links.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.sum(
            F.when(~md.rel_nofollow(rel), 1).otherwise(0)
        ).alias("n_rel_follow"),
    )
    return page_dirs.join(per_doc, "doc_id").select(
        "doc_id",
        "noindex",
        "nofollow",
        "n_links",
        F.when(F.col("nofollow"), F.lit(0).cast("long"))
        .otherwise(F.col("n_rel_follow"))
        .alias("n_follow"),
    )


def q_link_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink profile per page — the link-farm / SEO-spam signal
    (high external-link ratio, many distinct external domains):
    links through the REAL parse path, then source and target hosts
    reduced to registered domains via the publicsuffix module, then
    one groupBy(doc).  Internal = same eTLD+1 (www.site5.co.uk ->
    blog.site5.co.uk is internal; site6.co.uk is not).  Scale: the
    suffix join is broadcast; the final groupBy is one partial agg
    keyed on the page."""
    from mechaml_spark import domains

    d = _t(spark, sf_dir, "documents")
    body = F.concat(
        F.lit("<html><body><a href='http://blog.site"),
        d.doc_id % 10,
        F.lit(".co.uk/in"),
        d.doc_id,
        F.lit("'>i</a><a href='/rel"),
        d.doc_id,
        F.lit("'>r</a><a href='http://out"),
        d.doc_id % 7,
        F.lit(".com/x"),
        d.doc_id,
        F.lit("'>o</a>"),
        F.when(
            d.doc_id % 3 == 0,
            F.concat(
                F.lit("<a href='http://spam"),
                d.doc_id % 5,
                F.lit(".unknowntld/y'>s</a>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("http://www.site"), d.doc_id % 10, F.lit(".co.uk/d"),
            d.doc_id,
        ).alias("url"),
        body.alias("body"),
    )
    links = page.links_with(
        extract.parse_pages(pages), "", page_cols=("doc_id", "url")
    ).select(
        "doc_id",
        page.host_col(F.col("url")).alias("src_host"),
        page.host_col(F.col("uri")).alias("dst_host"),
    )
    rules = domains.rule_table(spark)
    links = links.withColumn(
        "_k", F.monotonically_increasing_id()
    )
    src = domains.registered_domain(
        links.select("_k", "src_host"), "src_host", "_k", rules
    ).select("_k", F.col("registered_domain").alias("src_dom"))
    dst = domains.registered_domain(
        links.select("_k", "dst_host"), "dst_host", "_k", rules
    ).select("_k", F.col("registered_domain").alias("dst_dom"))
    j = links.join(src, "_k").join(dst, "_k")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.sum(
            F.when(F.col("src_dom") == F.col("dst_dom"), 1).otherwise(0)
        ).cast("long").alias("n_internal"),
        F.size(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        F.col("src_dom") != F.col("dst_dom"),
                        F.col("dst_dom"),
                    )
                )
            )
        ).cast("long").alias("n_ext_domains"),
    )


def q_crawl_delay_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots Crawl-delay -> per-host politeness budget derivation
    (frontier.robots.crawl_delay_budgets, the table politeness_split
    consumes): six body shapes — integer and fractional delays,
    foreign-group-only (ignored), invalid value (ignored), trailing
    comment, and a tiny delay that must hit the cap.  budget =
    clamp(floor(epoch_s / delay), 1, cap), defaults where unusable."""
    from mechaml_spark.frontier import robots as _rb

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 240
    )
    v = F.col("doc_id") % 6
    body = (
        F.when(v == 0, F.concat(
            F.lit("User-agent: *\nCrawl-delay: "),
            F.col("doc_id") % 5 + 1, F.lit("\nDisallow: /x\n"),
        ))
        .when(v == 1, F.concat(
            F.lit("User-agent: *\nCrawl-delay: "),
            ((F.col("doc_id") % 4 + 1) / 2).cast("decimal(3,1)").cast(
                "string"
            ),
            F.lit("\n"),
        ))
        .when(v == 2, F.lit("User-agent: googlebot\nCrawl-delay: 9\n"))
        .when(v == 3, F.lit("User-agent: *\nCrawl-delay: soon\n"))
        .when(v == 4, F.lit("User-agent: *\nCrawl-delay: 4 # fast\n"))
        .otherwise(F.lit("User-agent: *\nCrawl-delay: 0.05\n"))
    )
    bodies = d.select(
        F.concat(F.lit("h"), F.col("doc_id"), F.lit(".test")).alias("host"),
        body.alias("body"),
    )
    return _rb.crawl_delay_budgets(
        bodies, epoch_seconds=4.0, default_budget=2, cap=64
    )


# ------------------------------------------------- safety / compliance gates

def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (mechaml_spark.safety): email /
    phone / IPv4 counted and replaced as pure JVM regex expressions
    (whole-stage codegen, zero Python, zero shuffle — the gate runs
    inside the scan stage at 100 TB).  The corpus deterministically
    injects one email per doc, a phone for doc_id%3==0, an IP for
    doc_id%4==0; the oracle runs the byte-identical pattern strings
    (Java-regex ∩ RE2 subset) and the identical redaction order, so
    the redacted TEXT itself hash-matches, not just the counts."""
    from mechaml_spark import safety

    d = _t(spark, sf_dir, "documents")
    t2 = F.concat(
        d.text,
        F.lit(" Contact user"), d.doc_id,
        F.lit("@ex"), d.doc_id % 7, F.lit(".org now."),
        F.when(
            d.doc_id % 3 == 0,
            F.concat(
                F.lit(" Call +1 415-555-"),
                F.lpad(d.doc_id.cast("string"), 4, "0"),
                F.lit(" today."),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d.doc_id % 4 == 0,
            F.concat(
                F.lit(" Origin 10."), d.doc_id % 256,
                F.lit(".0."), (d.doc_id % 250) + 1, F.lit(" logged."),
            ),
        ).otherwise(F.lit("")),
    )
    p = d.select("doc_id", t2.alias("t2"))
    ne, np, ni = safety.pii_counts(F.col("t2"))
    return p.select(
        "doc_id",
        ne.alias("n_emails"),
        np.alias("n_phones"),
        ni.alias("n_ips"),
        safety.redact(F.col("t2")).alias("red"),
    )


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UT1-style corpus gating (mechaml_spark.safety): a (host,
    banned) blocklist broadcast-joined against the corpus plus an
    integer badword-per-mille expression gate.  Blocklists are
    <=10^6 rows — always the broadcast side; the corpus never
    shuffles, and the term gate is codegen (`div` semantics shared
    with the oracle's ``//``)."""
    from mechaml_spark import safety

    d = _t(spark, sf_dir, "documents")
    t2 = F.concat(
        d.text,
        F.when(d.doc_id % 11 == 0, F.lit(" casino bonus casino night"))
        .otherwise(F.lit("")),
        F.when(d.doc_id % 17 == 0, F.lit(" cheap viagra deal"))
        .otherwise(F.lit("")),
    )
    docs = d.select(
        "doc_id",
        F.concat(F.lit("h"), d.doc_id % 41, F.lit(".example")).alias("host"),
        t2.alias("text"),
    )
    bl = (
        spark.range(0, 41)
        .where(F.col("id") % 13 == 0)
        .select(
            F.concat(F.lit("h"), "id", F.lit(".example")).alias("host"),
            F.lit(True).alias("banned"),
        )
    )
    out = safety.apply_blocklist(docs, bl, max_permille=30)
    return out.select(
        "doc_id", "host", "host_banned", "n_bad", "bad_permille", "kept"
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 App. C / The Pile style,
    mechaml_spark.safety): flag training docs sharing any 8-token
    gram with a 4-item benchmark suite.  Benchmark grams broadcast;
    the corpus explodes grams map-side and equi-joins, so the
    shuffle carries only hits.  doc_id%20==0 rows embed a full
    benchmark item (7 shared grams), %20==10 rows a 10-token prefix
    (3 shared grams); everything else is clean."""
    from mechaml_spark import safety

    d = _t(spark, sf_dir, "documents")
    inj_full = F.concat(
        F.lit(" bench secret sequence alpha b"), d.doc_id % 4,
        F.lit(" beta gamma delta epsilon zeta eta theta iota kappa"),
    )
    inj_part = F.concat(
        F.lit(" bench secret sequence alpha b"), d.doc_id % 4,
        F.lit(" beta gamma delta epsilon zeta"),
    )
    t2 = F.concat(
        d.text,
        F.when(d.doc_id % 20 == 0, inj_full)
        .when(d.doc_id % 20 == 10, inj_part)
        .otherwise(F.lit("")),
    )
    docs = d.select("doc_id", t2.alias("text"))
    bench = spark.range(0, 4).select(
        F.concat(
            F.lit("bench secret sequence alpha b"), F.col("id"),
            F.lit(" beta gamma delta epsilon zeta eta theta iota kappa"),
        ).alias("text")
    )
    return safety.contamination_hits(docs, bench, n=8)


def q_canonical_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=canonical resolution (mechaml_spark.metadata): declared
    canonical href (absolute, or relative resolved through the SAME
    vectorized canonicalizer the crawl uses), else the canonicalized
    page URL; dup-group size via a hash partition on the canonical.
    Exercises both attribute orders and both quote styles of the
    <link> tag; %5==0 pages carry a tracking query param the
    canonical collapses."""
    from mechaml_spark import metadata as md

    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://s"), d.doc_id % 7, F.lit(".test/p"), d.doc_id,
        F.when(d.doc_id % 5 == 0, F.lit("?utm=x")).otherwise(F.lit("")),
    )
    href_abs = F.concat(
        F.lit('<link rel="canonical" href="http://s'), d.doc_id % 7,
        F.lit(".test/canon/"), d.doc_id % 25, F.lit('">'),
    )
    href_rel = F.concat(
        F.lit("<link href='/canon/"), d.doc_id % 25,
        F.lit("' rel='canonical'>"),
    )
    head = (
        F.when(d.doc_id % 3 == 0, href_abs)
        .when(d.doc_id % 3 == 1, href_rel)
        .otherwise(F.lit(""))
    )
    body = F.concat(
        F.lit("<html><head>"), head, F.lit("</head><body>x</body></html>")
    )
    pages = d.select("doc_id", url.alias("url"), body.alias("body"))
    out = md.canonical_urls(pages)
    w = Window.partitionBy("canonical")
    return out.select(
        "doc_id",
        "url",
        "canonical",
        "has_tag",
        F.count(F.lit(1)).over(w).cast("long").alias("n_group"),
    )


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: per shard,
    documents are concatenated in deterministic (doc_id) order into
    one token stream and cut into fixed 256-token training contexts;
    each doc reports its stream offset and the context range it lands
    in (a doc longer than one context spans several — that is the
    n_ctx column).

    Scale posture: packing is PER SHARD (shard = doc_id % 16; a real
    pipeline hashes the id), so the only shuffle is one hash
    partition + an in-partition running sum — no global window, no
    single-reducer token stream.  At 100 TB, S shards are S
    independent streams packed in parallel, which is exactly the
    sharded-packing layout training pipelines use; `div` keeps the
    context arithmetic integer-exact and engine-portable."""
    ctx = 256
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(_toks(F.col("text"))).cast("long").alias("n_tok"),
    )
    d = d.withColumn("shard", (F.col("doc_id") % 16).cast("int"))
    w = Window.partitionBy("shard").orderBy("doc_id")
    d = d.withColumn("tok_end", F.sum("n_tok").over(w)).withColumn(
        "tok_start", F.col("tok_end") - F.col("n_tok")
    )
    # a zero-token doc occupies no stream space: its "last token"
    # clamps to tok_start so it reports the context it would open
    last_tok = f"greatest(tok_start, tok_end - 1) div {ctx}"
    return d.select(
        "doc_id",
        "shard",
        "n_tok",
        "tok_start",
        F.expr(f"tok_start div {ctx}").alias("pack_first"),
        F.expr(last_tok).alias("pack_last"),
        (F.expr(last_tok) - F.expr(f"tok_start div {ctx}") + F.lit(1))
        .cast("long")
        .alias("n_ctx"),
    )


def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-stride character chunking (the RAG/embedding
    chunker): windows of 180 chars at stride 120, last window
    ragged; empty docs still yield their one empty chunk so no row
    silently disappears.  Expression-only (sequence + posexplode +
    substring): no UDF, no shuffle — a pure map over the corpus, so
    it inherits the scan's partitioning at any scale."""
    win, stride = 180, 120
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").alias("n")
    )
    idx = F.sequence(
        F.lit(0),
        F.expr(f"cast((greatest(n, 1) - 1) div {stride} as int)"),
    )
    e = d.select(
        "doc_id", "text", F.posexplode(idx).alias("chunk_id", "_i")
    )
    chunk = F.substring(
        F.col("text"), F.col("chunk_id") * stride + 1, win
    )
    return e.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        (F.col("chunk_id").cast("long") * stride).alias("c_start"),
        chunk.alias("chunk"),
        F.length(chunk).cast("long").alias("c_len"),
    )


def q_exif_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF IFD1 thumbnail extraction + decode (EXIF 2.3 §4.6.3 —
    the Compression=6 JPEGInterchangeFormat layout every camera
    writes): host JPEGs carry a real chained-IFD1 thumbnail (built by
    exif.exif_payload, alternating II/MM wire orders), the stage
    slices it out and decodes it with the repo's own JPEG codec.
    Thumbnails are constant planes at q95 so dims and pixel mean are
    closed forms of doc_id; every 4th doc has no thumbnail and must
    report present=false with NULL features."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import exif as _exif
    from mechaml_spark import multimodal
    from mechaml_spark.jpeg import jpeg_encode as _jenc

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                host = _np.full((16, 16, 3), (did * 7) % 251, _np.uint8)
                thumb = None
                if did % 4 != 3:
                    s = 8 + 4 * (did % 3)
                    thumb = _jenc(
                        _np.full((s, s, 3), (did * 11) % 251, _np.uint8),
                        quality=95,
                    )
                payload = _exif.exif_payload(
                    {"Make": f"cam{did % 5}", "Orientation": 1 + did % 8},
                    byte_order="II" if did % 2 == 0 else "MM",
                    thumbnail=thumb,
                )
                data = _exif.jpeg_set_exif(_jenc(host, quality=95), payload)
                rows.append({"doc_id": did, "bytes": data})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary")
    th = multimodal.exif_thumbnails(media)
    return th.select(
        "doc_id",
        F.col("thumb")["present"].alias("has_thumb"),
        F.col("thumb")["tw"].alias("tw"),
        F.col("thumb")["th"].alias("th"),
        F.col("thumb")["mean_px"].alias("mean_px"),
    )


_HLL_M = 64  # registers (b = 6 bits)
_HLL_ALPHA_NUM = 0.709 * (_HLL_M**2) * float(1 << 55)  # inlined literal


def q_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog distinct-count sketch (Flajolet et
    al. 2007) — the frontier's "how many distinct URLs has this host
    contributed" estimator at 10^10 scale, where exact countDistinct
    shuffles every key.  Built from scratch on md5 so Spark and
    DuckDB produce BIT-IDENTICAL registers: 60 bits of the md5 ->
    top 6 bits pick one of 64 registers, rho = leading-zero count of
    the remaining 54 bits + 1 (via binary-string length — no float
    log anywhere), register = max(rho).  The register SUM is kept as
    the exact integer sum of 2^(55-rho) (order-free, so partial
    aggregation cannot perturb it; a float 2^-rho sum would be
    addition-order-dependent and nondeterministic across
    partitionings); the estimate divides an inlined double literal
    by that integer — one correctly-rounded division, identical in
    both engines.  v0 (untouched registers) is reported so a client
    can apply the standard linear-counting small-range correction
    (ln is deliberately kept OUT of the cross-engine contract).

    Scale posture: one partial-agg groupBy(key, bucket) max — the
    shuffle carries at most 64 rows per key — then a 64-row fold per
    key.  n_true (exact countDistinct) rides along at test scale to
    show sketch error; a production pipeline drops it."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    # 50% duplicate URLs so the sketch sees real repetition
    url = F.concat(
        F.lit("http://"), F.col("lang"), F.lit(".test/p"),
        F.expr("cast(doc_id div 2 as string)"),
    )
    h60 = F.conv(F.substring(F.md5(url.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )
    rows = d.select(
        "lang", url.alias("url"), h60.alias("h60")
    ).select(
        "lang",
        "url",
        F.expr(f"h60 div {1 << 54}").cast("int").alias("bucket"),
        (F.col("h60") % F.lit(1 << 54).cast("long")).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.conv(F.col("w"), 10, 2))
    )
    regs = rows.select(
        "lang", "url", "bucket", rho.cast("int").alias("rho")
    )
    per_reg = regs.groupBy("lang", "bucket").agg(
        F.max("rho").alias("rmax"),
        F.countDistinct("url").alias("_nd"),
    )
    agg = per_reg.groupBy("lang").agg(
        F.sum(
            F.expr("shiftleft(cast(1 as bigint), 55 - rmax)")
        ).alias("s_present"),
        F.count("*").alias("n_buckets"),
        F.sum("_nd").alias("n_true"),
    )
    s_reg = F.col("s_present") + (F.lit(64) - F.col("n_buckets")) * F.lit(
        1 << 55
    ).cast("long")
    return agg.select(
        "lang",
        F.col("n_true").cast("long").alias("n_true"),
        (F.lit(64) - F.col("n_buckets")).cast("int").alias("v0"),
        s_reg.cast("long").alias("s_reg"),
        (F.lit(_HLL_ALPHA_NUM) / s_reg.cast("double")).alias("est"),
    )


def q_freq_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (Cormode & Muthukrishnan 2005) —
    the heavy-hitter estimator (hot tokens, hot URLs, hot hosts) at
    scales where an exact per-key count is itself the bottleneck.
    Engine-portable like ``distinct_sketch``: 4 salted md5 hash rows
    x 512 counters, every counter an EXACT integer sum (order-free
    under partial aggregation), estimate = min over the 4 rows.
    Count-min never underestimates, so ``est >= n_true`` is an
    invariant the oracle check exercises on every row; the
    over-estimate ratio rides along in exact integer milli.

    Scale posture: counters build as one partial-agg groupBy(row,
    bucket) — at most 4x512 rows survive the shuffle regardless of
    corpus size; candidates (here: tokens with exact count >= 50,
    computed at test scale for comparison) probe the broadcast
    counter table."""
    d = _t(spark, sf_dir, "documents")
    tok_counts = (
        d.select(F.explode(_toks(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    def _bucket(hr):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(f"cm{hr}:"), F.col("tok")).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 512
        )

    # ONE pass over the exact counts: the 4 hash rows explode from an
    # in-row array (posexplode), not a 4-way union that would
    # re-aggregate the token counts once per row
    hashed = tok_counts.select(
        "tok",
        "n",
        F.posexplode(F.array(*[_bucket(hr) for hr in range(4)])).alias(
            "hrow", "bucket"
        ),
    )
    counters = hashed.groupBy("hrow", "bucket").agg(
        F.sum("n").alias("cnt")
    )
    cand = hashed.where(F.col("n") >= 50).select(
        "hrow", "bucket", "tok", "n"
    )
    est = (
        cand.join(F.broadcast(counters), ["hrow", "bucket"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est"), F.first("n").alias("n_true"))
    )
    return est.select(
        "tok",
        F.col("n_true").cast("long").alias("n_true"),
        F.col("est").cast("long").alias("est"),
        F.expr("(est * 1000) div n_true").alias("over_milli"),
    )


def q_http_cache_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9111 response-freshness policy for the recrawl scheduler —
    the header-derived half of `revisit_policy`: Cache-Control
    ``no-store`` / ``no-cache`` / ``max-age=N`` (which WINS over
    Expires per §4.2.1) and ``Expires`` vs ``Date`` HTTP-date
    arithmetic (parsed, not regex'd apart — both engines run a real
    timestamp parse), falling back to ``heuristic`` when nothing is
    asserted.  Expression-only over a raw header block; fresh_s is
    an exact integer epoch difference."""
    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 1000
    )
    i = d.doc_id
    mm = F.lpad(((i / 60).cast("long") % 60).cast("string"), 2, "0")
    ss = F.lpad((i % 60).cast("string"), 2, "0")
    m5 = i % 5
    headers = F.concat(
        F.lit("Date: Mon, 01 Jan 2024 00:00:00 GMT\r\n"),
        F.when(
            m5 == 0,
            F.concat(F.lit("Cache-Control: public, max-age="),
                     i % 7200,
                     F.lit("\r\nExpires: Mon, 01 Jan 2024 09:00:00 GMT"
                           "\r\n")),
        )
        .when(m5 == 1, F.lit("Cache-Control: no-store\r\n"))
        .when(m5 == 2,
              F.lit("Cache-Control: no-cache, private\r\n"))
        .when(
            m5 == 3,
            F.concat(F.lit("Expires: Mon, 01 Jan 2024 00:"), mm,
                     F.lit(":"), ss, F.lit(" GMT\r\n")),
        )
        .otherwise(F.lit("Server: test\r\n")),
    )
    h = d.select("doc_id", headers.alias("headers"))
    cc = F.regexp_extract(
        F.col("headers"), r"(?m)^Cache-Control: ([^\r\n]*)", 1
    )
    max_age = F.regexp_extract(cc, r"max-age=(\d+)", 1)
    # Spark 3+ forbids EEE in parse patterns: strip the weekday in
    # the extract, parse the fixed-width remainder
    date_ts = F.to_timestamp(
        F.regexp_extract(
            F.col("headers"),
            r"(?m)^Date: \w+, (\d+ \w+ \d+ [\d:]+) GMT", 1,
        ),
        "dd MMM yyyy HH:mm:ss",
    )
    exp_raw = F.regexp_extract(
        F.col("headers"), r"(?m)^Expires: ([^\r\n]*)", 1
    )
    exp_ts = F.to_timestamp(
        F.regexp_extract(
            F.col("headers"),
            r"(?m)^Expires: \w+, (\d+ \w+ \d+ [\d:]+) GMT", 1,
        ),
        "dd MMM yyyy HH:mm:ss",
    )
    policy = (
        F.when(cc.contains("no-store"), F.lit("no-store"))
        .when(cc.contains("no-cache"), F.lit("no-cache"))
        .when(max_age != "", F.lit("max-age"))
        .when(exp_raw != "", F.lit("expires"))
        .otherwise(F.lit("heuristic"))
    )
    fresh = (
        F.when(cc.contains("no-store") | cc.contains("no-cache"),
               F.lit(0))
        .when(max_age != "", max_age.cast("long"))
        .when(
            exp_raw != "",
            F.unix_timestamp(exp_ts) - F.unix_timestamp(date_ts),
        )
        .otherwise(F.lit(None).cast("long"))
    )
    return h.select(
        "doc_id", policy.alias("policy"),
        fresh.cast("long").alias("fresh_s"),
    )


_HTTP_CACHE_ORACLE = """
    SELECT doc_id,
           CASE doc_id % 5
             WHEN 0 THEN 'max-age'
             WHEN 1 THEN 'no-store'
             WHEN 2 THEN 'no-cache'
             WHEN 3 THEN 'expires'
             ELSE 'heuristic'
           END AS policy,
           CASE doc_id % 5
             WHEN 0 THEN doc_id % 7200
             WHEN 1 THEN 0
             WHEN 2 THEN 0
             WHEN 3 THEN 60 * ((doc_id // 60) % 60) + doc_id % 60
             ELSE NULL
           END AS fresh_s
    FROM documents WHERE doc_id < 1000
"""


def q_dom_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOM structural statistics (:func:`mechaml_spark.htmlkit.
    parser.dom_stats`) — element count, max element depth, raw text
    chars, and the text-to-markup permille a template-heaviness
    quality gate runs on.  Pages nest 1+d%4 divs around documents
    text with a fixed head/p frame, so every statistic is a closed
    form of (doc_id, n_chars) and the ratio's denominator is the
    length of the SAME body string the oracle reconstructs in SQL."""
    import pandas as _pd

    from mechaml_spark.htmlkit.parser import dom_stats

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    ).where(F.col("doc_id") < 500)

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                k = 1 + did % 4
                body = (
                    "<html><head><title>T</title></head><body>"
                    + "<div>" * k + text + "</div>" * k
                    + "<p>x</p></body></html>"
                )
                n_tags, max_depth, text_chars = dom_stats(body)
                rows.append({
                    "doc_id": did, "n_tags": n_tags,
                    "max_depth": max_depth, "text_chars": text_chars,
                    "markup_ratio_milli":
                        text_chars * 1000 // len(body),
                })
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "n_tags", "max_depth",
                         "text_chars", "markup_ratio_milli"],
            )

    return d.mapInPandas(
        gen,
        schema="doc_id long, n_tags long, max_depth long, "
               "text_chars long, markup_ratio_milli long",
    )


_DOM_STATS_ORACLE = """
    WITH b AS (
        SELECT doc_id, n_chars, 1 + doc_id % 4 AS k,
               '<html><head><title>T</title></head><body>'
               || repeat('<div>', CAST(1 + doc_id % 4 AS INT)) || text
               || repeat('</div>', CAST(1 + doc_id % 4 AS INT))
               || '<p>x</p></body></html>' AS body
        FROM documents WHERE doc_id < 500
    )
    SELECT doc_id,
           CAST(5 + k AS BIGINT) AS n_tags,
           CAST(greatest(3, 2 + k) AS BIGINT) AS max_depth,
           CAST(n_chars + 2 AS BIGINT) AS text_chars,
           CAST((n_chars + 2) * 1000 // len(body) AS BIGINT)
               AS markup_ratio_milli
    FROM b
"""


def q_pipeline_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three pipeline stages COMPOSED in one plan — the shape a real
    training-data run takes (gate → dedup → corpus stats), proving
    the operators chain without materialization barriers: (1) the
    quality gate (chars 100-400, >=20 tokens, stop-word ratio), (2)
    exact dedup keeping the min-doc_id copy per text, (3) per-lang
    corpus statistics over survivors.  One SQL mirror runs the same
    three stages; Catalyst fuses the gate into the scan filter and
    the dedup + stats are two partial-agg groupBys — the composed
    plan is exactly what the stages cost individually, no glue."""
    d = _t(spark, sf_dir, "documents")
    toks = _toks(d.text)
    stops = F.filter(toks, lambda x: x.isin("the", "a", "and", "of"))
    gated = d.select(
        "doc_id", "lang", "text", "n_chars",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(stops).cast("long").alias("n_stop"),
    ).where(
        (F.col("n_chars") >= 100)
        & (F.col("n_chars") <= 400)
        & (F.col("n_tokens") >= 20)
        & (20 * F.col("n_stop") >= F.col("n_tokens"))
    )
    kept = gated.groupBy("text").agg(
        F.min("doc_id").alias("keeper"),
        F.min("lang").alias("lang"),
        F.min("n_tokens").alias("n_tokens"),
        F.count("*").alias("n_copies"),
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_unique"),
        F.sum("n_copies").cast("long").alias("n_gated"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("keeper").cast("long").alias("min_keeper"),
    )


_PIPELINE_COMPOSE_ORACLE = """
    WITH g AS (
        SELECT doc_id, lang, text, n_chars,
               len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens,
               len(list_filter(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
                   x -> x IN ('the','a','and','of'))) AS n_stop
        FROM documents
    ), gated AS (
        SELECT * FROM g
        WHERE n_chars BETWEEN 100 AND 400 AND n_tokens >= 20
          AND 20 * n_stop >= n_tokens
    ), kept AS (
        SELECT text, MIN(doc_id) AS keeper, MIN(lang) AS lang,
               MIN(n_tokens) AS n_tokens, COUNT(*) AS n_copies
        FROM gated GROUP BY text
    )
    SELECT lang, COUNT(*) AS n_unique,
           CAST(SUM(n_copies) AS BIGINT) AS n_gated,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(keeper) AS BIGINT) AS min_keeper
    FROM kept GROUP BY lang
"""


def url_template_col(url) -> "F.Column":
    """URL → structural template: hex runs (>=8) → ``{x}`` FIRST (so
    a hex id never half-collapses into digits), digit runs → ``{d}``,
    query values → ``={v}`` keeping key names.  Shared by the
    `url_templates` driver query and the streaming crawl's
    incremental template-cardinality fold (parity asserted in
    tests)."""
    hexed = F.regexp_replace(url, "[0-9a-f]{8,}", "{x}")
    dig = F.regexp_replace(hexed, "[0-9]+", "{d}")
    return F.regexp_replace(dig, "=([^&=?]+)", "={v}")


def q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL template mining — the structural-dedup / crawl-trap
    signal `url_hygiene` doesn't cover: URLs collapse to templates
    (digit runs → ``{d}``, >=8-char hex runs → ``{x}``, query VALUES
    → ``{v}`` keeping key names), then per (host, template) the
    frontier learns cardinality: a template with huge fan-out is a
    calendar/session trap or a paginated listing to cap, and
    template identity is the cheapest URL-level near-dup key.
    Expression-only regexp_replace chain (pinned order: hex before
    digits, so a hex id never half-collapses) + one partial-agg
    groupBy — codegen, one shuffle on the fine-grained template key.
    The oracle applies the identical replacements in SQL."""
    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 2000
    )
    m4 = d.doc_id % 4
    url = (
        F.when(
            m4 == 0,
            F.concat(F.lit("http://h"), d.doc_id % 8,
                     F.lit(".test/item/"), d.doc_id,
                     F.lit("/view?page="), d.doc_id % 30),
        )
        .when(
            m4 == 1,
            F.concat(F.lit("http://h"), d.doc_id % 8,
                     F.lit(".test/s/"),
                     F.md5((d.doc_id).cast("string")),
                     F.lit("/download")),
        )
        .when(
            m4 == 2,
            F.concat(F.lit("http://h"), d.doc_id % 8,
                     F.lit(".test/cal/2021/"), d.doc_id % 12 + 1,
                     F.lit("/"), d.doc_id % 28 + 1,
                     F.lit("?sid="), F.md5((d.doc_id * 3).cast("string"))),
        )
        .otherwise(
            F.concat(F.lit("http://h"), d.doc_id % 8,
                     F.lit(".test/about")),
        )
    )
    tpl = url_template_col(url)
    rows = d.select(
        F.regexp_extract(url, "^https?://([^/]+)", 1).alias("host"),
        tpl.alias("template"),
        url.alias("url"),
    )
    return rows.groupBy("host", "template").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("url").alias("n_distinct"),
    )


_URL_TEMPLATES_ORACLE = """
    WITH u AS (
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN 'http://h' || (doc_id % 8) || '.test/item/'
                     || doc_id || '/view?page=' || (doc_id % 30)
                 WHEN 1 THEN 'http://h' || (doc_id % 8) || '.test/s/'
                     || md5(CAST(doc_id AS VARCHAR)) || '/download'
                 WHEN 2 THEN 'http://h' || (doc_id % 8) || '.test/cal/2021/'
                     || (doc_id % 12 + 1) || '/' || (doc_id % 28 + 1)
                     || '?sid=' || md5(CAST(doc_id * 3 AS VARCHAR))
                 ELSE 'http://h' || (doc_id % 8) || '.test/about'
               END AS url
        FROM documents WHERE doc_id < 2000
    ), t AS (
        SELECT url,
               regexp_extract(url, '^https?://([^/]+)', 1) AS host,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(url, '[0-9a-f]{8,}', '{x}', 'g'),
                       '[0-9]+', '{d}', 'g'),
                   '=([^&=?]+)', '={v}', 'g') AS template
        FROM u
    )
    SELECT host, template,
           COUNT(*) AS n_urls,
           COUNT(DISTINCT url) AS n_distinct
    FROM t GROUP BY host, template
"""


def q_image_ssim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global SSIM (Wang et al. 2004) between image pairs — the
    perceptual counterpart of the payload PSNR invariant, used to
    verify re-encodes and score near-dup candidates.  EXACT-integer
    engine-portable form: the stage accumulates the six sufficient
    statistics (n, Sx, Sy, Sxx, Syy, Sxy) as exact integers over REAL
    PNG decodes, then evaluates the SSIM rational with C1/C2 scaled
    by 10^4 so numerator and denominator are exact big integers
    (Python int in the stage, HUGEINT in DuckDB — no float anywhere):

        ssim_milli = (1000 * (2*10^4*Sx*Sy + 65025*n^2)
                           * (2*10^4*(n*Sxy - Sx*Sy) + 585225*n^2))
                     div ((10^4*(Sx^2 + Sy^2) + 65025*n^4')
                           ... same structure for the variance term)

    Pairs are (constant plane a, same plane with the right half
    shifted by s) so every statistic is a closed form of doc_id;
    identical planes (s=0 when doc_id%17==0) must yield exactly
    1000."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark.imaging import png_decode, png_encode

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                a = (did * 7) % 200
                s = did % 17
                x = _np.full((16, 16, 3), a, _np.uint8)
                y = x.copy()
                y[:, 8:, :] += _np.uint8(s)
                rows.append(
                    {"doc_id": did, "png_a": png_encode(x),
                     "png_b": png_encode(y)}
                )
            yield _pd.DataFrame(rows,
                                columns=["doc_id", "png_a", "png_b"])

    pairs = d.mapInPandas(
        gen, schema="doc_id long, png_a binary, png_b binary"
    )

    def ssim_stage(batches):
        for pdf in batches:
            rows = []
            for did, ba, bb in zip(
                pdf["doc_id"], pdf["png_a"], pdf["png_b"]
            ):
                x = png_decode(bytes(ba)).astype(_np.int64)
                y = png_decode(bytes(bb)).astype(_np.int64)
                n = int(x.size)
                sx, sy = int(x.sum()), int(y.sum())
                sxx = int((x * x).sum())
                syy = int((y * y).sum())
                sxy = int((x * y).sum())
                # exact rational SSIM, C1/C2 x10^4 (6.5025 / 58.5225)
                num = (2 * 10**4 * sx * sy + 65025 * n * n) * (
                    2 * 10**4 * (n * sxy - sx * sy) + 585225 * n * n
                )
                den = (10**4 * (sx * sx + sy * sy) + 65025 * n * n) * (
                    10**4 * (n * sxx - sx * sx + n * syy - sy * sy)
                    + 585225 * n * n
                )
                rows.append(
                    {"doc_id": int(did), "n_px": n,
                     "ssim_milli": (1000 * num) // den}
                )
            yield _pd.DataFrame(
                rows, columns=["doc_id", "n_px", "ssim_milli"]
            )

    return pairs.mapInPandas(
        ssim_stage, schema="doc_id long, n_px long, ssim_milli long"
    )


_IMAGE_SSIM_ORACLE = """
    WITH s AS (
        SELECT doc_id,
               CAST(768 AS HUGEINT) AS n,
               CAST((doc_id * 7) % 200 AS HUGEINT) AS a,
               CAST(doc_id % 17 AS HUGEINT) AS sh
        FROM documents WHERE doc_id < 300
    ), m AS (
        SELECT doc_id, n,
               n * a AS sx,
               n * a + (n // 2) * sh AS sy,
               n * a * a AS sxx,
               (n // 2) * (a * a + (a + sh) * (a + sh)) AS syy,
               (n // 2) * (a * a + a * (a + sh)) AS sxy
        FROM s
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_px,
           CAST((1000 * ((2 * 10000 * sx * sy + 65025 * n * n)
                 * (2 * 10000 * (n * sxy - sx * sy) + 585225 * n * n)))
                // ((10000 * (sx * sx + sy * sy) + 65025 * n * n)
                 * (10000 * (n * sxx - sx * sx + n * syy - sy * sy)
                    + 585225 * n * n)) AS BIGINT) AS ssim_milli
    FROM m
"""


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher document-quality rule table (Rae et al. 2021,
    "Scaling Language Models", table A1 filtering) as named boolean
    gates, every comparison EXACT-integer (mean-word-length bounds as
    ``3n <= chars <= 10n`` — no float ratio anywhere): word-count
    window, mean word length 3-10, symbol-to-word ratio (# and ...),
    bullet-start <= 90% of lines, ellipsis-end <= 30% of lines,
    >= 80% words alphabetic, >= 2 of the 8-stop-word set.  Documents
    are extended with deterministic bullet / ellipsis / symbol lines
    so every rule fires on its own modulus class; the DuckDB oracle
    recomputes the identical counts over the identical text.
    Expression-only: one codegen project, zero shuffles, pushes below
    any downstream join like c4_filters."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    m3 = d.doc_id % 3
    extra = (
        F.when(m3 == 0, F.lit("\n- bullet one\n- bullet two"))
        .when(m3 == 1, F.lit("\ntrailing thought..."))
        .otherwise(F.lit("\n# # # # # # # # # #"))
    )
    t2 = F.concat(d.text, extra)
    toks = F.filter(F.split(t2, r"\s+"), lambda x: x != "")
    lines = F.split(t2, r"\n")
    n_words = F.size(toks).cast("long")
    total_chars = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_alpha = F.size(
        F.filter(toks, lambda x: x.rlike("[a-zA-Z]"))
    ).cast("long")
    n_hash = (
        (F.length(t2) - F.length(F.replace(t2, F.lit("#"), F.lit(""))))
    ).cast("long")
    n_ellipsis = (
        (F.length(t2) - F.length(F.replace(t2, F.lit("..."), F.lit(""))))
        / 3
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("- ") | x.startswith("* "),
        )
    ).cast("long")
    n_ell_end = F.size(
        F.filter(lines, lambda x: x.rlike("\\.\\.\\.$"))
    ).cast("long")
    stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    n_stopset = sum(
        F.when(F.array_contains(toks, s), 1).otherwise(0) for s in stops
    ).cast("long")
    q = d.select(
        "doc_id",
        n_words.alias("n_words"),
        (n_words.between(50, 100000)).alias("r_words"),
        (
            (3 * n_words <= total_chars) & (total_chars <= 10 * n_words)
        ).alias("r_mean_len"),
        (10 * (n_hash + n_ellipsis) <= n_words).alias("r_symbol"),
        (10 * n_bullet <= 9 * n_lines).alias("r_bullet"),
        (10 * n_ell_end <= 3 * n_lines).alias("r_ellipsis"),
        (5 * n_alpha >= 4 * n_words).alias("r_alpha"),
        (n_stopset >= 2).alias("r_stop"),
    )
    return q.select(
        "*",
        (
            F.col("r_words") & F.col("r_mean_len") & F.col("r_symbol")
            & F.col("r_bullet") & F.col("r_ellipsis") & F.col("r_alpha")
            & F.col("r_stop")
        ).alias("keep"),
    )


_GOPHER_RULES_ORACLE = """
    WITH t AS (
        SELECT doc_id,
               text || CASE doc_id % 3
                 WHEN 0 THEN chr(10) || '- bullet one' || chr(10)
                     || '- bullet two'
                 WHEN 1 THEN chr(10) || 'trailing thought...'
                 ELSE chr(10) || '# # # # # # # # # #'
               END AS t2
        FROM documents
    ), c AS (
        SELECT doc_id, t2,
               list_filter(string_split_regex(t2, '\\s+'),
                           x -> x <> '') AS toks,
               string_split(t2, chr(10)) AS lines
        FROM t
    ), m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(coalesce(list_sum(
                   list_transform(toks, x -> len(x))), 0) AS BIGINT)
                   AS total_chars,
               CAST(len(list_filter(toks,
                   x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT)
                   AS n_alpha,
               CAST(len(t2) - len(replace(t2, '#', '')) AS BIGINT)
                   AS n_hash,
               CAST((len(t2) - len(replace(t2, '...', ''))) // 3
                   AS BIGINT) AS n_ellipsis,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(list_filter(lines,
                   x -> x LIKE '- %' OR x LIKE '* %')) AS BIGINT)
                   AS n_bullet,
               CAST(len(list_filter(lines,
                   x -> regexp_matches(x, '\\.\\.\\.$'))) AS BIGINT)
                   AS n_ell_end,
               CAST((CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END)
                  + (CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_stopset
        FROM c
    )
    SELECT doc_id, n_words,
           n_words BETWEEN 50 AND 100000 AS r_words,
           3 * n_words <= total_chars AND total_chars <= 10 * n_words
               AS r_mean_len,
           10 * (n_hash + n_ellipsis) <= n_words AS r_symbol,
           10 * n_bullet <= 9 * n_lines AS r_bullet,
           10 * n_ell_end <= 3 * n_lines AS r_ellipsis,
           5 * n_alpha >= 4 * n_words AS r_alpha,
           n_stopset >= 2 AS r_stop,
           (n_words BETWEEN 50 AND 100000)
               AND (3 * n_words <= total_chars
                    AND total_chars <= 10 * n_words)
               AND (10 * (n_hash + n_ellipsis) <= n_words)
               AND (10 * n_bullet <= 9 * n_lines)
               AND (10 * n_ell_end <= 3 * n_lines)
               AND (5 * n_alpha >= 4 * n_words)
               AND (n_stopset >= 2) AS keep
    FROM m
"""


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log-histogram quantile sketch (the DDSketch shape,
    Masson et al. VLDB 2019) — completing the sketch family next to
    HLL (``distinct_sketch``) and count-min (``freq_sketch``): the
    per-key latency/size percentile estimator at scales where exact
    quantiles mean a full sort.  Engine-portable and EXACT-integer
    like its siblings: bucket id for a positive int v is
    ``(e, v >> max(0, e-3))`` with ``e = floor(log2 v)`` computed via
    binary-STRING length (no float log anywhere), i.e. one bucket per
    top-4-bits-per-octave — guaranteed relative error <= 2^-3 = 12.5%
    on the reported lower bound (asserted in tests).  The sketch is a
    groupBy(key, bucket) count — order-free partial aggregation, at
    most 16 rows per octave per key cross the shuffle — and the
    quantile walk is a pure array fold over the sorted bucket list
    (no window function in the Spark plan), picking the first bucket
    whose cumulative count reaches the ceil permille rank
    ``(n*p + 999) div 1000``.  DuckDB mirrors the identical
    arithmetic with a window cumsum, bit-for-bit."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    v = (1 + (F.col("doc_id") * F.col("doc_id")) % 100000).cast("long")
    e = (F.length(F.conv(F.col("v"), 10, 2)) - 1).cast("int")
    rows = (
        d.select("lang", v.alias("v"))
        .select("lang", "v", e.alias("e"))
        # shiftright/shiftleft by a COLUMN needs the SQL form (the
        # pyspark wrappers take a literal int only)
        .select(
            "lang",
            F.expr(
                "e * 16 + shiftright(v, greatest(0, e - 3))"
            ).cast("long").alias("bucket"),
            F.expr(
                "shiftleft(shiftright(v, greatest(0, e - 3)),"
                " greatest(0, e - 3))"
            ).cast("long").alias("lb"),
        )
    )
    sk = rows.groupBy("lang", "bucket").agg(
        F.count("*").alias("cnt"), F.first("lb").alias("lb")
    )
    per_key = sk.groupBy("lang").agg(
        F.sort_array(
            F.collect_list(F.struct("bucket", "cnt", "lb"))
        ).alias("arr"),
        F.sum("cnt").alias("n"),
        F.count("*").alias("n_buckets"),
    )

    def pick(permille: int):
        return F.expr(
            f"""aggregate(
                arr,
                struct(cast(0 as bigint) as cum, cast(-1 as bigint) as lb),
                (acc, x) -> if(acc.lb >= 0, acc,
                    if(acc.cum + x.cnt >= (n * {permille} + 999) div 1000,
                       struct(acc.cum + x.cnt as cum, x.lb as lb),
                       struct(acc.cum + x.cnt as cum,
                              cast(-1 as bigint) as lb)))
            ).lb"""
        )

    return per_key.select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("n_buckets").cast("long").alias("n_buckets"),
        pick(500).alias("p50_lb"),
        pick(900).alias("p90_lb"),
        pick(990).alias("p99_lb"),
    )


_QUANTILE_SKETCH_ORACLE = """
    WITH vals AS (
        SELECT lang, 1 + (doc_id * doc_id) % 100000 AS v
        FROM documents
    ), b AS (
        SELECT lang, v,
               length(printf('%b', v)) - 1 AS e
        FROM vals
    ), bk AS (
        SELECT lang,
               e * 16 + (v >> greatest(0, e - 3)) AS bucket,
               (v >> greatest(0, e - 3)) << greatest(0, e - 3) AS lb
        FROM b
    ), sk AS (
        SELECT lang, bucket, COUNT(*) AS cnt, MIN(lb) AS lb
        FROM bk GROUP BY lang, bucket
    ), cum AS (
        SELECT lang, bucket, lb, cnt,
               SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket) AS c,
               SUM(cnt) OVER (PARTITION BY lang) AS n
        FROM sk
    )
    SELECT lang, CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MIN(CASE WHEN c >= (n * 500 + 999) // 1000
                    THEN lb END) AS BIGINT) AS p50_lb,
           CAST(MIN(CASE WHEN c >= (n * 900 + 999) // 1000
                    THEN lb END) AS BIGINT) AS p90_lb,
           CAST(MIN(CASE WHEN c >= (n * 990 + 999) // 1000
                    THEN lb END) AS BIGINT) AS p99_lb
    FROM cum GROUP BY lang
"""


def q_image_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-palette extraction by median-cut quantization
    (Heckbert 1982, the classic k-color reduction behind GIF/indexed
    thumbnails and palette-based image dedup): decode PNG bytes, cut
    the color cube to k=4 boxes, report each box's floor-mean color.
    Corpus images are four-quadrant planes whose colors are closed
    forms of doc_id and split cleanly (equal counts, widest channel
    always R), so the exact palette is SQL-expressible.  Scale
    posture: decode + quantize per row inside mapInPandas — pixels
    never shuffle; only (doc_id, 4 palette rows) leave the worker."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 200
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.zeros((16, 16, 3), _np.uint8)
                for i, sl in enumerate(
                    ((slice(0, 8), slice(0, 8)), (slice(0, 8), slice(8, 16)),
                     (slice(8, 16), slice(0, 8)), (slice(8, 16), slice(8, 16)))
                ):
                    px[sl] = (
                        30 + 60 * i + did % 8,
                        (did * 5) % 256,
                        (did * 7) % 256,
                    )
                rows.append({"doc_id": did, "bytes": _im.png_encode(px)})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary")

    def quant(batches):
        for pdf in batches:
            out = {"doc_id": [], "slot": [], "r": [], "g": [], "b": []}
            for did, data in zip(pdf["doc_id"], pdf["bytes"]):
                pal = _im.median_cut_palette(
                    _im.png_decode(bytes(data)), 4
                )
                for s, (r, g, b) in enumerate(pal):
                    out["doc_id"].append(int(did))
                    out["slot"].append(s)
                    out["r"].append(int(r))
                    out["g"].append(int(g))
                    out["b"].append(int(b))
            yield _pd.DataFrame(out)

    return media.mapInPandas(
        quant, schema="doc_id long, slot int, r int, g int, b int"
    )


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease per document (the classic text-quality
    feature: 206.835 - 1.015*(words/sentences) - 84.6*(syll/words)),
    with heuristic counts — words = whitespace tokens, sentences =
    `[.!?]+` group count clamped to >= 1, syllables = `[aeiouy]+`
    vowel-group count over the lowercased text.  The formula uses
    only +,-,*,/ on doubles, all IEEE correctly-rounded, so Spark and
    DuckDB produce bit-identical scores — no transcendental ever
    enters the plan.  Expression-only: one codegen project over the
    scan, zero shuffle at any scale."""
    d = _t(spark, sf_dir, "documents")
    words = F.size(_toks(F.col("text"))).cast("long")
    sents = F.greatest(
        F.lit(1).cast("long"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))
        ).cast("long"),
    )
    syll = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
    ).cast("long")
    q = d.select(
        "doc_id",
        words.alias("n_words"),
        sents.alias("n_sents"),
        syll.alias("n_syll"),
    ).where(F.col("n_words") > 0)
    fre = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sents"))
        - F.lit(84.6) * (F.col("n_syll").cast("double") / F.col("n_words"))
    )
    return q.select(
        "doc_id", "n_words", "n_sents", "n_syll", fre.alias("fre")
    )


def q_word_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining over adjacent token bigrams (the phrase-
    detection stage of word2vec-style preprocessing): lift =
    P(ab)/(P(a)P(b)) reported as the EXACT integer milli-ratio
    ``(n_ab * N * 1000) div (n_a * n_b)`` — monotone in PMI with no
    ln/float to drift across engines.  Only bigrams seen >= 3 times
    with lift > 1x survive.

    Scale posture: two partial-agg groupBys (unigrams, bigrams) whose
    shuffles carry (token, count) rows, then the unigram table joins
    back twice; at web scale the unigram side is Zipf-small after a
    min-count filter and broadcasts."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", _toks(F.lower(F.col("text"))).alias("ws")
    )
    toks = d.select(F.explode("ws").alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("n_w"))
    n_total = toks.count()
    # adjacent bigrams built INSIDE the token array (pure map — the
    # token stream never self-joins); explode ships only bigram keys
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 1),
        lambda i: F.struct(
            F.element_at("ws", i).alias("w1"),
            F.element_at("ws", i + 1).alias("w2"),
        ),
    )
    big = (
        d.where(F.size("ws") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    j = big.join(
        F.broadcast(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a"))),
        "w1",
    ).join(
        F.broadcast(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b"))),
        "w2",
    )
    return j.select(
        "w1",
        "w2",
        "n_ab",
        "n_a",
        "n_b",
        F.expr(f"(n_ab * {n_total} * 1000) div (n_a * n_b)").alias(
            "lift_milli"
        ),
    ).where(F.col("lift_milli") > 1000)


def textrank_scores(
    d: DataFrame, iters: int = 3, damping_micro: int = 850_000
) -> DataFrame:
    """TextRank (Mihalcea & Tarau 2004) over per-document word
    co-occurrence graphs, in EXACT integer micro fixed-point so two
    engines agree bit-for-bit.

    ``d`` carries ``(doc_id, ws)`` where ``ws`` is the kept-token
    array.  The graph is the set of DISTINCT undirected edges between
    adjacent kept tokens (self-loops dropped); each power-iteration
    step is ``s'(w) = (1M - damping) + damping * S // 1M`` with
    ``S = sum over neighbours u of s(u) // deg(u)`` — floor division
    in a pinned order (per-edge first, then the sum), all positive
    int64, so Spark's ``div`` and DuckDB's ``//`` coincide.

    Scale posture: every join and groupBy keys on ``(doc_id, word)``
    — per-doc graphs never mix across documents, the ``iters`` join
    rounds reuse one co-partitioning, and edge rows carry only two
    short words.  Degrees attach to the directed-edge table once,
    outside the loop."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 1),
        lambda i: F.struct(
            F.element_at("ws", i).alias("w1"),
            F.element_at("ws", i + 1).alias("w2"),
        ),
    )
    e = (
        d.where(F.size("ws") >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            F.least("p.w1", "p.w2").alias("a"),
            F.greatest("p.w1", "p.w2").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    dir_e = e.select(
        "doc_id", F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        e.select("doc_id", F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = dir_e.groupBy("doc_id", "src").agg(
        F.count("*").cast("long").alias("deg")
    )
    # one materialization: the directed-edge+degree table drives every
    # power-iteration join — without the checkpoint each of the
    # ``iters`` branches re-derives explode+distinct+degree at run
    # time, and the static plan grows a copy of that subtree per step
    de = dir_e.join(deg, ["doc_id", "src"]).localCheckpoint(eager=False)
    base = 1_000_000 - damping_micro
    s = deg.select(
        "doc_id", F.col("src").alias("w"), F.lit(1_000_000).cast("long").alias("s")
    )
    for _ in range(iters):
        contrib = (
            de.join(s.withColumnRenamed("w", "src"), ["doc_id", "src"])
            .select(
                "doc_id",
                F.col("dst").alias("w"),
                F.expr("s div deg").alias("c"),
            )
            .groupBy("doc_id", "w")
            .agg(F.sum("c").alias("cs"))
        )
        s = contrib.select(
            "doc_id",
            "w",
            F.expr(f"{base} + ({damping_micro} * cs) div 1000000").alias("s"),
        )
    return s


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction for topic tagging / corpus curation: top-3
    TextRank words per document (score desc, word asc tie-break) over
    the adjacency graph of kept tokens (len >= 3, stopwords out).
    The oracle unrolls the same 3 integer power-iteration steps as
    CTEs — same recipe as pagerank_frontier / opic_scores."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(
            _toks(F.lower(F.col("text"))),
            lambda x: (F.length(x) >= 3) & ~x.isin("the", "and"),
        ).alias("ws"),
    )
    s = textrank_scores(d)
    win = Window.partitionBy("doc_id").orderBy(
        F.col("s").desc(), F.col("w").asc()
    )
    return (
        s.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= 3)
        .select(
            "doc_id",
            "rank",
            F.col("w").alias("word"),
            F.col("s").alias("score_micro"),
        )
    )


def q_image_cropdetect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Letterbox/pillarbox border detection (the ffmpeg ``cropdetect``
    stage every video/image dataset pipeline runs before feature
    extraction): decode PNG bytes, find the bounding box of rows and
    columns whose max integer BT.601 luma exceeds 24, report the
    ffmpeg-style ``(crop_x, crop_y, crop_w, crop_h)``.  Corpus images
    are 24x32 frames with black borders of closed-form widths
    (top/bottom = doc_id % 5, left/right = (doc_id*3) % 7) around a
    bright two-tone content plate; every 37th image is entirely
    near-black to exercise the all-dark degenerate branch (crop =
    0,0,0,0).  The detected box is therefore a pure closed form of
    doc_id and the oracle recomputes it arithmetically.  Scale
    posture: decode + luma scan per row inside mapInPandas — pixels
    never shuffle; four ints per image leave the worker."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.zeros((24, 32, 3), _np.uint8)
                if did % 37 == 0:
                    px[:] = 15  # luma 15 <= 24: all-dark frame
                else:
                    t, l = did % 5, (did * 3) % 7
                    px[t : 24 - t, l : 16] = (
                        40 + did % 160, 200, 60,
                    )
                    px[t : 24 - t, 16 : 32 - l] = (
                        200, 40 + (did * 7) % 160, 90,
                    )
                rows.append({"doc_id": did, "bytes": _im.png_encode(px)})
            yield _pd.DataFrame(rows, columns=["doc_id", "bytes"])

    media = d.mapInPandas(gen, schema="doc_id long, bytes binary")

    def crop(batches):
        for pdf in batches:
            out = {"doc_id": [], "crop_x": [], "crop_y": [],
                   "crop_w": [], "crop_h": []}
            for did, data in zip(pdf["doc_id"], pdf["bytes"]):
                x, y, w, h = _im.detect_crop(_im.png_decode(bytes(data)))
                out["doc_id"].append(int(did))
                out["crop_x"].append(x)
                out["crop_y"].append(y)
                out["crop_w"].append(w)
                out["crop_h"].append(h)
            yield _pd.DataFrame(out)

    return media.mapInPandas(
        crop,
        schema="doc_id long, crop_x int, crop_y int, crop_w int, crop_h int",
    )


_IDN_HOSTS = [
    "xn--bcher-kva.example",   # bücher.example — legitimate Latin IDN
    "xn--80ak6aa92e.com",      # аррӏе.com — whole-script Cyrillic spoof
    "xn--pypal-4ve.com",       # pаypal.com — mixed Latin+Cyrillic label
    "example.com",             # plain ASCII
    "xn--mxacde.example",      # αβγδ.example — Greek, not confusable
    "www.xn--fiqs8s",          # www.中国 — Han
    "xn--mgbh0fb.net",         # مثال.net — Arabic
    "xn--5dbqzzl.org",         # עברית.org — Hebrew
    "xn--!!!.bad",             # malformed ACE: kept verbatim, bad_ace
    "xn--vxaj.com",            # οκ.com — whole-script Greek confusable
]

# (decoded, scripts, mixed, confusable, bad_ace) per fixture above —
# stated literally so the DuckDB oracle can assert them; the Spark
# side RUNS the RFC 3492 decoder, tests/test_idn.py differentially
# checks it against CPython's independent punycode codec.
_IDN_EXPECT = [
    ("bücher.example", "latin", False, False, False),
    ("аррӏе.com", "cyrillic,latin", False, True, False),
    ("pаypal.com", "cyrillic,latin", True, False, False),
    ("example.com", "latin", False, False, False),
    ("αβγδ.example", "greek,latin", False, False, False),
    ("www.中国", "han,latin", False, False, False),
    ("مثال.net", "arabic,latin", False, False, False),
    ("עברית.org", "hebrew,latin", False, False, False),
    ("xn--!!!.bad", "latin,other", True, False, True),
    ("οκ.com", "greek,latin", False, True, False),
]


def q_idn_hostnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN hostname hygiene for the URL frontier: RFC 3492 punycode
    decode of ``xn--`` ACE labels plus the two standard UTS #39-style
    homograph signals (per-label mixed-script, whole-script
    Cyrillic/Greek->Latin confusable) and a malformed-ACE flag.  The
    reference never decodes hostnames (src/agent.ml passes the URI to
    the HTTP layer untouched); a 10^10-URL frontier that dedupes,
    politeness-buckets, and safety-gates per host needs the decoded
    form and the spoof flags.  Hosts are a 10-row fixture table of
    published homograph shapes (аррӏе.com et al.) cycled by doc_id;
    the oracle states the expected decode/flags literally while Spark
    actually runs the spec decoder (differentially tested against
    CPython's punycode codec).  Scale posture: expression-only host
    assembly + one Arrow-batched pandas stage; per-row scalar work,
    zero shuffle — scales exactly like the canonicalizer."""
    import pandas as _pd

    from mechaml_spark import idn as _idn

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 500)
        .withColumn(
            "host",
            F.element_at(
                F.array(*[F.lit(h) for h in _IDN_HOSTS]),
                (F.col("doc_id") % 10 + 1).cast("int"),
            ),
        )
    )

    def flags(batches):
        for pdf in batches:
            out = {"doc_id": [], "host": [], "decoded": [], "scripts": [],
                   "mixed_script": [], "confusable": [], "bad_ace": []}
            for did, host in zip(pdf["doc_id"], pdf["host"]):
                dec, bad = _idn.decode_host(str(host))
                s, m, c = _idn.script_flags(dec)
                out["doc_id"].append(int(did))
                out["host"].append(str(host))
                out["decoded"].append(dec)
                out["scripts"].append(s)
                out["mixed_script"].append(m)
                out["confusable"].append(c)
                out["bad_ace"].append(bad)
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        flags,
        schema=(
            "doc_id long, host string, decoded string, scripts string, "
            "mixed_script boolean, confusable boolean, bad_ace boolean"
        ),
    )


_IP_HOSTS = [
    "93.184.216.34",    # public dotted quad — is_ip, not blocked
    "127.0.0.1",        # loopback
    "2130706433",       # 127.0.0.1 as one decimal (inet_aton 1-part)
    "0x7F.0.0.1",       # hex first octet (case-insensitive)
    "017700000001",     # 127.0.0.1 as one octal literal
    "10.1.2.3",         # RFC 1918 10/8
    "172.16.0.5",       # RFC 1918 172.16/12
    "192.168.1.1",      # RFC 1918 192.168/16
    "169.254.9.9",      # link-local 169.254/16
    "100.64.0.1",       # CGNAT 100.64/10
    "239.255.255.250",  # multicast (SSDP)
    "0.1.2.3",          # this-network 0/8
    "192.168.257",      # 3-part short form -> 192.168.1.1
    "127.1",            # 2-part short form -> 127.0.0.1
    "example.com",      # ordinary hostname — not an IP
    "256.1.1.1",        # octet overflow — inet_aton fails, not an IP
]


def q_ip_hostnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSRF gate for the fetch stage: classify IPv4-literal hosts in
    every ``inet_aton`` spelling crawled HTML abuses (dotted quads,
    1/2/3-part short forms, decimal / leading-zero-octal / 0x-hex
    parts in any mix), canonicalize to the dotted quad, and flag the
    reserved ranges a distributed fetcher must never dial (RFC 1918,
    loopback, link-local, CGNAT, 0/8, 224/4+).  The reference hands
    the URI string straight to the HTTP stack (src/agent.ml); a
    fetcher fleet inside a VPC needs this on every frontier row,
    which is why :func:`mechaml_spark.urlkit.ip_literal_cols` is
    expression-only — conv/transform/aggregate under whole-stage
    codegen, zero Python, zero shuffle.  Hosts are a 16-row fixture
    of the canonical abuse spellings cycled by doc_id; the oracle
    states the expected classification literally while Spark runs
    the real expressions (differentially tested against
    ``socket.inet_aton`` in tests/test_ipliteral.py)."""
    from mechaml_spark.urlkit import ip_literal_cols

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 800)
        .withColumn(
            "host",
            F.element_at(
                F.array(*[F.lit(h) for h in _IP_HOSTS]),
                (F.col("doc_id") % 16 + 1).cast("int"),
            ),
        )
    )
    return d.select("doc_id", "host", *ip_literal_cols(F.col("host")))


_IP6_HOSTS = [
    "[::1]",                      # loopback
    "[fe80::1ff:fe23:4567:890a]", # link-local
    "[fd12:3456:789a::1]",        # ULA fc00::/7
    "[2001:db8::2:1]",            # documentation range
    "[2606:2800:220:1:248:1893:25c8:1946]",  # global (example.com)
    "[::ffff:127.0.0.1]",         # v4-mapped loopback
    "[::ffff:10.1.2.3]",          # v4-mapped RFC 1918
    "[::ffff:93.184.216.34]",     # v4-mapped public
    "[ff02::fb]",                 # multicast (mDNS)
    "[::]",                       # unspecified
    "[2001:db8::zz]",             # malformed: kept verbatim, not an IP
    "example.com",                # not bracketed, not v6
]


def q_ip6_hostnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv6 side of the SSRF gate (the v4 twin is `ip_hostnames`):
    bracketed IPv6 URL hosts parsed with the stdlib grammar
    (``::`` elision, embedded dotted-quad tails) and classified
    against the ranges a VPC fetcher must not dial — loopback ::1,
    link-local fe80::/10, ULA fc00::/7, documentation 2001:db8::/32,
    multicast ff00::/8, unspecified ::, and v4-MAPPED addresses
    (::ffff:a.b.c.d) classified by their embedded IPv4 so the v4
    reserved ranges cannot be smuggled through a v6 literal.
    12-host fixture cycled by doc_id; the oracle states the
    classification literally while Spark runs the real parser.
    Scale posture: one Arrow-batched pandas stage, per-row scalar
    work, zero shuffle — scales like the canonicalizer."""
    import ipaddress as _ip

    import pandas as _pd

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 600)
        .withColumn(
            "host",
            F.element_at(
                F.array(*[F.lit(h) for h in _IP6_HOSTS]),
                (F.col("doc_id") % 12 + 1).cast("int"),
            ),
        )
    )

    def classify(batches):
        for pdf in batches:
            out = {"doc_id": [], "host": [], "is_ip6": [],
                   "canonical": [], "blocked": [], "block_reason": []}
            for did, host in zip(pdf["doc_id"], pdf["host"]):
                host = str(host)
                addr = None
                if host.startswith("[") and host.endswith("]"):
                    try:
                        addr = _ip.IPv6Address(host[1:-1])
                    except ValueError:
                        addr = None
                reason = None
                if addr is not None:
                    v4 = addr.ipv4_mapped
                    if v4 is not None:
                        if v4.is_loopback:
                            reason = "v4-mapped-loopback"
                        elif v4.is_private:
                            reason = "v4-mapped-private"
                    elif addr.is_unspecified:
                        reason = "unspecified"
                    elif addr.is_loopback:
                        reason = "loopback"
                    elif addr.is_link_local:
                        reason = "link-local"
                    elif addr.is_multicast:
                        reason = "multicast"
                    elif addr in _ip.ip_network("fc00::/7"):
                        reason = "unique-local"
                    elif addr in _ip.ip_network("2001:db8::/32"):
                        reason = "documentation"
                out["doc_id"].append(int(did))
                out["host"].append(host)
                out["is_ip6"].append(addr is not None)
                out["canonical"].append(
                    addr.compressed if addr is not None else None
                )
                out["blocked"].append(reason is not None)
                out["block_reason"].append(reason)
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        classify,
        schema=(
            "doc_id long, host string, is_ip6 boolean, canonical string, "
            "blocked boolean, block_reason string"
        ),
    )


def q_caption_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION / DataComp-style caption junk filters for image-text
    pair curation: token count, filename-like (IMG_1234.JPG), URL in
    caption, boilerplate phrases, all-caps, integer digit permille,
    too-short, and the combined ``keep`` gate.  Captions are a closed
    form of doc_id — one modulus class per junk shape with pinned
    precedence (filename > url > boilerplate > caps > short > good) —
    so the oracle derives every flag arithmetically while Spark runs
    the REAL expression-only rule set
    (:func:`mechaml_spark.metadata.caption_quality_cols`).  Scale
    posture: single-pass regexp/length expressions, whole-stage
    codegen, zero shuffle — the gate runs inline in the fetch stage
    at 10^10 (image, caption) rows."""
    from mechaml_spark.metadata import caption_quality_cols

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 800
    )
    did = F.col("doc_id")
    caption = (
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit("IMG_"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
                F.lit(".JPG"),
            ),
        )
        .when(
            did % 5 == 0,
            F.concat(
                F.lit("see http://ex"),
                (did % 9).cast("string"),
                F.lit(".test/p now"),
            ),
        )
        .when(
            did % 11 == 0,
            F.concat(
                F.lit("click to enlarge stock photo "),
                (did % 100).cast("string"),
            ),
        )
        .when(
            did % 13 == 0,
            F.concat(
                F.lit("GREAT PRODUCT NUMBER "), (did % 100).cast("string")
            ),
        )
        .when(did % 3 == 0, F.lit("img"))
        .otherwise(
            F.concat(
                F.lit("a photo of item "),
                (did % 50).cast("string"),
                F.lit(" on a wooden table"),
            )
        )
    )
    return d.select(
        "doc_id",
        caption.alias("caption"),
        *caption_quality_cols(caption),
    )


def q_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SDXL-style multi-aspect training buckets over the image table:
    resolution gate (>= 0.25 MP), extreme-ratio gate (long side <= 4x
    short side), and nearest-aspect assignment into the pinned
    64-multiple bucket list by exact-integer relative ratio error
    (micro units) with (distance, index) tie-break — the standard
    prep stage between an image crawl and a diffusion trainer.
    Dimensions are a closed form of doc_id (w = 128 + 97*d mod 1920,
    h = 128 + 53*d mod 1080), so the oracle replays the identical
    integer arithmetic per bucket in SQL while Spark evaluates the
    one-expression ``array_min(transform(...))`` form
    (:func:`mechaml_spark.multimodal.aspect_bucket_expr`).  Scale
    posture: whole-stage codegen, zero shuffle, 15-element constant
    array per row — runs inline in the ingest scan at 10^10 rows."""
    from mechaml_spark.multimodal import aspect_bucket_expr

    did = F.col("doc_id")
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .where(did < 1000)
        .withColumn("w", (F.lit(128) + (did * 97) % 1920).cast("int"))
        .withColumn("h", (F.lit(128) + (did * 53) % 1080).cast("int"))
    )
    ok = (
        (F.col("w").cast("long") * F.col("h") >= 262144)
        & (
            F.greatest("w", "h").cast("long")
            <= 4 * F.least("w", "h").cast("long")
        )
    ).alias("ok")
    best = aspect_bucket_expr("w", "h")
    return d.select(
        "doc_id",
        "w",
        "h",
        ok,
        F.when(ok, best["i"]).alias("bucket_i"),
        F.when(ok, best["w"]).alias("bucket_w"),
        F.when(ok, best["h"]).alias("bucket_h"),
        F.when(ok, best["d"]).alias("ratio_err_micro"),
    )


def q_svg_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SVG structure probe (svgkit.svg_probe): intrinsic size in exact
    milli-px (CSS 96-dpi unit ratios, rational round-half-up — doc_id%6
    cycles px/pt/mm/cm/in/pc), viewBox sizing fallback when the
    width/height attributes are absent (doc_id%5==0), element counts,
    and the sanitizer flags (script element, on* event attribute,
    external http ref) — the "is this image markup safe/usable"
    gate a crawl must answer before serving or training on SVG.
    Every field is the stated closed form over doc_id.  Scale
    posture: XML walk in mapInPandas, bytes never shuffle, small
    typed columns out, zero exchanges."""
    import pandas as _pd

    from mechaml_spark import svgkit as _svg

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 500
    )

    def gen(batches):
        units = ["px", "pt", "mm", "cm", "in", "pc"]
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                wv, hv = 20 + did % 80, 10 + did % 40
                data = _svg.svg_write(
                    wv, hv, units[did % 6],
                    viewbox_only=(did % 5 == 0),
                    n_rects=1 + did % 4,
                    n_paths=did % 3,
                    n_texts=did % 2,
                    with_script=(did % 7 == 0),
                    with_event=(did % 11 == 0),
                    with_external_image=(did % 13 == 0),
                )
                p = _svg.svg_probe(data)
                rows.append(
                    (did, p["w_milli_px"], p["h_milli_px"],
                     p["from_viewbox"], p["n_elems"], p["n_paths"],
                     p["n_rasters"], p["n_texts"], p["has_script"],
                     p["has_event_attrs"], p["has_external_ref"])
                )
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "w_milli", "h_milli",
                         "from_viewbox", "n_elems", "n_paths",
                         "n_rasters", "n_texts", "has_script",
                         "has_event", "has_external"],
            )

    return d.mapInPandas(
        gen,
        schema=(
            "doc_id long, w_milli long, h_milli long, "
            "from_viewbox boolean, n_elems int, n_paths int, "
            "n_rasters int, n_texts int, has_script boolean, "
            "has_event boolean, has_external boolean"
        ),
    )


def q_zip_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP central-directory walk (office.zip_walk): member name,
    method, sizes, CRC-32 — routing facts with ZERO decompression,
    EOCD found by backward scan so trailing garbage (docs < 100, a
    crawl reality) is tolerated exactly like real unzip.  Fixture:
    1 + doc_id%4 STORED members ``f{k}.txt`` of ``b'x'*(10+k)`` (CRCs
    are the four pinned constants), odd docs DEFLATED (method 8,
    stored-size column NULL).  Scale posture: struct walk in
    mapInPandas over the directory tail only, zero exchanges."""
    import pandas as _pd

    from mechaml_spark import office as _of

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                members = [(f"f{k}.txt", b"x" * (10 + k))
                           for k in range(1 + did % 4)]
                data = _of.zip_write(members, deflate=(did % 2 == 1))
                if did < 100:
                    data += b"\xde\xadtrailing"
                for m in _of.zip_walk(data):
                    rows.append((
                        did, m["name"], m["method"], m["usize"],
                        m["csize"] if m["method"] == 0 else None,
                        m["crc32"],
                    ))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "name", "method", "usize",
                               "csize_stored", "crc32"])

    return d.mapInPandas(
        gen,
        schema=("doc_id long, name string, method int, usize long, "
                "csize_stored long, crc32 long"),
    )


def q_docx_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOCX text extraction (office.docx_text): WordprocessingML
    paragraph walk — w:t runs, w:tab → tab, document order — through
    a REAL zip + XML parse of a conformant fixture (2 + doc_id%3
    paragraphs, paragraph 1 carries a w:tab element).  The office-doc
    text source every CommonCrawl-derived corpus mines.  Scale
    posture: unzip+parse in mapInPandas, text column out, zero
    exchanges."""
    import pandas as _pd

    from mechaml_spark import office as _of

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                paras = []
                for k in range(2 + did % 3):
                    if k == 1:
                        paras.append(f"Doc {did}\tparagraph {k}")
                    else:
                        paras.append(f"Doc {did} paragraph {k}")
                got = _of.docx_text(_of.docx_write(paras))
                text = "\n".join(got)
                rows.append((did, len(got), text, len(text)))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "n_paras", "text", "n_chars"])

    return d.mapInPandas(
        gen, schema="doc_id long, n_paras int, text string, n_chars int"
    )


def q_epub_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPUB chapter extraction in SPINE order (office.epub_text):
    container.xml → OPF → spine → XHTML visible text.  The fixture
    writes chapter FILES in reverse zip order while the spine lists
    reading order, so zip-member-order shortcuts provably fail; text
    goes through the real OCF/OPF chain + tag-strip.  2 + doc_id%3
    chapters per doc.  Scale posture: per-row unzip in mapInPandas,
    zero exchanges."""
    import pandas as _pd

    from mechaml_spark import office as _of

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 300
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                chapters = [
                    (f"Chapter {i}", f"text of chapter {i} in doc {did}")
                    for i in range(2 + did % 3)
                ]
                got = _of.epub_text(_of.epub_write(chapters))
                for idx, (href, text) in enumerate(got):
                    rows.append((did, idx, href, text))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "idx", "href", "text"])

    return d.mapInPandas(
        gen, schema="doc_id long, idx int, href string, text string"
    )


def q_mojibake_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake repair (textclean.fix_mojibake — the ftfy core move):
    UTF-8-read-as-cp1252 text is detected by its lead-byte telltales
    and repaired by the strict round-trip (sloppy-cp1252 encode →
    strict UTF-8 decode), up to two passes for doubly-damaged text.
    Fixture: doc_id%3==1 clean, ==0 singly-garbled, ==2 doubly-garbled
    forms of the same closed-form string (damage applied at plan time
    with the genuine encode/decode chain, digits pass through
    unchanged so doc_id survives garbling).  Every row repairs back
    to the clean form with the expected pass count.  Scale posture:
    one Arrow-batched pandas_udf, zero exchanges."""
    seg_a, seg_b = "café déjà vu ", "’s ‘quote‘ end"

    def _m(s: str) -> str:
        return s.encode("utf-8").decode("cp1252")

    m1a, m1b = _m(seg_a), _m(seg_b)
    m2a, m2b = _m(m1a), _m(m1b)
    did = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id").where(did < 600)
    text = (
        F.when(did % 3 == 1,
               F.concat(F.lit(seg_a), did, F.lit(seg_b)))
        .when(did % 3 == 0,
              F.concat(F.lit(m1a), did, F.lit(m1b)))
        .otherwise(F.concat(F.lit(m2a), did, F.lit(m2b)))
    )
    out = textclean.repair_mojibake(d.select("doc_id", text.alias("text")))
    return out.select(
        "doc_id",
        (F.col("n_fixes") > 0).alias("was_mojibake"),
        "n_fixes",
        "fixed",
    )


def q_color_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Color-management probe (mediaprobe.png_color_probe /
    jpeg_color_probe): gAMA/sRGB/iCCP chunk facts for PNG, reassembled
    multi-segment ICC_PROFILE APP2 size + Adobe APP14 transform for
    JPEG — the "which color transform does this image need" gate a
    training pipeline runs BEFORE pixels are touched, with zero pixel
    decode and zero profile parse.  Fixtures splice real chunks/
    markers (proper CRCs, ICC Annex-B segment split) into streams
    from the repo's own codecs; every fact is the stated closed form
    (JPEG ICC of 60000 + doc_id%10000 bytes crosses the 65505-byte
    segment boundary, so the segment count flips 1→2 exactly when
    the size does).  Scale posture: chunk/marker walk in mapInPandas,
    zero exchanges."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark import jpeg as _jp
    from mechaml_spark import mediaprobe as _mp

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 450
    )

    def gen(batches):
        png_base = _im.png_encode(_np.zeros((4, 6, 3), _np.uint8))
        jpg_base = _jp.jpeg_encode(_np.zeros((8, 8, 3), _np.uint8), 90)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    data = _mp.png_add_color_chunks(
                        png_base,
                        gamma_micro=(45455 if did % 3 == 0 else None),
                        srgb_intent=(did % 4 if did % 5 == 0 else None),
                        icc_name=(f"p{did % 9}" if did % 7 == 0
                                  else None),
                        icc_profile=(b"\x00" * (128 + did % 100)
                                     if did % 7 == 0 else None),
                    )
                    p = _mp.png_color_probe(data)
                    rows.append((did, "png", p["gamma_micro"],
                                 p["srgb_intent"], p["icc_name"],
                                 p["icc_size"], None, None))
                else:
                    data = jpg_base
                    if did % 7 == 0:
                        data = _mp.jpeg_add_icc(
                            data, b"\x00" * (60000 + did % 10000),
                            adobe_transform=(did % 3 if did % 5 == 0
                                             else None),
                        )
                    elif did % 5 == 0:
                        data = _mp.jpeg_add_icc(
                            data, None, adobe_transform=did % 3
                        )
                    p = _mp.jpeg_color_probe(data)
                    rows.append((did, "jpeg", None, None, None,
                                 p["icc_size"], p["icc_segments"],
                                 p["adobe_transform"]))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "fmt", "gamma_micro",
                               "srgb_intent", "icc_name", "icc_size",
                               "icc_segments", "adobe_transform"])

    return d.mapInPandas(
        gen,
        schema=("doc_id long, fmt string, gamma_micro long, "
                "srgb_intent int, icc_name string, icc_size long, "
                "icc_segments int, adobe_transform int"),
    )


def q_payload_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-integrity gate (mediaprobe.png/jpeg/gif_verify):
    split "decodes cleanly" / "truncated" / "corrupt" BEFORE paying
    decode cost — interrupted transfers make broken payloads a
    constant of crawl data.  PNG verifies per-chunk CRC-32 + bounds +
    IEND; JPEG walks SOI→SOS markers and requires the EOI trailer;
    GIF walks blocks to the 0x3B trailer.  Fixture per doc (doc_id%3
    picks the container, repo codecs encode real streams): doc_id%4
    ∈ {0,3} intact, ==1 tail-truncated (7 bytes cut — always lands
    inside the final chunk/trailer), ==2 corrupted (PNG: one IDAT
    data byte flipped → exactly 1 bad CRC, stream still walks to
    IEND; JPEG/GIF: end marker stripped).  Scale posture: header
    walk in mapInPandas, zero exchanges."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import imaging as _im
    from mechaml_spark import jpeg as _jp
    from mechaml_spark import mediaprobe as _mp

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 600
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.full((6, 8, 3), (did * 13) % 251, _np.uint8)
                fmt = ("png", "jpeg", "gif")[did % 3]
                if fmt == "png":
                    data = _im.png_encode(px)
                elif fmt == "jpeg":
                    data = _jp.jpeg_encode(px, 90)
                else:
                    data = _im.gif_encode(px)
                cse = did % 4
                if cse == 1:
                    data = data[:-7]
                elif cse == 2:
                    if fmt == "png":
                        b = bytearray(data)
                        b[45] ^= 0xFF  # inside IDAT data
                        data = bytes(b)
                    elif fmt == "jpeg":
                        data = data[:-2]  # strip EOI
                    else:
                        data = data[:-1]  # strip 0x3B trailer
                v = {"png": _mp.png_verify, "jpeg": _mp.jpeg_verify,
                     "gif": _mp.gif_verify}[fmt](data)
                bad_crc = v.get("bad_crc", 0)
                keep = (not v["truncated"] and bad_crc == 0
                        and v["has_end"])
                rows.append((did, fmt, v["truncated"], bad_crc,
                             v["has_end"], keep))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "fmt", "truncated",
                               "bad_crc", "has_end", "keep"])

    return d.mapInPandas(
        gen,
        schema=("doc_id long, fmt string, truncated boolean, "
                "bad_crc int, has_end boolean, keep boolean"),
    )


def q_adaptive_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AIMD per-host politeness (frontier.revisit.adaptive_delay):
    delay doubles (cap 60 s) on 429/5xx/transport-0, decreases by
    250 ms (floor 1 s) on success — per-host server back-pressure
    adapted into the scheduler's host_budgets override.  Fixture: 20
    hosts × 20 epochs; host h errors every (3 + h%4)th epoch, so each
    host walks a different saw-tooth.  The oracle replays the exact
    recurrence with a recursive CTE.  Scale posture: ONE shuffle of
    (host, epoch, status) triples; the recurrence is sequential only
    within a host — hosts are the parallel unit."""
    from mechaml_spark.frontier.revisit import adaptive_delay

    did = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id").where(did < 400)
    base = d.select(
        F.concat(F.lit("h"), did % 20).alias("host"),
        (did / 20).cast("long").alias("epoch"),
        F.when(
            (F.floor(did / 20) % (3 + (did % 20) % 4)) == 0,
            F.lit(503),
        ).otherwise(F.lit(200)).cast("int").alias("status"),
    )
    return adaptive_delay(base)


def q_lang_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level language segmentation (the mC4 move: documents
    are filtered per-PARAGRAPH because web pages mix languages —
    boilerplate in one, content in another).  Paragraphs split on
    blank lines; each scores against four pinned stopword marker sets
    (en/de/fr/es, 3 markers each, padded-word occurrence counts);
    per-paragraph argmax rolls up to a doc majority with the pinned
    tie rule (max count, then smallest lang index — exercised for
    real by the 4-paragraph docs where all four langs tie).  Fixture:
    2 + doc_id%4 paragraphs; doc_id%5==0 docs are pure English,
    others cycle langs at (doc_id+k)%4, so majority / n_langs /
    mixed are the stated closed forms.  Scale posture: detection is
    expression-only (posexplode + length-replace counts, codegen);
    the rollup is ONE partial-agg groupBy carrying (doc_id, lang_idx)
    — never text."""
    did = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id").where(did < 500)

    templates = F.array(
        F.lit("the cat and the dog of the house"),
        F.lit("der hund und die katze der stadt"),
        F.lit("le chien et les maisons le soir"),
        F.lit("el perro y los campos el dia"),
    )
    n_paras = (2 + did % 4).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_paras - 1),
        lambda k: F.when(
            did % 5 == 0, F.element_at(templates, 1)
        ).otherwise(
            F.element_at(templates, ((did + k) % 4 + 1).cast("int"))
        ),
    )
    doc = d.select("doc_id", n_paras.alias("n_paras"),
                   F.array_join(paras, "\n\n").alias("text"))

    ex = doc.select(
        "doc_id", "n_paras",
        F.posexplode(F.split(F.col("text"), r"\n\n")).alias("k", "para"),
    )
    padded = F.concat(F.lit(" "), F.col("para"), F.lit(" "))

    def cnt(word):
        pad = f" {word} "
        return (
            (F.length(padded) - F.length(F.replace(padded, F.lit(pad))))
            / len(pad)
        ).cast("long")

    markers = [["the", "and", "of"], ["der", "und", "die"],
               ["le", "et", "les"], ["el", "y", "los"]]
    scores = [sum(cnt(w) for w in ws) for ws in markers]
    best = F.greatest(*scores)
    # argmax with smallest-index tie rule
    lang_idx = (
        F.when(scores[0] == best, F.lit(0))
        .when(scores[1] == best, F.lit(1))
        .when(scores[2] == best, F.lit(2))
        .otherwise(F.lit(3))
    )
    names = F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"))
    per_para = ex.select("doc_id", "n_paras",
                         lang_idx.alias("lang_idx"))
    # majority via count-per-(doc,lang) argmax; the struct max orders
    # by (count, -lang_idx), so ties go to the SMALLEST lang index
    counts = per_para.groupBy("doc_id", "n_paras", "lang_idx").agg(
        F.count("*").alias("c")
    )
    return counts.groupBy("doc_id", "n_paras").agg(
        F.max(F.struct(F.col("c"), (-F.col("lang_idx")).alias("ni"),
                       F.col("lang_idx"))).alias("m"),
        F.count("*").cast("int").alias("n_langs"),
    ).select(
        "doc_id",
        "n_paras",
        F.element_at(names, (F.col("m.lang_idx") + 1).cast("int"))
        .alias("majority"),
        "n_langs",
        (F.col("n_langs") > 1).alias("mixed"),
    )


def q_sitemap_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Google image-sitemap extension (sitemap.parse_image_sitemaps):
    the channel through which sites EXPLICITLY hand crawlers
    image+caption pairs — the highest-precision discovery source the
    image pipeline has.  Fixture: 1 + doc_id%3 <url> entries per
    sitemap, each carrying doc_id%4 <image:image> blocks (docs with
    doc_id%4==0 contribute no rows); captions on even image indices,
    titles only on index 0 — absent fields must surface as NULL, not
    empty string.  Scale posture: two-level explode, all fields JVM
    regexp — codegen end to end."""
    did = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id").where(did < 400)

    def img_block(u, i):
        return F.concat(
            F.lit("<image:image><image:loc>http://cdn.test/i"),
            did, F.lit("_"), u, F.lit("_"), i, F.lit(".jpg"),
            F.lit("</image:loc>"),
            F.when(
                i % 2 == 0,
                F.concat(F.lit("<image:caption>img "), i,
                         F.lit(" of page "), u, F.lit(" doc "), did,
                         F.lit("</image:caption>")),
            ).otherwise(F.lit("")),
            F.when(
                i == 0,
                F.concat(F.lit("<image:title>t"), did,
                         F.lit("</image:title>")),
            ).otherwise(F.lit("")),
            F.lit("</image:image>"),
        )

    def url_block(u):
        imgs = F.array_join(
            F.transform(
                F.sequence(F.lit(0), (did % 4 - 1).cast("int")),
                lambda i: img_block(u, i),
            ),
            "",
        )
        return F.concat(
            F.lit("<url><loc>http://site"), did % 10,
            F.lit(".test/p"), did, F.lit("/"), u, F.lit("</loc>"),
            F.when(did % 4 > 0, imgs).otherwise(F.lit("")),
            F.lit("</url>"),
        )

    body = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (did % 3).cast("int")),
                url_block,
            ),
            "",
        ),
        F.lit("</urlset>"),
    )
    from mechaml_spark import sitemap as _sm

    return _sm.parse_image_sitemaps(
        d.select("doc_id", body.alias("body")), keep_cols=("doc_id",)
    )


def q_sitemap_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Google video-sitemap extension (sitemap.parse_video_sitemaps):
    the explicit video+description discovery channel — content URL,
    thumbnail, title, description, duration per <video:video> block,
    the video twin of sitemap_images.  Fixture: 1 + doc_id%3 <url>
    entries, each with doc_id%3 <video:video> blocks (doc_id%3==0
    docs contribute no rows); descriptions only on even video
    indices, thumbnails only on index 0, duration = 30 + 10*vid_pos
    — absent fields must surface as NULL.  Scale posture: two-level
    explode, all fields JVM regexp — codegen end to end."""
    did = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id").where(did < 400)

    def vid_block(u, i):
        return F.concat(
            F.lit("<video:video><video:content_loc>"
                  "http://cdn.test/v"),
            did, F.lit("_"), u, F.lit("_"), i, F.lit(".mp4"),
            F.lit("</video:content_loc>"),
            F.when(
                i == 0,
                F.concat(F.lit("<video:thumbnail_loc>"
                               "http://cdn.test/t"),
                         did, F.lit(".jpg</video:thumbnail_loc>")),
            ).otherwise(F.lit("")),
            F.lit("<video:title>v"), i, F.lit(" p"), u,
            F.lit("</video:title>"),
            F.when(
                i % 2 == 0,
                F.concat(F.lit("<video:description>video "), i,
                         F.lit(" of doc "), did,
                         F.lit("</video:description>")),
            ).otherwise(F.lit("")),
            F.lit("<video:duration>"), F.lit(30) + i * 10,
            F.lit("</video:duration></video:video>"),
        )

    def url_block(u):
        vids = F.array_join(
            F.transform(
                F.sequence(F.lit(0), (did % 3 - 1).cast("int")),
                lambda i: vid_block(u, i),
            ),
            "",
        )
        return F.concat(
            F.lit("<url><loc>http://site"), did % 10,
            F.lit(".test/p"), did, F.lit("/"), u, F.lit("</loc>"),
            F.when(did % 3 > 0, vids).otherwise(F.lit("")),
            F.lit("</url>"),
        )

    body = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (did % 3).cast("int")),
                url_block,
            ),
            "",
        ),
        F.lit("</urlset>"),
    )
    from mechaml_spark import sitemap as _sm

    return _sm.parse_video_sitemaps(
        d.select("doc_id", body.alias("body")), keep_cols=("doc_id",)
    )


def q_id3_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID3v2 text-frame mining (mediaprobe.id3v2_tags): the audio
    caption channel — title/artist/album ride in the tag block that
    duration probing length-skips.  Fixture cycles the four published
    (version, encoding) shapes by doc_id%4 — v2.3+latin-1,
    v2.3+UTF-16-BOM, v2.4+UTF-16BE, v2.4+UTF-8 (v2.4 frame sizes
    syncsafe, v2.3 plain) — over real MP3 streams; non-ASCII text
    exercises every decode path; TALB present only for doc_id%3==0
    (absent → NULL).  Scale posture: header walk in mapInPandas,
    zero shuffle."""
    import pandas as _pd

    from mechaml_spark import mediaprobe as _mp

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def gen(batches):
        mp3 = _mp.mp3_write(3)
        shapes = ((3, 0), (3, 1), (4, 2), (4, 3))
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                ver, enc = shapes[did % 4]
                tags = {"TIT2": f"Tïtle {did}",
                        "TPE1": f"Ärtist {did % 7}"}
                if did % 3 == 0:
                    tags["TALB"] = f"Album {did % 5}"
                data = _mp.id3v2_write(tags, version=ver,
                                       encoding=enc) + mp3
                got = _mp.id3v2_tags(data)
                rows.append((did, got["_version"], got.get("TIT2"),
                             got.get("TPE1"), got.get("TALB")))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "version", "title",
                               "artist", "album"])

    return d.mapInPandas(
        gen,
        schema=("doc_id long, version int, title string, "
                "artist string, album string"),
    )


def q_ogg_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vorbis-comment mining (mediaprobe.ogg_comments): the Ogg
    caption channel — TITLE/ARTIST/ALBUM as length-prefixed UTF-8
    KEY=value fields in the second header packet (Vorbis I §5 /
    OpusTags RFC 7845 §5.2), keys case-folded per the spec.  Fixture
    alternates vorbis/opus by doc_id%2 over CRC-valid pages (the
    comment page is spliced with later sequence numbers rebuilt, so
    the duration probe still reads the same stream); lowercase keys
    in the fixture prove the fold; ALBUM only on doc_id%4==0.
    Scale posture: page walk in mapInPandas, zero shuffle."""
    import pandas as _pd

    from mechaml_spark import mediaprobe as _mp

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                codec = ("vorbis", "opus")[did % 2]
                comments = {"title": f"Sträck {did}",
                            "Artist": f"Günd {did % 6}"}
                if did % 4 == 0:
                    comments["ALBUM"] = f"LP {did % 9}"
                data = _mp.ogg_write_tagged(
                    codec, 44100, 2, 44100 * (1 + did % 5), comments
                )
                got = _mp.ogg_comments(data)
                c = got["comments"]
                rows.append((did, codec, got["vendor"],
                             c.get("TITLE"), c.get("ARTIST"),
                             c.get("ALBUM")))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "codec", "vendor", "title",
                               "artist", "album"])

    return d.mapInPandas(
        gen,
        schema=("doc_id long, codec string, vendor string, "
                "title string, artist string, album string"),
    )


def q_hls_playlists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLS playlist parse (RFC 8216) — how video actually ships on
    the web: master playlists explode into renditions (#EXT-X-
    STREAM-INF BANDWIDTH/RESOLUTION + following URI line, the
    "which rendition do we fetch" decision), media playlists reduce
    to segment count / total #EXTINF duration / VOD-vs-live
    (#EXT-X-ENDLIST absent ⇒ live ⇒ skip — a crawler must not tail
    live streams).  Fixture: even docs are masters with 2 + doc_id%3
    variants (pinned bandwidth/resolution ladder), odd docs media
    lists with 3 + doc_id%4 segments of 4+(k%3) s; doc_id%5==0 media
    lists omit ENDLIST.  Scale posture: block regexp_extract_all +
    per-block field extracts — expression-only both halves, one
    union, codegen end to end."""
    did = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id").where(did < 500)

    ladder_w = F.array(F.lit(640), F.lit(1280), F.lit(1920),
                       F.lit(2560))
    ladder_h = F.array(F.lit(360), F.lit(720), F.lit(1080),
                       F.lit(1440))
    n_var = (2 + did % 3).cast("int")
    master_body = F.concat(
        F.lit("#EXTM3U\n"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_var - 1),
                lambda v: F.concat(
                    F.lit("#EXT-X-STREAM-INF:BANDWIDTH="),
                    (500000 * (v + 1)).cast("long"),
                    F.lit(",RESOLUTION="),
                    F.element_at(ladder_w, (v + 1).cast("int")),
                    F.lit("x"),
                    F.element_at(ladder_h, (v + 1).cast("int")),
                    F.lit("\nrendition_"), v, F.lit(".m3u8"),
                ),
            ),
            "\n",
        ),
    )
    n_seg = (3 + did % 4).cast("int")
    media_body = F.concat(
        F.lit("#EXTM3U\n#EXT-X-TARGETDURATION:7\n"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda k: F.concat(
                    F.lit("#EXTINF:"), (4 + k % 3).cast("int"),
                    F.lit(".0,\nseg"), k, F.lit(".ts"),
                ),
            ),
            "\n",
        ),
        F.when(did % 5 == 0, F.lit("")).otherwise(
            F.lit("\n#EXT-X-ENDLIST")),
    )
    body = F.when(did % 2 == 0, master_body).otherwise(media_body)
    src = d.select("doc_id", body.alias("body"))

    blk = r"(?m)^#EXT-X-STREAM-INF:([^\n]*)\n([^\n#][^\n]*)"
    inf = F.regexp_extract_all(F.col("body"), F.lit(blk), 0)
    masters = (
        src.where(did % 2 == 0)
        .select("doc_id", F.posexplode(inf).alias("variant", "b"))
        .select(
            "doc_id",
            F.lit("master").alias("kind"),
            F.col("variant").cast("int").alias("variant"),
            F.regexp_extract(F.col("b"), r"BANDWIDTH=(\d+)", 1)
            .cast("long").alias("bandwidth"),
            F.regexp_extract(F.col("b"), r"RESOLUTION=(\d+)x", 1)
            .cast("int").alias("width"),
            F.regexp_extract(F.col("b"), r"RESOLUTION=\d+x(\d+)", 1)
            .cast("int").alias("height"),
            F.regexp_extract(F.col("b"), r"\n([^\n]+)$", 1)
            .alias("uri"),
            F.lit(None).cast("int").alias("n_segments"),
            F.lit(None).cast("long").alias("total_ms"),
            F.lit(None).cast("boolean").alias("live"),
        )
    )
    durs = F.transform(
        F.regexp_extract_all(F.col("body"),
                             F.lit(r"(?m)^#EXTINF:([0-9.]+),"), 1),
        lambda s: s.cast("double"),
    )
    media = src.where(did % 2 == 1).select(
        "doc_id",
        F.lit("media").alias("kind"),
        F.lit(None).cast("int").alias("variant"),
        F.lit(None).cast("long").alias("bandwidth"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("string").alias("uri"),
        F.size(durs).cast("int").alias("n_segments"),
        (F.aggregate(durs, F.lit(0.0), lambda a, x: a + x) * 1000)
        .cast("long").alias("total_ms"),
        (~F.col("body").contains("#EXT-X-ENDLIST")).alias("live"),
    )
    return masters.unionByName(media)


def q_exif_containers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF across ALL the image containers a crawl sees (exif.
    exif_from_container): JPEG APP1 (Exif 2.32 §4.5.4 position),
    PNG 1.5 ``eXIf`` chunk (raw TIFF payload), WebP extended-format
    ``EXIF`` chunk (VP8X flag bit set, RIFF even-padding) — one
    dispatched parse so orientation/GPS policy (rotation, privacy
    scrub) is container-blind.  Fixture: doc_id%3 picks the
    container, the SAME exif_payload TIFF rides in each (orientation
    1 + doc_id%8, alternating II/MM wire order, GPS only on
    doc_id%5==0), every spliced stream still decodes with the repo
    codecs (tested).  Scale posture: header walk in mapInPandas,
    zero shuffle."""
    import numpy as _np
    import pandas as _pd

    from mechaml_spark import exif as _exif
    from mechaml_spark import imaging as _im
    from mechaml_spark import jpeg as _jp
    from mechaml_spark import webp as _wp

    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 450
    )

    def gen(batches):
        px = _np.zeros((4, 6, 3), _np.uint8)
        jpg = _jp.jpeg_encode(px, 90)
        png = _im.png_encode(px)
        wpb = _wp.webp_encode(px)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                tags = {"Make": f"Cam{did % 4}",
                        "Orientation": 1 + did % 8}
                if did % 5 == 0:
                    tags["GPSLatitudeRef"] = "N"
                    tags["GPSLatitude"] = [(did % 90, 1), (30, 1),
                                           (0, 1)]
                payload = _exif.exif_payload(
                    tags, byte_order=("II", "MM")[did % 2])
                tiff = payload[6:]
                fmt = ("jpeg", "png", "webp")[did % 3]
                if fmt == "jpeg":
                    data = _exif.jpeg_set_exif(jpg, payload)
                elif fmt == "png":
                    data = _exif.png_add_exif(png, tiff)
                else:
                    data = _exif.webp_add_exif(wpb, tiff)
                got = _exif.exif_from_container(data)
                rows.append((
                    did, fmt, got.get("Make"), got.get("Orientation"),
                    "GPSLatitude" in got,
                    int(got["GPSLatitude"][0][0])
                    if "GPSLatitude" in got else None,
                ))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "fmt", "make", "orientation",
                               "has_gps", "gps_lat_deg"])

    return d.mapInPandas(
        gen,
        schema=("doc_id long, fmt string, make string, "
                "orientation int, has_gps boolean, gps_lat_deg int"),
    )


def q_jsonld_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema.org JSON-LD entity extraction — the dominant
    structured-data carrier on today's web (microdata's successor;
    the `microdata` query covers the older format): every
    ``<script type="application/ld+json">`` block parses as JSON,
    ``@graph`` arrays flatten, and (type, name, image) project out —
    image+caption pairs with PUBLISHER-ASSERTED semantics.  Broken
    JSON (doc_id%7==0 carries a trailing comma) contributes zero
    rows, never a task kill — crawled JSON-LD is malformed
    constantly.  Block discovery is a JVM regexp; only the JSON
    parse is Python (JSON-LD has no fixed schema, so ``from_json``
    can't express it honestly).  Scale posture: regexp + per-row
    json.loads in mapInPandas, zero shuffle."""
    import json as _json

    import pandas as _pd

    did = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id").where(did < 500)

    typ = F.element_at(
        F.array(F.lit("Article"), F.lit("Product"),
                F.lit("ImageObject")),
        (did % 3 + 1).cast("int"),
    )
    single = F.concat(
        F.lit('{"@context":"https://schema.org","@type":"'), typ,
        F.lit('","name":"Entity '), did,
        F.lit('","image":"http://img.test/'), did, F.lit('.jpg"}'),
    )
    graph = F.concat(
        F.lit('{"@context":"https://schema.org","@graph":['),
        F.lit('{"@type":"Article","name":"Graph A '), did,
        F.lit('"},{"@type":"ImageObject","name":"Graph B '), did,
        F.lit('","image":"http://img.test/g'), did, F.lit('.jpg"}]}'),
    )
    broken = F.concat(
        F.lit('{"@type":"Article","name":"Broken '), did,
        F.lit('",}'),
    )
    payload = (
        F.when(did % 7 == 0, broken)
        .when(did % 4 == 0, graph)
        .otherwise(single)
    )
    body = F.concat(
        F.lit('<html><head><script type="application/ld+json">'),
        payload,
        F.lit("</script></head><body>x</body></html>"),
    )
    src = d.select("doc_id", body.alias("body"))
    blocks = F.regexp_extract_all(
        F.col("body"),
        F.lit(r'(?s)<script type="application/ld\+json">(.*?)</script>'),
        1,
    )
    withb = src.select("doc_id", F.explode(blocks).alias("block"))

    def gen(batches):
        for pdf in batches:
            rows = []
            for did_, block in zip(pdf["doc_id"], pdf["block"]):
                did_ = int(did_)
                try:
                    obj = _json.loads(block)
                except ValueError:
                    continue
                ents = obj.get("@graph", [obj]) \
                    if isinstance(obj, dict) else []
                idx = 0
                for e in ents:
                    if not isinstance(e, dict) or "@type" not in e:
                        continue
                    rows.append((did_, idx, str(e["@type"]),
                                 e.get("name"), e.get("image")))
                    idx += 1
            yield _pd.DataFrame(
                rows, columns=["doc_id", "idx", "type", "name",
                               "image"])

    return withb.mapInPandas(
        gen,
        schema=("doc_id long, idx int, type string, name string, "
                "image string"),
    )


def q_amp_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMP page detection + canonical pairing — AMP mirrors are one
    of the largest systematic duplicate sources in a web crawl: every
    AMP page must be folded onto its canonical before dedup counts
    anything.  Detection per the published AMP HTML spec: the ``⚡``
    or ``amp`` attribute on ``<html>`` marks an AMP document (its
    ``rel=canonical`` names the original); a canonical page instead
    advertises its mirror via ``rel=amphtml``.  Fixture: doc_id%3==0
    canonical pages with an amphtml link, ==1 their AMP mirrors
    (⚡ on even, ``amp`` attr on odd doc_ids — both spellings
    exercised), ==2 plain pages with neither.  Output: flags + the
    fold-target URL (canonical for AMP pages, self otherwise).
    Scale posture: expression-only regexp over the html column —
    codegen, zero shuffle."""
    did = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id").where(did < 600)

    canon_url = F.concat(F.lit("http://site.test/page"), did)
    amp_url = F.concat(F.lit("http://site.test/page"), did,
                       F.lit("/amp"))
    html_canon = F.concat(
        F.lit('<html><head><link rel="amphtml" href="'), amp_url,
        F.lit('"></head><body>c</body></html>'),
    )
    amp_attr = F.when(did % 2 == 0, F.lit("⚡")).otherwise(F.lit("amp"))
    html_amp = F.concat(
        F.lit("<html "), amp_attr,
        F.lit('><head><link rel="canonical" href="'), canon_url,
        F.lit('"></head><body>a</body></html>'),
    )
    html_plain = F.lit("<html><head></head><body>p</body></html>")
    body = (
        F.when(did % 3 == 0, html_canon)
        .when(did % 3 == 1, html_amp)
        .otherwise(html_plain)
    )
    own_url = F.when(did % 3 == 1, amp_url).otherwise(canon_url)
    src = d.select("doc_id", own_url.alias("url"),
                   body.alias("body"))
    is_amp = F.col("body").rlike(r"(?s)<html\s[^>]*(?:⚡|\bamp\b)")
    amphtml = F.regexp_extract(
        F.col("body"),
        r'<link rel="amphtml" href="([^"]*)"', 1)
    canonical = F.regexp_extract(
        F.col("body"),
        r'<link rel="canonical" href="([^"]*)"', 1)
    return src.select(
        "doc_id",
        is_amp.alias("is_amp"),
        F.when(amphtml != "", amphtml).alias("amphtml_url"),
        F.when(is_amp & (canonical != ""), canonical)
        .otherwise(F.col("url")).alias("fold_url"),
    )


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion (retrieval.rrf_fuse — Cormack et al.
    2009 reciprocal-rank fusion): lexical and dense rankings merge as
    Σ 1/(60 + rank) without score calibration — the standard way
    BM25 and embedding top-k combine.  Fixture: 3 queries × 200 docs
    with two deterministic incomparable score functions (mod-101 and
    mod-97 residues — collisions exercise the pinned tie rule);
    output is each query's top-10 with both source ranks and the
    fused score as an exact micro-int.  Scale posture: windows
    partition by query (never global), the join carries (query, doc,
    rank) triples only."""
    from mechaml_spark.retrieval import rrf_fuse

    did = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id").where(did < 200)
    base = d.select(
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("query_id"),
        "doc_id",
    )
    a = base.select(
        "query_id", "doc_id",
        ((F.col("doc_id") * 7 + F.col("query_id") * 11) % 101)
        .alias("score"),
    )
    b = base.select(
        "query_id", "doc_id",
        ((F.col("doc_id") * 13 + F.col("query_id") * 5) % 97)
        .alias("score"),
    )
    return rrf_fuse(a, b)


QUERIES = {
    "extract_links": q_extract_links,
    "selector_suffix": q_selector_suffix,
    "selector_class": q_selector_class,
    "url_canonicalize": q_url_canonicalize,
    "cookie_match": q_cookie_match,
    "jar_fold": q_jar_fold,
    "politeness_topk": q_politeness_topk,
    "politeness_by_ip": q_politeness_by_ip,
    "login_pages": q_login_pages,
    "robots_agent_groups": q_robots_agent_groups,
    "anim_probe": q_anim_probe,
    "svg_probe": q_svg_probe,
    "zip_probe": q_zip_probe,
    "docx_text": q_docx_text,
    "epub_spine": q_epub_spine,
    "mojibake_fix": q_mojibake_fix,
    "color_probe": q_color_probe,
    "payload_integrity": q_payload_integrity,
    "adaptive_delay": q_adaptive_delay,
    "lang_segments": q_lang_segments,
    "sitemap_images": q_sitemap_images,
    "sitemap_videos": q_sitemap_videos,
    "id3_tags": q_id3_tags,
    "ogg_tags": q_ogg_tags,
    "hls_playlists": q_hls_playlists,
    "exif_containers": q_exif_containers,
    "jsonld_entities": q_jsonld_entities,
    "amp_pages": q_amp_pages,
    "hybrid_rrf": q_hybrid_rrf,
    "bitext_candidates": q_bitext_candidates,
    "webdataset_roundtrip": q_webdataset_roundtrip,
    "media_discovery": q_media_discovery,
    "image_discovery": q_image_discovery,
    "data_uri_images": q_data_uri_images,
    "pdf_images": q_pdf_images,
    "jpeg_structure": q_jpeg_structure,
    "warc_requests": q_warc_requests,
    "seen_dedupe": q_seen_dedupe,
    "seen_dedupe_cuckoo": q_seen_dedupe_cuckoo,
    "form_defaults": q_form_defaults,
    "format_scalars": q_format_scalars,
    "submit_fetch": q_submit_fetch,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "simhash_buckets": q_simhash_buckets,
    "ngram_jaccard": q_ngram_jaccard,
    "image_features": q_image_features,
    "image_colorhist": q_image_colorhist,
    "image_webp_lossy_features": q_image_webp_lossy_features,
    "webm_blocks": q_webm_blocks,
    "mp3_frames": q_mp3_frames,
    "webm_vp8_frames": q_webm_vp8_frames,
    "image_patches": q_image_patches,
    "image_phash": q_image_phash,
    "image_neardup": q_image_neardup,
    "image_jpeg_features": q_image_jpeg_features,
    "jpeg_quality": q_jpeg_quality,
    "text_overlay": q_text_overlay,
    "mp4_samples": q_mp4_samples,
    "subtitle_cues": q_subtitle_cues,
    "pair_dedup": q_pair_dedup,
    "pipeline_image": q_pipeline_image,
    "audio_silence": q_audio_silence,
    "image_posterize": q_image_posterize,
    "image_otsu": q_image_otsu,
    "exif_gps_scrub": q_exif_gps_scrub,
    "image_jpeg_progressive": q_image_jpeg_progressive,
    "image_png_variants": q_image_png_variants,
    "image_exif": q_image_exif,
    "image_tiff_features": q_image_tiff_features,
    "image_ico_features": q_image_ico_features,
    "image_qoi_features": q_image_qoi_features,
    "image_webp_features": q_image_webp_features,
    "image_tiff_compressed": q_image_tiff_compressed,
    "image_pixel_dedup": q_image_pixel_dedup,
    "warc_roundtrip": q_warc_roundtrip,
    "warc_cdx": q_warc_cdx,
    "sitemap_extract": q_sitemap_extract,
    "sitemap_gz": q_sitemap_gz,
    "line_dedupe": q_line_dedupe,
    "image_orientation": q_image_orientation,
    "image_thumbnail": q_image_thumbnail,
    "robots_sitemap_chain": q_robots_sitemap_chain,
    "image_resize_bilinear": q_image_resize_bilinear,
    "revisit_policy": q_revisit_policy,
    "span_dedupe": q_span_dedupe,
    "pdf_text_extract": q_pdf_text_extract,
    "repetition_filter": q_repetition_filter,
    "c4_filters": q_c4_filters,
    "charlm_score": q_charlm_score,
    "bpe_pairs": q_bpe_pairs,
    "text_normalize": q_text_normalize,
    "bpe_encode": q_bpe_encode,
    "html_text": q_html_text,
    "html_tables": q_html_tables,
    "html_markdown": q_html_markdown,
    "microdata": q_microdata,
    "robots_rfc": q_robots_rfc,
    "mime_sniff": q_mime_sniff,
    "charset_decode": q_charset_decode,
    "audio_features": q_audio_features,
    "video_frames": q_video_frames,
    "video_frames_avi": q_video_frames_avi,
    "video_frames_apng": q_video_frames_apng,
    "video_frames_webp": q_video_frames_webp,
    "audio_g711_features": q_audio_g711_features,
    "audio_adpcm_features": q_audio_adpcm_features,
    "audio_container_features": q_audio_container_features,
    "media_probe": q_media_probe,
    "image_probe": q_image_probe,
    "pagerank_frontier": q_pagerank_frontier,
    "hits_scores": q_hits_scores,
    "opic_scores": q_opic_scores,
    "main_content": q_main_content,
    "bm25_score": q_bm25_score,
    "url_hygiene": q_url_hygiene,
    "caption_extract": q_caption_extract,
    "image_caption_pairs": q_image_caption_pairs,
    "feed_extract": q_feed_extract,
    "image_quality": q_image_quality,
    "caption_similarity": q_caption_similarity,
    "dedup_clusters": q_dedup_clusters,
    "classifier_score": q_classifier_score,
    "semantic_dedup": q_semantic_dedup,
    "video_keyframes": q_video_keyframes,
    "warc_wet": q_warc_wet,
    "warc_wat": q_warc_wat,
    "warc_revisit": q_warc_revisit,
    "doc_sample": q_doc_sample,
    "link_headers": q_link_headers,
    "domain_mixture": q_domain_mixture,
    "domain_cap": q_domain_cap,
    "anchor_text": q_anchor_text,
    "robots_meta": q_robots_meta,
    "public_suffix": q_public_suffix,
    "pub_date": q_pub_date,
    "hreflang": q_hreflang,
    "meta_refresh": q_meta_refresh,
    "sentence_split": q_sentence_split,
    "crawl_delay_budgets": q_crawl_delay_budgets,
    "link_stats": q_link_stats,
    "pii_scrub": q_pii_scrub,
    "blocklist_filter": q_blocklist_filter,
    "decontaminate": q_decontaminate,
    "canonical_urls": q_canonical_urls,
    "token_stats": q_token_stats,
    "quality_filter": q_quality_filter,
    "lang_id": q_lang_id,
    "embedding_topk": q_embedding_topk,
    "embedding_ann_lsh": q_embedding_ann_lsh,
    "embedding_ann_ivf": q_embedding_ann_ivf,
    "embedding_pq": q_embedding_pq,
    "embedding_neardup": q_embedding_neardup,
    "doc_fingerprint": q_doc_fingerprint,
    "sessionize": q_sessionize,
    "pricing_summary": q_pricing_summary,
    "sequence_pack": q_sequence_pack,
    "chunk_overlap": q_chunk_overlap,
    "readability": q_readability,
    "word_collocations": q_word_collocations,
    "textrank_keywords": q_textrank_keywords,
    "exif_thumbnail": q_exif_thumbnail,
    "image_palette": q_image_palette,
    "distinct_sketch": q_distinct_sketch,
    "freq_sketch": q_freq_sketch,
    "quantile_sketch": q_quantile_sketch,
    "gopher_rules": q_gopher_rules,
    "image_ssim": q_image_ssim,
    "url_templates": q_url_templates,
    "pipeline_compose": q_pipeline_compose,
    "dom_stats": q_dom_stats,
    "http_cache_headers": q_http_cache_headers,
    "image_cropdetect": q_image_cropdetect,
    "idn_hostnames": q_idn_hostnames,
    "ip_hostnames": q_ip_hostnames,
    "ip6_hostnames": q_ip6_hostnames,
    "caption_rules": q_caption_rules,
    "aspect_buckets": q_aspect_buckets,
}

_TOKS_SQL = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"


def _ivf_oracle_sql(iterations: int = 2) -> str:
    """DuckDB mirror of q_embedding_ann_ivf: the same deterministic
    k-means (integer floor-means, cid tie-breaks) unrolled
    ``iterations`` times, then the identical probe/rank pipeline."""

    def dot(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, len({a}) + 1), "
            f"i -> {a}[i] * {b}[i]))"
        )

    def assign(name: str, cent: str) -> str:
        return f"""{name} AS (
            SELECT neighbor_id, cid, cv FROM (
                SELECT d.neighbor_id, c.cid, d.cv,
                       row_number() OVER (PARTITION BY d.neighbor_id
                           ORDER BY {dot('d.cv', 'c.cv')} DESC, c.cid) AS rk
                FROM data d, {cent} c)
            WHERE rk = 1)"""

    def update(name: str, assigned: str) -> str:
        return f"""{name} AS (
            SELECT cid, list(cv_i ORDER BY pos) AS cv FROM (
                SELECT cid, pos, (s - ((s % n) + n) % n) // n AS cv_i FROM (
                    SELECT cid, pos, sum(v) AS s, count(*) AS n FROM (
                        SELECT cid,
                               unnest(range(1, len(cv) + 1)) AS pos,
                               unnest(cv) AS v
                        FROM {assigned})
                    GROUP BY cid, pos))
            GROUP BY cid)"""

    ctes = []
    cent = "cent0"
    for t in range(iterations):
        ctes.append(assign(f"a{t}", cent))
        cent = f"cent{t + 1}"
        ctes.append(update(cent, f"a{t}"))
    ctes.append(assign("assign", cent))
    steps = ",\n".join(ctes)
    return f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(x * 1000) AS BIGINT)) AS v
            FROM embeddings),
        cent0 AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < 8),
        data AS (SELECT vec_id AS neighbor_id, v AS cv
                 FROM q WHERE vec_id >= 16),
        qry AS (SELECT vec_id AS query_id, v AS qv
                FROM q WHERE vec_id >= 8 AND vec_id < 16),
        {steps},
        probes AS (
            SELECT query_id, cid, qv FROM (
                SELECT qy.query_id, c.cid, qy.qv,
                       row_number() OVER (PARTITION BY qy.query_id
                           ORDER BY {dot('qy.qv', 'c.cv')} DESC, c.cid) AS rk
                FROM qry qy, {cent} c)
            WHERE rk <= 2),
        ranked AS (
            SELECT p.query_id, a.neighbor_id, {dot('p.qv', 'a.cv')} AS dot
            FROM probes p JOIN assign a USING (cid))
        SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id,
               CAST(dot AS BIGINT) AS dot
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
              FROM ranked)
        WHERE rnk <= 5
    """


def _cnt_sql(m: str) -> str:
    pad = f" {m} "
    return (
        f"(length(text) - length(replace(text, '{pad}', ''))) // {len(pad)}"
    )


def _pii_oracle_sql() -> str:
    """DuckDB mirror of q_pii_scrub: the byte-identical pattern
    strings (Java-regex ∩ RE2 subset) in the identical redaction
    order, so the redacted text itself must hash-match."""
    from mechaml_spark import safety as _sf

    red = "t2"
    for pat, repl in _sf.REDACTIONS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
        WITH t AS (
            SELECT doc_id,
                   text || ' Contact user' || doc_id || '@ex'
                        || (doc_id % 7) || '.org now.'
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' Call +1 415-555-'
                                || lpad(CAST(doc_id AS VARCHAR), 4, '0')
                                || ' today.'
                           ELSE '' END
                   || CASE WHEN doc_id % 4 = 0
                           THEN ' Origin 10.' || (doc_id % 256) || '.0.'
                                || (doc_id % 250 + 1) || ' logged.'
                           ELSE '' END AS t2
            FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t2, '{_sf.EMAIL_RE}'))
                    AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t2, '{_sf.PHONE_RE}'))
                    AS BIGINT) AS n_phones,
               CAST(len(regexp_extract_all(t2, '{_sf.IPV4_RE}'))
                    AS BIGINT) AS n_ips,
               {red} AS red
        FROM t
    """


def _blocklist_oracle_sql() -> str:
    from mechaml_spark import safety as _sf

    toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    return f"""
        WITH t AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 11 = 0
                           THEN ' casino bonus casino night' ELSE '' END
                   || CASE WHEN doc_id % 17 = 0
                           THEN ' cheap viagra deal' ELSE '' END AS text,
                   'h' || (doc_id % 41) || '.example' AS host
            FROM documents),
        c AS (
            SELECT doc_id, host,
                   (doc_id % 41) % 13 = 0 AS host_banned,
                   CAST(len(regexp_extract_all(lower(text),
                        '{_sf.BADWORD_RE}')) AS BIGINT) AS n_bad,
                   CAST(greatest(len({toks}), 1) AS BIGINT) AS n_tok
            FROM t)
        SELECT doc_id, host, host_banned, n_bad,
               (n_bad * 1000) // n_tok AS bad_permille,
               (NOT host_banned) AND ((n_bad * 1000) // n_tok < 30) AS kept
        FROM c
    """


def _decontaminate_oracle_sql(n: int = 8) -> str:
    toks = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
    grams = (
        f"list_transform(range(1, greatest(len(l) - {n - 2}, 1)), "
        f"i -> array_to_string(list_slice(l, i, i + {n - 1}), ' '))"
    )
    return f"""
        WITH bt AS (
            SELECT 'bench secret sequence alpha b' || i
                   || ' beta gamma delta epsilon zeta eta theta iota kappa'
                   AS text
            FROM (SELECT unnest(range(4)) AS i)),
        bg AS (
            SELECT DISTINCT gram FROM (
                SELECT unnest({grams}) AS gram
                FROM (SELECT {toks} AS l FROM bt))),
        dt AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 20 = 0
                           THEN ' bench secret sequence alpha b'
                                || (doc_id % 4)
                                || ' beta gamma delta epsilon zeta'
                                || ' eta theta iota kappa'
                        WHEN doc_id % 20 = 10
                           THEN ' bench secret sequence alpha b'
                                || (doc_id % 4)
                                || ' beta gamma delta epsilon zeta'
                        ELSE '' END AS text
            FROM documents),
        dg AS (
            SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id, unnest({grams}) AS gram
                FROM (SELECT doc_id, {toks} AS l FROM dt)))
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
               TRUE AS contaminated
        FROM dg JOIN bg USING (gram)
        GROUP BY doc_id
    """


ORACLES = {
    "extract_links": """
        SELECT lang,
               CAST(count(*) + sum(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_links
        FROM documents GROUP BY lang
    """,
    "selector_suffix": """
        SELECT lang, CAST(count(*) AS BIGINT) AS n_png
        FROM documents WHERE doc_id % 3 = 0 GROUP BY lang
    """,
    "selector_class": """
        SELECT lang, CAST(count(*) AS BIGINT) AS n_long
        FROM documents WHERE n_chars > 200 GROUP BY lang
    """,
    "url_canonicalize": """
        SELECT doc_id,
               'http://host' || (doc_id % 5) || '.test/a/d' || doc_id AS url_norm
        FROM documents
    """,
    # same event synthesis; the fold is one row_number window ordered
    # by the (epoch, visit-order) tuple desc + the Max_age-0 delete
    # filter on the winner
    "jar_fold": """
        WITH e AS (
            SELECT doc_id % 3 AS epoch,
                   doc_id % 4 AS depth,
                   doc_id % 2 AS de,
                   'http://h' || (doc_id % 7) || '.test/p' || doc_id
                       AS url_norm,
                   doc_id % 2 AS hop,
                   doc_id % 5 AS idx,
                   'c' || (doc_id % 5) AS name,
                   'v' || doc_id AS value,
                   CASE WHEN doc_id % 17 = 0 THEN 0
                        WHEN doc_id % 5 = 1 THEN 7200 END AS max_age,
                   'd' || (doc_id % 11) || '.test' AS domain,
                   '/' AS path,
                   doc_id % 2 = 0 AS secure
            FROM documents WHERE doc_id < 500),
        w AS (
            SELECT *, row_number() OVER (
                       PARTITION BY name, domain, path
                       ORDER BY epoch DESC, depth DESC, de DESC,
                                url_norm DESC, hop DESC, idx DESC) AS rn
            FROM e)
        SELECT name, value, CAST(max_age AS BIGINT) AS max_age,
               domain, path, secure
        FROM w WHERE rn = 1 AND (max_age IS NULL OR max_age <> 0)
    """,
    "cookie_match": """
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN ''
                    ELSE 'sess=' || n_name END AS cookie_header
        FROM customer JOIN nation ON n_nationkey = c_nationkey
    """,
    # Class table: login form (password+members path), paywall
    # phrase, login-path plain form, plain article.
    "login_pages": """
        SELECT doc_id,
               doc_id % 4 = 0 AS has_password,
               doc_id % 4 IN (0, 2) AS login_path,
               doc_id % 4 = 1 AS paywall_text,
               doc_id % 4 < 3 AS auth_walled
        FROM documents
        WHERE doc_id < 600
    """,
    # otherbot -> the * group (1 rule, both paths allowed);
    # mybot -> its 2-rule group (/b blocked, /b/ok allowed by the
    # longer allow); mybot-images -> the images group (1 rule, both
    # /b paths allowed).
    "robots_agent_groups": """
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'otherbot'
                    WHEN 1 THEN 'mybot' ELSE 'mybot-images' END
                   AS agent,
               CAST(CASE doc_id % 3 WHEN 1 THEN 2 ELSE 1 END AS INT)
                   AS n_rules,
               TRUE AS allowed_ok,
               doc_id % 3 <> 1 AS allowed_z
        FROM documents
        WHERE doc_id < 450
    """,
    # F = 2 + d%3 frames at delays 100+10k -> total = 100F + 5F(F-1);
    # GIF loop NULL (no NETSCAPE ext in the fixture), else d%4.
    "anim_probe": """
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'gif' WHEN 1 THEN 'apng'
                    ELSE 'webp' END AS fmt,
               CAST(6 AS INT) AS w, CAST(4 AS INT) AS h,
               CAST(2 + doc_id % 3 AS INT) AS n_frames,
               CAST(100 * (2 + doc_id % 3)
                    + 5 * (2 + doc_id % 3) * (1 + doc_id % 3)
                    AS INT) AS total_ms,
               CAST(CASE WHEN doc_id % 3 = 0 THEN NULL
                    ELSE doc_id % 4 END AS INT) AS loop
        FROM documents
        WHERE doc_id < 450
    """,
    # Milli-px via the same integer round-half-up rational the probe
    # uses (px/pt/mm/cm/in/pc at doc_id%6); element counts and
    # sanitizer flags are the fixture's own closed forms.
    "svg_probe": """
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN (20 + doc_id % 80) * 1000
                    ELSE CASE doc_id % 6
                      WHEN 0 THEN (20 + doc_id % 80) * 1000
                      WHEN 1 THEN ((20 + doc_id % 80) * 96000 + 36) // 72
                      WHEN 2 THEN ((20 + doc_id % 80) * 960000 + 127) // 254
                      WHEN 3 THEN ((20 + doc_id % 80) * 9600000 + 127) // 254
                      WHEN 4 THEN (20 + doc_id % 80) * 96000
                      ELSE (20 + doc_id % 80) * 16000 END
               END AS w_milli,
               CASE WHEN doc_id % 5 = 0 THEN (10 + doc_id % 40) * 1000
                    ELSE CASE doc_id % 6
                      WHEN 0 THEN (10 + doc_id % 40) * 1000
                      WHEN 1 THEN ((10 + doc_id % 40) * 96000 + 36) // 72
                      WHEN 2 THEN ((10 + doc_id % 40) * 960000 + 127) // 254
                      WHEN 3 THEN ((10 + doc_id % 40) * 9600000 + 127) // 254
                      WHEN 4 THEN (10 + doc_id % 40) * 96000
                      ELSE (10 + doc_id % 40) * 16000 END
               END AS h_milli,
               doc_id % 5 = 0 AS from_viewbox,
               CAST(2 + doc_id % 4 + doc_id % 3 + doc_id % 2
                    + CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END
                    + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
                    AS INT) AS n_elems,
               CAST(doc_id % 3 AS INT) AS n_paths,
               CAST(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END
                    AS INT) AS n_rasters,
               CAST(doc_id % 2 AS INT) AS n_texts,
               doc_id % 7 = 0 AS has_script,
               doc_id % 11 = 0 AS has_event,
               doc_id % 13 = 0 AS has_external
        FROM documents
        WHERE doc_id < 500
    """,
    # The identical rank windows + fused floor replayed in SQL.
    "hybrid_rrf": """
        WITH qs AS (SELECT * FROM (VALUES (0),(1),(2)) t(q)),
        base AS (
          SELECT q.q AS query_id, d.doc_id
          FROM documents d, qs q WHERE d.doc_id < 200),
        a AS (
          SELECT query_id, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY (doc_id*7 + query_id*11) % 101 DESC,
                            doc_id) AS r1
          FROM base),
        b AS (
          SELECT query_id, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY (doc_id*13 + query_id*5) % 97 DESC,
                            doc_id) AS r2
          FROM base),
        f AS (
          SELECT a.query_id, a.doc_id, a.r1, b.r2,
                 1.0/(60 + a.r1) + 1.0/(60 + b.r2) AS rrf
          FROM a JOIN b USING (query_id, doc_id)),
        ranked AS (
          SELECT query_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY rrf DESC, doc_id) AS pos,
                 doc_id, r1, r2,
                 CAST(FLOOR(rrf * 1000000) AS BIGINT) AS rrf_micro
          FROM f)
        SELECT CAST(query_id AS INT) AS query_id,
               CAST(pos AS INT) AS pos, doc_id,
               CAST(r1 AS INT) AS r1, CAST(r2 AS INT) AS r2,
               rrf_micro
        FROM ranked WHERE pos <= 10
    """,
    # AMP mirrors fold onto their canonical; everything else folds
    # onto itself.
    "amp_pages": """
        SELECT doc_id,
               doc_id % 3 = 1 AS is_amp,
               CASE WHEN doc_id % 3 = 0
                    THEN 'http://site.test/page' || doc_id || '/amp'
               END AS amphtml_url,
               'http://site.test/page' || doc_id AS fold_url
        FROM documents
        WHERE doc_id < 600
    """,
    # Broken-JSON docs (%7==0) emit nothing; @graph docs (%4==0)
    # emit two entities, the rest one.
    "jsonld_entities": """
        SELECT doc_id, CAST(0 AS INT) AS idx,
               CASE doc_id % 3 WHEN 0 THEN 'Article'
                    WHEN 1 THEN 'Product' ELSE 'ImageObject'
               END AS type,
               'Entity ' || doc_id AS name,
               'http://img.test/' || doc_id || '.jpg' AS image
        FROM documents
        WHERE doc_id < 500 AND doc_id % 7 <> 0 AND doc_id % 4 <> 0
        UNION ALL
        SELECT doc_id, CAST(0 AS INT), 'Article',
               'Graph A ' || doc_id, CAST(NULL AS VARCHAR)
        FROM documents
        WHERE doc_id < 500 AND doc_id % 7 <> 0 AND doc_id % 4 = 0
        UNION ALL
        SELECT doc_id, CAST(1 AS INT), 'ImageObject',
               'Graph B ' || doc_id,
               'http://img.test/g' || doc_id || '.jpg'
        FROM documents
        WHERE doc_id < 500 AND doc_id % 7 <> 0 AND doc_id % 4 = 0
    """,
    # Same TIFF payload round-trips through all three containers.
    "exif_containers": """
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
                    ELSE 'webp' END AS fmt,
               'Cam' || (doc_id % 4) AS make,
               CAST(1 + doc_id % 8 AS INT) AS orientation,
               doc_id % 5 = 0 AS has_gps,
               CAST(CASE WHEN doc_id % 5 = 0 THEN doc_id % 90 END
                    AS INT) AS gps_lat_deg
        FROM documents
        WHERE doc_id < 450
    """,
    # Master rows follow the pinned rendition ladder; media totals
    # are the two reachable segment sums (odd docs ⇒ S ∈ {4, 6}).
    "hls_playlists": """
        WITH vs AS (SELECT * FROM (VALUES (0),(1),(2),(3)) t(v))
        SELECT d.doc_id, 'master' AS kind,
               CAST(v.v AS INT) AS variant,
               CAST(500000 * (v.v + 1) AS BIGINT) AS bandwidth,
               CAST(CASE v.v WHEN 0 THEN 640 WHEN 1 THEN 1280
                    WHEN 2 THEN 1920 ELSE 2560 END AS INT) AS width,
               CAST(CASE v.v WHEN 0 THEN 360 WHEN 1 THEN 720
                    WHEN 2 THEN 1080 ELSE 1440 END AS INT) AS height,
               'rendition_' || v.v || '.m3u8' AS uri,
               CAST(NULL AS INT) AS n_segments,
               CAST(NULL AS BIGINT) AS total_ms,
               CAST(NULL AS BOOLEAN) AS live
        FROM documents d, vs v
        WHERE d.doc_id < 500 AND d.doc_id % 2 = 0
          AND v.v < 2 + d.doc_id % 3
        UNION ALL
        SELECT doc_id, 'media', CAST(NULL AS INT),
               CAST(NULL AS BIGINT), CAST(NULL AS INT),
               CAST(NULL AS INT), CAST(NULL AS VARCHAR),
               CAST(3 + doc_id % 4 AS INT),
               CAST(CASE 3 + doc_id % 4 WHEN 4 THEN 19000
                    ELSE 30000 END AS BIGINT),
               doc_id % 5 = 0
        FROM documents
        WHERE doc_id < 500 AND doc_id % 2 = 1
    """,
    # Case-folded keys land on the same closed forms either codec.
    "ogg_tags": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'vorbis'
                    ELSE 'opus' END AS codec,
               'fixture' AS vendor,
               'Sträck ' || doc_id AS title,
               'Günd ' || (doc_id % 6) AS artist,
               CASE WHEN doc_id % 4 = 0
                    THEN 'LP ' || (doc_id % 9) END AS album
        FROM documents
        WHERE doc_id < 400
    """,
    # Tag text round-trips every (version, encoding) shape to the
    # same closed forms; album only on doc_id%3==0.
    "id3_tags": """
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 4 < 2 THEN 3 ELSE 4 END
                    AS INT) AS version,
               'Tïtle ' || doc_id AS title,
               'Ärtist ' || (doc_id % 7) AS artist,
               CASE WHEN doc_id % 3 = 0
                    THEN 'Album ' || (doc_id % 5) END AS album
        FROM documents
        WHERE doc_id < 400
    """,
    # One row per (url u, image i) with i < doc_id%4 and
    # u <= doc_id%3; caption on even i, title only on i=0.
    "sitemap_videos": """
        WITH us AS (SELECT * FROM (VALUES (0),(1),(2)) t(u)),
             vs AS (SELECT * FROM (VALUES (0),(1)) t(i))
        SELECT d.doc_id,
               'http://site' || (d.doc_id % 10) || '.test/p'
                 || d.doc_id || '/' || u.u AS page_loc,
               CAST(i.i AS INT) AS vid_pos,
               'http://cdn.test/v' || d.doc_id || '_' || u.u || '_'
                 || i.i || '.mp4' AS content_loc,
               CASE WHEN i.i = 0
                    THEN 'http://cdn.test/t' || d.doc_id || '.jpg'
               END AS thumbnail_loc,
               'v' || i.i || ' p' || u.u AS title,
               CASE WHEN i.i % 2 = 0
                    THEN 'video ' || i.i || ' of doc ' || d.doc_id
               END AS description,
               CAST(30 + i.i * 10 AS INT) AS duration_s
        FROM documents d, us u, vs i
        WHERE d.doc_id < 400
          AND u.u <= d.doc_id % 3
          AND i.i < d.doc_id % 3
    """,
    "sitemap_images": """
        WITH us AS (SELECT * FROM (VALUES (0),(1),(2)) t(u)),
             im AS (SELECT * FROM (VALUES (0),(1),(2)) t(i))
        SELECT d.doc_id,
               'http://site' || (d.doc_id % 10) || '.test/p'
                 || d.doc_id || '/' || u.u AS page_loc,
               CAST(i.i AS INT) AS img_pos,
               'http://cdn.test/i' || d.doc_id || '_' || u.u || '_'
                 || i.i || '.jpg' AS img_loc,
               CASE WHEN i.i % 2 = 0
                    THEN 'img ' || i.i || ' of page ' || u.u
                         || ' doc ' || d.doc_id END AS caption,
               CASE WHEN i.i = 0 THEN 't' || d.doc_id END AS title
        FROM documents d, us u, im i
        WHERE d.doc_id < 400
          AND u.u <= d.doc_id % 3
          AND i.i < d.doc_id % 4
    """,
    # Closed forms from the correlated fixture (P = 2 + doc_id%4,
    # langs cycle at (doc_id+k)%4 so P determines the winner):
    # pure-English docs (doc_id%5==0) → en/1; else P=2→en, P=3→de,
    # P=4→en (four-way tie, smallest index), P=5→es (wraps, es twice).
    "lang_segments": """
        SELECT doc_id,
               CAST(2 + doc_id % 4 AS INT) AS n_paras,
               CASE WHEN doc_id % 5 = 0 THEN 'en'
                    ELSE CASE 2 + doc_id % 4
                      WHEN 2 THEN 'en' WHEN 3 THEN 'de'
                      WHEN 4 THEN 'en' ELSE 'es' END
               END AS majority,
               CAST(CASE WHEN doc_id % 5 = 0 THEN 1
                    ELSE LEAST(2 + doc_id % 4, 4) END AS INT)
                 AS n_langs,
               doc_id % 5 <> 0 AS mixed
        FROM documents
        WHERE doc_id < 500
    """,
    # The AIMD recurrence replayed exactly: epoch-0 anchor, then
    # join epoch e+1 onto the epoch-e state per host.
    "adaptive_delay": """
        WITH RECURSIVE base AS (
          SELECT 'h' || (doc_id % 20) AS host,
                 doc_id // 20 AS epoch,
                 CAST(CASE WHEN (doc_id // 20)
                               % (3 + (doc_id % 20) % 4) = 0
                      THEN 503 ELSE 200 END AS INT) AS status
          FROM documents WHERE doc_id < 400),
        rec AS (
          SELECT host, epoch, status,
                 CASE WHEN status >= 500 THEN 2000
                      ELSE 1000 END AS delay_ms
          FROM base WHERE epoch = 0
          UNION ALL
          SELECT b.host, b.epoch, b.status,
                 CASE WHEN b.status >= 500
                      THEN LEAST(r.delay_ms * 2, 60000)
                      ELSE GREATEST(r.delay_ms - 250, 1000) END
          FROM rec r
          JOIN base b ON b.host = r.host AND b.epoch = r.epoch + 1)
        SELECT host, CAST(epoch AS BIGINT) AS epoch, status,
               CAST(delay_ms AS BIGINT) AS delay_ms
        FROM rec
    """,
    # Damage class drives every flag: %4∈{0,3} intact, ==1 truncated,
    # ==2 corrupt (PNG: 1 bad CRC but walk reaches IEND; JPEG/GIF:
    # missing end marker reads as truncation).
    "payload_integrity": """
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                    ELSE 'gif' END AS fmt,
               doc_id % 4 = 1
                 OR (doc_id % 4 = 2 AND doc_id % 3 <> 0) AS truncated,
               CAST(CASE WHEN doc_id % 4 = 2 AND doc_id % 3 = 0
                    THEN 1 ELSE 0 END AS INT) AS bad_crc,
               doc_id % 4 IN (0, 3)
                 OR (doc_id % 4 = 2 AND doc_id % 3 = 0) AS has_end,
               doc_id % 4 IN (0, 3) AS keep
        FROM documents
        WHERE doc_id < 600
    """,
    # Fixture closed forms; the JPEG ICC segment count flips 1→2
    # exactly when 60000 + doc_id%10000 crosses 65505 (ICC Annex-B
    # max payload per APP2).
    "color_probe": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END
                 AS fmt,
               CASE WHEN doc_id % 2 = 0 AND doc_id % 3 = 0
                    THEN 45455 END AS gamma_micro,
               CAST(CASE WHEN doc_id % 2 = 0 AND doc_id % 5 = 0
                    THEN doc_id % 4 END AS INT) AS srgb_intent,
               CASE WHEN doc_id % 2 = 0 AND doc_id % 7 = 0
                    THEN 'p' || (doc_id % 9) END AS icc_name,
               CASE WHEN doc_id % 2 = 0 AND doc_id % 7 = 0
                      THEN 128 + doc_id % 100
                    WHEN doc_id % 2 = 1 AND doc_id % 7 = 0
                      THEN 60000 + doc_id % 10000
               END AS icc_size,
               CAST(CASE WHEN doc_id % 2 = 1 AND doc_id % 7 = 0
                    THEN CASE WHEN 60000 + doc_id % 10000 > 65505
                         THEN 2 ELSE 1 END
               END AS INT) AS icc_segments,
               CAST(CASE WHEN doc_id % 2 = 1 AND doc_id % 5 = 0
                    THEN doc_id % 3 END AS INT) AS adobe_transform
        FROM documents
        WHERE doc_id < 450
    """,
    # Every row repairs to the same clean closed form; pass count
    # follows the damage depth (0 clean / 1 single / 2 double).
    "mojibake_fix": """
        SELECT doc_id,
               doc_id % 3 <> 1 AS was_mojibake,
               CAST(CASE doc_id % 3 WHEN 1 THEN 0 WHEN 0 THEN 1
                    ELSE 2 END AS INT) AS n_fixes,
               'café déjà vu ' || doc_id || '’s ‘quote‘ end' AS fixed
        FROM documents
        WHERE doc_id < 600
    """,
    # Member facts are the fixture's closed forms; CRC-32 of
    # b'x'*(10+k) pinned (zlib.crc32, IEEE 802.3 polynomial).
    "zip_probe": """
        WITH ks AS (SELECT * FROM (VALUES (0),(1),(2),(3)) t(k))
        SELECT d.doc_id,
               'f' || k.k || '.txt' AS name,
               CAST(CASE WHEN d.doc_id % 2 = 1 THEN 8 ELSE 0 END
                    AS INT) AS method,
               CAST(10 + k.k AS BIGINT) AS usize,
               CASE WHEN d.doc_id % 2 = 1 THEN NULL
                    ELSE CAST(10 + k.k AS BIGINT) END AS csize_stored,
               CAST(CASE k.k WHEN 0 THEN 2396997495
                    WHEN 1 THEN 1110650203 WHEN 2 THEN 1881648594
                    ELSE 3832644310 END AS BIGINT) AS crc32
        FROM documents d, ks k
        WHERE d.doc_id < 400 AND k.k < 1 + d.doc_id % 4
    """,
    # Paragraph strings reconstructed closed-form (chr(10) joins,
    # chr(9) is the w:tab in paragraph 1).
    "docx_text": """
        WITH t AS (
          SELECT doc_id,
                 CAST(2 + doc_id % 3 AS INT) AS n_paras,
                 'Doc ' || doc_id || ' paragraph 0' || chr(10)
                 || 'Doc ' || doc_id || chr(9) || 'paragraph 1'
                 || CASE WHEN doc_id % 3 >= 1
                    THEN chr(10) || 'Doc ' || doc_id || ' paragraph 2'
                    ELSE '' END
                 || CASE WHEN doc_id % 3 >= 2
                    THEN chr(10) || 'Doc ' || doc_id || ' paragraph 3'
                    ELSE '' END AS text
          FROM documents WHERE doc_id < 400)
        SELECT doc_id, n_paras, text,
               CAST(length(text) AS INT) AS n_chars
        FROM t
    """,
    # Spine order == idx order; visible text = h1 title + p body
    # (head title stripped), whitespace-collapsed.
    "epub_spine": """
        WITH ks AS (SELECT * FROM (VALUES (0),(1),(2),(3)) t(i))
        SELECT d.doc_id,
               CAST(k.i AS INT) AS idx,
               'ch' || k.i || '.xhtml' AS href,
               'Chapter ' || k.i || ' text of chapter ' || k.i
               || ' in doc ' || d.doc_id AS text
        FROM documents d, ks k
        WHERE d.doc_id < 300 AND k.i < 2 + d.doc_id % 3
    """,
    # Pages < 25: 12 URLs across en/de/fr; pages >= 25: the 4
    # English-only URLs.  Same collapse replayed in SQL.
    "bitext_candidates": """
        WITH u AS (
            SELECT 'www.test' AS host,
                   '/_L_/page' || (doc_id % 50) AS path_norm,
                   CASE doc_id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                        ELSE 'fr' END AS lang
            FROM documents
            WHERE doc_id < 600
              AND (doc_id % 50 < 25 OR doc_id % 3 = 0))
        SELECT host, path_norm,
               CAST(count(*) AS BIGINT) AS n_urls,
               list_aggr(list_sort(list_distinct(list(lang))),
                         'string_agg', ',') AS langs,
               len(list_distinct(list(lang))) >= 2 AS bitext
        FROM u
        GROUP BY host, path_norm
    """,
    # Shard/parse/decode is the real machinery; keys, captions, and
    # exact q95 constant-plane means are the stated closed forms.
    "webdataset_roundtrip": """
        SELECT doc_id,
               'a photo of item ' || (doc_id % 40) AS caption,
               CAST((doc_id * 17) % 251 AS INT) AS mean_r
        FROM documents
        WHERE doc_id < 400
    """,
    # Five AV rows per doc in channel-group order (poster, two
    # sources, track, audio).
    "media_discovery": """
        SELECT doc_id, 'video_poster' AS channel,
               'http://m' || (doc_id % 6) || '.test/poster.jpg' AS url
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id, 'source_src',
               'http://m' || (doc_id % 6) || '.test/clip'
                   || (doc_id % 4) || '.mp4'
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id, 'source_src',
               'http://m' || (doc_id % 6) || '.test/clip'
                   || (doc_id % 4) || '.webm'
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id, 'track_src',
               'http://m' || (doc_id % 6) || '.test/cap'
                   || (doc_id % 3) || '.vtt'
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id, 'audio_src',
               'http://m' || (doc_id % 6) || '.test/pod'
                   || (doc_id % 5) || '.wav'
        FROM documents WHERE doc_id < 400
    """,
    # Five discovery rows per doc: src, lazy (data-src shadows the
    # placeholder), srcset best (2x wins), and two CSS urls.
    "image_discovery": """
        SELECT doc_id, 'src' AS channel,
               'http://i' || (doc_id % 9) || '.test/plain.png' AS img_url
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id, 'lazy',
               'http://i' || (doc_id % 9) || '.test/real'
                   || (doc_id % 5) || '.jpg'
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id, 'srcset',
               'http://i' || (doc_id % 9) || '.test/b'
                   || (doc_id % 3) || '.jpg'
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id, 'css',
               'http://c' || (doc_id % 7) || '.test/hero.jpg'
        FROM documents WHERE doc_id < 400
        UNION ALL
        SELECT doc_id, 'css',
               'http://c' || (doc_id % 7) || '.test/div'
                   || (doc_id % 4) || '.png'
        FROM documents WHERE doc_id < 400
    """,
    # Two data-URI rows per doc: the base64 PNG decodes to its
    # closed-form plane; the percent-encoded text round-trips.
    "data_uri_images": """
        SELECT doc_id, 'image/png' AS mime,
               CAST((doc_id * 13) % 251 AS INT) AS mean_r,
               CAST(NULL AS VARCHAR) AS text_payload
        FROM documents WHERE doc_id < 300
        UNION ALL
        SELECT doc_id, 'text/plain', CAST(NULL AS INT),
               'note ' || doc_id
        FROM documents WHERE doc_id < 300
    """,
    # Constant q95 planes decode exactly, so means/dims/captions are
    # the stated closed forms.
    "pdf_images": """
        WITH k(img_no, w, h) AS (VALUES (0, 8, 8), (1, 16, 8))
        SELECT d.doc_id, CAST(k.img_no AS INT) AS img_no,
               CAST(k.w AS INT) AS w, CAST(k.h AS INT) AS h,
               CAST(CASE k.img_no WHEN 0 THEN (d.doc_id * 7) % 251
                    ELSE (d.doc_id * 11) % 251 END AS INT) AS mean_r,
               'figure ' || d.doc_id || ' caption' AS caption
        FROM documents d CROSS JOIN k
        WHERE d.doc_id < 300
    """,
    # Four structure classes stated literally per doc_id%4.
    "jpeg_structure": """
        SELECT doc_id,
               doc_id % 4 = 1 AS progressive,
               CAST(16 AS INT) AS w, CAST(16 AS INT) AS h,
               CAST(3 AS INT) AS n_components,
               CASE doc_id % 4 WHEN 2 THEN '4:2:0'
                               WHEN 3 THEN '4:2:2'
                               ELSE '4:4:4' END AS subsampling
        FROM documents
        WHERE doc_id < 400
    """,
    # method/target/pairing stated arithmetically; the chain itself
    # (paired write -> reparse -> Concurrent-To join -> request-block
    # parse) is the real machinery.
    "warc_requests": """
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'POST' ELSE 'GET' END
                   AS method,
               '/p' || doc_id || '?q=' || (doc_id % 7) AS target,
               TRUE AS paired,
               'body-' || doc_id AS resp_body
        FROM documents
        WHERE doc_id < 400
    """,
    # The salted two-phase top-B is provably equal to this naive
    # per-group window (scheduler.politeness_split docstring); the
    # simulated A-record is the same md5 arithmetic.
    "politeness_by_ip": """
        WITH fr AS (
            SELECT 'http://h' || (o_custkey % 40) || '.test/p'
                       || o_orderkey AS url_norm,
                   'h' || (o_custkey % 40) || '.test' AS real_host,
                   CAST(o_orderkey % 5 AS INT) AS depth
            FROM orders),
        g AS (
            SELECT *,
                   CAST(CAST(concat('0x', substr(md5(real_host), 1, 2))
                             AS BIGINT) % 8 AS VARCHAR) AS server_group
            FROM fr)
        SELECT server_group, real_host, depth, url_norm
        FROM g
        QUALIFY row_number() OVER (
            PARTITION BY server_group ORDER BY depth, url_norm) <= 4
    """,
    "politeness_topk": """
        SELECT o_orderkey, 'h' || (o_custkey % 20) AS host
        FROM orders
        QUALIFY row_number() OVER (
            PARTITION BY o_custkey % 20 ORDER BY o_orderdate, o_orderkey) <= 3
    """,
    "seen_dedupe": """
        SELECT CAST(count(*) AS BIGINT) AS n_new FROM (
            SELECT DISTINCT
                'http://h' || (user_id % 50) || '.test/p' || (event_id % 1000) AS u
            FROM events
        ) WHERE u NOT IN (
            SELECT 'http://h' || (o_custkey % 50) || '.test/p' || (o_orderkey % 1000)
            FROM orders
        )
    """,
    "seen_dedupe_cuckoo": """
        WITH seeds AS (
            SELECT DISTINCT
                'http://h' || (o_custkey % 50) || '.test/p' || (o_orderkey % 1000) AS u
            FROM orders
        ), deleted AS (
            SELECT DISTINCT
                'http://h' || (o_custkey % 50) || '.test/p' || (o_orderkey % 1000) AS u
            FROM orders WHERE o_orderkey % 7 = 0
        ), cand AS (
            SELECT DISTINCT
                'http://h' || (user_id % 50) || '.test/p' || (event_id % 1000) AS u
            FROM events
        )
        SELECT CAST(count(*) AS BIGINT) AS n_new
        FROM cand
        WHERE u NOT IN (
            SELECT u FROM seeds WHERE u NOT IN (SELECT u FROM deleted)
        )
    """,
    "form_defaults": """
        SELECT p_partkey, (p_size % 2 = 0) AS checked, p_brand AS brand_default
        FROM part
    """,
    "format_scalars": """
        SELECT p_partkey,
               printf('#%02X%02X%02X', p_size % 256, (p_size*7) % 256,
                      (p_size*11) % 256) AS color_valid,
               CASE WHEN (p_size*3) % 300 <= 255
                    THEN printf('#%02X%02X%02X', (p_size*3) % 300, p_size % 256,
                                p_size % 256)
                    END AS color_maybe,
               CASE WHEN (p_size % 35) >= 1 AND (p_partkey % 14) BETWEEN 1 AND 12
                         AND (p_size % 35) <= (CASE
                             WHEN (p_partkey % 14) IN (1,3,5,7,8,10,12) THEN 31
                             WHEN (p_partkey % 14) IN (4,6,9,11) THEN 30
                             WHEN ((1900+p_size) % 400 = 0 OR
                                   ((1900+p_size) % 4 = 0 AND
                                    (1900+p_size) % 100 <> 0)) THEN 29
                             ELSE 28 END)
                    THEN printf('%d-%02d-%02d', 1900 + p_size,
                                CAST(p_partkey % 14 AS INT), p_size % 35)
                    END AS date_s,
               CASE WHEN (p_size % 30) <= 23 AND ((p_size*7) % 61) <= 59
                    THEN printf('%02d:%02d:%02d', p_size % 30,
                                CAST(p_partkey % 60 AS INT), (p_size*7) % 61)
                    END AS time_s
        FROM part
    """,
    "submit_fetch": """
        SELECT CASE WHEN p_partkey % 2 = 0
                    THEN 'http://parts.test/submit/' || p_partkey
                    ELSE 'http://parts.test/submit/' || p_partkey
                         || '?q=' || p_partkey END AS url_norm,
               CASE WHEN p_partkey % 2 = 0 THEN 'POST' ELSE 'GET' END AS method,
               CAST(200 AS INT) AS status,
               'got:' || CASE WHEN p_partkey % 2 = 0 THEN 'POST' ELSE 'GET' END
                      || ':q=' || p_partkey AS body
        FROM part
    """,
    "dedup_exact": """
        SELECT lang, CAST(count(DISTINCT text) AS BIGINT) AS n_unique,
               CAST(count(*) AS BIGINT) AS n_total
        FROM documents GROUP BY lang
    """,
    "dedup_minhash": f"""
        SELECT sig0, sig1, CAST(count(*) AS BIGINT) AS n_docs FROM (
            SELECT list_min(list_transform({_TOKS_SQL}, w -> md5(w || 's0'))) AS sig0,
                   list_min(list_transform({_TOKS_SQL}, w -> md5(w || 's1'))) AS sig1
            FROM documents
        ) GROUP BY sig0, sig1 HAVING count(*) > 1
    """,
    "simhash_buckets": f"""
        WITH hs AS (
            SELECT doc_id,
                   list_transform({_TOKS_SQL},
                       w -> CAST(('0x' || substr(md5(w), 1, 4)) AS INTEGER)) AS h
            FROM documents),
        bits AS (
            SELECT doc_id, b,
                   sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
            FROM hs, unnest(h) AS u(hv), range(16) AS rb(b)
            GROUP BY doc_id, b),
        sims AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN 1 << b ELSE 0 END) AS BIGINT)
                       AS simhash
            FROM bits GROUP BY doc_id)
        SELECT simhash, CAST(count(*) AS BIGINT) AS n_docs
        FROM sims GROUP BY simhash HAVING count(*) > 1
    """,
    "ngram_jaccard": f"""
        WITH t AS (
            SELECT doc_id, sh,
                   list_min(list_transform(sh, s -> md5(s || 's0'))) AS sig0,
                   list_min(list_transform(sh, s -> md5(s || 's1'))) AS sig1
            FROM (SELECT doc_id,
                   list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
                  FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
                  WHERE len(toks) >= 3))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
               CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
                    AS BIGINT) AS n_union
        FROM t a JOIN t b
          ON a.sig0 = b.sig0 AND a.sig1 = b.sig1 AND a.doc_id < b.doc_id
        WHERE 3 * len(list_intersect(a.sh, b.sh)) >= len(a.sh) + len(b.sh)
    """,
    "image_features": """
        SELECT doc_id,
               CAST((doc_id * 7)  % 251 AS BIGINT) * 1000 AS mean_r,
               CAST((doc_id * 11) % 251 AS BIGINT) * 1000 AS mean_g,
               CAST((doc_id * 13) % 251 AS BIGINT) * 1000 AS mean_b
        FROM documents WHERE doc_id < 200
    """,
    "image_phash": """
        SELECT doc_id,
               CAST(sum(CASE WHEN (((doc_id % 10000) >> ((x + y) % 16)) & 1)
                              < (((doc_id % 10000) >> ((x + y + 1) % 16)) & 1)
                        THEN (CAST(1 AS BIGINT) << (y * 8 + x)) ELSE 0 END)
                    AS BIGINT) AS phash
        FROM documents, range(8) ry(y), range(8) rx(x)
        WHERE doc_id < 1000
        GROUP BY doc_id
    """,
    "image_neardup": """
        WITH ph AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN (((doc_id % 10000) >> ((x + y) % 16)) & 1)
                                  < (((doc_id % 10000) >> ((x + y + 1) % 16)) & 1)
                            THEN (CAST(1 AS BIGINT) << (y * 8 + x)) ELSE 0 END)
                        AS BIGINT) AS phash
            FROM documents, range(8) ry(y), range(8) rx(x)
            WHERE doc_id < 1000
            GROUP BY doc_id)
        SELECT band, val, CAST(count(*) AS BIGINT) AS n_imgs
        FROM (SELECT CAST(b AS INT) AS band,
                     (phash >> (16 * CAST(b AS INT))) & 65535 AS val
              FROM ph, range(4) rb(b))
        GROUP BY band, val HAVING count(*) > 1
    """,
    # Constant fixture shape -> constant mdat payload base 680
    # (pinned by test_mp4_samples); offsets/dts replayed as window
    # cumsums of the closed-form sizes/deltas.
    "mp4_samples": """
        WITH s(sample_no) AS (VALUES (0),(1),(2),(3),(4),(5)),
        p AS (
            SELECT d.doc_id, s.sample_no,
                   CAST(16 + (d.doc_id + s.sample_no) % 9 AS BIGINT)
                       AS size,
                   CASE WHEN s.sample_no < 3
                        THEN 400 + (d.doc_id % 5) * 20
                        ELSE 900 + (d.doc_id % 3) * 100 END AS delta
            FROM documents d CROSS JOIN s
            WHERE d.doc_id < 400)
        SELECT doc_id, CAST(sample_no AS INT) AS sample_no,
               CAST(680 + COALESCE(SUM(size) OVER (
                   PARTITION BY doc_id ORDER BY sample_no
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS offset,
               size,
               CAST(COALESCE(SUM(delta) OVER (
                   PARTITION BY doc_id ORDER BY sample_no
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS dts,
               sample_no IN (0, 3) AS keyframe
        FROM p
    """,
    # start/end/text are closed forms of (doc_id, cue_no); the
    # malformed no-arrow block (docs%4==0) and the WEBVTT/NOTE header
    # blocks contribute no rows by construction.
    "subtitle_cues": """
        WITH c(cue_no) AS (VALUES (0), (1), (2))
        SELECT d.doc_id,
               CAST(c.cue_no AS INT) AS cue_no,
               CAST(((d.doc_id % 50) * 3 + 4 * c.cue_no) * 1000
                    + (d.doc_id % 10) * 100 AS BIGINT) AS start_ms,
               CAST(((d.doc_id % 50) * 3 + 4 * c.cue_no + 2 + c.cue_no)
                    * 1000 + (d.doc_id % 10) * 100 AS BIGINT) AS end_ms,
               'item ' || d.doc_id || ' cue ' || c.cue_no
                   || CASE WHEN c.cue_no = 0 THEN chr(10) || 'extra'
                           ELSE '' END AS text
        FROM documents d CROSS JOIN c
        WHERE d.doc_id < 600
    """,
    # Same synthesis + the identical (area, doc_id) struct-order max
    # replayed as a row_number over (w*h DESC, doc_id DESC).
    "pair_dedup": """
        WITH p AS (
            SELECT doc_id,
                   'a photo of item ' || (doc_id % 40) AS caption,
                   CAST((doc_id % 40) * 2654435761 AS BIGINT) AS phash,
                   CAST(64 * (1 + doc_id % 8) AS BIGINT)
                   * CAST(64 * (1 + doc_id % 5) AS BIGINT) AS area
            FROM documents WHERE doc_id < 800),
        r AS (
            SELECT caption, phash, doc_id, area,
                   row_number() OVER (PARTITION BY caption, phash
                                      ORDER BY area DESC, doc_id DESC)
                       AS rk,
                   count(*) OVER (PARTITION BY caption, phash)
                       AS n_pairs
            FROM p)
        SELECT caption, phash, CAST(n_pairs AS BIGINT) AS n_pairs,
               doc_id AS keep_doc, area AS keep_area
        FROM r WHERE rk = 1
    """,
    # The same three stages in SQL: regexp-free junk gate (junk
    # classes are arithmetically known), row_number pair keeper,
    # micro-ratio-error bucket argmin, then the histogram.
    "pipeline_image": """
        WITH b(i, bw, bh) AS (VALUES
            (0, 512, 2048), (1, 576, 1792), (2, 640, 1536),
            (3, 704, 1408), (4, 768, 1344), (5, 832, 1216),
            (6, 896, 1152), (7, 1024, 1024), (8, 1152, 896),
            (9, 1216, 832), (10, 1344, 768), (11, 1408, 704),
            (12, 1536, 640), (13, 1792, 576), (14, 2048, 512)),
        gated AS (
            SELECT doc_id,
                   'a photo of item ' || (doc_id % 40)
                       || ' on a wooden table' AS caption,
                   CAST((doc_id % 40) * 2654435761 AS BIGINT) AS phash,
                   CAST(128 + (doc_id * 97) % 1920 AS INT) AS w,
                   CAST(128 + (doc_id * 53) % 1080 AS INT) AS h
            FROM documents
            WHERE doc_id < 1200 AND doc_id % 7 <> 0
              AND doc_id % 11 <> 0),
        keepers AS (
            SELECT w, h FROM (
                SELECT w, h, row_number() OVER (
                    PARTITION BY caption, phash
                    ORDER BY CAST(w AS BIGINT) * h DESC, doc_id DESC
                ) AS rn
                FROM gated) WHERE rn = 1),
        okk AS (
            SELECT * FROM keepers
            WHERE CAST(w AS BIGINT) * h >= 262144
              AND greatest(w, h) <= 4 * least(w, h)),
        assigned AS (
            SELECT i AS bucket_i, bw AS bucket_w, bh AS bucket_h
            FROM (
                SELECT k.w, k.h, b.i, b.bw, b.bh,
                       row_number() OVER (
                           PARTITION BY k.w, k.h, k.rid ORDER BY
                           (abs(CAST(k.w AS BIGINT) * b.bh
                                - CAST(k.h AS BIGINT) * b.bw)
                            * 1000000)
                               // (CAST(k.h AS BIGINT) * b.bw), b.i)
                           AS rn
                FROM (SELECT w, h, row_number() OVER () AS rid
                      FROM okk) k
                CROSS JOIN b) WHERE rn = 1)
        SELECT CAST(bucket_i AS INT) AS bucket_i,
               CAST(bucket_w AS INT) AS bucket_w,
               CAST(bucket_h AS INT) AS bucket_h,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM assigned
        GROUP BY bucket_i, bucket_w, bucket_h
    """,
    # L = d%3 lead, M = 2+d%2 loud, T = 1+d%2 trail windows; d%5==0
    # adds one ragged 50 ms silent tail window.
    "audio_silence": """
        SELECT doc_id,
               CAST(doc_id % 3 + (2 + doc_id % 2) + (1 + doc_id % 2)
                    + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
                    AS INT) AS n_windows,
               CAST(doc_id % 3 + (1 + doc_id % 2)
                    + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
                    AS INT) AS n_silent,
               CAST((doc_id % 3) * 100 AS INT) AS lead_ms,
               CAST((1 + doc_id % 2) * 100
                    + CASE WHEN doc_id % 5 = 0 THEN 50 ELSE 0 END
                    AS INT) AS trail_ms
        FROM documents
        WHERE doc_id < 500
    """,
    # Class table: quantized gradient -> (8, 32), 2-level checker ->
    # (2, 190), dense gray ramp -> (256, 1).
    "image_posterize": """
        SELECT doc_id,
               CAST(CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 2
                    ELSE 256 END AS INT) AS distinct_colors,
               CAST(CASE doc_id % 3 WHEN 0 THEN 32 WHEN 1 THEN 190
                    ELSE 1 END AS INT) AS step,
               doc_id % 3 < 2 AS graphics
        FROM documents
        WHERE doc_id < 600
    """,
    # Class table: stripes -> (dark, 500, 1000, scanlike), constant
    # -> degenerate (level, 1000, 0), half-split -> (dark, 500, 66).
    "image_otsu": """
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 3 = 1 THEN 100 + doc_id % 100
                         ELSE 20 + doc_id % 10 END AS INT) AS threshold,
               CAST(CASE WHEN doc_id % 3 = 1 THEN 1000
                         ELSE 500 END AS INT) AS ink_pm,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 1000
                         WHEN doc_id % 3 = 1 THEN 0
                         ELSE 66 END AS INT) AS trans_pm,
               doc_id % 3 = 0 AS scanlike
        FROM documents
        WHERE doc_id < 600
    """,
    # Class table stated literally: cls0 carries GPS (scrubbed,
    # bytes change), cls1 EXIF sans GPS (byte-identical), cls2 no
    # EXIF (byte-identical, no surviving tags).
    "exif_gps_scrub": """
        SELECT doc_id,
               doc_id % 3 = 0 AS had_gps,
               FALSE AS gps_after,
               CAST(CASE WHEN doc_id % 3 < 2 THEN 1 + doc_id % 8
                    END AS INT) AS orientation,
               CASE WHEN doc_id % 3 < 2 THEN 'Cam' END AS make,
               doc_id % 3 <> 0 AS unchanged
        FROM documents
        WHERE doc_id < 500
    """,
    # Three closed-form classes: flat -> 0/0/0; bottom-third
    # period-2 stripes -> 0/0/470 (1000*64//136) and flagged;
    # full-frame period-1 stripes -> 1000 everywhere, not flagged.
    "text_overlay": """
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 3 = 2 THEN 1000 ELSE 0 END
                    AS INT) AS top_pm,
               CAST(CASE WHEN doc_id % 3 = 2 THEN 1000 ELSE 0 END
                    AS INT) AS mid_pm,
               CAST(CASE WHEN doc_id % 3 = 1 THEN 470
                         WHEN doc_id % 3 = 2 THEN 1000
                         ELSE 0 END AS INT) AS bot_pm,
               doc_id % 3 = 1 AS text_overlay
        FROM documents
        WHERE doc_id < 600
    """,
    # Estimator inverts the IJG Annex-K scaling exactly for every q
    # in 1..100 (tests/test_jpeg_quality.py proves the round trip
    # over the full range, baseline AND progressive), so the oracle
    # is the encoding quality itself, stated arithmetically.
    "jpeg_quality": """
        SELECT doc_id,
               CAST(35 + (doc_id * 7) % 61 AS INT) AS q_est,
               TRUE AS exact,
               CAST(2 AS INT) AS n_tables
        FROM documents
        WHERE doc_id < 400
    """,
    "image_jpeg_features": """
        SELECT doc_id,
               CAST((doc_id * 7)  % 251 AS BIGINT) * 1000 AS mean_r,
               CAST((doc_id * 11) % 251 AS BIGINT) * 1000 AS mean_g,
               CAST((doc_id * 13) % 251 AS BIGINT) * 1000 AS mean_b
        FROM documents WHERE doc_id < 200
    """,
    "image_jpeg_progressive": """
        SELECT doc_id,
               CAST(250 * ((doc_id * 7) % 251 + (doc_id * 7 + 17) % 251
                    + (doc_id * 7 + 34) % 251 + (doc_id * 7 + 51) % 251)
                    AS BIGINT) AS mean_r,
               CAST(250 * ((doc_id * 11) % 251 + (doc_id * 11 + 17) % 251
                    + (doc_id * 11 + 34) % 251 + (doc_id * 11 + 51) % 251)
                    AS BIGINT) AS mean_g,
               CAST(250 * ((doc_id * 13) % 251 + (doc_id * 13 + 17) % 251
                    + (doc_id * 13 + 34) % 251 + (doc_id * 13 + 51) % 251)
                    AS BIGINT) AS mean_b
        FROM documents WHERE doc_id < 200
    """,
    "image_png_variants": """
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN CAST((doc_id * 7) % 251 AS BIGINT) * 1000
                 WHEN 1 THEN 125 * (SELECT CAST(SUM((doc_id * 7 + k * 5) % 251)
                                    AS BIGINT) FROM range(8) t(k))
                 WHEN 2 THEN CAST((doc_id * 7) % 251 AS BIGINT) * 1000
                 ELSE 250 * CAST((doc_id * 7) % 251 + (doc_id * 7 + 17) % 251
                      + (doc_id * 7 + 34) % 251 + (doc_id * 7 + 51) % 251
                      AS BIGINT)
               END AS mean_r,
               CASE doc_id % 4
                 WHEN 0 THEN CAST((doc_id * 7) % 251 AS BIGINT) * 1000
                 WHEN 1 THEN 125 * (SELECT CAST(SUM((doc_id * 11 + k * 5) % 251)
                                    AS BIGINT) FROM range(8) t(k))
                 WHEN 2 THEN CAST((doc_id * 11) % 251 AS BIGINT) * 1000
                 ELSE 250 * CAST((doc_id * 11) % 251 + (doc_id * 11 + 17) % 251
                      + (doc_id * 11 + 34) % 251 + (doc_id * 11 + 51) % 251
                      AS BIGINT)
               END AS mean_g,
               CASE doc_id % 4
                 WHEN 0 THEN CAST((doc_id * 7) % 251 AS BIGINT) * 1000
                 WHEN 1 THEN 125 * (SELECT CAST(SUM((doc_id * 13 + k * 5) % 251)
                                    AS BIGINT) FROM range(8) t(k))
                 WHEN 2 THEN CAST((doc_id * 13) % 251 AS BIGINT) * 1000
                 ELSE 250 * CAST((doc_id * 13) % 251 + (doc_id * 13 + 17) % 251
                      + (doc_id * 13 + 34) % 251 + (doc_id * 13 + 51) % 251
                      AS BIGINT)
               END AS mean_b
        FROM documents WHERE doc_id < 200
    """,
    "image_exif": """
        SELECT doc_id,
               TRUE AS has_exif,
               CAST(1 + doc_id % 8 AS INT) AS orientation,
               'cam' || (doc_id % 5) AS make,
               'm' || (doc_id % 7) AS model,
               CAST(16 AS INT) AS px_w,
               CAST(16 AS INT) AS px_h,
               CASE WHEN doc_id % 2 = 0 THEN 'N' ELSE 'S' END AS lat_ref,
               CAST(doc_id % 90 AS INT) AS lat_deg,
               CAST(doc_id % 60 AS INT) AS lat_min,
               CAST((doc_id * 37) % 6000 AS BIGINT) AS lat_sec_num,
               CAST(100 AS BIGINT) AS lat_sec_den,
               FALSE AS scrub_has_exif
        FROM documents WHERE doc_id < 300
    """,
    "image_tiff_features": """
        SELECT doc_id,
               CAST(16 AS INT) AS w, CAST(12 AS INT) AS h,
               CAST((doc_id * 7) % 251 AS BIGINT) * 1000 AS mean_r,
               CAST((doc_id * CASE WHEN doc_id % 2 = 0 THEN 7 ELSE 11 END)
                    % 251 AS BIGINT) * 1000 AS mean_g,
               CAST((doc_id * CASE WHEN doc_id % 2 = 0 THEN 7 ELSE 13 END)
                    % 251 AS BIGINT) * 1000 AS mean_b
        FROM documents WHERE doc_id < 200
    """,
    "image_ico_features": """
        SELECT doc_id,
               CAST(16 AS INT) AS w, CAST(12 AS INT) AS h,
               CAST((doc_id * 7) % 251 AS BIGINT) * 1000 AS mean_r,
               CAST((doc_id * 11) % 251 AS BIGINT) * 1000 AS mean_g,
               CAST((doc_id * 13) % 251 AS BIGINT) * 1000 AS mean_b
        FROM documents WHERE doc_id < 200
    """,
    "image_qoi_features": """
        SELECT doc_id,
               CAST(16 AS INT) AS w, CAST(12 AS INT) AS h,
               CAST((doc_id * 7) % 200 AS BIGINT) * 1000 + 7500 AS mean_r,
               CAST((doc_id * 11) % 200 AS BIGINT) * 1000 + 5500 AS mean_g,
               CAST((doc_id * 13) % 251 AS BIGINT) * 1000 AS mean_b
        FROM documents WHERE doc_id < 200
    """,
    "image_webp_features": """
        SELECT doc_id,
               CAST(16 AS INT) AS w, CAST(12 AS INT) AS h,
               CAST((doc_id * 7) % 200 AS BIGINT) * 1000 + 7500 AS mean_r,
               CAST((doc_id * 11) % 200 AS BIGINT) * 1000 + 5500 AS mean_g,
               CAST((doc_id * 13) % 251 AS BIGINT) * 1000 AS mean_b
        FROM documents WHERE doc_id < 200
    """,
    "image_tiff_compressed": """
        SELECT doc_id,
               CAST(16 AS INT) AS w, CAST(12 AS INT) AS h,
               CAST((doc_id * 7) % 200 AS BIGINT) * 1000 + 7500 AS mean_r,
               CAST((doc_id * 11) % 200 AS BIGINT) * 1000 + 5500 AS mean_g,
               CAST((doc_id * 13) % 251 AS BIGINT) * 1000 AS mean_b
        FROM documents WHERE doc_id < 200
    """,
    "image_pixel_dedup": """
        SELECT gid AS keeper_doc_id,
               CAST(CASE WHEN gid < 40 THEN 5 ELSE 4 END AS BIGINT)
                   AS n_copies,
               CAST(CASE WHEN gid < 40 THEN 5 ELSE 4 END AS INT)
                   AS n_formats,
               CASE WHEN gid < 40 THEN 'bmp,png,ppm,qoi,tiff'
                    ELSE 'bmp,png,ppm,tiff' END AS fmts
        FROM (SELECT DISTINCT doc_id % 60 AS gid
              FROM documents WHERE doc_id < 280) t
    """,
    "warc_cdx": """
        WITH p AS (
            SELECT doc_id,
                   'doc-' || doc_id || '-'
                       || repeat('x', CAST(doc_id % 97 AS INT)) AS body
            FROM documents WHERE doc_id < 500
        )
        SELECT 'com,example,w' || (doc_id % 7) || ')/p/' || doc_id
                   || '?a=' || (doc_id % 5) || '&b=2' AS surt,
               '20260818123456' AS ts,
               'HTTPS://W' || (doc_id % 7) || '.Example.COM:443/P/'
                   || doc_id || '?b=2&a=' || (doc_id % 5) AS url,
               'text/plain' AS mime,
               CAST(200 AS INT) AS status,
               'sha256:' || sha256(body) AS digest,
               CAST(length(body) AS BIGINT) AS payload_length
        FROM p
    """,
    "warc_roundtrip": """
        SELECT doc_id,
               'response' AS warc_type,
               CAST(63 + length(CAST(strlen(text) AS VARCHAR))
                    + strlen(text) AS BIGINT) AS content_length,
               CAST(200 AS INT) AS status,
               substr(text, 1, 12) AS body_prefix
        FROM documents WHERE doc_id < 300
    """,
    "sitemap_gz": """
        WITH live AS (
            SELECT doc_id FROM documents
            WHERE doc_id < 200
              AND NOT (doc_id % 2 = 0 AND doc_id % 7 = 0))
        SELECT doc_id, 'url' AS kind, CAST(0 AS BIGINT) AS pos,
               'http://gz' || (doc_id % 10) || '.test/a' || doc_id AS loc,
               CAST(0.5 AS DOUBLE) AS priority
        FROM live
        UNION ALL
        SELECT doc_id, 'url', 1,
               'http://gz' || (doc_id % 10) || '.test/b' || doc_id,
               CAST(NULL AS DOUBLE)
        FROM live
    """,
    "sitemap_extract": """
        WITH ks AS (SELECT unnest(range(3)) AS k)
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 2 = 0 THEN 'url'
                    ELSE 'sitemap' END AS kind,
               CAST(k AS INT) AS pos,
               CASE WHEN d.doc_id % 2 = 0 THEN
                    'http://host' || (d.doc_id % 20) || '.test/s'
                        || d.doc_id ||
                    CASE k WHEN 0 THEN '/p0'
                           WHEN 1 THEN '/p1?a=1&b=2'
                           ELSE '/p2' END
               ELSE
                    'http://host' || (d.doc_id % 20) || '.test/sitemaps/'
                        || d.doc_id || '-' || k || '.xml'
               END AS loc,
               CASE WHEN d.doc_id % 2 = 0 THEN
                    CASE k WHEN 0 THEN '2026-01-'
                               || lpad(CAST(d.doc_id % 28 + 1 AS VARCHAR),
                                       2, '0')
                           WHEN 2 THEN '2026-02-'
                               || lpad(CAST(d.doc_id % 28 + 1 AS VARCHAR),
                                       2, '0')
                    END
               ELSE '2026-03-'
                        || lpad(CAST(d.doc_id % 28 + 1 AS VARCHAR), 2, '0')
               END AS lastmod,
               CASE WHEN d.doc_id % 2 = 0 THEN
                    CAST(CASE k WHEN 0 THEN 0.1 WHEN 1 THEN 0.9 END
                         AS DOUBLE)
               END AS priority
        FROM documents d CROSS JOIN ks
        WHERE d.doc_id < 200 AND (d.doc_id % 2 = 0 OR k < 2)
    """,
    "image_thumbnail": """
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                    ELSE 'qoi' END AS fmt,
               CAST(8 AS INT) AS w, CAST(8 AS INT) AS h,
               CAST((doc_id * 7) % 200 + 10 AS INT) AS tl,
               CAST((doc_id * 11) % 200 + 20 AS INT) AS tr,
               CAST((doc_id * 13) % 200 + 5 AS INT) AS bl,
               CAST((doc_id * 17) % 200 + 15 AS INT) AS br
        FROM documents WHERE doc_id < 240
    """,
    "image_resize_bilinear": """
        SELECT doc_id,
               CAST(8 AS INT) AS w, CAST(8 AS INT) AS h,
               CAST((doc_id * 7) % 190 + 2 AS INT) AS tl,
               CAST((doc_id * 7) % 190 + 30 AS INT) AS tr,
               CAST((doc_id * 7) % 190 + 30 AS INT) AS bl,
               CAST((doc_id * 7) % 190 + 58 AS INT) AS br
        FROM documents WHERE doc_id < 240
    """,
    "pdf_text_extract": """
        SELECT doc_id,
               'Doc ' || doc_id || ' (report) ' || chr(92) || ' draft'
                   || chr(10) || 'Value: ' || (doc_id * 7) % 100
                   || chr(10) || 'Appendix ' || doc_id % 5 AS text,
               CAST(length('Doc ' || doc_id || ' (report) ' || chr(92)
                   || ' draft' || chr(10) || 'Value: '
                   || (doc_id * 7) % 100 || chr(10) || 'Appendix '
                   || doc_id % 5) AS INT) AS n_chars
        FROM documents WHERE doc_id < 300
    """,
    "span_dedupe": """
        WITH p AS (
            SELECT doc_id,
                   3 + doc_id % 3 AS np, 2 + doc_id % 2 AS nq,
                   CASE WHEN (doc_id % 20) % 4 < 2 THEN 1 ELSE 0 END AS sh
            FROM documents WHERE doc_id < 400
        )
        SELECT doc_id,
               CAST(np + nq + 10 * sh AS INT) AS n_tokens,
               CAST(3 * sh AS BIGINT) AS n_dup_windows,
               CAST(np + nq AS INT) AS n_kept
        FROM p
    """,
    "revisit_policy": """
        WITH p AS (
            SELECT doc_id, 2 + doc_id % 4 AS kk, 60 + doc_id % 60 AS t,
                   1 + doc_id % 3 AS j, doc_id % 97 AS t0
            FROM documents WHERE doc_id < 400
        ), s AS (
            SELECT doc_id, kk,
                   t0 + (kk - 1) * t AS last_ts,
                   (kk - 1) // j AS n_changes,
                   LEAST(GREATEST(((kk - 1) * t) // ((kk - 1) // j + 1),
                                  100), 10000) AS iv
            FROM p
        )
        SELECT 'http://host' || (doc_id % 40) || '.test/p' || doc_id AS url,
               CAST(kk AS BIGINT) AS n_fetches,
               CAST(n_changes AS BIGINT) AS n_changes,
               CAST(last_ts AS BIGINT) AS last_ts,
               CAST(last_ts + iv AS BIGINT) AS next_due,
               last_ts + iv <= 5000 AS due
        FROM s
    """,
    "robots_sitemap_chain": """
        WITH sp AS (SELECT unnest(range(2)) AS sm_pos),
             pp AS (SELECT unnest(range(2)) AS pos)
        SELECT d.doc_id,
               CAST(sm_pos AS INT) AS sm_pos,
               CAST(pos AS INT) AS pos,
               'http://host' || d.doc_id || '.test/'
                   || CASE WHEN sm_pos = 0 THEN 'main' ELSE 'extra' END
                   || '/p' || pos AS loc
        FROM documents d, sp, pp
        WHERE d.doc_id < 120 AND (sm_pos = 0 OR d.doc_id % 2 = 0)
    """,
    "image_orientation": """
        SELECT doc_id,
               CAST(1 + doc_id % 8 AS INT) AS orientation,
               CAST(16 AS INT) AS w, CAST(16 AS INT) AS h,
               CAST((doc_id * 7) % 200 + 10 AS INT) AS tl,
               CAST((doc_id * 11) % 200 + 20 AS INT) AS tr,
               CAST((doc_id * 13) % 200 + 5 AS INT) AS bl,
               CAST((doc_id * 17) % 200 + 15 AS INT) AS br,
               TRUE AS exif_gone
        FROM documents WHERE doc_id < 240
    """,
    "line_dedupe": """
        SELECT doc_id,
               CAST(4 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_lines,
               CAST(2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_boiler,
               'doc ' || doc_id || ' ' || substr(text, 1, 40)
                   || chr(10) || 'promo code ' || (doc_id % 80) AS kept
        FROM documents WHERE doc_id < 400
    """,
    "repetition_filter": """
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '') AS t
            FROM documents),
        uni AS (SELECT doc_id, unnest(t) AS term FROM base),
        bi AS (SELECT b.doc_id, b.t[u.k] || ' ' || b.t[u.k + 1] AS term
               FROM base b, unnest(range(1, len(b.t))) u(k)),
        t1 AS (SELECT doc_id, max(n) AS top_tok_n FROM (
                   SELECT doc_id, count(*) AS n FROM uni
                   GROUP BY doc_id, term) GROUP BY doc_id),
        b1 AS (SELECT doc_id, max(n) AS top_bigram_n FROM (
                   SELECT doc_id, count(*) AS n FROM bi
                   GROUP BY doc_id, term) GROUP BY doc_id)
        SELECT base.doc_id,
               CAST(len(base.t) AS BIGINT) AS n_tokens,
               t1.top_tok_n, b1.top_bigram_n,
               (10 * t1.top_tok_n > 3 * len(base.t)
                OR 5 * b1.top_bigram_n > len(base.t) - 1) AS flagged
        FROM base
        JOIN t1 USING (doc_id)
        LEFT JOIN b1 USING (doc_id)
    """,
    "bpe_encode": _bpe_encode_oracle_sql(_BPE_MERGES),
    "text_normalize": """
        WITH raw AS (
            SELECT doc_id,
                   'Ae' || chr(769) || chr(8203) || 'b' || chr(7)
                   || chr(173) || ' x' || chr(13) || chr(10) || 'y '
                   || list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')[1]
                   || chr(8205) || chr(65279) || '.' AS t
            FROM documents)
        SELECT doc_id,
               replace(
                   regexp_replace(nfc_normalize(t),
                       '[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}'
                       || '\\x{7F}\\x{200B}-\\x{200D}\\x{FEFF}\\x{AD}]',
                       '', 'g'),
                   chr(13) || chr(10), chr(10)) AS norm_text
        FROM raw
    """,
    "bpe_pairs": """
        WITH nrm AS (
            SELECT trim(regexp_replace(lower(text),
                                       '[^a-z]+', ' ', 'g')) AS s
            FROM documents),
        w AS (
            SELECT word, COUNT(*) AS freq
            FROM (SELECT unnest(list_filter(string_split(s, ' '),
                                            x -> x <> '')) AS word
                  FROM nrm)
            GROUP BY word),
        pairs AS (
            SELECT freq,
                   substr(word, CAST(i AS INT), 1) || '+'
                       || substr(word, CAST(i AS INT) + 1, 1) AS pair
            FROM (SELECT word, freq, unnest(range(1, len(word))) AS i
                  FROM w)
            UNION ALL
            SELECT freq, substr(word, len(word), 1) || '+</w>' FROM w),
        pc AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
               FROM pairs GROUP BY pair)
        SELECT * FROM (
            SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair)
                        AS BIGINT) AS rnk, pair, cnt
            FROM pc)
        WHERE rnk <= 20
    """,
    "charlm_score": """
        WITH nrm AS (
            SELECT doc_id,
                   trim(regexp_replace(lower(
                       CASE WHEN doc_id % 5 = 4 THEN reverse(text)
                            ELSE text END), '[^a-z]+', ' ', 'g')) AS s
            FROM documents),
        ref AS (
            SELECT trim(regexp_replace(lower(text),
                                       '[^a-z]+', ' ', 'g')) AS s
            FROM documents WHERE doc_id % 2 = 0),
        model AS (
            SELECT substr(s, CAST(i AS INT), 3) AS tri, COUNT(*) AS cnt
            FROM (SELECT s, unnest(range(1, len(s) - 1)) AS i
                  FROM ref WHERE len(s) >= 3)
            GROUP BY tri),
        tot AS (SELECT COALESCE(SUM(cnt), 0) AS tot FROM model),
        dt AS (
            SELECT doc_id, substr(s, CAST(i AS INT), 3) AS tri
            FROM (SELECT doc_id, s, unnest(range(1, len(s) - 1)) AS i
                  FROM nrm WHERE len(s) >= 3)),
        fam AS (
            SELECT doc_id,
                   COALESCE(cnt, 0)
                       // GREATEST(1, tot // 1000000) AS fam
            FROM dt LEFT JOIN model USING (tri) CROSS JOIN tot)
        SELECT doc_id, COUNT(*) AS n_tri,
               CAST(SUM(fam) // COUNT(*) AS BIGINT) AS score
        FROM fam GROUP BY doc_id
    """,
    "c4_filters": """
        WITH pages AS (
            SELECT doc_id,
                   'alpha ' || t[1] || ' beta gamma delta.' || chr(10)
                   || 'tiny line.' || chr(10)
                   || 'five good words without terminal punct'
                   || CASE WHEN doc_id % 2 = 0 THEN chr(10)
                        || 'second good line with ' || t[2] || ' tail.'
                        ELSE '' END
                   || CASE WHEN doc_id % 3 = 0 THEN chr(10)
                        || 'third good line stays here today.'
                        ELSE '' END
                   || CASE WHEN doc_id % 7 = 0 THEN chr(10)
                        || 'Please enable JavaScript to continue viewing.'
                        ELSE '' END
                   || CASE WHEN doc_id % 11 = 0 THEN chr(10)
                        || 'Lorem Ipsum dolor sit amet.'
                        ELSE '' END
                   || CASE WHEN doc_id % 13 = 3 THEN chr(10)
                        || 'var x = ' || chr(123) || ' a: 1 ' || chr(125)
                        || ';'
                        ELSE '' END AS text
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(text, '\\s+'),
                                     x -> x <> '') AS t
                  FROM documents)),
        split AS (
            SELECT doc_id, text,
                   list_filter(string_split(text, chr(10)),
                               x -> trim(x) <> '') AS ls
            FROM pages),
        kept AS (
            SELECT doc_id, text, ls,
                   list_filter(ls, x ->
                       regexp_matches(x, '[.!?"”]$')
                       AND len(list_filter(
                               string_split_regex(x, '\\s+'),
                               w -> w <> '')) >= 5
                       AND NOT contains(lower(x), 'javascript')) AS ks,
                   (contains(lower(text), 'lorem ipsum')
                    OR contains(text, chr(123))) AS doc_bad
            FROM split)
        SELECT doc_id,
               CAST(len(ls) AS BIGINT) AS n_lines,
               CAST(len(ks) AS BIGINT) AS n_kept,
               (len(ks) >= 3 AND NOT doc_bad) AS keep_doc,
               CASE WHEN len(ks) >= 3 AND NOT doc_bad
                    THEN array_to_string(ks, chr(10)) END AS cleaned_text
        FROM kept
    """,
    "html_tables": _HTML_TABLES_ORACLE,
    "html_markdown": _HTML_MARKDOWN_ORACLE,
    "microdata": _MICRODATA_ORACLE,
    "html_text": """
        SELECT doc_id,
               'menu ' || text || ' A & B <tag> "q" ''s'' x y' AS text_out
        FROM documents
    """,
    "robots_rfc": """
        SELECT doc_id,
               'http://h.test' || CASE doc_id % 6
                 WHEN 0 THEN '/open' || doc_id
                 WHEN 1 THEN '/d/x' || doc_id
                 WHEN 2 THEN '/d/ok/x' || doc_id
                 WHEN 3 THEN '/d/ok' || doc_id || '/no'
                 WHEN 4 THEN '/p' || doc_id
                 ELSE '/x' || doc_id || '/no_t'
               END AS url,
               doc_id % 6 IN (1, 3) AS blocked
        FROM documents
    """,
    "mime_sniff": """
        SELECT doc_id,
               CASE doc_id % 12
                 WHEN 0 THEN 'image/png'
                 WHEN 1 THEN 'image/jpeg'
                 WHEN 2 THEN 'image/gif'
                 WHEN 3 THEN 'image/bmp'
                 WHEN 4 THEN 'image/tiff'
                 WHEN 5 THEN 'image/x-portable-pixmap'
                 WHEN 6 THEN 'audio/wav'
                 WHEN 7 THEN 'video/x-msvideo'
                 WHEN 8 THEN 'text/html'
                 WHEN 9 THEN 'text/xml'
                 ELSE 'application/octet-stream'
               END AS mime,
               CASE doc_id % 12 WHEN 8 THEN 'windows-1252'
                    ELSE 'utf-8' END AS charset
        FROM documents WHERE doc_id < 240
    """,
    "charset_decode": """
        SELECT doc_id,
               CASE doc_id % 4 WHEN 2 THEN 'utf-16le'
                    WHEN 3 THEN 'iso-8859-1' ELSE 'utf-8' END AS charset,
               CASE WHEN doc_id % 4 = 3
                    THEN '<meta charset="iso-8859-1">' || text
                    ELSE text END AS text_out
        FROM documents
    """,
    "audio_features": """
        SELECT doc_id,
               CAST(16000 AS INT) AS sample_rate,
               CAST(16 * (500 + doc_id % 50) AS BIGINT) AS n_samples,
               CAST(500 + doc_id % 50 AS BIGINT) AS duration_ms,
               CAST((1000 + (doc_id % 30) * 500) * 1000 AS BIGINT)
                   AS rms_x1000,
               CAST(1000 + (doc_id % 30) * 500 AS INT) AS peak,
               CAST((16 * (500 + doc_id % 50) - 1) // (4 + doc_id % 5)
                    AS BIGINT) AS zero_crossings
        FROM documents WHERE doc_id < 300
    """,
    "video_frames": """
        SELECT doc_id,
               CAST(k AS INT) AS frame_idx,
               CAST(k * 100 AS BIGINT) AS ts_ms,
               CAST((doc_id * 7  + k * 31) % 251 AS BIGINT) * 1000 AS mean_r,
               CAST((doc_id * 11 + k * 37) % 251 AS BIGINT) * 1000 AS mean_g,
               CAST((doc_id * 13 + k * 41) % 251 AS BIGINT) * 1000 AS mean_b
        FROM documents, range(4) rk(k)
        WHERE doc_id < 200 AND k < 2 + doc_id % 3
    """,
    "audio_g711_features": """
        WITH p AS (
            SELECT doc_id,
                   8 * (400 + doc_id % 40) AS n,
                   4 + doc_id % 5 AS h,
                   1 + doc_id % 15 AS m,
                   doc_id % 8 AS e
            FROM documents WHERE doc_id < 300
        ), amp AS (
            SELECT doc_id, n, h,
                   CASE WHEN doc_id % 2 = 0
                        THEN ((m * 8 + 132) << e) - 132
                        WHEN e = 0 THEN m * 16 + 8
                        ELSE (m * 16 + 264) << (e - 1)
                   END AS a
            FROM p
        )
        SELECT doc_id,
               CAST(8000 AS INT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(n // 8 AS BIGINT) AS duration_ms,
               CAST(a * 1000 AS BIGINT) AS rms_x1000,
               CAST(a AS INT) AS peak,
               CAST((n - 1) // h AS BIGINT) AS zero_crossings
        FROM amp
    """,
    "pagerank_frontier": _pagerank_oracle_sql(3),
    "hits_scores": _hits_oracle_sql(3),
    "opic_scores": _opic_oracle_sql(3),
    "url_hygiene": """
        SELECT doc_id,
               doc_id % 11 = 0 AS long_url,
               doc_id % 5 = 0 AS many_params,
               doc_id % 6 = 0 AS has_session,
               doc_id % 7 = 0 AS trap,
               doc_id % 9 = 0 AS deep,
               doc_id % 13 = 0 AND doc_id % 11 <> 0 AS digit_heavy,
               (doc_id % 11 = 0 OR doc_id % 5 = 0 OR doc_id % 6 = 0
                OR doc_id % 7 = 0 OR doc_id % 9 = 0
                OR doc_id % 13 = 0) AS spam
        FROM documents WHERE doc_id < 1000
    """,
    "caption_extract": """
        SELECT doc_id,
               trim(substr(text, 1, doc_id % 23 + 8)) AS caption,
               CASE doc_id % 6
                    WHEN 0 THEN 'og' WHEN 1 THEN 'og'
                    WHEN 2 THEN 'meta' WHEN 3 THEN 'twitter'
                    WHEN 4 THEN 'jsonld' ELSE 'title'
               END AS caption_source,
               CASE WHEN doc_id % 6 IN (0, 2) THEN
                    'http://host' || (doc_id % 20) || '.test/img'
                        || doc_id || '.png'
               END AS og_image
        FROM documents WHERE doc_id < 400
    """,
    "image_caption_pairs": """
        WITH ks AS (SELECT unnest(range(3)) AS k)
        SELECT d.doc_id,
               CAST(k AS INT) AS pos,
               'http://host' || (d.doc_id % 20) || '.test/i' || d.doc_id
                   || '-' || CASE k WHEN 0 THEN '0' WHEN 1 THEN '1c'
                                  ELSE '2a' END || '.png' AS url,
               CASE k
                    WHEN 0 THEN trim(substr(d.text, 1, d.doc_id % 19 + 6))
                    WHEN 1 THEN trim(substr(d.text, 2, d.doc_id % 23 + 8))
                    ELSE trim(substr(d.text, 3, d.doc_id % 17 + 6))
               END AS caption,
               CASE k WHEN 0 THEN 'alt' WHEN 1 THEN 'og'
                    ELSE 'figcaption' END AS caption_source
        FROM documents d CROSS JOIN ks
        WHERE d.doc_id < 300
    """,
    "crawl_delay_budgets": """
        SELECT 'h' || doc_id || '.test' AS host,
               CAST(CASE doc_id % 6
                    WHEN 0 THEN greatest(1, CAST(floor(
                        4.0 / (doc_id % 5 + 1)) AS INT))
                    WHEN 1 THEN CAST(floor(
                        4.0 / ((doc_id % 4 + 1) / 2.0)) AS INT)
                    WHEN 2 THEN 2
                    WHEN 3 THEN 2
                    WHEN 4 THEN 1
                    ELSE 64
               END AS INT) AS budget
        FROM documents WHERE doc_id < 240
    """,
    "anchor_text": """
        WITH l AS (
            SELECT 'http://t.test/p' || (doc_id % 50) AS url,
                   trim(substr(text, 1, doc_id % 7 + 4)) AS anchor
            FROM documents
            UNION ALL
            SELECT 'http://t.test/p' || ((doc_id * 3) % 50),
                   'see ' || doc_id
            FROM documents)
        SELECT url, COUNT(*) AS n_refs,
               CAST(COUNT(DISTINCT anchor) AS BIGINT) AS n_unique,
               string_agg(DISTINCT anchor, '|' ORDER BY anchor) AS anchors
        FROM l GROUP BY url
    """,
    "sentence_split": """
        WITH s AS (
            SELECT doc_id, sid, sentence FROM documents, (VALUES
                (0, NULL), (1, 'Dr. Who met Mr. Smith.'),
                (2, 'Pi is 3.14 exactly!'), (3, 'Is it done?'),
                (4, '"Yes" it said.')) v(sid, sentence))
        SELECT doc_id, CAST(sid AS BIGINT) AS sid,
               COALESCE(sentence,
                        'Alpha doc ' || doc_id || ' starts here.')
                   AS sentence
        FROM s
        UNION ALL
        SELECT doc_id, 5, 'Extra tail ' || doc_id || ' ends.'
        FROM documents WHERE doc_id % 3 = 0
    """,
    "meta_refresh": """
        SELECT doc_id, 0 AS refresh_delay_s,
               'http://h' || (doc_id % 5) || '.test/next' || doc_id
                   AS refresh_target
        FROM documents WHERE doc_id % 6 = 0
        UNION ALL
        SELECT doc_id, 5, 'http://abs.test/x' || doc_id
        FROM documents WHERE doc_id % 6 = 1
        UNION ALL
        SELECT doc_id, 3, 'http://h' || (doc_id % 5) || '.test/pages/p'
                   || doc_id || '.html'
        FROM documents WHERE doc_id % 6 = 2
        UNION ALL
        SELECT doc_id, 10, CAST(NULL AS VARCHAR)
        FROM documents WHERE doc_id % 6 = 3
    """,
    "hreflang": """
        SELECT doc_id, 'en' AS hreflang,
               'http://x.test/en/d' || doc_id AS alt_url
        FROM documents WHERE doc_id % 4 = 0
        UNION ALL
        SELECT doc_id, 'de-de',
               'http://h' || (doc_id % 5) || '.test/de/d' || doc_id
        FROM documents WHERE doc_id % 4 = 0
        UNION ALL
        SELECT doc_id, 'x-default', 'http://alt.test/d' || doc_id
        FROM documents WHERE doc_id % 4 = 1
    """,
    "pub_date": """
        SELECT doc_id,
               CASE doc_id % 6
                 WHEN 0 THEN '2023-05-'
                     || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                 WHEN 1 THEN '2022-11-'
                     || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                 WHEN 2 THEN '2021-07-'
                     || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                 WHEN 3 THEN '2020-09-01'
                 WHEN 4 THEN '2019-01-'
                     || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                 ELSE NULL
               END AS pub_date,
               CASE doc_id % 6
                 WHEN 0 THEN 'jsonld'
                 WHEN 1 THEN 'meta'
                 WHEN 2 THEN 'time'
                 WHEN 3 THEN 'url'
                 WHEN 4 THEN 'time'
                 ELSE NULL
               END AS source
        FROM documents
    """,
    "public_suffix": """
        SELECT doc_id,
               CASE doc_id % 7
                 WHEN 0 THEN 'www.site' || (doc_id % 10) || '.co.uk'
                 WHEN 1 THEN 'deep.a.site' || (doc_id % 10) || '.com'
                 WHEN 2 THEN 'b.foo' || (doc_id % 10) || '.ck'
                 WHEN 3 THEN 'www.ck'
                 WHEN 4 THEN 'host' || (doc_id % 10) || '.unknowntld'
                 WHEN 5 THEN 'co.uk'
                 ELSE 'sub.x' || (doc_id % 10) || '.github.io'
               END AS host,
               CASE doc_id % 7
                 WHEN 0 THEN 'co.uk'
                 WHEN 1 THEN 'com'
                 WHEN 2 THEN 'foo' || (doc_id % 10) || '.ck'
                 WHEN 3 THEN 'ck'
                 WHEN 4 THEN 'unknowntld'
                 WHEN 5 THEN 'co.uk'
                 ELSE 'github.io'
               END AS public_suffix,
               CASE doc_id % 7
                 WHEN 0 THEN 'site' || (doc_id % 10) || '.co.uk'
                 WHEN 1 THEN 'site' || (doc_id % 10) || '.com'
                 WHEN 2 THEN 'b.foo' || (doc_id % 10) || '.ck'
                 WHEN 3 THEN 'www.ck'
                 WHEN 4 THEN 'host' || (doc_id % 10) || '.unknowntld'
                 WHEN 5 THEN NULL
                 ELSE 'x' || (doc_id % 10) || '.github.io'
               END AS registered_domain
        FROM documents
    """,
    "link_stats": """
        SELECT doc_id,
               CAST(3 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_links,
               CAST(2 AS BIGINT) AS n_internal,
               CAST(1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_ext_domains
        FROM documents
    """,
    "robots_meta": """
        SELECT doc_id,
               doc_id % 5 IN (0, 1) AS noindex,
               doc_id % 5 IN (0, 1, 2) AS nofollow,
               CAST(2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_links,
               CAST(CASE WHEN doc_id % 5 IN (0, 1, 2) THEN 0
                         ELSE 1 + CASE WHEN doc_id % 3 = 0
                                       THEN 1 ELSE 0 END
                    END AS BIGINT) AS n_follow
        FROM documents
    """,
    "pii_scrub": _pii_oracle_sql(),
    "blocklist_filter": _blocklist_oracle_sql(),
    "decontaminate": _decontaminate_oracle_sql(),
    "canonical_urls": """
        WITH t AS (
            SELECT doc_id,
                   'http://s' || (doc_id % 7) || '.test/p' || doc_id
                   || CASE WHEN doc_id % 5 = 0 THEN '?utm=x' ELSE '' END
                   AS url,
                   CASE WHEN doc_id % 3 = 2
                        THEN 'http://s' || (doc_id % 7) || '.test/p'
                             || doc_id
                             || CASE WHEN doc_id % 5 = 0
                                     THEN '?utm=x' ELSE '' END
                        ELSE 'http://s' || (doc_id % 7) || '.test/canon/'
                             || (doc_id % 25)
                   END AS canonical,
                   doc_id % 3 <> 2 AS has_tag
            FROM documents)
        SELECT doc_id, url, canonical, has_tag,
               CAST(count(*) OVER (PARTITION BY canonical)
                    AS BIGINT) AS n_group
        FROM t
    """,
    "domain_cap": """
        SELECT doc_id, domain, grp_rank FROM (
            SELECT doc_id,
                   'site' || (doc_id % 20) || '.com' AS domain,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id % 20
                       ORDER BY CAST(concat('0x',
                           substr(md5('cap-v1:' || doc_id), 1, 8))
                           AS BIGINT) ASC, doc_id ASC)
                       AS BIGINT) AS grp_rank
            FROM documents)
        WHERE grp_rank <= 10
    """,
    # Every (url, rel) stated arithmetically; the multi-token quoted
    # rel keeps its first token per RFC 8288 3.3.
    "link_headers": """
        WITH e(pos, kind) AS (VALUES (0, 'next'), (1, 'prev'),
                                     (2, 'canonical'), (3, 'alternate'))
        SELECT d.doc_id, CAST(e.pos AS INT) AS pos,
               CASE e.kind
                 WHEN 'next' THEN 'https://h' || (d.doc_id % 20)
                     || '.test/page' || (d.doc_id % 50 + 1)
                 WHEN 'prev' THEN 'https://h' || (d.doc_id % 20)
                     || '.test/page' || (d.doc_id % 50 - 1)
                 WHEN 'canonical' THEN 'https://h' || (d.doc_id % 20)
                     || '.test/canon' || (d.doc_id % 50)
                 ELSE 'https://cdn.test/s.css' END AS url,
               e.kind AS rel
        FROM documents d JOIN e
          ON e.pos < 3 OR d.doc_id % 3 = 0
        WHERE d.doc_id < 700
    """,
    # Replays the identical integer arithmetic: bit-length domains,
    # floor-sqrt weights, min(2^32, (T*2^32*w) // (sum_w*n)) keep
    # thresholds, and the same salted-md5 uniform per doc.
    "domain_mixture": """
        WITH d AS (
            SELECT doc_id,
                   CAST(length(bin(CAST(doc_id % 63 + 1 AS BIGINT)))
                        AS INT) AS domain
            FROM documents),
        c AS (
            SELECT domain, CAST(count(*) AS BIGINT) AS n_docs
            FROM d GROUP BY domain),
        w AS (
            SELECT domain, n_docs,
                   CAST(floor(sqrt(n_docs)) AS BIGINT) AS weight
            FROM c),
        t AS (
            SELECT domain, n_docs, weight,
                   CAST(LEAST(CAST(4294967296 AS BIGINT),
                              (300 * CAST(4294967296 AS BIGINT) * weight)
                              // (s.sum_w * n_docs)) AS BIGINT) AS threshold
            FROM w CROSS JOIN
                 (SELECT SUM(weight) AS sum_w FROM w) s),
        k AS (
            SELECT d.domain, CAST(count(*) AS BIGINT) AS kept
            FROM d JOIN t USING (domain)
            WHERE CAST(concat('0x', substr(md5('mix-v1:' || d.doc_id),
                                           1, 8)) AS BIGINT)
                  < t.threshold
            GROUP BY d.domain)
        SELECT t.domain, t.n_docs, t.weight, t.threshold,
               COALESCE(k.kept, CAST(0 AS BIGINT)) AS kept
        FROM t LEFT JOIN k USING (domain)
    """,
    "doc_sample": """
        WITH u AS (
            SELECT doc_id, lang,
                   CAST(concat('0x', substr(md5('docs-v1:' || doc_id),
                                            1, 8)) AS BIGINT) AS u,
                   CAST(concat('0x', substr(md5('split-v1:' || doc_id),
                                            1, 8)) AS BIGINT) AS su
            FROM documents)
        SELECT doc_id, lang, u,
               CASE WHEN su < 3435973836 THEN 'train'
                    WHEN su < 3865470566 THEN 'val'
                    ELSE 'test' END AS split
        FROM u
        WHERE u < CASE lang WHEN 'en' THEN 2147483648
                            WHEN 'de' THEN 1073741824
                            ELSE 536870912 END
    """,
    "image_colorhist": """
        WITH c AS (
            SELECT doc_id,
                   ((doc_id * 7) % 251) // 64 * 16
                   + ((doc_id * 11) % 251) // 64 * 4
                   + ((doc_id * 13) % 251) // 64 AS bin_a,
                   (255 - (doc_id * 7) % 251) // 64 * 16
                   + (255 - (doc_id * 11) % 251) // 64 * 4
                   + (255 - (doc_id * 13) % 251) // 64 AS bin_b
            FROM documents WHERE doc_id < 200)
        SELECT doc_id,
               CAST(64 AS BIGINT) AS n_px,
               array_to_string(
                   list_transform(range(0, 64), i -> CAST(
                       CASE WHEN i = bin_a AND bin_a = bin_b THEN 64
                            WHEN i = bin_a OR i = bin_b THEN 32
                            ELSE 0 END AS BIGINT)), ',') AS hist,
               CAST(least(bin_a, bin_b) AS INT) AS dom_bin,
               CAST(CASE WHEN bin_a = bin_b THEN 1000 ELSE 500 END
                    AS BIGINT) AS dom_milli
        FROM c
    """,
    "image_webp_lossy_features": """
        WITH p AS (
            SELECT doc_id,
                   (doc_id * 7) % 256 AS vy,
                   (doc_id * 11) % 200 AS vu,
                   (doc_id * 13) % 200 AS vv,
                   list_value(4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17, 18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89, 91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157)[(doc_id % 128) + 1] AS dcq
            FROM documents WHERE doc_id < 300),
        yuv AS (
            SELECT doc_id,
                   least(255, 128 + (((vy * dcq * 2 + 3) // 8) + 4) // 8)
                       AS yy,
                   least(255, 128 + (vu * least(dcq, 132) + 4) // 8) AS uu,
                   least(255, 128 + (vv * least(dcq, 132) + 4) // 8) AS vv2
            FROM p),
        rgb AS (
            SELECT doc_id,
                   greatest(0, least(255, CAST(floor(
                       (298 * (yy - 16) + 409 * (vv2 - 128) + 128) / 256.0
                   ) AS BIGINT))) AS r,
                   greatest(0, least(255, CAST(floor(
                       (298 * (yy - 16) - 100 * (uu - 128)
                        - 208 * (vv2 - 128) + 128) / 256.0
                   ) AS BIGINT))) AS g,
                   greatest(0, least(255, CAST(floor(
                       (298 * (yy - 16) + 516 * (uu - 128) + 128) / 256.0
                   ) AS BIGINT))) AS b
            FROM yuv)
        SELECT doc_id,
               CAST(16 AS INT) AS w, CAST(16 AS INT) AS h,
               r * 1000 AS mean_r, g * 1000 AS mean_g, b * 1000 AS mean_b
        FROM rgb
    """,
    "webm_blocks": """
        WITH p AS (
            SELECT doc_id,
                   3 + doc_id % 4 AS n,
                   1000 + (doc_id % 9) * 1000 AS ctc
            FROM documents WHERE doc_id < 400),
        b AS (
            SELECT doc_id, ctc,
                   CAST(unnest(range(0, n)) AS INT) AS i
            FROM p),
        b2 AS (
            SELECT doc_id, ctc, i,
                   40 + ((doc_id * 7 + i * 13) % 50) AS ps
            FROM b),
        c AS (
            SELECT doc_id, ctc, i, ps,
                   COALESCE(SUM(ps + 6) OVER (
                       PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum
            FROM b2)
        SELECT doc_id,
               i AS block,
               CAST(1 AS BIGINT) AS track,
               CAST(ctc + i * 40 AS BIGINT) AS timecode,
               i % 3 = 0 AS keyframe,
               CAST(103 + cum AS BIGINT) AS "offset",
               CAST(ps AS BIGINT) AS size
        FROM c
    """,
    "mp3_frames": """
        WITH p AS (
            SELECT doc_id,
                   3 + doc_id % 5 AS n,
                   1 + doc_id % 14 AS bi0,
                   doc_id % 3 AS si,
                   (doc_id % 4) * 10 AS v2,
                   doc_id % 2 AS step
            FROM documents WHERE doc_id < 400),
        f AS (
            SELECT doc_id, si, v2,
                   CAST(unnest(range(0, n)) AS INT) AS i,
                   bi0, step
            FROM p),
        f2 AS (
            SELECT doc_id, i, si, v2,
                   least(bi0 + (i % 3) * step, 14) AS bi,
                   i % 2 AS pad
            FROM f),
        f3 AS (
            SELECT doc_id, i, v2, pad,
                   list_value(0,32,40,48,56,64,80,96,112,128,160,192,
                              224,256,320)[bi + 1] AS br,
                   list_value(44100,48000,32000)[si + 1] AS sr
            FROM f2),
        f4 AS (
            SELECT doc_id, i, v2, pad, br, sr,
                   144 * br * 1000 // sr + pad AS flen
            FROM f3)
        SELECT doc_id,
               i AS idx,
               CAST(CASE WHEN v2 = 0 THEN 0 ELSE 10 + v2 END
                    + COALESCE(SUM(flen) OVER (
                        PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ), 0) AS BIGINT) AS "offset",
               CAST(flen AS BIGINT) AS size,
               CAST(br AS INT) AS bitrate_kbps,
               CAST(sr AS INT) AS samplerate,
               pad = 1 AS padded
        FROM f4
    """,
    "webm_vp8_frames": """
        WITH p AS (
            SELECT doc_id,
                   CAST(unnest(range(0, 2 + doc_id % 3)) AS INT) AS i
            FROM documents WHERE doc_id < 200),
        t AS (
            SELECT doc_id, i,
                   (doc_id * 7 + i * 31) % 256 AS vy,
                   (doc_id * 11 + i * 17) % 200 AS vu,
                   (doc_id * 13 + i * 23) % 200 AS vv,
                   list_value(4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17, 18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89, 91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157)[(doc_id % 128) + 1] AS dcq
            FROM p),
        yuv AS (
            SELECT doc_id, i,
                   least(255, 128 + (((vy * dcq * 2 + 3) // 8) + 4) // 8)
                       AS yy,
                   least(255, 128 + (vu * least(dcq, 132) + 4) // 8) AS uu,
                   least(255, 128 + (vv * least(dcq, 132) + 4) // 8) AS vv2
            FROM t)
        SELECT doc_id,
               i AS frame,
               CAST(i * 33 AS BIGINT) AS timecode,
               TRUE AS keyframe,
               CAST(16 AS INT) AS w, CAST(16 AS INT) AS h,
               CAST(greatest(0, least(255, CAST(floor(
                   (298 * (yy - 16) + 409 * (vv2 - 128) + 128) / 256.0
               ) AS BIGINT))) AS INT) AS r,
               CAST(greatest(0, least(255, CAST(floor(
                   (298 * (yy - 16) - 100 * (uu - 128)
                    - 208 * (vv2 - 128) + 128) / 256.0
               ) AS BIGINT))) AS INT) AS g,
               CAST(greatest(0, least(255, CAST(floor(
                   (298 * (yy - 16) + 516 * (uu - 128) + 128) / 256.0
               ) AS BIGINT))) AS INT) AS b
        FROM yuv
    """,
    "image_patches": """
        WITH p AS (
            SELECT doc_id,
                   CAST(unnest(range(0, 4)) AS INT) AS pr
            FROM documents WHERE doc_id < 300),
        g AS (
            SELECT doc_id, pr, CAST(unnest(range(0, 4)) AS INT) AS pc
            FROM p),
        v AS (
            SELECT doc_id, pr, pc,
                   (doc_id * 3 + pr * 4 + pc) * 17 AS base
            FROM g)
        SELECT doc_id,
               pr AS patch_row,
               pc AS patch_col,
               (base % 256) * 1000 AS mean_r,
               ((base + 85) % 256) * 1000 AS mean_g,
               ((base + 170) % 256) * 1000 AS mean_b
        FROM v
    """,
    "warc_wat": """
        WITH t AS (
            SELECT doc_id, md5('http://docs.test/' || doc_id) AS h
            FROM documents WHERE doc_id < 300)
        SELECT doc_id,
               'metadata' AS warc_type,
               CAST(200 AS INT) AS status,
               'text/html' AS content_type,
               'T' || doc_id AS title,
               CAST(2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_links,
               'http://l.test/a' || doc_id AS first_link,
               'urn:uuid:' || substr(h, 1, 8) || '-' || substr(h, 9, 4)
                   || '-5' || substr(h, 14, 3) || '-a' || substr(h, 18, 3)
                   || '-' || substr(h, 21, 12) AS refers_to
        FROM t
    """,
    "warc_revisit": """
        WITH t AS (
            SELECT doc_id,
                   doc_id % 100 AS g,
                   doc_id < 100 AS keeper,
                   sha256('payload ' || (doc_id % 100)) AS dig,
                   md5('http://docs.test/'
                       || lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0'))
                       AS h,
                   8 + strlen(CAST(doc_id % 100 AS VARCHAR)) AS n
            FROM documents WHERE doc_id < 300)
        SELECT doc_id,
               CASE WHEN keeper THEN 'response' ELSE 'revisit' END
                   AS warc_type,
               'sha256:' || dig AS payload_digest,
               CASE WHEN keeper THEN NULL
                    ELSE 'urn:uuid:' || substr(h, 1, 8) || '-'
                         || substr(h, 9, 4) || '-5' || substr(h, 14, 3)
                         || '-a' || substr(h, 18, 3) || '-'
                         || substr(h, 21, 12) END AS refers_to,
               CASE WHEN keeper THEN NULL
                    ELSE 'http://docs.test/'
                         || lpad(CAST(g AS VARCHAR), 3, '0')
               END AS refers_to_target_uri,
               CASE WHEN keeper THEN NULL
                    ELSE 'http://netpreserve.org/warc/1.1/revisit/identical-payload-digest'
               END AS profile,
               CAST(CASE WHEN keeper
                         THEN 63 + strlen(CAST(n AS VARCHAR)) + n
                         ELSE 0 END AS BIGINT) AS content_length
        FROM t
    """,
    "warc_wet": """
        WITH t AS (
            SELECT doc_id,
                   'menu ' || text
                       || ' A & B <tag> "q" ''s'' x y' AS text,
                   md5('http://docs.test/' || doc_id) AS h
            FROM documents WHERE doc_id < 300)
        SELECT doc_id,
               'conversion' AS warc_type,
               text,
               'urn:uuid:' || substr(h, 1, 8) || '-' || substr(h, 9, 4)
                   || '-5' || substr(h, 14, 3) || '-a' || substr(h, 18, 3)
                   || '-' || substr(h, 21, 12) AS refers_to,
               CAST(strlen(text) AS BIGINT) AS content_length
        FROM t
    """,
    "video_keyframes": """
        WITH ks AS (SELECT unnest(range(4)) AS k),
        f AS (
            SELECT d.doc_id, CAST(k AS INT) AS frame_idx,
                   (77 * ((d.doc_id * 7 + k * 31) % 251)
                    + 150 * ((d.doc_id * 11 + k * 37) % 251)
                    + 29 * ((d.doc_id * 13 + k * 41) % 251)) // 256 AS luma
            FROM documents d CROSS JOIN ks
            WHERE d.doc_id < 200 AND k < 2 + d.doc_id % 3
        )
        SELECT doc_id, frame_idx,
               CAST(frame_idx * 100 AS BIGINT) AS ts_ms,
               CASE WHEN frame_idx = 0 THEN NULL
                    ELSE abs(luma - lag(luma) OVER w) * 1000
               END AS diff_milli,
               frame_idx = 0
                   OR abs(luma - lag(luma) OVER w) * 1000 >= 30000
                   AS is_keyframe
        FROM f
        WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    """,
    "dedup_clusters": """
        SELECT doc_id AS node,
               6 * (doc_id // 6) AS component
        FROM documents WHERE doc_id < 600
    """,
    "classifier_score": f"""
        WITH tok AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT) % 256 AS b
            FROM documents, unnest({_TOKS_SQL}) AS u(w)),
        s AS (
            SELECT doc_id,
                   CAST(sum((b * 131 + 0)  % 201 - 100) AS BIGINT) AS score0,
                   CAST(sum((b * 131 + 17) % 201 - 100) AS BIGINT) AS score1,
                   CAST(sum((b * 131 + 34) % 201 - 100) AS BIGINT) AS score2
            FROM tok GROUP BY doc_id)
        SELECT doc_id, score0, score1, score2,
               CAST(CASE WHEN score0 >= score1 AND score0 >= score2 THEN 0
                         WHEN score1 >= score2 THEN 1
                         ELSE 2 END AS INTEGER) AS pred
        FROM s
    """,
    "semantic_dedup": """
        -- closed form: the verified geometry makes near-dup
        -- components exactly the 4-member groups (min within-group
        -- cos 0.9936 >= 0.95 > 0.8923 max cross-group), each group
        -- lands whole in the cluster seeded by its axis's init
        -- member (id 4*(g%8)), and the keeper is the component min
        SELECT CAST(doc_id AS BIGINT) AS vec_id,
               CAST(4 * ((doc_id // 4) % 8) AS BIGINT) AS cid,
               CAST(4 * (doc_id // 4) AS BIGINT) AS component,
               doc_id % 4 = 0 AS kept
        FROM documents WHERE doc_id < 128
    """,
    "caption_similarity": """
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                                  x -> CAST(round(x*1000) AS BIGINT)) AS v
            FROM embeddings),
        p AS (
            SELECT a.vec_id AS pair_id, a.v AS iv, b.v AS tv
            FROM q a JOIN q b ON b.vec_id = a.vec_id + 7),
        s AS (
            SELECT pair_id,
                   CAST(list_sum(list_transform(list_zip(iv, tv),
                                                e -> e[1]*e[2]))
                        AS BIGINT) AS dot,
                   CAST(list_sum(list_transform(iv, x -> x*x))
                        AS BIGINT) AS na2,
                   CAST(list_sum(list_transform(tv, x -> x*x))
                        AS BIGINT) AS nb2
            FROM p)
        SELECT pair_id, dot, na2, nb2,
               dot > 0 AND dot*dot*10000 >= 784*na2*nb2 AS keep
        FROM s
    """,
    "image_quality": """
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 10 ELSE 16 END
                    AS INT) AS w,
               CAST(8 AS INT) AS h,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 1250 ELSE 2000 END
                    AS BIGINT) AS aspect_milli,
               CAST((2 * ((doc_id * 3) % 120) + doc_id % 40) * 500
                    AS BIGINT) AS brightness_milli,
               CAST((doc_id % 40) * (doc_id % 40) * 250
                    AS BIGINT) AS var_milli,
               CAST((doc_id % 40) * (doc_id % 40) * 4000
                    AS BIGINT) AS lap_var_milli,
               (doc_id % 40) * (doc_id % 40) * 4000 < 640000 AS blurry,
               (2 * ((doc_id * 3) % 120) + doc_id % 40) * 500 < 60000
                   AS dark,
               (doc_id % 40) * (doc_id % 40) * 250 < 10000 AS low_contrast
        FROM documents WHERE doc_id < 300
    """,
    "feed_extract": """
        WITH ks AS (SELECT unnest(range(3)) AS k)
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 2 = 0 THEN 'rss' ELSE 'atom'
               END AS kind,
               CAST(k AS INT) AS pos,
               'http://host' || (d.doc_id % 20) || '.test/'
                   || CASE WHEN d.doc_id % 2 = 0 THEN 'r' ELSE 'a' END
                   || d.doc_id || '/e' || k AS link,
               trim(substr(d.text, CAST(k + 1 AS INT),
                           d.doc_id % 13 + 5)) AS title,
               CASE WHEN d.doc_id % 2 = 0 THEN
                    'Mon, ' || lpad(CAST(d.doc_id % 28 + 1 AS VARCHAR),
                                    2, '0') || ' Jan 2026 00:00:00 GMT'
                    WHEN k = 0 THEN
                    '2026-01-' || lpad(CAST(d.doc_id % 28 + 1 AS VARCHAR),
                                       2, '0') || 'T00:00:00Z'
                    ELSE
                    '2026-02-' || lpad(CAST(d.doc_id % 28 + 1 AS VARCHAR),
                                       2, '0') || 'T00:00:00Z'
               END AS published,
               CASE WHEN d.doc_id % 2 = 0 AND k = 1 THEN
                    'http://host' || (d.doc_id % 20) || '.test/img'
                        || d.doc_id || '.jpg'
                    WHEN d.doc_id % 2 = 1 AND k = 2 THEN
                    'http://host' || (d.doc_id % 20) || '.test/art'
                        || d.doc_id || '.png'
               END AS enclosure_url
        FROM documents d CROSS JOIN ks
        WHERE d.doc_id < 200
    """,
    "bm25_score": """
        WITH base AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS toks
            FROM documents WHERE doc_id < 400
        ), d AS (
            SELECT doc_id, toks, len(toks) AS dl FROM base
            WHERE len(toks) > 0
        ), meta AS (
            SELECT COUNT(*) AS n, SUM(dl) AS tl FROM d
        ), tf AS (
            SELECT doc_id, dl, tok AS term, COUNT(*) AS tf
            FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM d)
            WHERE tok IN ('join', 'vector', 'slow')
            GROUP BY doc_id, dl, tok
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        )
        SELECT doc_id,
               CAST(SUM(
                   ((1000000 * (2 * (n - df) + 1)) // (2 * df + 1))
                   * (tf * 44 * tl)
                   // (tf * 20 * tl + 6 * tl + 18 * dl * n)
               ) AS BIGINT) AS score_scaled
        FROM tf JOIN dfreq USING (term) CROSS JOIN meta
        GROUP BY doc_id
    """,
    "main_content": """
        WITH p AS (
            SELECT doc_id, 2 + doc_id % 3 AS np
            FROM documents WHERE doc_id < 600
        ), q AS (
            SELECT doc_id, np,
                   'Doc ' || doc_id || ' paragraph 0 holds enough '
                       || 'visible characters to stay.' AS p0,
                   'Doc ' || doc_id || ' paragraph 1 holds enough '
                       || 'visible characters to stay.' AS p1,
                   'Doc ' || doc_id || ' paragraph 2 holds enough '
                       || 'visible characters to stay.' AS p2,
                   'Doc ' || doc_id || ' paragraph 3 holds enough '
                       || 'visible characters to stay.' AS p3
            FROM p
        )
        SELECT doc_id,
               CASE np
                    WHEN 2 THEN p0 || chr(10) || p1
                    WHEN 3 THEN p0 || chr(10) || p1 || chr(10) || p2
                    ELSE p0 || chr(10) || p1 || chr(10) || p2
                            || chr(10) || p3
               END AS main_text,
               CAST(np AS INT) AS n_kept,
               CAST(4 AS INT) AS n_dropped
        FROM q
    """,
    "image_probe": """
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 'avif'
                               WHEN 3 THEN 'jxl'
                               ELSE 'webp' END AS container,
               CASE doc_id % 4 WHEN 0 THEN 'avif'
                               WHEN 3 THEN 'bare'
                               ELSE NULL END AS brand,
               CASE doc_id % 4 WHEN 0 THEN 'av01'
                               WHEN 1 THEN 'vp8'
                               WHEN 2 THEN 'vp8l'
                               ELSE 'jxl' END AS video_codec,
               CAST(CASE doc_id % 4
                 WHEN 0 THEN 320 + doc_id % 16
                 WHEN 1 THEN 640 + doc_id % 16
                 WHEN 2 THEN 3 + doc_id % 5
                 ELSE 8 * (1 + doc_id % 32)
               END AS INT) AS width,
               CAST(CASE doc_id % 4
                 WHEN 0 THEN 200 + doc_id % 8
                 WHEN 1 THEN 480
                 WHEN 2 THEN 2 + doc_id % 7
                 ELSE 8 * (1 + doc_id % 16)
               END AS INT) AS height
        FROM documents WHERE doc_id < 300
    """,
    "media_probe": """
        WITH p AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 8 = 2 THEN 'flac'
                        WHEN doc_id % 8 = 6 THEN 'webm'
                        WHEN doc_id % 2 = 0 THEN 'mp4'
                        WHEN doc_id % 4 = 1 THEN 'mp3'
                        WHEN doc_id % 8 = 7 THEN 'opus'
                        ELSE 'vorbis' END AS kind,
                   ([44100, 48000, 32000])[(doc_id % 3) + 1] AS sr3,
                   ([32000, 44100, 48000])[(doc_id % 3) + 1] AS fsr,
                   50 + doc_id % 50 AS nf,
                   ([32,40,48,56,64,80,96,112,128,160,192,224,256,320]
                   )[(doc_id % 14) + 1] AS kbps
            FROM documents WHERE doc_id < 400
        )
        SELECT doc_id,
               CASE WHEN kind IN ('mp4', 'mp3', 'flac') THEN kind
                    WHEN kind = 'webm' THEN 'mkv'
                    ELSE 'ogg' END AS container,
               CAST(CASE WHEN kind = 'mp4' THEN 3000 + doc_id * 7
                         WHEN kind = 'mp3' THEN nf * 1152 * 1000 // sr3
                         WHEN kind = 'opus' THEN 20 * (10 + doc_id % 20)
                         WHEN kind = 'vorbis' THEN (2 + doc_id % 9) * 1000
                         WHEN kind = 'flac' THEN (3 + doc_id % 6) * 1000
                         ELSE 4000 + doc_id * 9
                    END AS BIGINT) AS duration_ms,
               CAST(CASE WHEN kind IN ('mp4', 'webm')
                         THEN 1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                         ELSE 1 END AS INT) AS n_tracks,
               CASE WHEN kind = 'mp4'
                    THEN CASE WHEN doc_id % 8 = 0 THEN 'avc1' ELSE 'hev1' END
                    WHEN kind = 'webm'
                    THEN CASE WHEN doc_id % 16 = 6
                              THEN 'V_VP9' ELSE 'V_AV1' END
               END AS video_codec,
               CAST(CASE WHEN kind = 'mp4' THEN 16 * (2 + doc_id % 20)
                         WHEN kind = 'webm' THEN 32 * (1 + doc_id % 10) END
                    AS INT) AS width,
               CAST(CASE WHEN kind = 'mp4' THEN 16 * (1 + doc_id % 12)
                         WHEN kind = 'webm' THEN 32 * (1 + doc_id % 6) END
                    AS INT) AS height,
               CASE WHEN kind = 'mp4'
                    THEN CASE WHEN doc_id % 3 = 0 THEN 'mp4a' END
                    WHEN kind = 'webm'
                    THEN CASE WHEN doc_id % 3 = 0 THEN 'A_OPUS' END
                    ELSE kind END AS audio_codec,
               CAST(CASE WHEN kind = 'mp4'
                         THEN CASE WHEN doc_id % 3 = 0 THEN
                              CASE WHEN doc_id % 24 = 0
                                   THEN 44100 ELSE 48000 END END
                         WHEN kind = 'webm'
                         THEN CASE WHEN doc_id % 3 = 0 THEN 48000 END
                         WHEN kind = 'opus' THEN 48000
                         WHEN kind = 'flac' THEN fsr
                         ELSE sr3 END AS INT) AS audio_rate,
               CAST(CASE WHEN kind = 'mp3' THEN kbps END
                    AS INT) AS bitrate_kbps,
               CAST(CASE WHEN kind = 'mp3' THEN nf END
                    AS BIGINT) AS n_frames
        FROM p
    """,
    "audio_container_features": """
        WITH p AS (
            SELECT doc_id,
                   8 * (400 + doc_id % 40) AS n,
                   4 + doc_id % 5 AS h,
                   1 + doc_id % 15 AS m,
                   doc_id % 8 AS e
            FROM documents WHERE doc_id < 300
        ), amp AS (
            SELECT doc_id, n, h,
                   CASE WHEN doc_id % 2 = 0
                        THEN ((m * 8 + 132) << e) - 132
                        ELSE 500 + (doc_id % 64) * 100
                   END AS a
            FROM p
        )
        SELECT doc_id,
               CAST(8000 AS INT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(n // 8 AS BIGINT) AS duration_ms,
               CAST(a * 1000 AS BIGINT) AS rms_x1000,
               CAST(a AS INT) AS peak,
               CAST((n - 1) // h AS BIGINT) AS zero_crossings
        FROM amp
    """,
    "audio_adpcm_features": """
        SELECT doc_id,
               CAST((3 + doc_id % 4) * 505 AS BIGINT) AS n_samples,
               CAST((3 + doc_id % 4) * 505 * 1000 // 8000 AS BIGINT)
                   AS duration_ms,
               CAST((1000 + (doc_id % 30) * 500) * 1000 AS BIGINT)
                   AS rms_x1000,
               CAST(1000 + (doc_id % 30) * 500 AS INT) AS peak,
               CAST(3 + doc_id % 4 - 1 AS BIGINT) AS zero_crossings
        FROM documents WHERE doc_id < 200
    """,
    "video_frames_avi": """
        SELECT doc_id,
               CAST(k AS INT) AS frame_idx,
               CAST(k * 100 AS BIGINT) AS ts_ms,
               CAST((doc_id * 7  + k * 31) % 251 AS BIGINT) * 1000 AS mean_r,
               CAST((doc_id * 11 + k * 37) % 251 AS BIGINT) * 1000 AS mean_g,
               CAST((doc_id * 13 + k * 41) % 251 AS BIGINT) * 1000 AS mean_b
        FROM documents, range(4) rk(k)
        WHERE doc_id < 200 AND k < 2 + doc_id % 3
    """,
    # Quadrant closed forms through the REAL VP8L codec both ways;
    # blended channel = (128*c3 + 127*c0 + 127) // 255 (the decoder's
    # integer Porter-Duff over an opaque canvas).
    "video_frames_webp": """
        WITH c AS (
            SELECT doc_id, k,
                   (doc_id * 7)  % 251 AS r0, (doc_id * 11) % 251 AS g0,
                   (doc_id * 13) % 251 AS b0,
                   (doc_id * 17) % 251 AS r1, (doc_id * 19) % 251 AS g1,
                   (doc_id * 23) % 251 AS b1,
                   (doc_id * 29) % 251 AS r2, (doc_id * 31) % 251 AS g2,
                   (doc_id * 37) % 251 AS b2,
                   (doc_id * 41) % 251 AS r3, (doc_id * 43) % 251 AS g3,
                   (doc_id * 47) % 251 AS b3,
                   (doc_id * 53) % 251 AS rb, (doc_id * 59) % 251 AS gb,
                   (doc_id * 61) % 251 AS bb
            FROM documents, range(4) rk(k) WHERE doc_id < 200
        )
        SELECT doc_id,
               CAST(k AS INT) AS frame_idx,
               CAST(k * 100 AS BIGINT) AS ts_ms,
               CAST(CASE k WHEN 0 THEN r0 * 1000
                    WHEN 1 THEN (3 * r0 + r1) * 250
                    WHEN 2 THEN (2 * r0 + rb + r2) * 250
                    ELSE (r0 + rb + r2
                          + (128 * r3 + 127 * r0 + 127) // 255) * 250
                    END AS BIGINT) AS mean_r,
               CAST(CASE k WHEN 0 THEN g0 * 1000
                    WHEN 1 THEN (3 * g0 + g1) * 250
                    WHEN 2 THEN (2 * g0 + gb + g2) * 250
                    ELSE (g0 + gb + g2
                          + (128 * g3 + 127 * g0 + 127) // 255) * 250
                    END AS BIGINT) AS mean_g,
               CAST(CASE k WHEN 0 THEN b0 * 1000
                    WHEN 1 THEN (3 * b0 + b1) * 250
                    WHEN 2 THEN (2 * b0 + bb + b2) * 250
                    ELSE (b0 + bb + b2
                          + (128 * b3 + 127 * b0 + 127) // 255) * 250
                    END AS BIGINT) AS mean_b
        FROM c
    """,
    "video_frames_apng": """
        WITH c AS (
            SELECT doc_id, k,
                   (doc_id * 7)  % 251 AS r0, (doc_id * 11) % 251 AS g0,
                   (doc_id * 13) % 251 AS b0,
                   (doc_id * 17) % 251 AS r1, (doc_id * 19) % 251 AS g1,
                   (doc_id * 23) % 251 AS b1,
                   (doc_id * 29) % 251 AS r2, (doc_id * 31) % 251 AS g2,
                   (doc_id * 37) % 251 AS b2
            FROM documents, range(3) rk(k) WHERE doc_id < 200
        )
        SELECT doc_id,
               CAST(k AS INT) AS frame_idx,
               CAST(k * 100 AS BIGINT) AS ts_ms,
               CAST(CASE k WHEN 0 THEN r0 * 1000
                    WHEN 1 THEN (3 * r0 + r1) * 250
                    ELSE (3 * r0 + (255 * (128 * r2 + 127 * r0) + 32512)
                          // 65025) * 250 END AS BIGINT) AS mean_r,
               CAST(CASE k WHEN 0 THEN g0 * 1000
                    WHEN 1 THEN (3 * g0 + g1) * 250
                    ELSE (3 * g0 + (255 * (128 * g2 + 127 * g0) + 32512)
                          // 65025) * 250 END AS BIGINT) AS mean_g,
               CAST(CASE k WHEN 0 THEN b0 * 1000
                    WHEN 1 THEN (3 * b0 + b1) * 250
                    ELSE (3 * b0 + (255 * (128 * b2 + 127 * b0) + 32512)
                          // 65025) * 250 END AS BIGINT) AS mean_b
        FROM c
    """,
    "token_stats": f"""
        SELECT lang,
               CAST(sum(len({_TOKS_SQL})) AS BIGINT) AS n_tokens,
               CAST(sum(len(regexp_extract_all(
                   text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT)
                   AS n_subtokens,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        FROM documents GROUP BY lang
    """,
    "quality_filter": f"""
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(toks, x -> x IN ('the','a','and','of')))
                    AS BIGINT) AS n_stop
        FROM (SELECT doc_id, n_chars, {_TOKS_SQL} AS toks FROM documents)
        WHERE n_chars BETWEEN 100 AND 400 AND len(toks) >= 20
          AND 20 * len(list_filter(toks, x -> x IN ('the','a','and','of')))
              >= len(toks)
    """,
    "lang_id": f"""
        SELECT doc_id,
               CASE WHEN {_cnt_sql('the')} >= {_cnt_sql('scan')}
                         AND {_cnt_sql('the')} >= {_cnt_sql('join')}
                         AND {_cnt_sql('the')} >= {_cnt_sql('data')} THEN 'the'
                    WHEN {_cnt_sql('scan')} >= {_cnt_sql('join')}
                         AND {_cnt_sql('scan')} >= {_cnt_sql('data')} THEN 'scan'
                    WHEN {_cnt_sql('join')} >= {_cnt_sql('data')} THEN 'join'
                    ELSE 'data' END AS guess
        FROM documents
    """,
    "embedding_topk": """
        WITH qe AS (
            SELECT vec_id AS query_id,
                   list_transform(embedding,
                                  x -> CAST(round(x*1000) AS BIGINT)) AS qv
            FROM embeddings WHERE vec_id < 3),
        ce AS (
            SELECT vec_id AS neighbor_id,
                   list_transform(embedding,
                                  x -> CAST(round(x*1000) AS BIGINT)) AS cv
            FROM embeddings WHERE vec_id >= 3),
        d AS (
            SELECT query_id, neighbor_id,
                   CAST(list_sum(list_transform(list_zip(qv, cv),
                                                p -> p[1]*p[2])) AS BIGINT) AS dot
            FROM qe, ce)
        SELECT query_id, CAST(rn AS BIGINT) AS rnk, neighbor_id, dot
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rn
              FROM d)
        WHERE rn <= 5
    """,
    "embedding_ann_lsh": """
        WITH b AS (
            SELECT vec_id,
                   list_transform(embedding,
                                  x -> CAST(round(x*1000) AS BIGINT)) AS v,
                   CAST((((((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) * 2
                        + CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END) * 2)
                        + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) * 2
                        + CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS bucket
            FROM embeddings),
        d AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(list_sum(list_transform(list_zip(q.v, c.v),
                                                p -> p[1]*p[2])) AS BIGINT)
                       AS dot
            FROM b q JOIN b c ON q.bucket = c.bucket
            WHERE q.vec_id < 3 AND c.vec_id >= 3)
        SELECT query_id, CAST(rn AS BIGINT) AS rnk, neighbor_id, dot
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rn
              FROM d)
        WHERE rn <= 5
    """,
    "embedding_ann_ivf": _ivf_oracle_sql(),
    "embedding_pq": _pq_oracle_sql(32),
    "embedding_neardup": """
        SELECT CAST(round(embedding[1]*10) AS BIGINT) AS b1,
               CAST(round(embedding[2]*10) AS BIGINT) AS b2,
               CAST(round(embedding[3]*10) AS BIGINT) AS b3,
               CAST(round(embedding[4]*10) AS BIGINT) AS b4,
               CAST(count(*) AS BIGINT) AS n_vecs
        FROM embeddings GROUP BY 1, 2, 3, 4 HAVING count(*) > 1
    """,
    "doc_fingerprint": """
        WITH g AS (
            SELECT doc_id,
                   list_transform(range(1, length(text) - 16 + 2),
                       i -> CAST(('0x' || substr(md5(substr(text, i, 16)), 1, 8))
                            AS BIGINT)) AS gs
            FROM documents WHERE length(text) >= 16),
        f AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(gs) - 8 + 2),
                       j -> list_min(gs[j:j+7]))) AS fps
            FROM g WHERE len(gs) >= 8)
        SELECT fp, CAST(count(*) AS BIGINT) AS n_docs
        FROM f, unnest(fps) AS u(fp)
        GROUP BY fp HAVING count(*) > 1
    """,
    "sessionize": """
        SELECT user_id,
               CAST(sum(CASE WHEN prev IS NULL
                             OR epoch_us(ts) - prev > 1800000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        FROM (SELECT user_id, ts,
                     lag(epoch_us(ts)) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events)
        GROUP BY user_id
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_cents,
               CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))
                    AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "sequence_pack": f"""
        WITH t AS (
            SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok
            FROM documents),
        c AS (
            SELECT doc_id, shard, n_tok,
                   CAST(sum(n_tok) OVER (
                       PARTITION BY shard ORDER BY doc_id) AS BIGINT)
                       AS tok_end
            FROM t)
        SELECT doc_id, shard, n_tok,
               CAST(tok_end - n_tok AS BIGINT) AS tok_start,
               CAST((tok_end - n_tok) // 256 AS BIGINT) AS pack_first,
               CAST(greatest(tok_end - n_tok, tok_end - 1) // 256
                    AS BIGINT) AS pack_last,
               CAST(greatest(tok_end - n_tok, tok_end - 1) // 256
                    - (tok_end - n_tok) // 256 + 1 AS BIGINT) AS n_ctx
        FROM c
    """,
    "chunk_overlap": """
        WITH t AS (SELECT doc_id, text, length(text) AS n
                   FROM documents),
        e AS (SELECT doc_id, text,
                     unnest(range(0, (greatest(n, 1) - 1) // 120 + 1))
                         AS chunk_id
              FROM t)
        SELECT doc_id,
               CAST(chunk_id AS INT) AS chunk_id,
               CAST(chunk_id * 120 AS BIGINT) AS c_start,
               substr(text, CAST(chunk_id * 120 + 1 AS INT), 180) AS chunk,
               CAST(length(substr(text, CAST(chunk_id * 120 + 1 AS INT),
                                  180)) AS BIGINT) AS c_len
        FROM e
    """,
    "readability": f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_words,
                   CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                        AS BIGINT) AS n_sents,
                   CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                        AS BIGINT) AS n_syll
            FROM documents)
        SELECT doc_id, n_words, n_sents, n_syll,
               CAST(206.835 AS DOUBLE)
                   - CAST(1.015 AS DOUBLE)
                     * (CAST(n_words AS DOUBLE) / n_sents)
                   - CAST(84.6 AS DOUBLE)
                     * (CAST(n_syll AS DOUBLE) / n_words) AS fre
        FROM t WHERE n_words > 0
    """,
    "word_collocations": """
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS ws
            FROM documents),
        tok AS (SELECT unnest(ws) AS w FROM t),
        uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w
                FROM tok GROUP BY w),
        n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM tok),
        big AS (
            SELECT (p).w1 AS w1, (p).w2 AS w2,
                   CAST(count(*) AS BIGINT) AS n_ab
            FROM (SELECT unnest(list_transform(
                             range(1, len(ws)),
                             i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
                  FROM t WHERE len(ws) >= 2)
            GROUP BY 1, 2
            HAVING count(*) >= 3)
        SELECT b.w1, b.w2, b.n_ab,
               u1.n_w AS n_a, u2.n_w AS n_b,
               CAST(b.n_ab * n.nt * 1000 // (u1.n_w * u2.n_w)
                    AS BIGINT) AS lift_milli
        FROM big b
        JOIN uni u1 ON b.w1 = u1.w
        JOIN uni u2 ON b.w2 = u2.w
        CROSS JOIN n
        WHERE b.n_ab * n.nt * 1000 // (u1.n_w * u2.n_w) > 1000
    """,
    "textrank_keywords": """
        WITH t AS (
            SELECT doc_id,
                   list_filter(
                       list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> ''),
                       x -> len(x) >= 3 AND x NOT IN ('the', 'and')) AS ws
            FROM documents),
        e AS (
            SELECT DISTINCT doc_id, a, b FROM (
                SELECT doc_id,
                       least((p).w1, (p).w2) AS a,
                       greatest((p).w1, (p).w2) AS b
                FROM (SELECT doc_id,
                             unnest(list_transform(
                                 range(1, len(ws)),
                                 i -> {'w1': ws[i], 'w2': ws[i+1]})) AS p
                      FROM t WHERE len(ws) >= 2))
            WHERE a <> b),
        de AS (SELECT doc_id, a AS src, b AS dst FROM e
               UNION ALL
               SELECT doc_id, b AS src, a AS dst FROM e),
        deg AS (SELECT doc_id, src, CAST(count(*) AS BIGINT) AS deg
                FROM de GROUP BY 1, 2),
        d2 AS (SELECT de.doc_id, de.src, de.dst, deg.deg
               FROM de JOIN deg USING (doc_id, src)),
        s0 AS (SELECT doc_id, src AS w, CAST(1000000 AS BIGINT) AS s
               FROM deg),
        s1 AS (SELECT d2.doc_id, d2.dst AS w,
                      CAST(150000 + (850000 * sum(s0.s // d2.deg)) // 1000000
                           AS BIGINT) AS s
               FROM d2 JOIN s0 ON d2.doc_id = s0.doc_id AND d2.src = s0.w
               GROUP BY 1, 2),
        s2 AS (SELECT d2.doc_id, d2.dst AS w,
                      CAST(150000 + (850000 * sum(s1.s // d2.deg)) // 1000000
                           AS BIGINT) AS s
               FROM d2 JOIN s1 ON d2.doc_id = s1.doc_id AND d2.src = s1.w
               GROUP BY 1, 2),
        s3 AS (SELECT d2.doc_id, d2.dst AS w,
                      CAST(150000 + (850000 * sum(s2.s // d2.deg)) // 1000000
                           AS BIGINT) AS s
               FROM d2 JOIN s2 ON d2.doc_id = s2.doc_id AND d2.src = s2.w
               GROUP BY 1, 2)
        SELECT doc_id, CAST(rank AS INT) AS rank, word, score_micro
        FROM (SELECT doc_id, w AS word, s AS score_micro,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY s DESC, w ASC) AS rank
              FROM s3)
        WHERE rank <= 3
    """,
    "exif_thumbnail": """
        SELECT doc_id,
               doc_id % 4 <> 3 AS has_thumb,
               CAST(CASE WHEN doc_id % 4 <> 3
                         THEN 8 + 4 * (doc_id % 3) END AS INT) AS tw,
               CAST(CASE WHEN doc_id % 4 <> 3
                         THEN 8 + 4 * (doc_id % 3) END AS INT) AS th,
               CAST(CASE WHEN doc_id % 4 <> 3
                         THEN (doc_id * 11) % 251 END AS INT) AS mean_px
        FROM documents WHERE doc_id < 300
    """,
    "image_palette": """
        SELECT doc_id,
               CAST(slot AS INT) AS slot,
               CAST(30 + 60 * slot + doc_id % 8 AS INT) AS r,
               CAST((doc_id * 5) % 256 AS INT) AS g,
               CAST((doc_id * 7) % 256 AS INT) AS b
        FROM documents
        CROSS JOIN (SELECT unnest(range(0, 4)) AS slot)
        WHERE doc_id < 200
    """,
    "distinct_sketch": f"""
        WITH urls AS (
            SELECT lang,
                   'http://' || lang || '.test/p'
                       || CAST(doc_id // 2 AS VARCHAR) AS url
            FROM documents),
        h AS (
            SELECT lang, url,
                   CAST(concat('0x', substr(md5(url), 1, 15)) AS BIGINT)
                       AS h60
            FROM urls),
        b AS (
            SELECT lang, url,
                   CAST(h60 // 18014398509481984 AS INT) AS bucket,
                   h60 % 18014398509481984 AS w
            FROM h),
        r AS (
            SELECT lang, url, bucket,
                   CAST(CASE WHEN w = 0 THEN 55
                             ELSE 55 - length(bin(w)) END AS INT) AS rho
            FROM b),
        pr AS (
            SELECT lang, bucket, max(rho) AS rmax,
                   CAST(count(DISTINCT url) AS BIGINT) AS nd
            FROM r GROUP BY lang, bucket),
        a AS (
            SELECT lang,
                   CAST(sum(CAST(1 AS BIGINT) << (55 - rmax)) AS BIGINT)
                       AS s_present,
                   count(*) AS nb,
                   CAST(sum(nd) AS BIGINT) AS n_true
            FROM pr GROUP BY lang)
        SELECT lang, n_true,
               CAST(64 - nb AS INT) AS v0,
               CAST(s_present + (64 - nb) * 36028797018963968 AS BIGINT)
                   AS s_reg,
               CAST({_HLL_ALPHA_NUM!r} AS DOUBLE)
                   / CAST(s_present + (64 - nb) * 36028797018963968
                          AS DOUBLE) AS est
        FROM a
    """,
    "quantile_sketch": _QUANTILE_SKETCH_ORACLE,
    "gopher_rules": _GOPHER_RULES_ORACLE,
    "image_ssim": _IMAGE_SSIM_ORACLE,
    "url_templates": _URL_TEMPLATES_ORACLE,
    "pipeline_compose": _PIPELINE_COMPOSE_ORACLE,
    "dom_stats": _DOM_STATS_ORACLE,
    "http_cache_headers": _HTTP_CACHE_ORACLE,
    "freq_sketch": """
        WITH tc AS (
            SELECT t.tok, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(list_filter(
                      string_split_regex(lower(text), '\\s+'),
                      x -> x <> '')) AS tok
                  FROM documents) t
            GROUP BY t.tok),
        hashed AS (
            SELECT hrow, tok, n,
                   CAST(concat('0x', substr(
                       md5('cm' || hrow || ':' || tok), 1, 8)) AS BIGINT)
                       % 512 AS bucket
            FROM tc CROSS JOIN (SELECT unnest(range(0, 4)) AS hrow)),
        counters AS (
            SELECT hrow, bucket, CAST(sum(n) AS BIGINT) AS cnt
            FROM hashed GROUP BY hrow, bucket),
        est AS (
            SELECT h.tok,
                   CAST(min(c.cnt) AS BIGINT) AS est,
                   CAST(min(h.n) AS BIGINT) AS n_true
            FROM hashed h JOIN counters c USING (hrow, bucket)
            WHERE h.n >= 50
            GROUP BY h.tok)
        SELECT tok, n_true, est,
               CAST(est * 1000 // n_true AS BIGINT) AS over_milli
        FROM est
    """,
    # The borders are a closed form of doc_id (generator in
    # q_image_cropdetect): top/bottom = doc_id % 5, left/right =
    # (doc_id*3) % 7, every 37th frame all-dark -> (0,0,0,0).  The
    # Spark side actually decodes the PNG and scans integer BT.601
    # luma; the oracle recomputes the box arithmetically.
    "image_cropdetect": """
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 37 = 0 THEN 0
                         ELSE (doc_id * 3) % 7 END AS INT) AS crop_x,
               CAST(CASE WHEN doc_id % 37 = 0 THEN 0
                         ELSE doc_id % 5 END AS INT) AS crop_y,
               CAST(CASE WHEN doc_id % 37 = 0 THEN 0
                         ELSE 32 - 2 * ((doc_id * 3) % 7) END AS INT)
                   AS crop_w,
               CAST(CASE WHEN doc_id % 37 = 0 THEN 0
                         ELSE 24 - 2 * (doc_id % 5) END AS INT) AS crop_h
        FROM documents
        WHERE doc_id < 300
    """,
    # Expected decode/flags stated literally per fixture host (the
    # _IDN_EXPECT table, validated against CPython's independent
    # punycode codec); Spark RUNS the RFC 3492 decoder + UTS #39-style
    # classifier on the wire-form host.
    "idn_hostnames": """
        WITH fx(idx, host, decoded, scripts,
                mixed_script, confusable, bad_ace) AS (VALUES
            (0, 'xn--bcher-kva.example', 'bücher.example', 'latin',
             FALSE, FALSE, FALSE),
            (1, 'xn--80ak6aa92e.com', 'аррӏе.com', 'cyrillic,latin',
             FALSE, TRUE, FALSE),
            (2, 'xn--pypal-4ve.com', 'pаypal.com', 'cyrillic,latin',
             TRUE, FALSE, FALSE),
            (3, 'example.com', 'example.com', 'latin',
             FALSE, FALSE, FALSE),
            (4, 'xn--mxacde.example', 'αβγδ.example', 'greek,latin',
             FALSE, FALSE, FALSE),
            (5, 'www.xn--fiqs8s', 'www.中国', 'han,latin',
             FALSE, FALSE, FALSE),
            (6, 'xn--mgbh0fb.net', 'مثال.net', 'arabic,latin',
             FALSE, FALSE, FALSE),
            (7, 'xn--5dbqzzl.org', 'עברית.org', 'hebrew,latin',
             FALSE, FALSE, FALSE),
            (8, 'xn--!!!.bad', 'xn--!!!.bad', 'latin,other',
             TRUE, FALSE, TRUE),
            (9, 'xn--vxaj.com', 'οκ.com', 'greek,latin',
             FALSE, TRUE, FALSE))
        SELECT d.doc_id, fx.host, fx.decoded, fx.scripts,
               fx.mixed_script, fx.confusable, fx.bad_ace
        FROM documents d
        JOIN fx ON fx.idx = d.doc_id % 10
        WHERE d.doc_id < 500
    """,
    # Expected SSRF classification stated literally per fixture host
    # (validated against socket.inet_aton + the ipaddress module in
    # tests/test_ipliteral.py); Spark RUNS the expression-only
    # inet_aton recognizer + reserved-range classifier.
    "ip_hostnames": """
        WITH fx(idx, host, is_ip, ip_canonical, blocked,
                block_reason) AS (VALUES
            (0, '93.184.216.34', TRUE, '93.184.216.34', FALSE,
             CAST(NULL AS VARCHAR)),
            (1, '127.0.0.1', TRUE, '127.0.0.1', TRUE, 'loopback'),
            (2, '2130706433', TRUE, '127.0.0.1', TRUE, 'loopback'),
            (3, '0x7F.0.0.1', TRUE, '127.0.0.1', TRUE, 'loopback'),
            (4, '017700000001', TRUE, '127.0.0.1', TRUE, 'loopback'),
            (5, '10.1.2.3', TRUE, '10.1.2.3', TRUE, 'rfc1918'),
            (6, '172.16.0.5', TRUE, '172.16.0.5', TRUE, 'rfc1918'),
            (7, '192.168.1.1', TRUE, '192.168.1.1', TRUE, 'rfc1918'),
            (8, '169.254.9.9', TRUE, '169.254.9.9', TRUE,
             'link-local'),
            (9, '100.64.0.1', TRUE, '100.64.0.1', TRUE, 'cgnat'),
            (10, '239.255.255.250', TRUE, '239.255.255.250', TRUE,
             'multicast-reserved'),
            (11, '0.1.2.3', TRUE, '0.1.2.3', TRUE, 'this-network'),
            (12, '192.168.257', TRUE, '192.168.1.1', TRUE,
             'rfc1918'),
            (13, '127.1', TRUE, '127.0.0.1', TRUE, 'loopback'),
            (14, 'example.com', FALSE, CAST(NULL AS VARCHAR), FALSE,
             CAST(NULL AS VARCHAR)),
            (15, '256.1.1.1', FALSE, CAST(NULL AS VARCHAR), FALSE,
             CAST(NULL AS VARCHAR)))
        SELECT d.doc_id, fx.host, fx.is_ip, fx.ip_canonical,
               fx.blocked, fx.block_reason
        FROM documents d
        JOIN fx ON fx.idx = d.doc_id % 16
        WHERE d.doc_id < 800
    """,
    # Expected v6 classification stated literally per fixture host
    # (validated against the stdlib ipaddress module, which Spark
    # actually runs inside the Arrow stage).
    "ip6_hostnames": """
        WITH fx(idx, host, is_ip6, canonical, blocked,
                block_reason) AS (VALUES
            (0, '[::1]', TRUE, '::1', TRUE, 'loopback'),
            (1, '[fe80::1ff:fe23:4567:890a]', TRUE,
             'fe80::1ff:fe23:4567:890a', TRUE, 'link-local'),
            (2, '[fd12:3456:789a::1]', TRUE, 'fd12:3456:789a::1',
             TRUE, 'unique-local'),
            (3, '[2001:db8::2:1]', TRUE, '2001:db8::2:1', TRUE,
             'documentation'),
            (4, '[2606:2800:220:1:248:1893:25c8:1946]', TRUE,
             '2606:2800:220:1:248:1893:25c8:1946', FALSE,
             CAST(NULL AS VARCHAR)),
            (5, '[::ffff:127.0.0.1]', TRUE, '::ffff:7f00:1', TRUE,
             'v4-mapped-loopback'),
            (6, '[::ffff:10.1.2.3]', TRUE, '::ffff:a01:203', TRUE,
             'v4-mapped-private'),
            (7, '[::ffff:93.184.216.34]', TRUE, '::ffff:5db8:d822',
             FALSE, CAST(NULL AS VARCHAR)),
            (8, '[ff02::fb]', TRUE, 'ff02::fb', TRUE, 'multicast'),
            (9, '[::]', TRUE, '::', TRUE, 'unspecified'),
            (10, '[2001:db8::zz]', FALSE, CAST(NULL AS VARCHAR),
             FALSE, CAST(NULL AS VARCHAR)),
            (11, 'example.com', FALSE, CAST(NULL AS VARCHAR), FALSE,
             CAST(NULL AS VARCHAR)))
        SELECT d.doc_id, fx.host, fx.is_ip6, fx.canonical, fx.blocked,
               fx.block_reason
        FROM documents d
        JOIN fx ON fx.idx = d.doc_id % 12
        WHERE d.doc_id < 600
    """,
    # Flags derived arithmetically per modulus class (pinned
    # precedence filename > url > boilerplate > caps > short > good);
    # Spark runs the real regexp rule set over the same closed-form
    # captions.  L = decimal width of the class's embedded number.
    "caption_rules": """
        WITH base AS (
            SELECT doc_id,
                   CASE
                     WHEN doc_id % 7 = 0 THEN
                       'IMG_' || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                      4, '0') || '.JPG'
                     WHEN doc_id % 5 = 0 THEN
                       'see http://ex' || (doc_id % 9) || '.test/p now'
                     WHEN doc_id % 11 = 0 THEN
                       'click to enlarge stock photo ' || (doc_id % 100)
                     WHEN doc_id % 13 = 0 THEN
                       'GREAT PRODUCT NUMBER ' || (doc_id % 100)
                     WHEN doc_id % 3 = 0 THEN 'img'
                     ELSE 'a photo of item ' || (doc_id % 50)
                          || ' on a wooden table'
                   END AS caption,
                   CASE
                     WHEN doc_id % 7 = 0 THEN 'A'
                     WHEN doc_id % 5 = 0 THEN 'B'
                     WHEN doc_id % 11 = 0 THEN 'C'
                     WHEN doc_id % 13 = 0 THEN 'D'
                     WHEN doc_id % 3 = 0 THEN 'E'
                     ELSE 'F'
                   END AS cls,
                   len(CAST(doc_id % 100 AS VARCHAR)) AS l2,
                   len(CAST(doc_id % 50 AS VARCHAR)) AS l50
            FROM documents WHERE doc_id < 800)
        SELECT doc_id, caption,
               CAST(CASE cls WHEN 'A' THEN 1 WHEN 'B' THEN 3
                             WHEN 'C' THEN 6 WHEN 'D' THEN 4
                             WHEN 'E' THEN 1 ELSE 9 END AS INT)
                   AS n_tokens,
               cls = 'A' AS filename_like,
               cls = 'B' AS has_url,
               cls = 'C' AS boilerplate,
               cls IN ('A', 'D') AS all_caps,
               CAST(CASE cls
                    WHEN 'A' THEN 4000 // 12
                    WHEN 'B' THEN 1000 // 25
                    WHEN 'C' THEN 1000 * l2 // (29 + l2)
                    WHEN 'D' THEN 1000 * l2 // (21 + l2)
                    WHEN 'E' THEN 0
                    ELSE 1000 * l50 // (34 + l50)
               END AS BIGINT) AS digit_permille,
               cls IN ('A', 'E') AS too_short,
               cls = 'F' AS keep
        FROM base
    """,
    # Same exact-integer bucket arithmetic replayed relationally:
    # CROSS JOIN the pinned 15-bucket table, quantized relative ratio
    # error in micro units with floor division (Spark's div on
    # non-negative operands agrees bit-for-bit), (d, i) tie-break via
    # row_number.
    "aspect_buckets": """
        WITH b(i, bw, bh) AS (VALUES
            (0, 512, 2048),
            (1, 576, 1792),
            (2, 640, 1536),
            (3, 704, 1408),
            (4, 768, 1344),
            (5, 832, 1216),
            (6, 896, 1152),
            (7, 1024, 1024),
            (8, 1152, 896),
            (9, 1216, 832),
            (10, 1344, 768),
            (11, 1408, 704),
            (12, 1536, 640),
            (13, 1792, 576),
            (14, 2048, 512)),
        imgs AS (
            SELECT doc_id,
                   CAST(128 + (doc_id * 97) % 1920 AS INT) AS w,
                   CAST(128 + (doc_id * 53) % 1080 AS INT) AS h
            FROM documents WHERE doc_id < 1000),
        gated AS (
            SELECT *, (CAST(w AS BIGINT) * h >= 262144 AND
                       greatest(w, h) <= 4 * least(w, h)) AS ok
            FROM imgs),
        dist AS (
            SELECT g.doc_id, g.w, g.h, g.ok, b.i, b.bw, b.bh,
                   (abs(CAST(g.w AS BIGINT) * b.bh
                        - CAST(g.h AS BIGINT) * b.bw) * 1000000)
                       // (CAST(g.h AS BIGINT) * b.bw) AS d,
                   row_number() OVER (
                       PARTITION BY g.doc_id ORDER BY
                       (abs(CAST(g.w AS BIGINT) * b.bh
                            - CAST(g.h AS BIGINT) * b.bw) * 1000000)
                           // (CAST(g.h AS BIGINT) * b.bw), b.i) AS rn
            FROM gated g CROSS JOIN b)
        SELECT doc_id, w, h, ok,
               CAST(CASE WHEN ok THEN i END AS INT) AS bucket_i,
               CAST(CASE WHEN ok THEN bw END AS INT) AS bucket_w,
               CAST(CASE WHEN ok THEN bh END AS INT) AS bucket_h,
               CAST(CASE WHEN ok THEN d END AS BIGINT)
                   AS ratio_err_micro
        FROM dist WHERE rn = 1
    """,
}
