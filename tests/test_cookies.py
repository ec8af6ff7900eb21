"""Cookie jar tests ported from the reference (test.ml:18-87, 147-200).

The reference uses ``Random.self_init``; we fix seed=42 for
determinism (FIXTURES.md §3).  Cases 1-5 run on the pure-Python jar
(the oracle's data structure); the Spark-side jar table and the
match/header join are then checked against it.
"""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from mechaml_spark import cookies as ck

rng = random.Random(42)


def rand_s(lo=5, hi=10):
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(lo, hi)))


def make_cookie(domain, name=None, value=None, path="", max_age=None, secure=False):
    return {
        "name": name or rand_s(),
        "value": value or rand_s(),
        "max_age": max_age,
        "domain": domain,
        "path": path,
        "secure": secure,
    }


URI = f"http://{rand_s()}.{rand_s(2,2)}/{rand_s()}"
HOST = URI.split("//")[1].split("/")[0]
COOKIES = [make_cookie(HOST) for _ in range(10)]


def to_set_cookie(c):
    return f"{c['name']}={c['value']}; Domain={c['domain']}"


def jar_eq(cookie_list, jar: ck.Jar) -> bool:
    have = {(c["name"], c["domain"], c["path"], c["value"]) for c in jar.cookies()}
    want = {(c["name"], c["domain"], c["path"], c["value"]) for c in cookie_list}
    return have == want and len(jar.cookies()) == len(cookie_list)


def fresh_jar(cs=COOKIES) -> ck.Jar:
    j = ck.Jar()
    for c in cs:
        j.add(c)
    return j


def test_add():
    assert jar_eq(COOKIES, fresh_jar())


def test_remove():
    j = fresh_jar()
    for c in COOKIES:
        j.remove(c)
    assert j.is_empty()


def test_add_from_headers_combined():
    """One comma-joined Set-Cookie header -> only the FIRST cookie
    survives (test.ml:159-166)."""
    combined = ", ".join(to_set_cookie(c) for c in COOKIES)
    j = ck.Jar()
    j.add_from_headers(URI, [combined])
    assert jar_eq([COOKIES[0]], j)


def test_add_from_headers_multiple():
    j = ck.Jar()
    j.add_from_headers(URI, [to_set_cookie(c) for c in COOKIES])
    assert jar_eq(COOKIES, j)


def test_add_from_headers_domainless():
    c = make_cookie(HOST)
    url = f"http://{c['domain']}/a.php"
    j = ck.Jar()
    j.add_from_headers(url, [f"{c['name']}={c['value']}"])
    assert jar_eq([c], j)


def test_max_age_zero_deletes():
    j = fresh_jar()
    dead = dict(COOKIES[0], max_age=0)
    j.add(dead)
    assert len(j.cookies()) == 9
    # non-zero max-age never expires (no clock; cookiejar.ml:110-113)
    j.add(dict(COOKIES[1], max_age=1))
    assert len(j.cookies()) == 9


def test_domain_match_quirks():
    assert ck.domain_match_py("example.com", "example.com")
    assert ck.domain_match_py("a.example.com", "example.com")
    assert not ck.domain_match_py("aexample.com", "example.com")
    # RFC 6265 deviation preserved: leading-dot domain never matches
    # subdomains (the boundary char check hits the dot itself)
    assert not ck.domain_match_py("a.example.com", ".example.com")
    assert ck.domain_match_py(".example.com", ".example.com")
    assert not ck.domain_match_py("example.com", "a.example.com")


def test_path_match():
    assert ck.path_match_py("/a/b", "/a")
    assert ck.path_match_py("/a/b", "")
    assert not ck.path_match_py("/a", "/a/b")


def test_header_for_order():
    """Cookie header in jar key order (name^domain^path ascending)."""
    j = ck.Jar()
    j.add(make_cookie("h.ex", name="zz", value="1"))
    j.add(make_cookie("h.ex", name="aa", value="2"))
    j.add(make_cookie("other.ex", name="mm", value="3"))
    assert j.header_for("http://h.ex/x") == "aa=2; zz=1"
    assert j.header_for("http://nomatch.ex/x") == ""


# ------------------------------------------------------------- Spark parity


@pytest.fixture(scope="module")
def jar_df(spark):
    return spark.createDataFrame(COOKIES, ck.COOKIE_T)


def test_spark_upsert_and_delete(spark, jar_df):
    upd = spark.createDataFrame(
        [dict(COOKIES[0], value="NEW"), dict(COOKIES[1], max_age=0)],
        ck.COOKIE_T,
    )
    out = {
        (r["name"], r["domain"], r["path"]): r["value"]
        for r in ck.jar_upsert(jar_df, upd).collect()
    }
    assert len(out) == 9
    assert out[(COOKIES[0]["name"], COOKIES[0]["domain"], COOKIES[0]["path"])] == "NEW"
    assert (COOKIES[1]["name"], COOKIES[1]["domain"], COOKIES[1]["path"]) not in out


def test_spark_add_to_headers_matches_oracle(spark, jar_df):
    urls = [
        URI,
        f"http://sub.{HOST}/deep/path",
        f"http://{HOST}/",
        "http://unrelated.zz/x",
    ]
    req = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["cookie_header"]
        for r in ck.add_to_headers(req, jar_df).collect()
    }
    oracle = fresh_jar()
    for u in urls:
        assert got[u] == oracle.header_for(u), u


QUIRK_COOKIES = [
    # multiple cookies per domain, interleaved names -> jar key order
    make_cookie("quirk.ex", name="zz", value="1"),
    make_cookie("quirk.ex", name="aa", value="2"),
    make_cookie("quirk.ex", name="mm", value="3", path="/deep"),
    # leading-dot domain: must match ONLY the literal host ".quirk.ex"
    make_cookie(".quirk.ex", name="dot", value="4"),
    # parent-domain cookie: matches quirk.ex + subdomains via dotted
    # suffix, NOT "notquirk.ex"
    make_cookie("ex", name="tld", value="5"),
    # empty domain: matches only hosts ENDING in '.' (boundary-dot
    # quirk applied to the empty suffix) or the empty host
    make_cookie("", name="empty", value="6"),
    # path-restricted parent cookie
    make_cookie("quirk.ex", name="pp", value="7", path="/a/b"),
]

QUIRK_URLS = [
    "http://quirk.ex/",
    "http://quirk.ex/deep/er",
    "http://sub.quirk.ex/a/b/c",
    "http://sub.sub.quirk.ex/",
    "http://notquirk.ex/a/b",
    "http://aquirk.ex/",  # no boundary dot -> suffix must NOT match
    "http://quirk.ex./x",  # trailing-dot host -> empty-domain cookie
    "http://ex/a/b/z",
    "http://other.zz/",
    f"http://{HOST}/a b/c",  # java.net.URI-hostile (raw space)
    "not a url at all",
]


@pytest.mark.parametrize("strategy", ["scan", "join"])
def test_spark_add_to_headers_quirks_vs_oracle(spark, strategy):
    """Both physical strategies reproduce the pure jar on the full
    quirk corpus (boundary dot, leading dot, empty domain, path
    prefixes, invalid URLs, jar key ordering)."""
    jar = spark.createDataFrame(QUIRK_COOKIES, ck.COOKIE_T)
    req = spark.createDataFrame([(u,) for u in QUIRK_URLS], "url string")
    got = {
        r["url"]: r["cookie_header"]
        for r in ck.add_to_headers(req, jar, strategy=strategy).collect()
    }
    oracle = fresh_jar(QUIRK_COOKIES)
    assert len(got) == len(QUIRK_URLS)
    for u in QUIRK_URLS:
        assert got[u] == oracle.header_for(u), (strategy, u)


def test_spark_add_to_headers_strategies_equal(spark, jar_df):
    """scan == join row-for-row on the seeded corpus, extra request
    columns preserved, empty jar handled by both."""
    urls = QUIRK_URLS + [URI, f"http://sub.{HOST}/deep"]
    req = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "rid int, url string"
    )
    for jar in (jar_df, ck.empty_jar(spark)):
        scan = {
            (r["rid"], r["url"]): r["cookie_header"]
            for r in ck.add_to_headers(req, jar, strategy="scan").collect()
        }
        join = {
            (r["rid"], r["url"]): r["cookie_header"]
            for r in ck.add_to_headers(req, jar, strategy="join").collect()
        }
        assert scan == join
        assert len(scan) == len(urls)


def test_spark_add_to_headers_auto_gate(spark, jar_df):
    """auto picks scan under the threshold, join above — both correct."""
    req = spark.createDataFrame([(u,) for u in QUIRK_URLS], "url string")
    small = ck.add_to_headers(req, jar_df, strategy="auto", small_jar_threshold=100)
    big = ck.add_to_headers(req, jar_df, strategy="auto", small_jar_threshold=1)
    assert {tuple(r) for r in small.collect()} == {tuple(r) for r in big.collect()}
    with pytest.raises(ValueError, match="strategy"):
        ck.add_to_headers(req, jar_df, strategy="nope")


def test_spark_cookies_from_responses(spark):
    rows = [
        (
            URI,
            {"set-cookie": [to_set_cookie(c) for c in COOKIES[:3]]},
        ),
        (f"http://{HOST}/other", {"content-type": ["text/html"]}),
    ]
    df = spark.createDataFrame(
        rows, "url string, headers map<string, array<string>>"
    )
    out = ck.cookies_from_responses(df).collect()
    assert {(r["name"], r["value"]) for r in out} == {
        (c["name"], c["value"]) for c in COOKIES[:3]
    }
    assert all(r["domain"] == HOST for r in out)


def test_spark_add_to_headers_uri_invalid_urls(spark, jar_df):
    """Header synthesis must match the pure Jar on URLs java.net.URI
    rejects (raw space/pipe in the path) — F.parse_url raised
    INVALID_URL on these under ANSI; the regex path column does not."""
    urls = [
        f"http://{HOST}/a b/c",
        f"http://sub.{HOST}/x|y?q=1",
        f"http://{HOST}/100%zz",
    ]
    req = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["cookie_header"]
        for r in ck.add_to_headers(req, jar_df).collect()
    }
    oracle = fresh_jar()
    for u in urls:
        assert got[u] == oracle.header_for(u), u


def test_fold_cookie_events_equals_chained_upserts(spark):
    """The round-5 single-window fold must be SET-equal to the
    original per-epoch winner-window + jar_upsert chain on a
    deterministic 240-event corpus covering: multi-epoch overwrites,
    within-epoch tie-breaks on every tuple position, max_age==0
    deletes (both winning and shadowed-by-later-epoch), and keys
    untouched after epoch 0."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = []
    for i in range(240):
        rows.append(
            (
                i % 4,                      # epoch
                i % 3,                      # depth
                i % 2,                      # discovered_epoch
                f"http://h{i % 5}.test/p{i}",  # url_norm (total order)
                i % 2,                      # hop
                i % 6,                      # idx
                (
                    f"c{i % 6}",            # name: 6x7=42 keys
                    f"v{i}",
                    0 if i % 13 == 0 else (3600 if i % 5 == 2 else None),
                    f"d{i % 7}.test",
                    "/",
                    i % 2 == 0,
                ),
            )
        )
    events = spark.createDataFrame(
        rows,
        "epoch int, depth int, discovered_epoch int, url_norm string, "
        "hop int, idx int, c struct<name:string,value:string,"
        "max_age:bigint,domain:string,path:string,secure:boolean>",
    )
    base = ck.empty_jar(spark)

    # reference: the pre-r5 chain, epoch by epoch
    jar = base
    for ep in range(4):
        epoch_ev = events.where(F.col("epoch") == ep)
        w = Window.partitionBy(
            F.col("c")["name"], F.col("c")["domain"], F.col("c")["path"]
        ).orderBy(
            F.desc("depth"), F.desc("discovered_epoch"),
            F.desc("url_norm"), F.desc("hop"), F.desc("idx"),
        )
        winners = (
            epoch_ev.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("c.*")
        )
        jar = ck.jar_upsert(jar, winners)
    # the chain's anti-join moves key columns first — compare by name
    want = {tuple(sorted(r.asDict().items())) for r in jar.collect()}

    got = {
        tuple(sorted(r.asDict().items()))
        for r in ck.fold_cookie_events(base, events).collect()
    }
    assert got == want and len(got) > 0
    # and deletes actually removed something: fewer keys than touched
    touched = events.select(
        F.col("c")["name"], F.col("c")["domain"], F.col("c")["path"]
    ).distinct().count()
    assert len(got) < touched
