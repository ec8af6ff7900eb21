"""robots.txt fetch+parse path: rules sourced from /robots.txt
responses through the fetch stage equal the corpus's static spec."""

from __future__ import annotations

from mechaml_spark import agent
from mechaml_spark.corpus import CorpusSpec, corpus_df, robots_rules
from mechaml_spark.frontier.robots import fetch_robots_rules, parse_robots


def test_parse_robots_groups():
    body = (
        "# comment\n"
        "User-agent: googlebot\nDisallow: /g-only\n\n"
        "User-agent: other\nUser-agent: *\nDisallow: /blocked\n"
        "Disallow: /private\nAllow: /blocked/ok\n"
        "User-agent: *\nDisallow:\n"          # empty = allow-all (no rule)
    )
    assert parse_robots(body) == [
        (False, "/blocked"),
        (False, "/private"),
        (True, "/blocked/ok"),
    ]
    assert parse_robots(None) == []
    assert parse_robots("User-agent: x\nDisallow: /y\n") == []


def test_robots_allowed_rfc9309_precedence():
    """Longest-match precedence, allow-wins-ties, * and $ wildcards
    (the RFC 9309 §2.2.2 rule set + Google's documented examples)."""
    from mechaml_spark.frontier.robots import robots_allowed

    rules = parse_robots(
        "User-agent: *\n"
        "Disallow: /d\n"
        "Allow: /d/ok\n"
        "Disallow: /*/no$\n"
        "Allow: /p\n"
        "Disallow: /p\n"          # tie with the Allow above -> allow wins
    )
    assert robots_allowed("/open/x", rules)          # no rule matches
    assert not robots_allowed("/d/x", rules)         # Disallow /d
    assert robots_allowed("/d/ok/x", rules)          # longer Allow wins
    assert not robots_allowed("/d/ok/no", rules)     # anchored wildcard longest
    assert robots_allowed("/d/ok/not", rules)        # $ anchor must not match
    assert robots_allowed("/p/x", rules)             # equal length -> allow
    assert robots_allowed("/", rules)

    # Google's example group: allow wins by length, not file order
    g = parse_robots("User-agent: *\nAllow: /page\nDisallow: /*.htm\n")
    assert robots_allowed("/page", g)
    assert not robots_allowed("/page.htm", g)        # /*.htm len 6 > /page 5


def test_fetched_rules_match_spec(spark):
    spec = CorpusSpec(n_hosts=3, pages_per_host=4)
    corpus = corpus_df(spark, spec)
    hosts = spark.createDataFrame([(h,) for h in spec.hosts], "host string")
    got = fetch_robots_rules(spark, hosts, agent.CorpusFetcher(corpus))
    assert got == robots_rules(spec)


def test_path_col_matches_urlsplit_semantics(spark):
    """page.path_col must agree with urlkit.path_of (urlsplit-based,
    the oracle's semantics) — including URLs java.net.URI rejects
    (raw space, |, stray %) which made F.parse_url raise INVALID_URL
    under Spark 4's default ANSI mode."""
    from pyspark.sql import functions as F

    from mechaml_spark import urlkit
    from mechaml_spark.page import path_col

    urls = [
        "http://h.test/a b",            # raw space: URI-invalid
        "http://h.test/a|b?q=1",        # pipe
        "http://h.test/100%zz",         # bad %-escape
        "http://h.test/p?q=1#frag",
        "http://h.test",                # no path at all
        "http://h.test?x=1",            # query, no path
        "http://h.test/#f",
        "https://h.test:8443/x/y/",
        "//h.test/protorel",            # protocol-relative
        "mailto:someone@h.test",
        "/bare/path?x",
        "a b/rel ative",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = {
        r["u"]: r["p"]
        for r in df.select("u", path_col(F.col("u")).alias("p")).collect()
    }
    for u in urls:
        assert got[u] == urlkit.path_of(u), u


def test_mark_blocked_survives_uri_invalid_urls(spark):
    """Robots blocking must neither crash nor silently pass URLs whose
    PATH java.net.URI cannot parse: a Disallow prefix with a space in
    it still blocks the matching URL."""
    from pyspark.sql import functions as F

    from mechaml_spark.frontier.robots import ROBOTS_T, compile_rules, mark_blocked

    rules = spark.createDataFrame(
        [("h.test", compile_rules([(False, "/private"), (False, "/a b")]))],
        ROBOTS_T,
    )
    frontier = spark.createDataFrame(
        [
            ("http://h.test/a b/page", "h.test"),   # blocked (space prefix)
            ("http://h.test/private/x", "h.test"),  # blocked
            ("http://h.test/ok|page", "h.test"),    # allowed, URI-invalid
            ("http://other.test/a b", "other.test"),  # no rules row
        ],
        "url_norm string, host string",
    )
    got = {
        r["url_norm"]: r["_blocked"]
        for r in mark_blocked(frontier, rules).collect()
    }
    assert got == {
        "http://h.test/a b/page": True,
        "http://h.test/private/x": True,
        "http://h.test/ok|page": False,
        "http://other.test/a b": False,
    }


def test_mark_blocked_matches_pure_matcher_rfc_rules(spark):
    """The distributed mark_blocked stage must agree with the pure
    robots_allowed matcher over a rule set exercising every RFC 9309
    feature (longest match, allow-ties, * and $) on many paths."""
    from pyspark.sql import functions as F

    from mechaml_spark.frontier.robots import (
        ROBOTS_T,
        compile_rules,
        mark_blocked,
        parse_robots,
        robots_allowed,
    )

    rules = parse_robots(
        "User-agent: *\nDisallow: /d\nAllow: /d/ok\nDisallow: /*/no$\n"
        "Allow: /p\nDisallow: /p\nDisallow: /q*x\n"
    )
    paths = [
        "/", "/open", "/d", "/d/x", "/d/ok", "/d/ok/x", "/d/ok/no",
        "/d/ok/not", "/p", "/p/x", "/q/ax", "/q/a", "/qx", "/no",
        "/a/no", "/a/no/b",
    ]
    rules_df = spark.createDataFrame(
        [("h.test", compile_rules(rules))], ROBOTS_T
    )
    frontier = spark.createDataFrame(
        [(f"http://h.test{p}", "h.test") for p in paths],
        "url_norm string, host string",
    )
    got = {
        r["url_norm"]: r["_blocked"]
        for r in mark_blocked(frontier, rules_df).collect()
    }
    for p in paths:
        assert got[f"http://h.test{p}"] == (not robots_allowed(p, rules)), p


def test_parse_crawl_delay_group_scoped():
    from mechaml_spark.frontier.robots import parse_crawl_delay

    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 2.5\n") == 2.5
    # foreign group's delay does not apply to us
    assert parse_crawl_delay(
        "User-agent: googlebot\nCrawl-delay: 9\n"
        "User-agent: *\nDisallow: /x\n"
    ) is None
    # multiple agent lines, * among them; first valid value wins
    body = (
        "User-agent: a\nUser-agent: *\nCrawl-delay: 3\n"
        "User-agent: *\nCrawl-delay: 7\n"
    )
    assert parse_crawl_delay(body) == 3.0
    # invalid / non-positive ignored; comments stripped
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: soon\n") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 0\n") is None
    assert parse_crawl_delay(
        "User-agent: *\nCrawl-delay: 4 # s\n"
    ) == 4.0
    assert parse_crawl_delay(None) is None


def test_crawl_delay_budgets_df(spark):
    from mechaml_spark.frontier.robots import crawl_delay_budgets

    bodies = spark.createDataFrame(
        [
            ("a.test", "User-agent: *\nCrawl-delay: 0.5\n"),   # 4/0.5=8
            ("b.test", "User-agent: *\nCrawl-delay: 100\n"),   # floor->0 -> clamp 1
            ("c.test", "User-agent: *\nDisallow: /x\n"),       # default
            ("d.test", "User-agent: *\nCrawl-delay: 0.01\n"),  # 400 -> cap
        ],
        "host string, body string",
    )
    got = {
        r["host"]: r["budget"]
        for r in crawl_delay_budgets(
            bodies, epoch_seconds=4.0, default_budget=2, cap=64
        ).collect()
    }
    assert got == {"a.test": 8, "b.test": 1, "c.test": 2, "d.test": 64}


def test_agent_group_selection_rfc9309():
    from mechaml_spark.frontier.robots import parse_robots

    body = (
        "User-agent: *\nDisallow: /all\n\n"
        "User-agent: googlebot\nDisallow: /gb\nAllow: /gb/ok\n\n"
        "User-agent: googlebot-images\nUser-agent: bingbot\n"
        "Disallow: /img\n\n"
        "User-agent: GoogleBot\nDisallow: /gb2\n"
    )
    # default (anonymous) reading unchanged: * group only
    assert parse_robots(body) == [(False, "/all")]
    # unknown token falls back to *
    assert parse_robots(body, agent="unknownbot") == [(False, "/all")]
    # exact token: BOTH same-specificity groups merge, case folded
    assert parse_robots(body, agent="googlebot") == [
        (False, "/gb"), (True, "/gb/ok"), (False, "/gb2")
    ]
    # more specific group beats the shorter prefix AND *
    assert parse_robots(body, agent="googlebot-images") == [
        (False, "/img")
    ]
    # shared group reachable from its other agent line
    assert parse_robots(body, agent="bingbot") == [(False, "/img")]
    # prefix semantics: token extends the group value
    assert parse_robots(body, agent="googlebot-news") == [
        (False, "/gb"), (True, "/gb/ok"), (False, "/gb2")
    ]
    # no groups at all
    assert parse_robots("", agent="googlebot") == []
