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
        "User-agent: *\nDisallow:\n"          # empty = allow-all
    )
    assert parse_robots(body) == ["/blocked", "/private"]
    assert parse_robots(None) == []
    assert parse_robots("User-agent: x\nDisallow: /y\n") == []


def test_fetched_rules_match_spec(spark):
    spec = CorpusSpec(n_hosts=3, pages_per_host=4)
    corpus = corpus_df(spark, spec)
    hosts = spark.createDataFrame([(h,) for h in spec.hosts], "host string")
    got = fetch_robots_rules(spark, hosts, agent.CorpusFetcher(corpus))
    assert got == robots_rules(spec)
