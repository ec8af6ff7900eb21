"""Agent facade tests: get/click/submit/save over the corpus fetcher."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mechaml_spark import agent, corpus as cp, extract, page

SPEC = cp.CorpusSpec(n_hosts=2, pages_per_host=6)


@pytest.fixture(scope="module")
def fetcher(spark):
    return agent.CorpusFetcher(cp.corpus_df(spark, SPEC).cache())


def test_get_and_redirect(spark, fetcher):
    reqs = spark.createDataFrame(
        [("http://host0.test/p0",), ("http://host0.test/r0",),
         ("http://host9.test/nope",)],
        "url_norm string",
    )
    fr = agent.get(reqs, fetcher)
    rows = {r["url_norm"]: r for r in fr.finals.collect()}
    assert rows["http://host0.test/p0"]["status"] == 200
    # /r0 is a 301 landing on /p5 (j=0: (0+5)%6=5)
    assert rows["http://host0.test/r0"]["final_url"] == "http://host0.test/p5"
    assert rows["http://host0.test/r0"]["status"] == 200
    assert rows["http://host9.test/nope"]["status"] == 404
    (tgt,) = fr.hop_targets.collect()
    assert tgt["url_norm"] == "http://host0.test/p5"


def test_jar_size_hint_join_path_through_hop_loop(spark, fetcher):
    """A crawl-scale jar (10^5 rows) with ``jar_size_hint`` set must
    route EVERY redirect hop's cookie injection through the
    suffix-chain hash equi-join (never the O(|jar|)/row scan) with
    outputs unchanged vs the scan path — the round-3 scale item: a
    big jar can no longer silently ride the per-row linear scan."""
    # 10^5 decoy cookies on unrelated domains + 2 that actually match
    decoys = spark.range(100_000).selectExpr(
        "concat('d', id, '.decoy.test') AS domain",
        "'/' AS path",
        "concat('k', id) AS name",
        "'v' AS value",
        "CAST(id AS LONG) AS order_key",
    )
    live = spark.createDataFrame(
        [("host0.test", "/", "sid", "abc", 100_001),
         ("host0.test", "/", "tok", "xyz", 100_002)],
        "domain string, path string, name string, value string, "
        "order_key long",
    )
    jar = decoys.unionByName(live)
    reqs = spark.createDataFrame(
        [("http://host0.test/p0",), ("http://host0.test/r0",)],
        "url_norm string",
    )
    hinted = agent.fetch(
        reqs, fetcher, jar=jar, jar_size_hint=100_002
    ).finals.collect()
    unhinted = agent.fetch(reqs, fetcher, jar=jar).finals.collect()
    key = lambda r: r["url_norm"]  # noqa: E731
    assert sorted(map(tuple, hinted)) == sorted(map(tuple, unhinted))
    rows = {r["url_norm"]: r for r in hinted}
    # the redirect still chases through the hop loop under the hint
    assert rows["http://host0.test/r0"]["final_url"] == \
        "http://host0.test/p5"
    # and every hop really selected the join strategy under the hint
    # (the scan strategy under no hint) — observed at the cookies API
    calls = []
    orig = agent.ck.add_to_headers

    def spy(*a, **k):
        calls.append(k.get("strategy"))
        return orig(*a, **k)

    agent.ck.add_to_headers = spy
    try:
        agent.fetch(reqs, fetcher, jar=jar, jar_size_hint=100_002)
        assert calls and set(calls) == {"join"}
        calls.clear()
        agent.fetch(reqs, fetcher, jar=jar)
        assert calls and set(calls) == {"scan"}
    finally:
        agent.ck.add_to_headers = orig


def test_click(spark, fetcher):
    reqs = spark.createDataFrame([("http://host0.test/p0",)], "url_norm string")
    fr = agent.get(reqs, fetcher)
    parsed = extract.parse_pages(
        fr.finals.select(F.col("final_url").alias("url"), "body")
    )
    links = page.links_with(parsed, "[href^=http://host1]")
    fr2 = agent.click(links, fetcher)
    stats = {r["url_norm"]: r["status"] for r in fr2.finals.collect()}
    assert stats and all(s == 200 for s in stats.values())


def test_submit_get_form(spark, fetcher):
    reqs = spark.createDataFrame([("http://host0.test/p0",)], "url_norm string")
    fr = agent.get(reqs, fetcher)
    parsed = extract.parse_pages(
        fr.finals.select(F.col("final_url").alias("url"), "body")
    )
    forms = page.forms_with(parsed, "[id=search]")
    fr2 = agent.submit(forms, fetcher)
    (row,) = fr2.finals.collect()
    # GET submit: action /p0 + replaced query (?q=default0); corpus
    # treats the query as a different URL -> 404, which is correct
    # fetch behavior (the query IS part of the request)
    assert row["url_norm"] == "http://host0.test/p0?q=default0"
    assert row["method"] == "GET"


def test_save_content(spark, fetcher, tmp_path):
    reqs = spark.createDataFrame([("http://host0.test/p1",)], "url_norm string")
    fr = agent.get(reqs, fetcher)
    out = str(tmp_path / "sink")
    agent.save_content(fr.finals.select("url_norm", "status", "body"), out)
    back = spark.read.parquet(out)
    assert back.count() == 1 and back.collect()[0]["status"] == 200


def test_http_fetcher_builds_plan(spark):
    """HttpFetcher is a real backend now (see test_http_fetcher.py for
    behavior); here just assert the stage contract schema."""
    out = agent.HttpFetcher().fetch(
        spark.createDataFrame([("http://x/",)], "url_norm string"), "url_norm"
    )
    assert [f.name for f in out.schema.fields] == [
        "url_norm", "status", "location", "set_cookie", "body", "error",
        "etag", "last_modified", "retry_after",
    ]


def test_adaptive_fetch_matches_lazy(spark, fetcher):
    """``adaptive=True`` stops building hop branches once the redirect
    stream dries up; results (finals, cookie events, hop targets) must
    be identical to the fully lazy loop — including through a real
    redirect chain, where the probe must NOT stop early."""
    reqs = spark.createDataFrame(
        [("http://host0.test/p0",), ("http://host0.test/r0",),
         ("http://host9.test/nope",)],
        "url_norm string",
    )
    lazy = agent.fetch(reqs, fetcher)
    fast = agent.fetch(reqs, fetcher, adaptive=True)
    key = lambda df, cols: sorted(  # noqa: E731
        tuple(r) for r in df.select(*cols).collect()
    )
    fcols = ("url_norm", "final_url", "status", "body")
    assert key(lazy.finals, fcols) == key(fast.finals, fcols)
    ccols = ("url_norm", "hop", "idx", "hv", "src_url")
    assert key(lazy.cookie_events, ccols) == key(fast.cookie_events, ccols)
    assert key(lazy.hop_targets, ("url_norm", "host")) == key(
        fast.hop_targets, ("url_norm", "host")
    )


def test_adaptive_fetch_no_redirects_hop_targets_none(spark, fetcher):
    reqs = spark.createDataFrame([("http://host0.test/p0",)], "url_norm string")
    fr = agent.fetch(reqs, fetcher, adaptive=True)
    assert fr.hop_targets is None  # documented "no redirects" state
    (row,) = fr.finals.collect()
    assert row["status"] == 200


def test_empty_location_302_returned_as_is(spark):
    """302 with ``Location: ""`` terminates immediately (truthiness —
    matching HttpLoopFetcher and the sequential oracle) on BOTH
    relational paths, instead of resolving ""->self and chasing its
    own tail to the hop cap."""
    corp = spark.createDataFrame(
        [("http://h.test/e", 302, "", None, "ebody"),
         ("http://h.test/n", 302, None, None, "nbody")],
        "url_norm string, status int, location string, "
        "set_cookie array<string>, body string",
    )
    reqs = corp.select("url_norm")

    fr = agent.fetch(reqs, agent.CorpusFetcher(corp))
    finals = {r["url_norm"]: r for r in fr.finals.collect()}
    for u in finals:
        assert finals[u]["status"] == 302 and finals[u]["final_url"] == u
    assert fr.hop_targets is None or fr.hop_targets.count() == 0

    closure = agent.resolve_redirect_closure(corp)
    for r in closure.collect():
        assert r["status"] == 302 and r["final_url"] == r["url_norm"]
        assert r["hop_urls"] == [] and len(r["cookie_hops"]) == 1
