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
        "url_norm", "status", "location", "set_cookie", "body", "error"
    ]
