"""Continuous-crawl (Structured Streaming) extension test: the
self-feeding frontier stream visits the same URL set as the batch
scheduler's seen-set closure on the same corpus.

Ordering is NOT asserted here — micro-batch boundaries depend on file
arrival timing, and the streaming mode is an extension beyond the
reference semantics (the batch scheduler is the normative,
oracle-equal engine; see test_crawl.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mechaml_spark.corpus import CorpusSpec, page_url
from mechaml_spark.streaming import StreamingCrawl

SPEC = CorpusSpec(n_hosts=3, pages_per_host=8, links_per_page=3)


@pytest.mark.timeout(300)
def test_streaming_crawl_visits_reachable_set(spark, tmp_path):
    seeds = [page_url(SPEC, i, 0) for i in range(3)]
    sc = StreamingCrawl(
        spark, SPEC, str(tmp_path / "crawl"), budget_per_host=8,
        max_files_per_trigger=8,
    )
    sc.seed(seeds)
    sc.start()
    try:
        sc.await_quiescence(idle_seconds=12.0, timeout=240.0)
    finally:
        sc.stop()

    visits = sc.visits()
    n_visits = visits.count()
    n_unique = visits.select("url_norm").distinct().count()
    # every URL fetched exactly once (seen-set dedup across batches)
    assert n_visits == n_unique > 3

    # the visited set must equal the batch scheduler's visited set
    # under an effectively-unlimited per-epoch budget (full closure)
    from mechaml_spark.frontier.oracle import crawl_oracle

    oracle = crawl_oracle(SPEC, seeds, budget_per_host=10**6, max_epochs=50)
    want = {v[3] for v in oracle.visit_log}
    got = {r["url_norm"] for r in visits.select("url_norm").collect()}
    assert got == want

    # 200s parsed, link depths monotone from seeds
    assert visits.where(F.col("status") == 200).count() > 0
