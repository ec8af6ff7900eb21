"""Transport-failure retry: status-0 rows (DNS/connect/timeout — the
real backend's sentinel, never an HTTP response code) are requeued
with attempt+1 up to ``max_transport_retries``, then dropped.  Corpus
fetchers never emit status 0, so the oracle-equivalence tests in
test_crawl.py prove the feature is inert on the normative path."""

from __future__ import annotations

import dataclasses

import pytest
from pyspark.sql import functions as F

from mechaml_spark import agent
from mechaml_spark import corpus as cp
from mechaml_spark.corpus import corpus_df
from mechaml_spark.frontier.scheduler import crawl

SPEC = cp.CorpusSpec(n_hosts=3, pages_per_host=8)
SEEDS = [cp.page_url(SPEC, 0, 0), cp.page_url(SPEC, 1, 3)]
BUDGET = 4
EPOCHS = 8


class FlakyFetcher:
    """Wraps a fetcher; flips chosen URLs to transport failure
    (status 0, NULL body) for the first ``fail_times`` epochs they
    are fetched — deterministic at plan level (the flip is keyed on
    the driver-side call index captured when the epoch is planned,
    so lazy re-execution can't change the outcome)."""

    def __init__(self, inner, fail_urls, fail_times=1):
        self.inner = inner
        self.fail_urls = list(fail_urls)
        self.fail_times = fail_times
        self.calls = 0

    def fetch_result(self, selected, url_col="url_norm", carry_cols=()):
        fr = self.inner.fetch_result(
            selected, url_col=url_col, carry_cols=carry_cols
        )
        flip = self.calls < self.fail_times
        self.calls += 1
        if not flip:
            return fr
        cond = F.col(url_col).isin(self.fail_urls)
        finals = (
            fr.finals.withColumn(
                "body",
                F.when(cond, F.lit(None).cast("binary")).otherwise(
                    F.col("body")
                ),
            )
            .withColumn(
                "final_url",
                F.when(cond, F.col(url_col)).otherwise(F.col("final_url")),
            )
            .withColumn(
                "status", F.when(cond, F.lit(0)).otherwise(F.col("status"))
            )
        )
        # a real transport failure produces no Set-Cookie events for
        # the failed request either; hop_targets need no filtering
        # here because the chosen fail URLs are plain pages (asserted
        # in the tests via their 200 final status, no redirect)
        cookies = fr.cookie_events.where(~F.col(url_col).isin(self.fail_urls))
        return dataclasses.replace(fr, finals=finals, cookie_events=cookies)


def _crawl_with(spark, fetcher, **kw):
    return crawl(
        spark,
        SPEC,
        SEEDS,
        budget_per_host=BUDGET,
        max_epochs=EPOCHS,
        n_shards=4,
        n_bits=1 << 16,
        fetcher=fetcher,
        **kw,
    )


def _inner(spark):
    corpus = corpus_df(spark, SPEC).cache()
    closure = agent.resolve_redirect_closure(corpus).localCheckpoint(
        eager=True
    )
    return corpus, agent.ResolvedCorpusFetcher(closure)


def test_transient_failure_retried_to_success(spark):
    corpus, inner = _inner(spark)
    control = crawl(
        spark, SPEC, SEEDS, budget_per_host=BUDGET, max_epochs=EPOCHS,
        n_shards=4, n_bits=1 << 16, corpus=corpus,
    )
    flaky = FlakyFetcher(inner, SEEDS, fail_times=1)
    res = _crawl_with(spark, flaky, corpus=corpus)

    vl = res.visit_log.collect()
    by_url = {}
    for r in vl:
        by_url.setdefault(r["url_norm"], []).append(
            (r["epoch"], r["status"], r["final_url"])
        )
    for u in SEEDS:
        attempts = sorted(by_url[u])
        assert attempts[0][1] == 0, "first attempt logged as transport failure"
        assert attempts[-1][1] == 200, "retry resolved to the real response"
        assert len(attempts) == 2
        assert attempts[1][0] > attempts[0][0], "retry lands in a later epoch"

    # eventual coverage: the flaky crawl fetches exactly the control's
    # URL set (same successful statuses per URL), just shifted epochs
    def ok_set(r):
        return {
            (x["url_norm"], x["status"], x["final_url"])
            for x in r.visit_log.collect()
            if x["status"] != 0
        }

    assert ok_set(res) == ok_set(control)
    # seen membership identical
    a = {r["url_norm"] for r in res.seen.seen_df.collect()}
    b = {r["url_norm"] for r in control.seen.seen_df.collect()}
    assert a == b
    # payload rows identical (image ids + captions)
    pa = {(r["image_id"], r["caption"]) for r in res.payload.collect()}
    pb = {(r["image_id"], r["caption"]) for r in control.payload.collect()}
    assert pa == pb


def test_permanent_failure_bounded(spark):
    corpus, inner = _inner(spark)
    dead = [SEEDS[0]]
    flaky = FlakyFetcher(inner, dead, fail_times=10_000)  # never recovers
    res = _crawl_with(spark, flaky, corpus=corpus, max_transport_retries=2)
    rows = [
        (r["epoch"], r["status"])
        for r in res.visit_log.collect()
        if r["url_norm"] == dead[0]
    ]
    assert sorted(s for _, s in rows) == [0, 0, 0]  # 1 try + 2 retries
    # the other seed's subtree still crawled
    assert res.visit_log.where(F.col("status") != 0).count() > 1


def test_retries_disabled(spark):
    corpus, inner = _inner(spark)
    flaky = FlakyFetcher(inner, [SEEDS[0]], fail_times=10_000)
    res = _crawl_with(
        spark, flaky, corpus=corpus, max_transport_retries=0
    )
    rows = [
        r["status"]
        for r in res.visit_log.collect()
        if r["url_norm"] == SEEDS[0]
    ]
    assert rows == [0]  # single attempt, never requeued


def test_resume_from_pre_retry_snapshot(spark, tmp_path):
    """Snapshots written before the retry feature carry no `attempt`
    column; resume must back-fill it and finish the crawl with the
    exact state a straight-through run produces."""
    import os

    ckpt = str(tmp_path / "snap")
    corpus, _ = _inner(spark)
    partial = crawl(
        spark, SPEC, SEEDS, budget_per_host=2, max_epochs=2,
        n_shards=4, n_bits=1 << 16, corpus=corpus, checkpoint_dir=ckpt,
    )
    assert partial.epochs == 2
    control = crawl(
        spark, SPEC, SEEDS, budget_per_host=2, max_epochs=EPOCHS,
        n_shards=4, n_bits=1 << 16, corpus=corpus,
    )
    # simulate a pre-retry snapshot: strip `attempt` from the stored
    # frontier table in place
    store = partial.store
    e = store.latest_epoch()
    path = os.path.join(store.root, f"epoch={e:06d}", "frontier")
    df = spark.read.parquet(path)
    assert "attempt" in df.columns
    stripped = df.drop("attempt").localCheckpoint(eager=True)
    stripped.write.mode("overwrite").parquet(path)

    resumed = crawl(
        spark, SPEC, SEEDS, budget_per_host=2, max_epochs=EPOCHS,
        n_shards=4, n_bits=1 << 16, corpus=corpus,
        checkpoint_dir=ckpt, resume=True,
    )
    got = sorted(
        (tuple(r) for r in resumed.visit_log.collect()), key=lambda t: t
    )
    want = sorted(
        (tuple(r) for r in control.visit_log.collect()), key=lambda t: t
    )
    assert got == want
    a = {r["url_norm"] for r in resumed.seen.seen_df.collect()}
    b = {r["url_norm"] for r in control.seen.seen_df.collect()}
    assert a == b


def test_adaptive_delay_aimd_recurrence(spark):
    from pyspark.sql import functions as F

    from mechaml_spark.frontier.revisit import adaptive_delay

    rows = [
        ("a", 0, 200), ("a", 1, 503), ("a", 2, 503), ("a", 3, 200),
        ("a", 4, 429), ("a", 5, 0),
        ("b", 0, 500), ("b", 1, 200),
    ]
    df = spark.createDataFrame(rows, "host string, epoch long, status int")
    got = {(r.host, r.epoch): r.delay_ms
           for r in adaptive_delay(df).collect()}
    # host a: 1000 -> 1000(succ floor) -> 2000 -> 4000 -> 3750 ->
    # 7500(429) -> 15000(status 0)
    assert [got[("a", e)] for e in range(6)] == [
        1000, 2000, 4000, 3750, 7500, 15000]
    # host b: 2000 (5xx from init 1000) -> 1750
    assert [got[("b", e)] for e in range(2)] == [2000, 1750]


def test_adaptive_delay_caps_and_floor(spark):
    from mechaml_spark.frontier.revisit import adaptive_delay

    rows = [("c", e, 503) for e in range(10)] + \
           [("c", e, 200) for e in range(10, 14)]
    df = spark.createDataFrame(rows, "host string, epoch long, status int")
    got = [r.delay_ms for r in
           adaptive_delay(df).orderBy("epoch").collect()]
    assert got[:7] == [2000, 4000, 8000, 16000, 32000, 60000, 60000]
    assert got[-1] == 60000 - 4 * 250
    # floor: long success run never drops below min_ms
    rows2 = [("d", e, 200) for e in range(30)]
    df2 = spark.createDataFrame(rows2, "host string, epoch long, status int")
    assert min(r.delay_ms for r in adaptive_delay(df2).collect()) == 1000
