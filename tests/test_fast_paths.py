"""Regression tests pinning the crawl fast paths to their reference
implementations:

* ``agent.resolve_redirect_closure`` + ``ResolvedCorpusFetcher`` vs
  the general bounded hop loop ``agent.fetch`` (same FetchResult);
* ``extract.parse_pages_lean`` vs the full ``extract.parse_pages``
  (same hrefs / image src+alt / base_uri);
* ``SeenSet.probe_dedup_update`` (fused dedup+probe+bloom-update) vs
  the two-step ``filter_new`` + ``add``.

The end-to-end crawl-vs-oracle equality lives in test_crawl.py; these
isolate each fast path so a regression points at the right layer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mechaml_spark import agent, extract, urlkit
from mechaml_spark.corpus import CorpusSpec, corpus_df, page_url
from mechaml_spark.frontier.seen import SeenSet

SPEC = CorpusSpec(n_hosts=3, pages_per_host=9, links_per_page=4)


@pytest.fixture(scope="module")
def corpus(spark):
    df = corpus_df(spark, SPEC).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def requests_df(spark):
    # mix: plain pages, redirect entries, the 7-hop chain, a 404
    urls = (
        [page_url(SPEC, i, j) for i in range(3) for j in (0, 1, 5)]
        + ["http://host0.test/r0", "http://host1.test/r3",
           "http://host0.test/chain0", "http://host9.test/missing"]
    )
    rows = [(urlkit.canonicalize(u), urlkit.host_of(u), 0, 0) for u in urls]
    return spark.createDataFrame(
        rows, "url_norm string, host string, depth int, discovered_epoch int"
    )


def test_closure_fetch_equals_hop_loop(spark, corpus, requests_df):
    carry = ("host", "depth", "discovered_epoch")
    loop = agent.fetch(
        requests_df, agent.CorpusFetcher(corpus), jar=None,
        url_col="url_norm", carry_cols=carry,
    )
    closure = agent.resolve_redirect_closure(corpus)
    fast = agent.ResolvedCorpusFetcher(closure).fetch_result(
        requests_df, url_col="url_norm", carry_cols=carry
    )

    def rows(df, cols):
        return sorted(map(tuple, df.select(*cols).collect()))

    final_cols = ["url_norm", "final_url", "status", "body"]
    assert rows(loop.finals, final_cols) == rows(fast.finals, final_cols)
    ev_cols = ["url_norm", "hop", "idx", "hv", "src_url"]
    assert rows(loop.cookie_events, ev_cols) == rows(fast.cookie_events, ev_cols)
    hop_cols = ["url_norm", "host"]
    assert rows(loop.hop_targets, hop_cols) == rows(fast.hop_targets, hop_cols)


def test_relational_closure_equals_driver_map(spark, corpus):
    """Forcing the size gate (max_driver_redirect_rows=0) routes the
    closure through the fully distributed bounded-join chase; it must
    be byte-equal to the Arrow driver-map pointer-chase on the same
    corpus (redirect chains incl. the 7-hop capped one, set-cookie
    hops, landings absent from the corpus)."""

    def rows(df):
        return sorted(
            (
                r["url_norm"], r["final_url"], r["status"], r["body"],
                tuple(map(tuple, r["cookie_hops"])),
                tuple(map(tuple, r["hop_urls"])),
            )
            for r in df.select(
                "url_norm", "final_url", "status", "body",
                F.expr(
                    "transform(cookie_hops, h -> struct(h.hop, h.src_url, "
                    "array_join(coalesce(h.set_cookie, array()), '|')))"
                ).alias("cookie_hops"),
                "hop_urls",
            ).collect()
        )

    arrow = agent.resolve_redirect_closure(corpus)
    relational = agent.resolve_redirect_closure(
        corpus, max_driver_redirect_rows=0
    )
    a, r = rows(arrow), rows(relational)
    assert len(a) == corpus.count()
    assert a == r


def test_lean_parse_matches_full(spark, corpus):
    pages = corpus.where(F.col("status") == 200).select(
        F.col("url_norm").alias("url"), "body"
    )
    full = extract.parse_pages(pages)
    lean = extract.parse_pages_lean(pages)
    f = {
        r["url"]: (
            r["base_uri"],
            [ln["href"] for ln in r["links"] if ln["href"] is not None],
            [(im["src"], (im["attrs"] or {}).get("alt")) for im in r["images"]],
        )
        for r in full.collect()
    }
    l = {
        r["url"]: (
            r["base_uri"],
            list(r["hrefs"]),
            [(im["src"], im["alt"]) for im in r["imgs"]],
        )
        for r in lean.collect()
    }
    assert f == l and len(f) > 0


def test_fused_seen_pass_equals_two_step(spark):
    base = spark.createDataFrame(
        [(f"http://h{i % 5}.test/p{i}", f"h{i % 5}.test") for i in range(40)],
        "url_norm string, host string",
    )
    cands = spark.createDataFrame(
        [
            (f"http://h{i % 5}.test/p{i}", f"h{i % 5}.test", i % 7, False)
            for i in range(25, 70)
        ]
        # duplicates with differing depth: fused pass must keep min
        + [(f"http://h{i % 5}.test/p{i}", f"h{i % 5}.test", 99, False)
           for i in range(25, 35)],
        "url_norm string, host string, depth int, is_hop boolean",
    )
    ref_seen = SeenSet(spark, n_shards=4, n_bits=1 << 16).add(base)
    dd = cands.groupBy("url_norm").agg(
        F.first("host").alias("host"),
        F.min("depth").alias("depth"),
        F.max("is_hop").alias("is_hop"),
    )
    expect = sorted(
        map(tuple, ref_seen.filter_new(dd)
            .select("url_norm", "host", "depth", "is_hop").collect())
    )

    seen = SeenSet(spark, n_shards=4, n_bits=1 << 16).add(base)
    probed = seen.probe_dedup_update(cands).cache()
    crows = probed.where(F.col("bits").isNull())
    verified = crows.where(F.col("_maybe_seen")).join(
        seen.seen_df.select("url_norm"), "url_norm", "left_anti"
    )
    got_df = crows.where(~F.col("_maybe_seen")).unionByName(verified)
    got = sorted(
        map(tuple, got_df.select("url_norm", "host", "depth", "is_hop").collect())
    )
    assert got == expect and len(got) > 0

    # bloom update correctness: after folding the new bloom back in,
    # re-probing the same candidates must yield zero bloom-negatives
    new_bloom = probed.where(F.col("bits").isNotNull()).select("host_shard", "bits")
    seen2 = SeenSet(
        spark, 4, 1 << 16,
        seen.seen_df.unionByName(
            got_df.select(
                "url_norm",
                F.pmod(F.xxhash64("host"), F.lit(4)).cast("int").alias("host_shard"),
            )
        ),
        new_bloom,
    )
    assert seen2.filter_new(dd).count() == 0
