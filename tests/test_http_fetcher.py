"""HttpFetcher (real-network backend) — hermetic tests.

No network exists in-sandbox, so these verify the stage CONTRACT:
plan construction, schema, host-partitioned grouping, and the
per-row catch semantics (unreachable origin -> 404 row with NULL
body, never a task failure) — unreachable-host rows exercise the
exception path end-to-end without any network dependency.
"""

from __future__ import annotations

from mechaml_spark import agent


def test_http_fetcher_schema_and_catch_semantics(spark):
    reqs = spark.createDataFrame(
        [
            ("http://localhost:1/nope", "a"),      # connection refused
            ("http://invalid.invalid/x", "b"),     # DNS failure (RFC 2606)
        ],
        "url_norm string, tag string",
    )
    f = agent.HttpFetcher(timeout_s=2.0)
    out = f.fetch(reqs, "url_norm")
    assert [x.name for x in out.schema.fields] == [
        "url_norm", "tag", "status", "location", "set_cookie", "body"
    ]
    rows = {r["url_norm"]: r for r in out.collect()}
    assert len(rows) == 2
    for r in rows.values():
        assert r["status"] == 404 and r["body"] is None
        assert r["set_cookie"] == []
    # carry columns pass through untouched
    assert rows["http://localhost:1/nope"]["tag"] == "a"


def test_http_fetcher_composes_with_hop_loop(spark):
    """agent.fetch() over the HTTP backend builds and runs: the
    bounded hop loop's plan is backend-agnostic."""
    reqs = spark.createDataFrame(
        [("http://localhost:1/nope", "h", 0, 0)],
        "url_norm string, host string, depth int, discovered_epoch int",
    )
    res = agent.fetch(
        reqs, agent.HttpFetcher(timeout_s=2.0), jar=None,
        carry_cols=("host", "depth", "discovered_epoch"),
    )
    finals = res.finals.collect()
    assert len(finals) == 1 and finals[0]["status"] == 404
