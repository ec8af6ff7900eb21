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

    # data-pipeline parity: the incrementally maintained MinHash
    # near-dup index (updated per micro-batch inside foreachBatch)
    # must equal the batch dedup_minhash stage run ONCE over all
    # fetched bodies — "same stages both modes" extended from crawl
    # semantics to the pipeline layer
    from mechaml_spark.queries import minhash_band_cols

    bodies = (
        visits.where(F.col("status") == 200)
        .join(
            sc.corpus.select(
                F.col("url_norm").alias("final_url"), "body"
            ),
            "final_url",
            "inner",
        )
        .where(F.col("body").isNotNull())
    )
    batch_buckets = (
        bodies.select(*minhash_band_cols(F.col("body")))
        .groupBy("sig0", "sig1")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )
    got_b = sorted(map(tuple, sc.minhash_buckets().collect()))
    want_b = sorted(map(tuple, batch_buckets.collect()))
    assert got_b == want_b and len(got_b) > 0

    # crawl-analytics parity: the incrementally folded URL-template
    # cardinality must equal the batch fold run ONCE over all visits
    from mechaml_spark.queries import url_template_col

    batch_tpl = (
        visits.select(
            F.regexp_extract("url_norm", "^https?://([^/]+)", 1)
            .alias("host"),
            url_template_col(F.col("url_norm")).alias("template"),
        )
        .groupBy("host", "template")
        .agg(F.count("*").alias("n_urls"))
    )
    got_t = sorted(map(tuple, sc.url_template_counts().collect()))
    want_t = sorted(map(tuple, batch_tpl.collect()))
    assert got_t == want_t and len(got_t) > 0

    # text-dedup-tier parity (round-4 item): the incrementally folded
    # line-frequency table must equal the batch line_dedupe frequency
    # stage run ONCE over all fetched bodies — byte-equal, incl. the
    # boilerplate set at the batch query's >= 10 threshold
    batch_lines = (
        bodies.select(
            F.col("url_norm").alias("doc"),
            F.explode(F.split(F.col("body"), "\n")).alias("line"),
        )
        .select("doc", F.xxhash64("line").alias("lh"))
        .distinct()
        .groupBy("lh")
        .agg(F.count("*").alias("n_docs"))
    )
    got_l = sorted(map(tuple, sc.line_counts().collect()))
    want_l = sorted(map(tuple, batch_lines.collect()))
    assert got_l == want_l and len(got_l) > 0
    got_boiler = {r["lh"] for r in sc.line_counts()
                  .where(F.col("n_docs") >= 10).collect()}
    want_boiler = {r["lh"] for r in batch_lines
                   .where(F.col("n_docs") >= 10).collect()}
    assert got_boiler == want_boiler

    # span-dedup-tier parity (round-5 item, closing the last un-twinned
    # text-dedup tier): the incrementally folded 8-token-window hash
    # table must equal the batch span_dedupe frequency stage run ONCE
    # over all fetched bodies — byte-equal, incl. the duplicated-span
    # set at the batch query's >= 2 threshold
    W = 8
    batch_spans = (
        bodies.select(F.split(F.col("body"), r"\s+").alias("toks"))
        .select(
            F.explode(
                F.when(
                    F.size("toks") >= W,
                    F.sequence(F.lit(0), F.size("toks") - W),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("ws"),
            "toks",
        )
        .select(
            F.xxhash64(
                F.array_join(F.slice("toks", F.col("ws") + 1, W), " ")
            ).alias("wh")
        )
        .groupBy("wh")
        .agg(F.count("*").alias("n"))
    )
    got_s = sorted(map(tuple, sc.span_window_counts().collect()))
    want_s = sorted(map(tuple, batch_spans.collect()))
    assert got_s == want_s and len(got_s) > 0
    got_dup = {r["wh"] for r in sc.span_window_counts()
               .where(F.col("n") >= 2).collect()}
    want_dup = {r["wh"] for r in batch_spans
                .where(F.col("n") >= 2).collect()}
    assert got_dup == want_dup and len(got_dup) > 0


@pytest.mark.timeout(300)
def test_sessionize_stream_matches_batch_rule(spark, tmp_path):
    """Stateful streaming sessionization (applyInPandasWithState +
    event-time timeout) emits exactly the sessions the batch gap rule
    defines, across micro-batch boundaries and via watermark timeout.

    Events arrive in ts order over several files (one file = one
    micro-batch); two far-future flush events advance the watermark so
    every real session closes by end-of-stream without relying on
    no-data micro-batches."""
    import pandas as pd

    from mechaml_spark.streaming import sessionize_stream

    gap_s = 1800
    base = pd.Timestamp("2026-01-01 00:00:00")
    mins = lambda m: base + pd.Timedelta(minutes=m)  # noqa: E731
    # user 1: two sessions split inside one micro-batch (gap 40 min);
    # user 2: one session spanning micro-batches (gaps < 30 min);
    # user 3: singleton session closed only by the watermark timeout
    files = [
        [(1, mins(0)), (1, mins(10)), (1, mins(50)), (2, mins(5))],
        [(2, mins(25)), (2, mins(45)), (3, mins(60))],
        [(1, mins(70)), (2, mins(66))],
        [(-1, mins(600))],
        [(-1, mins(1200))],
    ]
    in_dir = tmp_path / "events"
    in_dir.mkdir()
    for i, rows in enumerate(files):
        spark.createDataFrame(
            [(u, t.to_pydatetime()) for u, t in rows],
            "user_id long, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(str(in_dir / f"f{i}"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir) + "/*")
    )
    name = "sess_out"
    q = (
        sessionize_stream(stream, gap_s=gap_s)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r["user_id"] != -1
    }
    # expected sessions from the batch gap rule, computed directly
    events = sorted(
        [(u, t) for rows in files for u, t in rows if u != -1]
    )
    expected, cur = set(), {}
    for u, t in events:
        if u in cur and (t - cur[u][1]).total_seconds() > gap_s:
            s, e, n = cur.pop(u)
            expected.add((u, s.to_pydatetime(), e.to_pydatetime(), n))
        if u not in cur:
            cur[u] = [t, t, 1]
        else:
            cur[u][1], cur[u][2] = t, cur[u][2] + 1
    for u, (s, e, n) in cur.items():
        expected.add((u, s.to_pydatetime(), e.to_pydatetime(), n))
    assert got == expected


@pytest.mark.timeout(300)
def test_events_per_window_drops_late_rows(spark, tmp_path):
    """Watermarked tumbling-window agg: append mode emits each window
    exactly once, when the watermark passes its end and the state is
    evicted; a straggler arriving AFTER eviction is dropped — it can
    neither reopen nor double-count the emitted window (the hard
    guarantee; a straggler arriving while the state still lives may
    legally be merged — Spark's watermark is a bound on accepted
    lateness, not an eager filter)."""
    import pandas as pd

    from mechaml_spark.streaming import events_per_window

    base = pd.Timestamp("2026-01-01 00:00:00")
    secs = lambda s: (base + pd.Timedelta(seconds=s)).to_pydatetime()  # noqa: E731
    files = [
        [(1, secs(10)), (1, secs(20)), (1, secs(65))],
        # end-of-batch raises the watermark to 180-30 = 150s
        [(1, secs(180))],
        # this batch runs WITH wm=150s: [0,60) and [60,120) are
        # evicted and emitted; its own event lands in [180,240)
        [(1, secs(185))],
        # straggler at 30s, far below the watermark and after
        # eviction -> dropped (no duplicate [0,60) row either)
        [(1, secs(30))],
        # advances watermark to 600-30 = 570s: [180,240) finalizes
        [(1, secs(600))],
    ]
    in_dir = tmp_path / "wevents"
    in_dir.mkdir()
    for i, rows in enumerate(files):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(str(in_dir / f"f{i}"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir) + "/*")
    )
    q = (
        events_per_window(stream, window="1 minute", watermark_delay="30 seconds")
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r["window_start"].second + r["window_start"].minute * 60, r["n_events"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    # [0,60): 2 events — the post-eviction straggler is NOT counted
    # and produced no duplicate window row; [60,120): 1;
    # [180,240): 2 (events at 180 and 185).  The 600s event's window
    # never finalizes before end-of-stream and is correctly absent.
    assert got == {(0, 2), (60, 1), (180, 2)}


def test_adaptive_delay_stream_matches_batch(spark, tmp_path):
    """The streaming AIMD controller (one long of state per host)
    emits exactly the batch adaptive_delay rows when fed the same
    outcomes in epoch order across micro-batch boundaries."""
    from mechaml_spark.frontier.revisit import adaptive_delay
    from mechaml_spark.streaming import adaptive_delay_stream

    rows = [
        ("a", 0, 200), ("a", 1, 503), ("b", 0, 500),
        ("a", 2, 503), ("a", 3, 200), ("b", 1, 200),
        ("a", 4, 429), ("a", 5, 0), ("b", 2, 429),
    ]
    # file i = micro-batch i: epochs strictly increase per host
    files = [rows[0:3], rows[3:6], rows[6:9]]
    in_dir = tmp_path / "outcomes"
    in_dir.mkdir()
    schema = "host string, epoch long, status int"
    for i, chunk in enumerate(files):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(in_dir / f"f{i}")
        )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(in_dir / "f*"))
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    q = (
        adaptive_delay_stream(stream)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.host, r.epoch): (r.status, r.delay_ms)
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    batch = spark.createDataFrame(rows, schema)
    want = {
        (r.host, r.epoch): (r.status, r.delay_ms)
        for r in adaptive_delay(batch).collect()
    }
    assert got == want and len(got) == len(rows)
