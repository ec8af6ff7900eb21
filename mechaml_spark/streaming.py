"""Continuous-crawl mode: the superstep scheduler as a Structured
Streaming pipeline.

The batch scheduler (:mod:`mechaml_spark.frontier.scheduler`) is the
normative engine — the reference is strictly synchronous
request/response (SURVEY.md §2.11), so streaming is an EXTENSION, not
a parity surface.  This module re-expresses the crawl loop in the
idiomatic Structured Streaming shape for deployments that want a
long-running service instead of epoch jobs:

* the frontier is a **self-feeding file stream**: `readStream` over a
  parquet directory of `(url_norm, host, depth)` rows; each
  micro-batch fetches its URLs and appends newly discovered links
  back into the same directory, which the stream then picks up as the
  next micro-batch — the streaming analogue of the superstep loop;
* per-batch logic runs in ``foreachBatch`` (fetch join → lean parse →
  canonicalize → seen-set dedup), reusing the exact same library
  stages as the batch scheduler, so semantics cannot drift;
* politeness = ``maxFilesPerTrigger`` (global rate) + the batch
  scheduler's salted two-phase per-host budget inside the batch;
* state (seen set, visit log, payload) lives in the same
  SnapshotStore-compatible directories; checkpointing is Spark's
  streaming checkpoint + the seen-set table.

At 10^10-URL scale the same topology holds with the frontier
directory replaced by an Iceberg table (``readStream`` CDC) and the
fetch stage by the host-partitioned HTTP ``applyInPandas`` batch.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mechaml_spark import agent, extract, page
from mechaml_spark.corpus import CorpusSpec, corpus_df
from mechaml_spark.frontier.seen import SeenSet

FRONTIER_SCHEMA = "url_norm string, host string, depth int"


class StreamingCrawl:
    """A self-feeding Structured Streaming crawl over a synthetic
    corpus.  Call :meth:`start`, wait for quiescence (no new frontier
    files), then :meth:`stop`; results land in ``out_dir``.
    """

    def __init__(
        self,
        spark: SparkSession,
        spec: CorpusSpec,
        out_dir: str,
        budget_per_host: int = 4,
        n_shards: int = 8,
        n_bits: int = 1 << 18,
        max_files_per_trigger: int = 4,
    ) -> None:
        self.spark = spark
        self.spec = spec
        self.out = out_dir
        self.frontier_dir = os.path.join(out_dir, "frontier")
        self.visit_dir = os.path.join(out_dir, "visits")
        self.ckpt_dir = os.path.join(out_dir, "ckpt")
        os.makedirs(self.frontier_dir, exist_ok=True)
        self.budget = budget_per_host
        self.corpus = corpus_df(spark, spec).cache()
        closure = agent.resolve_redirect_closure(self.corpus).localCheckpoint(
            eager=True
        )
        self.fetcher = agent.ResolvedCorpusFetcher(closure)
        self.seen = SeenSet(spark, n_shards, n_bits)
        self.max_files = max_files_per_trigger
        self.query = None
        self._batches = 0
        self._busy = False
        self._last_activity = time.time()
        # same robots stage as the batch scheduler: rules fetched per
        # host through the fetch stage, kept as a DataFrame, applied
        # as a broadcast join + codegen'd prefix check
        from mechaml_spark.frontier.robots import fetch_robots_rules_df

        hosts_df = spark.createDataFrame(
            [(h,) for h in spec.hosts], "host string"
        )
        self._rules_df = fetch_robots_rules_df(
            spark, hosts_df, agent.CorpusFetcher(self.corpus)
        ).localCheckpoint(eager=True)
        # incremental MinHash near-dup index: running (sig0, sig1)
        # bucket counts over every 200-page body fetched so far,
        # updated per micro-batch with the SAME signature stage the
        # batch dedup_minhash query uses (queries.minhash_band_cols)
        self._minhash_counts = spark.createDataFrame(
            [], "sig0 string, sig1 string, n_docs long"
        )
        self._tpl_counts = spark.createDataFrame(
            [], "host string, template string, n_urls long"
        )
        # incremental line-frequency table for CCNet-style line-level
        # dedup (the batch line_dedupe stage): running (line-hash ->
        # distinct-doc count) folded per micro-batch.  Per-batch
        # count_distinct sums correctly ONLY because the seen-set
        # guarantees each URL's body enters exactly one batch — the
        # same single-delivery invariant the visit log asserts.
        self._line_counts = spark.createDataFrame([], "lh long, n_docs long")
        # incremental token-SPAN window-frequency table (the batch
        # span_dedupe stage, Lee et al. 2021 at window size 8): running
        # (window-hash -> occurrence count) folded per micro-batch.
        # Occurrence count (not distinct docs) is the batch query's
        # semantics, so a plain partial-count + merge-sum fold is
        # exact under the seen-set's single-delivery invariant.
        self._span_counts = spark.createDataFrame([], "wh long, n long")

    def _robots_filter(self, df: DataFrame) -> DataFrame:
        # literally the batch scheduler's robots stage
        from mechaml_spark.frontier.robots import mark_blocked

        return (
            mark_blocked(df, self._rules_df)
            .where(~F.col("_blocked"))
            .drop("_blocked")
        )

    # ------------------------------------------------------------ seeding
    def seed(self, urls: list[str]) -> None:
        from mechaml_spark import urlkit

        rows = sorted({urlkit.canonicalize(u) for u in urls})
        df = self.spark.createDataFrame(
            [(u, urlkit.host_of(u), 0) for u in rows], FRONTIER_SCHEMA
        )
        self.seen = self.seen.add(df).persist()
        self._append_frontier(df)

    def _append_frontier(self, df: DataFrame) -> None:
        # one parquet file per append = one stream input unit
        df.coalesce(1).write.mode("append").parquet(self.frontier_dir)

    # ------------------------------------------------------------ batches
    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        self._batches += 1
        self._busy = True
        self._last_activity = time.time()
        try:
            self._process_batch_inner(batch)
        finally:
            self._busy = False
            self._last_activity = time.time()

    def _process_batch_inner(self, batch: DataFrame) -> None:
        batch = self._robots_filter(batch)
        # same salted two-phase politeness stage as the batch scheduler
        from mechaml_spark.frontier.scheduler import politeness_split

        selected, overflow = politeness_split(
            batch, self.budget, key_cols=("depth", "url_norm")
        )
        fr = self.fetcher.fetch_result(
            selected, url_col="url_norm", carry_cols=("host", "depth")
        )
        finals = fr.finals.localCheckpoint(eager=True)
        finals.select("url_norm", "final_url", "status", "depth").write.mode(
            "append"
        ).parquet(self.visit_dir)

        ok = finals.where((F.col("status") == 200) & F.col("body").isNotNull())
        # data-pipeline layer runs inside the same foreachBatch: fold
        # this batch's body signatures into the running bucket counts
        # (partial-agg per batch, then a merge groupBy — the shuffle
        # carries one row per live bucket, never bodies)
        from mechaml_spark.queries import minhash_band_cols

        new_sigs = (
            ok.select(*minhash_band_cols(F.col("body")))
            .groupBy("sig0", "sig1")
            .agg(F.count("*").alias("n_docs"))
        )
        self._minhash_counts = (
            self._minhash_counts.unionByName(new_sigs)
            .groupBy("sig0", "sig1")
            .agg(F.sum("n_docs").alias("n_docs"))
            .localCheckpoint(eager=True)
        )
        # line-level dedup state, same fold shape as the batch
        # line_dedupe query: explode lines -> per-doc distinct hash ->
        # partial count per batch -> merge groupBy (one row per live
        # line hash crosses the shuffle, never lines or bodies)
        # doc key = the REQUEST url (url_norm): single delivery is
        # guaranteed per request URL by the seen-set; two requests may
        # land on one final_url via redirects, in different batches
        new_lines = (
            ok.select(
                F.col("url_norm").alias("doc"),
                F.explode(F.split(F.col("body"), "\n")).alias("line"),
            )
            .select("doc", F.xxhash64("line").alias("lh"))
            .distinct()
            .groupBy("lh")
            .agg(F.count("*").alias("n_docs"))
        )
        self._line_counts = (
            self._line_counts.unionByName(new_lines)
            .groupBy("lh")
            .agg(F.sum("n_docs").alias("n_docs"))
            .localCheckpoint(eager=True)
        )
        # span-dedup state, same fold shape at token granularity: every
        # 8-token sliding window hashed (whitespace tokens), partial
        # count per batch, merge groupBy — one 8-byte hash per live
        # window crosses the shuffle, never token text
        W = 8
        new_spans = (
            ok.select(
                F.split(F.col("body"), r"\s+").alias("toks")
            )
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
        self._span_counts = (
            self._span_counts.unionByName(new_spans)
            .groupBy("wh")
            .agg(F.sum("n").alias("n"))
            .localCheckpoint(eager=True)
        )
        # crawl-analytics layer, same fold shape: URL-template
        # cardinality (trap / pagination signal) maintained
        # incrementally — one row per live (host, template) crosses
        # the merge shuffle, never URLs
        from mechaml_spark.queries import url_template_col

        new_tpl = (
            finals.select(
                "host", url_template_col(F.col("url_norm")).alias("template")
            )
            .groupBy("host", "template")
            .agg(F.count("*").alias("n_urls"))
        )
        self._tpl_counts = (
            self._tpl_counts.unionByName(new_tpl)
            .groupBy("host", "template")
            .agg(F.sum("n_urls").alias("n_urls"))
            .localCheckpoint(eager=True)
        )
        # fused parse+resolve+filter — the exact stage the batch
        # scheduler runs (extract.parse_pages_crawl)
        parsed = extract.parse_pages_crawl(
            ok.select(F.col("final_url").alias("url"), "body", "depth"),
        )
        links = (
            parsed.select("depth", F.explode("links").alias("l"))
            .select(
                (F.col("depth") + 1).alias("depth"),
                F.col("l")["url_norm"].alias("url_norm"),
                F.col("l")["host"].alias("host"),
            )
            .select("url_norm", "host", "depth", F.lit(False).alias("is_hop"))
        )
        if fr.hop_targets is not None:
            links = links.unionByName(
                fr.hop_targets.select(
                    "url_norm", "host",
                    F.lit(None).cast("int").alias("depth"),
                    F.lit(True).alias("is_hop"),
                )
            )
        # JVM-side pre-dedup before the Python probe (same stage as the
        # batch scheduler — see scheduler.py)
        links = links.groupBy("url_norm").agg(
            F.first("host").alias("host"),
            F.min("depth").alias("depth"),
            F.max("is_hop").alias("is_hop"),
        )
        probed = self.seen.probe_dedup_update(links).localCheckpoint(eager=True)
        new_bloom = probed.where(F.col("bits").isNotNull()).select(
            "host_shard", "bits"
        )
        crows = probed.where(F.col("bits").isNull())
        verified = crows.where(F.col("_maybe_seen")).join(
            self.seen.seen_df.select("url_norm"), "url_norm", "left_anti"
        )
        new_urls = (
            crows.where(~F.col("_maybe_seen"))
            .unionByName(verified)
            .localCheckpoint(eager=True)
        )
        self.seen = SeenSet(
            self.spark,
            self.seen.n_shards,
            self.seen.n_bits,
            self.seen.seen_df.unionByName(
                new_urls.select("url_norm", "host_shard")
            ).localCheckpoint(eager=True),
            new_bloom.localCheckpoint(eager=True),
        )
        feed = (
            new_urls.where(~F.col("is_hop"))
            .select("url_norm", "host", "depth")
            .unionByName(overflow.select("url_norm", "host", "depth"))
        )
        if not feed.isEmpty():
            self._append_frontier(feed)

    # ------------------------------------------------------------ control
    def start(self) -> "StreamingCrawl":
        stream = (
            self.spark.readStream.schema(FRONTIER_SCHEMA)
            .option("maxFilesPerTrigger", str(self.max_files))
            .parquet(self.frontier_dir)
        )
        self.query = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.ckpt_dir)
            .trigger(processingTime="1 second")
            .queryName(f"crawl-{uuid.uuid4().hex[:8]}")
            .start()
        )
        return self

    def await_quiescence(self, idle_seconds: float = 10.0, timeout: float = 300.0):
        """Block until no micro-batch has been ACTIVE for
        ``idle_seconds`` (the crawl frontier is exhausted).  A batch
        marks activity at start and end, so a single long batch can
        never be mistaken for idleness (micro-batches may exceed the
        trigger interval)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            if (
                not self._busy
                and time.time() - self._last_activity >= idle_seconds
            ):
                return
            time.sleep(0.5)

    def stop(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None

    # ------------------------------------------------------------ results
    def visits(self) -> DataFrame:
        return self.spark.read.parquet(self.visit_dir)

    def minhash_buckets(self) -> DataFrame:
        """Near-dup buckets (>1 doc) from the incrementally maintained
        index — must equal the batch dedup_minhash stage run once over
        all fetched bodies (asserted in tests)."""
        return self._minhash_counts.where(F.col("n_docs") > 1)

    def line_counts(self) -> DataFrame:
        """The incrementally folded (line-hash, distinct-doc count)
        table — must equal the batch line_dedupe frequency stage run
        once over all fetched bodies (asserted in tests); a line is
        CCNet boilerplate when its count crosses the caller's
        threshold (>= 10 in the batch query)."""
        return self._line_counts

    def span_window_counts(self) -> DataFrame:
        """The incrementally folded (8-token-window hash, occurrence
        count) table — must equal the batch span_dedupe frequency
        stage run once over all fetched bodies (asserted in tests); a
        window with count >= 2 is a duplicated span whose covered
        tokens the batch query drops."""
        return self._span_counts

    def url_template_counts(self) -> DataFrame:
        """Incrementally maintained (host, template) cardinality —
        must equal the batch url_template_col fold run once over all
        visited URLs (asserted in tests)."""
        return self._tpl_counts


# ---------------------------------------------------------------------------
# Custom stateful streaming operator: event-time sessionization via
# applyInPandasWithState — the streaming twin of the batch
# `sessionize` driver query (same 30-min gap rule), for pipelines that
# sessionize a live event feed instead of a parquet snapshot.

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"


def events_per_window(
    events: DataFrame,
    window: str = "1 minute",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Event-time tumbling-window counts with late-data bounding —
    the built-in windowed-aggregation idiom (no custom state).

    In append mode a window row is emitted exactly once, when the
    watermark (max event time seen minus ``watermark_delay``) passes
    the window end; events arriving later than the watermark are
    dropped, so a straggler can never reopen or double-count an
    already-emitted window.  State per live window is one count —
    bounded by (watermark horizon / window length), independent of
    stream volume."""
    return (
        events.select(F.col("ts").cast("timestamp").alias("ts"))
        .withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w")["start"].alias("window_start"),
            F.col("w")["end"].alias("window_end"),
            "n_events",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming sessionization: one output row per CLOSED session.

    ``events`` is a STREAMING DataFrame with at least
    ``(user_id: long, ts: timestamp)``.  Sessions follow the batch
    `sessionize` query's rule — a new session starts when the gap
    since the user's previous event exceeds ``gap_s`` — and a session
    closes either when a same-batch successor event proves the gap,
    or when the event-time watermark passes ``last_event + gap_s``
    (GroupStateTimeout.EventTimeTimeout), which is how late data is
    bounded: events older than the watermark are dropped by
    ``withWatermark`` before they can reopen an emitted session.

    Scale shape: state is one tiny (start, last, n) triple per live
    user key, partitioned by ``user_id`` — no skew beyond the natural
    per-user event rate, and the Arrow-batched pandas transform never
    sees more than one user's in-flight batch at a time."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    gap_us = gap_s * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        # normalize to int64 microseconds regardless of the Arrow
        # batch's datetime64 resolution (ns under classic pandas,
        # us under pyarrow-backed pandas)
        ts_us = (
            pd.concat([pdf["ts"] for pdf in pdfs])
            .sort_values()
            .astype("datetime64[us]")
            .astype("int64")
        ).to_numpy()
        first = not state.exists
        start_us = last_us = n = 0
        if state.exists:
            start_us, last_us, n = state.get
        closed = []
        for t in ts_us:
            t = int(t)
            if first:
                start_us, last_us, n, first = t, t, 1, False
            elif t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        state.update((start_us, last_us, n))
        # close when the watermark passes last_event + gap; the
        # timeout timestamp must sit strictly beyond the current
        # watermark (same-batch boundary events can otherwise set a
        # timeout already in the past)
        timeout_ms = max(
            (last_us + gap_us) // 1000, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [n_ for _, _, n_ in closed],
                }
            )

    return (
        events.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# applyInPandasWithState — the streaming twin of the batch
# `adaptive_delay` driver query (frontier.revisit.adaptive_delay):
# AIMD politeness driven by a LIVE feed of fetch outcomes instead of
# a parquet history snapshot.

_AIMD_OUT_SCHEMA = "host string, epoch long, status int, delay_ms long"
_AIMD_STATE_SCHEMA = "delay long"


def adaptive_delay_stream(
    outcomes: DataFrame,
    *,
    init_ms: int = 1000,
    dec_ms: int = 250,
    min_ms: int = 1000,
    max_ms: int = 60000,
) -> DataFrame:
    """Streaming AIMD per-host politeness: same recurrence as the
    batch ``adaptive_delay`` (×2 capped on 429/5xx/transport-0,
    −dec floored on success), with the in-force delay carried as ONE
    long of state per live host across micro-batches.  Fed the same
    (host, epoch, status) rows in epoch order, the emitted rows are
    exactly the batch operator's output — asserted by the parity
    test.  State is bounded by live-host count, partitioned by host,
    no timeout (politeness state lives as long as the host does)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    def fn(key, pdfs, state: GroupState):
        (host,) = key
        delay = state.get[0] if state.exists else init_ms
        frames = [pdf for pdf in pdfs]
        pdf = pd.concat(frames).sort_values("epoch")
        delays = []
        for st in pdf["status"]:
            if st == 429 or st >= 500 or st == 0:
                delay = min(delay * 2, max_ms)
            else:
                delay = max(delay - dec_ms, min_ms)
            delays.append(delay)
        state.update((int(delay),))
        out = pdf[["host", "epoch", "status"]].copy()
        out["delay_ms"] = delays
        yield out

    return outcomes.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=_AIMD_OUT_SCHEMA,
        stateStructType=_AIMD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
