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
