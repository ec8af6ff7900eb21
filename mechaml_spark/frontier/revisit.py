"""Recrawl scheduling + conditional-GET revisit.

The reference agent is one-shot (no recrawl; src/agent.ml has no
refresh surface) — this implements the crawl-tier machinery a
CONTINUOUS crawler needs on top of it:

* :func:`revisit_schedule` — decide which known URLs are due for
  refetch from their observed change history, the classic
  change-rate-proportional refresh policy (Cho & Garcia-Molina,
  "Synchronizing a database to improve freshness", SIGMOD 2000): a
  URL's next fetch lands one estimated change-interval after its last
  fetch, clamped to [min_interval, max_interval].  The estimator is
  the observation span divided by (observed changes + 1) — integer
  arithmetic end to end so the DuckDB oracle replays it exactly.
* the transport half lives in :class:`mechaml_spark.agent.HttpFetcher`:
  optional ``if_none_match`` / ``if_modified_since`` request columns
  go on the wire (RFC 9110 conditional requests), responses carry
  ``etag`` / ``last_modified`` back, and a 304 yields a NULL body the
  pipeline resolves against its stored payload.

Scale posture: one window over (url, ts) to detect hash transitions
plus one per-URL groupBy — the shuffle carries (url, hash64, ts),
never bodies.  Both stages are partial-aggregable and skew-free (URLs
are the key, not hosts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def revisit_schedule(
    history: DataFrame,
    now_ts: int,
    min_interval: int,
    max_interval: int,
    url_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Per-URL fetch history -> (url, n_fetches, n_changes, last_ts,
    next_due, due).

    ``history`` rows are one per past fetch: (url, ts, content_hash).
    ``n_changes`` counts hash transitions between consecutive fetches
    of the same URL; the refresh interval estimate is
    ``span // (n_changes + 1)`` (span = last_ts - first_ts), clamped,
    with single-fetch URLs defaulting to ``min_interval``.
    """
    w = Window.partitionBy(url_col).orderBy(ts_col)
    marked = history.withColumn("_prev_hash", F.lag(hash_col).over(w))
    agg = marked.groupBy(F.col(url_col).alias("url")).agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(
            (
                F.col("_prev_hash").isNotNull()
                & (F.col(hash_col) != F.col("_prev_hash"))
            ).cast("long")
        ).alias("n_changes"),
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("last_ts"),
    )
    est = F.floor(
        (F.col("last_ts") - F.col("_first_ts"))
        / (F.col("n_changes") + F.lit(1))
    )
    interval = F.when(F.col("n_fetches") > 1, est).otherwise(
        F.lit(min_interval)
    )
    clamped = F.least(
        F.greatest(interval, F.lit(min_interval)), F.lit(max_interval)
    )
    return agg.select(
        "url",
        "n_fetches",
        "n_changes",
        "last_ts",
        (F.col("last_ts") + clamped).cast("long").alias("next_due"),
        ((F.col("last_ts") + clamped) <= F.lit(now_ts)).alias("due"),
    )
