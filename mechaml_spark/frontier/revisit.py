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


# ---------------------------------------------------------- AIMD delay

def adaptive_delay(
    df,
    *,
    host_col: str = "host",
    epoch_col: str = "epoch",
    status_col: str = "status",
    init_ms: int = 1000,
    dec_ms: int = 250,
    min_ms: int = 1000,
    max_ms: int = 60000,
):
    """AIMD per-host politeness controller (the BUbiNG/IRLbot move):
    the crawl-delay for a host ADAPTS to what the server says —
    multiplicative increase on back-pressure (429/5xx/timeout ⇒
    ``delay*2`` capped at ``max_ms``), additive decrease on success
    (``delay-dec_ms`` floored at ``min_ms``) — instead of one static
    budget for every host on the internet.  Input: one row per
    (host, epoch, status) fetch outcome; output adds ``delay_ms``,
    the delay in force AFTER that epoch's outcome.

    Scale shape: the recurrence is sequential ONLY within a host, so
    ``applyInPandas`` over ``groupBy(host)`` is the honest scale
    path — hosts are the parallel unit (10^7 of them at design
    point), per-host history is bounded by revisit horizon, and the
    one shuffle carries (host, epoch, status) triples, never bodies.
    The result feeds the scheduler's ``host_budgets`` override
    (scheduler.crawl: budget ≈ window/delay), closing the loop
    from server signals to frontier scheduling.
    """
    import pandas as pd

    out_schema = (f"{host_col} string, {epoch_col} long, "
                  f"{status_col} int, delay_ms long")

    def one_host(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(epoch_col)
        delay = init_ms
        delays = []
        for st in pdf[status_col]:
            if st == 429 or st >= 500 or st == 0:
                delay = min(delay * 2, max_ms)
            else:
                delay = max(delay - dec_ms, min_ms)
            delays.append(delay)
        pdf = pdf[[host_col, epoch_col, status_col]].copy()
        pdf["delay_ms"] = delays
        return pdf

    return df.groupBy(host_col).applyInPandas(one_host, out_schema)
