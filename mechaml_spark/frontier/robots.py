"""robots.txt acquisition + parse: fetch ``/robots.txt`` per host
through the SAME fetch stage as page fetches, parse Disallow rules
(vectorized), collect the tiny host->prefixes dict to the driver and
broadcast it (north rule: "robots.txt caches held as broadcast
state").

Parsing scope: the subset the reference crawl semantics need —
``User-agent: *`` groups' ``Disallow:`` path prefixes (empty
Disallow = allow-all, per the original robots.txt convention).
Specific-agent groups are ignored (we always identify as ``*``).
The collect is justified: one row per HOST (not per URL), and rules
must be visible to every politeness/filter task — at 10^10 URLs the
host count is ~10^7, a few hundred MB broadcast at worst; shard the
broadcast by host-hash if it outgrows memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_robots(body: str | None) -> list[str]:
    """Disallow prefixes for ``User-agent: *`` (pure function).

    A group = one or more consecutive ``User-agent`` lines followed by
    directives; the group applies to us iff any of its agent lines is
    ``*``.  Empty ``Disallow:`` means allow-all (skipped)."""
    if not body:
        return []
    prefixes: list[str] = []
    group_agents: list[str] = []
    in_agent_block = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_block:
                group_agents = []
                in_agent_block = True
            group_agents.append(val)
        else:
            in_agent_block = False
            if key == "disallow" and "*" in group_agents and val:
                prefixes.append(val)
    return prefixes


ROBOTS_T = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("prefixes", T.ArrayType(T.StringType())),
    ]
)


def fetch_robots_rules_df(
    spark: SparkSession,
    hosts: DataFrame,
    fetcher,
    host_col: str = "host",
    scheme_col: str | None = None,
) -> DataFrame:
    """Fetch+parse robots.txt for every distinct host via the crawl's
    fetch stage; returns a ``(host, prefixes: array<string>)``
    DataFrame holding only hosts with at least one Disallow prefix.
    Non-200/missing robots -> no row (reference behavior: only
    explicit Disallow blocks).

    The rules STAY distributed: the scheduler consumes this as a
    broadcast-join side, so at the 10^7-host design point the driver
    never materializes a rules dict (collecting it was the round-1
    bottleneck noted in the plan audit) — Spark ships the broadcast
    once per executor instead.

    The robots URL scheme comes from ``scheme_col`` when given — the
    caller derives it from the URLs that introduced each host, so an
    https-only host is asked over https, never plain http."""
    scheme = (
        F.coalesce(F.col(scheme_col), F.lit("http"))
        if scheme_col is not None
        else F.lit("http")
    )
    reqs = (
        hosts.select(F.col(host_col).alias("host"), scheme.alias("_scheme"))
        .distinct()
        .select(
            "host",
            F.concat(
                F.col("_scheme"), F.lit("://"), F.col("host"), F.lit("/robots.txt")
            ).alias("url_norm"),
        )
    )
    fetched = fetcher.fetch(reqs, "url_norm")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok = pdf["status"] == 200
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "prefixes": [
                        parse_robots(b) if o else []
                        for b, o in zip(pdf["body"], ok)
                    ],
                }
            )

    return (
        fetched.select("host", "status", "body")
        .mapInPandas(parse, schema=ROBOTS_T)
        .where(F.size("prefixes") > 0)
    )


def mark_blocked(
    df: DataFrame,
    rules_df: DataFrame,
    url_col: str = "url_norm",
    out_col: str = "_blocked",
) -> DataFrame:
    """Tag each frontier row with whether robots rules block it.

    THE robots-application stage, shared verbatim by the batch
    scheduler and the streaming crawl (so semantics cannot drift):
    broadcast join ``rules_df`` (``host, prefixes``) on ``host``, then
    a codegen'd ``exists(prefixes, path startswith prefix)`` over the
    crash-free :func:`mechaml_spark.page.path_col` path.  Hosts with
    no rules row pass.  Adds ``out_col: boolean``; drops nothing else.
    """
    from mechaml_spark.page import path_col

    return (
        df.join(F.broadcast(rules_df), "host", "left")
        .withColumn("_path", path_col(F.col(url_col)))
        .withColumn(
            out_col,
            F.coalesce(
                F.exists("prefixes", lambda p: F.col("_path").startswith(p)),
                F.lit(False),
            ),
        )
        .drop("prefixes", "_path")
    )


def fetch_robots_rules(
    spark: SparkSession,
    hosts: DataFrame,
    fetcher,
    host_col: str = "host",
    scheme_col: str | None = None,
) -> dict[str, list[str]]:
    """Dict form of :func:`fetch_robots_rules_df` — for tests and the
    sequential oracle; the scheduler uses the DataFrame form."""
    rows = fetch_robots_rules_df(
        spark, hosts, fetcher, host_col=host_col, scheme_col=scheme_col
    ).collect()
    return {r["host"]: list(r["prefixes"]) for r in rows}
