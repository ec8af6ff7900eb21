"""robots.txt acquisition + parse: fetch ``/robots.txt`` per host
through the SAME fetch stage as page fetches, parse the rule groups
(vectorized), and apply them distributed as a broadcast-join side
(north rule: "robots.txt caches held as broadcast state").

Semantics: RFC 9309 (Robots Exclusion Protocol) for ``User-agent: *``
groups — BOTH ``Allow`` and ``Disallow`` rules, longest-match
precedence (the rule whose pattern has the most octets wins; on a
tie ``Allow`` wins), and the two standard metacharacters: ``*``
matches any byte run, a trailing ``$`` anchors the pattern at the
path end.  No matching rule = allowed; empty rule values match
nothing (the original "empty Disallow = allow-all" convention falls
out of that).  Specific-agent groups are ignored (we always identify
as ``*``); ``Crawl-delay`` is not consumed here — the scheduler's
per-host politeness budget is the delay mechanism.

Scale: rules are parsed ONCE per host into a precompiled form
(plain-prefix fast path or a translated regex, plus the precedence
length), so the per-URL match stage is a broadcast hash join + a
codegen'd array fold — one row per HOST rides the broadcast (~10^7
rows at the design point, shardable by host-hash if it outgrows
memory), never a per-URL rules copy.
"""

from __future__ import annotations

import re
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

Rule = tuple[bool, str]  # (allow, pattern) in file order


def parse_robots(body: str | None, agent: str | None = None) -> list[Rule]:
    """``(allow, pattern)`` rules applying to this crawler (pure).

    A group = one or more consecutive ``User-agent`` lines followed
    by directives.  With ``agent=None`` (the default every existing
    call site uses) only ``*`` groups apply — the anonymous-crawler
    reading.  With a product token, RFC 9309 §2.2.1 group selection:
    a group matches when one of its agent values (case-insensitive)
    is a prefix of the token (``googlebot-images`` groups beat
    ``googlebot`` groups beat ``*`` — the most-specific-match rule
    every major crawler documents); ALL groups at the longest
    matching value merge, and ``*`` groups apply only when no
    specific group matched at all.  Empty patterns are dropped (they
    can match nothing)."""
    if not body:
        return []
    groups: list[tuple[list[str], list[Rule]]] = []
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
                groups.append((group_agents, []))
                in_agent_block = True
            group_agents.append(val)
        else:
            in_agent_block = False
            if key in ("allow", "disallow") and val and groups:
                groups[-1][1].append((key == "allow", val))
    tok = (agent or "").lower()
    best_len = -1
    if agent is not None:
        for agents, _rules in groups:
            for a in agents:
                al = a.lower()
                if al != "*" and tok.startswith(al):
                    best_len = max(best_len, len(al))
    rules: list[Rule] = []
    for agents, grules in groups:
        lens = [
            len(a) for a in agents
            if a.lower() != "*" and tok.startswith(a.lower())
        ]
        use = (
            (best_len >= 0 and lens and max(lens) == best_len)
            or (best_len < 0 and "*" in agents)
        )
        if use:
            rules.extend(grules)
    return rules


def _rule_regex(pattern: str) -> str:
    """Translate a robots pattern (``*`` wildcard, trailing ``$``
    anchor) to an anchored regex; every other byte is literal."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in core)
    return "^" + rx + ("$" if anchored else "")


def _is_plain(pattern: str) -> bool:
    return "*" not in pattern and not pattern.endswith("$")


def _precedence(allow: bool, pattern: str) -> int:
    # Longest pattern wins; allow wins ties (RFC 9309 §2.2.2) — fold
    # both into one maximizable integer so the distributed matcher is
    # a single array aggregate.
    return len(pattern) * 2 + (1 if allow else 0)


def robots_allowed(path: str, rules: Sequence[Rule]) -> bool:
    """RFC 9309 decision for one path (pure; the oracle's matcher —
    the DataFrame stage in :func:`mark_blocked` must agree with it)."""
    best = -1
    for allow, pattern in rules:
        if _is_plain(pattern):
            hit = path.startswith(pattern)
        else:
            hit = re.match(_rule_regex(pattern), path) is not None
        if hit:
            code = _precedence(allow, pattern)
            if code > best:
                best = code
    return best < 0 or best % 2 == 1


_RULE_T = T.StructType(
    [
        T.StructField("allow", T.BooleanType()),
        T.StructField("pattern", T.StringType()),
        T.StructField("plain", T.BooleanType()),
        T.StructField("rx", T.StringType()),
        T.StructField("plen", T.IntegerType()),
    ]
)
ROBOTS_T = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("rules", T.ArrayType(_RULE_T)),
    ]
)


def compile_rules(rules: Sequence[Rule]) -> list[dict]:
    """Precompile parsed rules into the ``ROBOTS_T`` element shape
    (fast-path flag, translated regex, precedence length) — done once
    per host at parse time so the per-URL stage does no compilation."""
    return [
        {
            "allow": allow,
            "pattern": pattern,
            "plain": _is_plain(pattern),
            "rx": _rule_regex(pattern),
            "plen": len(pattern),
        }
        for allow, pattern in rules
    ]


def fetch_robots_rules_df(
    spark: SparkSession,
    hosts: DataFrame,
    fetcher,
    host_col: str = "host",
    scheme_col: str | None = None,
) -> DataFrame:
    """Fetch+parse robots.txt for every distinct host via the crawl's
    fetch stage; returns a ``(host, rules: array<struct>)`` DataFrame
    holding only hosts with at least one rule.  Non-200/missing
    robots -> no row (no explicit rules = allow-all).

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
                    "rules": [
                        compile_rules(parse_robots(b)) if o else []
                        for b, o in zip(pdf["body"], ok)
                    ],
                }
            )

    return (
        fetched.select("host", "status", "body")
        .mapInPandas(parse, schema=ROBOTS_T)
        .where(F.size("rules") > 0)
    )


def _match_rule(path: Column, r: Column) -> Column:
    # Plain prefixes (the overwhelming majority of real rules) stay a
    # codegen'd startswith; wildcard/anchored rules fall to RLIKE with
    # the precompiled per-rule regex.
    return F.when(r["plain"], path.startswith(r["pattern"])).otherwise(
        F.regexp_like(path, r["rx"])
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
    broadcast join ``rules_df`` (``host, rules``) on ``host``, then a
    codegen'd filter+fold over the matching rules implementing RFC
    9309 longest-match (max of the precompiled precedence codes; the
    winning code's allow bit decides) over the crash-free
    :func:`mechaml_spark.page.path_col` path.  Hosts with no rules
    row pass.  Adds ``out_col: boolean``; drops nothing else.
    """
    from mechaml_spark.page import path_col

    path = F.col("_path")
    matched = F.filter("rules", lambda r: _match_rule(path, r))
    best = F.aggregate(
        matched,
        F.lit(-1),
        lambda acc, r: F.greatest(
            acc, r["plen"] * F.lit(2) + r["allow"].cast("int")
        ),
    )
    return (
        df.join(F.broadcast(rules_df), "host", "left")
        .withColumn("_path", path_col(F.col(url_col)))
        .withColumn(
            out_col,
            F.coalesce((best >= 0) & (F.pmod(best, F.lit(2)) == 0), F.lit(False)),
        )
        .drop("rules", "_path")
    )


def fetch_robots_rules(
    spark: SparkSession,
    hosts: DataFrame,
    fetcher,
    host_col: str = "host",
    scheme_col: str | None = None,
) -> dict[str, list[Rule]]:
    """Dict form of :func:`fetch_robots_rules_df` — for tests and the
    sequential oracle; the scheduler uses the DataFrame form."""
    rows = fetch_robots_rules_df(
        spark, hosts, fetcher, host_col=host_col, scheme_col=scheme_col
    ).collect()
    return {
        r["host"]: [(x["allow"], x["pattern"]) for x in r["rules"]]
        for r in rows
    }


# --------------------------------------------------------------- Crawl-delay
# Crawl-delay is not in RFC 9309, but every production crawler honors
# it; here it feeds the scheduler's per-host politeness BUDGET (the
# engine's delay mechanism): budget = clamp(epoch_seconds / delay).

def parse_crawl_delay(body: str | None) -> float | None:
    """``Crawl-delay`` seconds from the ``User-agent: *`` group(s),
    group-scoped exactly like :func:`parse_robots` scopes rules; the
    FIRST valid value in file order wins; non-numeric / non-positive
    values are ignored (treat like absent, the lenient convention)."""
    if not body:
        return None
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
            if key == "crawl-delay" and "*" in group_agents:
                try:
                    d = float(val)
                except ValueError:
                    continue
                if d > 0:
                    return d
    return None


def crawl_delay_budgets(
    bodies: DataFrame,
    epoch_seconds: float = 1.0,
    default_budget: int = 2,
    cap: int = 64,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Distributed robots-body -> per-host budget derivation for
    :func:`mechaml_spark.frontier.scheduler.politeness_split`:
    ``budget = clamp(floor(epoch_seconds / crawl_delay), 1, cap)``,
    ``default_budget`` when the body declares no usable delay.  One
    row per host rides the pipeline (same cardinality argument as the
    rules table); downstream it is a broadcast-join side."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            budgets = []
            for b in pdf[body_col]:
                d = parse_crawl_delay(b)
                if d is None:
                    budgets.append(default_budget)
                else:
                    budgets.append(max(1, min(cap, int(epoch_seconds / d))))
            yield pd.DataFrame(
                {"host": pdf[host_col], "budget": budgets}
            )

    return bodies.mapInPandas(run, schema="host string, budget int")
