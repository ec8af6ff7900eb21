"""Public-suffix / registered-domain (eTLD+1) extraction — the
publicsuffix.org algorithm as a broadcast-join Spark stage.

Hosts are NOT the right politeness / ownership key at web scale:
``a.blogspot.com`` and ``b.blogspot.com`` are different sites while
``www.bbc.co.uk`` and ``news.bbc.co.uk`` are the same one.  Crawl
frontiers, ownership dedup, and blocklists all key on the REGISTERED
domain = public suffix + one label.  This module implements the PSL
matching rules (publicsuffix.org/list/ algorithm):

  * a normal rule matches right-aligned label-for-label;
  * a wildcard rule ``*.ck`` additionally consumes exactly one more
    host label in the star position;
  * an exception rule ``!www.ck`` beats every other match and its
    public suffix is the rule minus its leftmost label;
  * otherwise longest match (most labels) wins; no match at all
    falls back to the implicit default rule ``*`` (the bare TLD).

Scale posture: the rule table (~9k rows for the full PSL; a pinned
subset here — swap in the full list the same way) is BROADCAST; each
host explodes into at most ``MAX_LABELS`` right-aligned suffixes,
joins the rules hash-side, and one partial-aggregating groupBy per
input row picks the winning rule.  The shuffle carries (row-key,
candidate-rule) pairs — a few dozen bytes per URL, never bodies.

The reference engine has no URL-ownership layer; this extends the
frontier surface the way urlkit.canonicalize does (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Pinned PSL subset (publicsuffix.org syntax): enough to cover the
# shapes the tests/queries exercise — normal TLDs, multi-label rules,
# a private-domain rule, and the wildcard/exception pair.
PSL_RULES = [
    "com",
    "org",
    "net",
    "io",
    "test",
    "uk",
    "co.uk",
    "ac.uk",
    "github.io",
    "*.ck",
    "!www.ck",
]

MAX_LABELS = 8  # bound the suffix explode; hosts deeper than this
                # are spider-trap shaped and get the rightmost 8.


def rule_rows(rules: list[str] | None = None) -> list[tuple[str, int, int]]:
    """PSL text rules -> (join_key, extra_labels, is_exception).

    * normal ``co.uk``   -> ("co.uk", 0, 0)
    * wildcard ``*.ck``  -> ("ck", 1, 0)   — key is the part after
      the star; the star consumes one extra host label;
    * exception ``!www.ck`` -> ("www.ck", -1, 1) — public suffix is
      the rule minus its leftmost label.
    """
    out = []
    for r in rules if rules is not None else PSL_RULES:
        if r.startswith("!"):
            out.append((r[1:], -1, 1))
        elif r.startswith("*."):
            out.append((r[2:], 1, 0))
        else:
            out.append((r, 0, 0))
    return out


def rule_table(spark: SparkSession, rules: list[str] | None = None) -> DataFrame:
    return spark.createDataFrame(
        rule_rows(rules), "key string, extra int, is_exc int"
    )


def registered_domain(
    df: DataFrame,
    host_col: str,
    key_col: str,
    rules_df: DataFrame,
) -> DataFrame:
    """Append ``public_suffix`` and ``registered_domain`` (NULL when
    the host IS a bare public suffix) to ``df``.

    ``key_col`` must be a unique row key (the groupBy key that picks
    each row's winning rule).  ``rules_df`` comes from
    :func:`rule_table` and is broadcast.
    """
    host = F.lower(F.col(host_col))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # right-aligned suffixes: position i (1-based label index where
    # the suffix starts), bounded to the rightmost MAX_LABELS labels.
    start_min = F.greatest(F.lit(1), n - F.lit(MAX_LABELS) + 1)
    cand = df.select(
        key_col,
        host.alias("_host"),
        labels.alias("_labels"),
        n.alias("_n"),
        F.explode(F.sequence(start_min, n)).alias("_i"),
    ).select(
        key_col,
        "_host",
        "_labels",
        "_n",
        "_i",
        F.array_join(
            F.slice("_labels", F.col("_i"), F.col("_n") - F.col("_i") + 1),
            ".",
        ).alias("_suffix"),
    )
    j = cand.join(
        F.broadcast(rules_df), cand["_suffix"] == rules_df["key"], "left"
    )
    # candidate public-suffix label count; wildcard needs a host
    # label in the star position (i > 1), exception drops one label.
    ps_labels = F.col("_n") - F.col("_i") + 1 + F.col("extra")
    valid = F.col("key").isNotNull() & (
        (F.col("extra") != 1) | (F.col("_i") > 1)
    )
    scored = j.select(
        key_col,
        "_host",
        "_labels",
        "_n",
        F.when(
            valid, F.struct(F.col("is_exc"), ps_labels.alias("ps"))
        ).alias("_cand"),
    )
    best = scored.groupBy(key_col, "_host", "_labels", "_n").agg(
        F.max("_cand").alias("_best")
    )
    # exception beats all (is_exc sorts first in the struct max);
    # otherwise the longest match; no match -> default rule "*".
    ps = F.coalesce(F.col("_best")["ps"], F.lit(1))
    suffix = F.array_join(
        F.slice("_labels", F.col("_n") - ps + 1, ps), "."
    )
    reg = F.when(
        F.col("_n") >= ps + 1,
        F.array_join(F.slice("_labels", F.col("_n") - ps, ps + 1), "."),
    )
    out = best.select(
        key_col,
        suffix.alias("public_suffix"),
        reg.alias("registered_domain"),
    )
    return df.join(out, key_col)
