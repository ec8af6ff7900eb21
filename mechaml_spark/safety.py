"""Safety / compliance gates for training-data pipelines.

Three operator families a 100-TB corpus build runs between crawl and
training, all designed to execute inside the scan stage:

* **PII detection + redaction** — email / phone / IPv4 patterns as
  pure JVM regex expressions (whole-stage codegen, zero Python).
  The pattern set is deliberately restricted to the Java-regex ∩ RE2
  common subset (no lookaround, no backreferences) so the DuckDB
  oracle runs the *identical* patterns; redaction applies in a fixed
  documented order (email → phone → IP) because replacement output
  depends on it.

* **Blocklist gating** — a (host, banned) table broadcast-joined
  against the corpus (UT1-style domain lists are ≤10^6 rows — always
  the small side) plus a term-frequency gate computed as an
  expression.  At scale the blocklist join is a broadcast hash join
  under the scan; nothing shuffles.

* **Benchmark decontamination** (GPT-3 App. C / The Pile style) —
  flag training documents sharing any N-token gram with an
  evaluation benchmark.  Benchmark grams are the tiny side
  (millions of grams — broadcast, or a bloom pre-filter at the
  extreme); the corpus side explodes grams map-side and equi-joins,
  so the shuffle carries only (doc, matched-gram) hits, never text.

Reference scope: the reference engine (yannham/mechaml) stops at page
parsing; these are engine-brief training-pipeline operators layered
on the same tables (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# PII patterns — Java-regex ∩ RE2 subset ONLY (the DuckDB oracle runs
# these byte-identical strings; adding lookaround would break it).
# --------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3}[ -][0-9]{4}\b"
IPV4_RE = (
    r"\b(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b"
)

#: (pattern, replacement) in application order.  Email first (may
#: contain digit runs a later pattern would nibble), then phone,
#: then bare IPs.  Both engines apply the same order.
REDACTIONS = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
)


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def pii_counts(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) as long columns — codegen only."""
    return (
        _count(col, EMAIL_RE).cast("long"),
        _count(col, PHONE_RE).cast("long"),
        _count(col, IPV4_RE).cast("long"),
    )


def redact(col: Column) -> Column:
    """Text with every PII match replaced, in ``REDACTIONS`` order."""
    out = col
    for pat, repl in REDACTIONS:
        out = F.regexp_replace(out, pat, repl)
    return out


# --------------------------------------------------------------------------
# Blocklist gating
# --------------------------------------------------------------------------

BADWORD_RE = r"\b(?:casino|viagra|xxx)\b"


def apply_blocklist(
    docs: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    max_permille: int = 30,
) -> DataFrame:
    """Gate ``docs`` on a broadcast (host, banned) table + term ratio.

    ``blocklist`` must have columns (host, banned:boolean); it is the
    small side by construction (domain lists are ≤10^6 rows) and is
    broadcast so the corpus never shuffles.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n_bad = _count(F.lower(F.col(text_col)), BADWORD_RE).cast("long")
    n_tok = F.greatest(F.size(toks).cast("long"), F.lit(1))
    joined = docs.join(F.broadcast(blocklist), host_col, "left")
    return (
        joined.withColumn("host_banned", F.coalesce("banned", F.lit(False)))
        .withColumn("n_bad", n_bad)
        .withColumn(
            "bad_permille",
            ((n_bad * 1000 - F.pmod(n_bad * 1000, n_tok)) / n_tok)
            .cast("long"),
        )
        .withColumn(
            "kept",
            (~F.col("host_banned")) & (F.col("bad_permille") < max_permille),
        )
        .drop("banned")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

def token_ngrams(col: Column, n: int) -> Column:
    """Array of space-joined ``n``-token grams of ``col`` (whitespace
    tokenization; empty array when the text has fewer than ``n``
    tokens).  Expression-only — the gram explosion happens map-side
    under codegen."""
    toks = F.filter(F.split(col, r"\s+"), lambda t: t != "")
    starts = F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    doc_text: str = "text",
    bench_text: str = "text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Per-document count of distinct ``n``-grams shared with the
    benchmark corpus (docs with zero hits are absent).

    Plan shape at 100 TB: benchmark grams (small side — a benchmark
    suite is ≤10^7 grams) are distinct'd and **broadcast**; the
    corpus side explodes its grams map-side and hash-joins, so the
    shuffle after the join carries only (doc_id, gram) HITS.  When
    the benchmark outgrows broadcast, the documented upgrade is a
    bloom pre-filter on gram hash before an equi-join — same
    top-level shape.
    """
    bg = (
        benchmark.select(
            F.explode(token_ngrams(F.col(bench_text), n)).alias("gram")
        )
        .distinct()
    )
    dg = docs.select(
        F.col(doc_id),
        F.explode(token_ngrams(F.col(doc_text), n)).alias("gram"),
    )
    return (
        dg.join(F.broadcast(bg), "gram")
        .groupBy(doc_id)
        .agg(F.countDistinct("gram").alias("n_hits"))
        .withColumn("contaminated", F.lit(True))
    )
