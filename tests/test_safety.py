"""safety.py — PII scrub, blocklist gate, benchmark decontamination,
and metadata.canonical_urls."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mechaml_spark import safety


def _texts(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)]
    )


# ----------------------------------------------------------------- PII

def test_pii_counts_and_redaction(spark):
    df = _texts(spark, [
        "mail bob.smith+x@sub.example.co.uk and carol@ex.org now",
        "call +1 415 555 0100 or +44 201-794-0958 soon",
        "hosts 10.0.0.1 and 255.255.255.255 and 999.1.1.1",
        "clean text with no identifiers at all",
    ])
    ne, np, ni = safety.pii_counts(F.col("text"))
    got = df.select(
        "doc_id", ne.alias("e"), np.alias("p"), ni.alias("i"),
        safety.redact(F.col("text")).alias("red"),
    ).collect()
    by = {r["doc_id"]: r for r in got}
    assert (by[0]["e"], by[0]["p"], by[0]["i"]) == (2, 0, 0)
    assert by[0]["red"] == "mail <EMAIL> and <EMAIL> now"
    assert (by[1]["e"], by[1]["p"], by[1]["i"]) == (0, 2, 0)
    assert by[1]["red"] == "call <PHONE> or <PHONE> soon"
    # 999.1.1.1 is not a valid IPv4 — but its `99.1.1.1` suffix has no
    # word boundary before it either, so nothing matches.
    assert (by[2]["e"], by[2]["p"], by[2]["i"]) == (0, 0, 2)
    assert by[2]["red"] == "hosts <IP> and <IP> and 999.1.1.1"
    assert (by[3]["e"], by[3]["p"], by[3]["i"]) == (0, 0, 0)
    assert by[3]["red"] == "clean text with no identifiers at all"


def test_pii_patterns_are_re2_safe():
    # The DuckDB oracle runs these byte-identical strings under RE2:
    # no lookaround, no backreferences allowed.
    for pat, _ in safety.REDACTIONS:
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
        assert not re.search(r"\\[1-9]", pat)
        re.compile(pat)  # valid Java-ish syntax per Python's engine


def test_redaction_order_email_before_phone_before_ip():
    assert [r for _, r in safety.REDACTIONS] == [
        "<EMAIL>", "<PHONE>", "<IP>"
    ]


# ------------------------------------------------------------- blocklist

def test_apply_blocklist_gates_host_and_terms(spark):
    docs = spark.createDataFrame([
        Row(doc_id=0, host="bad.example", text="fine words here"),
        Row(doc_id=1, host="ok.example", text="casino viagra casino"),
        Row(doc_id=2, host="ok.example",
            text=" ".join(["w"] * 100) + " casino"),
        Row(doc_id=3, host="ok.example", text="all clean tokens"),
    ])
    bl = spark.createDataFrame([Row(host="bad.example", banned=True)])
    got = {r["doc_id"]: r for r in safety.apply_blocklist(
        docs, bl, max_permille=30).collect()}
    assert got[0]["host_banned"] and not got[0]["kept"]
    assert got[1]["n_bad"] == 3 and got[1]["bad_permille"] == 1000
    assert not got[1]["kept"]
    assert got[2]["n_bad"] == 1 and got[2]["bad_permille"] == 9
    assert got[2]["kept"]
    assert got[3]["n_bad"] == 0 and got[3]["kept"]


# --------------------------------------------------------- decontamination

def test_token_ngrams_short_text_is_empty(spark):
    df = _texts(spark, ["a b c", ""])
    got = df.select(
        safety.token_ngrams(F.col("text"), 4).alias("g")
    ).collect()
    assert got[0]["g"] == [] and got[1]["g"] == []


def test_token_ngrams_windows(spark):
    df = _texts(spark, ["a b c d e"])
    got = df.select(
        safety.token_ngrams(F.col("text"), 3).alias("g")
    ).collect()
    assert got[0]["g"] == ["a b c", "b c d", "c d e"]


def test_contamination_hits_counts_distinct_shared_grams(spark):
    bench = _texts(spark, ["s1 s2 s3 s4 s5 s6"])
    docs = _texts(spark, [
        "x y s1 s2 s3 s4 s5 s6 z",   # full item embedded: 3 grams of 4
        "s1 s2 s3 s4 tail",          # prefix only: 1 gram
        "totally unrelated text here w1 w2",
    ])
    got = {r["doc_id"]: r["n_hits"] for r in
           safety.contamination_hits(docs, bench, n=4).collect()}
    assert got == {0: 3, 1: 1}


def test_contamination_repeated_gram_counts_once(spark):
    bench = _texts(spark, ["k1 k2 k3"])
    docs = _texts(spark, ["k1 k2 k3 pad k1 k2 k3"])
    got = safety.contamination_hits(docs, bench, n=3).collect()
    assert len(got) == 1 and got[0]["n_hits"] == 1
    assert got[0]["contaminated"] is True


# ------------------------------------------------------------ canonical

def test_canonical_urls_resolution(spark):
    from mechaml_spark import metadata as md

    pages = spark.createDataFrame([
        Row(url="http://a.test/p1?utm=x",
            body='<head><link rel="canonical" href="http://a.test/c"></head>'),
        Row(url="http://a.test/sub/p2",
            body="<head><link href='/c' rel='canonical'></head>"),
        Row(url="http://B.test/p3", body="<head></head>"),
        Row(url="http://a.test/p4",
            body='<head><link rel="canonical" href=""></head>'),
    ])
    got = {r["url"]: r for r in md.canonical_urls(pages).collect()}
    assert got["http://a.test/p1?utm=x"]["canonical"] == "http://a.test/c"
    assert got["http://a.test/p1?utm=x"]["has_tag"]
    # relative href resolves against the page URL
    assert got["http://a.test/sub/p2"]["canonical"] == "http://a.test/c"
    # no tag -> canonicalized self (host lowercased)
    assert got["http://B.test/p3"]["canonical"] == "http://b.test/p3"
    assert not got["http://B.test/p3"]["has_tag"]
    # empty href counts as absent
    assert got["http://a.test/p4"]["canonical"] == "http://a.test/p4"
    assert not got["http://a.test/p4"]["has_tag"]
