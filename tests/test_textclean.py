"""C4-style cleaning rules (textclean.py): every rule on its own row."""

from __future__ import annotations

from mechaml_spark import textclean


def _clean(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return textclean.c4_clean(df).collect()[0]


def test_line_rules(spark):
    r = _clean(
        spark,
        "one good line with enough words.\n"
        "short one.\n"                       # < 5 words
        "no terminal punctuation here at all\n"  # no terminal punct
        "please enable javascript to continue now.\n"  # javascript
        "a second good line ends here!\n"
        'a third "quoted" line survives too."',
    )
    assert r.n_lines == 6
    assert r.n_kept == 3
    assert r.keep_doc
    assert r.cleaned_text.count("\n") == 2


def test_doc_rules(spark):
    # lorem ipsum: line itself passes the line rules, doc still drops.
    r = _clean(
        spark,
        "one good line with enough words.\n"
        "a second good line ends here!\n"
        "Lorem ipsum dolor sit amet today.",
    )
    assert r.n_kept == 3 and not r.keep_doc and r.cleaned_text is None
    # curly brace anywhere drops the doc.
    r = _clean(
        spark,
        "one good line with enough words.\n"
        "a second good line ends here!\n"
        "a third good line ends here too. {",
    )
    assert not r.keep_doc
    # fewer than 3 surviving lines drops the doc.
    r = _clean(
        spark,
        "one good line with enough words.\na second good line ends here!",
    )
    assert r.n_kept == 2 and not r.keep_doc


def test_empty_lines_ignored(spark):
    r = _clean(
        spark,
        "one good line with enough words.\n\n   \n"
        "a second good line ends here!\n"
        "a third good line ends here too.",
    )
    assert r.n_lines == 3 and r.n_kept == 3 and r.keep_doc


# ------------------------------------------------------- sentence split

def _sents(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return [
        r["sentence"]
        for r in textclean.sentences(df, "doc_id")
        .orderBy("sid")
        .collect()
    ]


def test_sentence_boundaries(spark):
    got = _sents(
        spark,
        'One ends here. Two follows! Three asks? "Four quoted." Five.',
    )
    assert got == [
        "One ends here.",
        "Two follows!",
        "Three asks?",
        '"Four quoted."',
        "Five.",
    ]


def test_abbreviation_and_decimal_guards(spark):
    got = _sents(
        spark,
        "Dr. Who met Mr. Smith at St. Ives. Pi is 3.14 exactly. "
        "Costs rose vs. Last year.",
    )
    assert got == [
        "Dr. Who met Mr. Smith at St. Ives.",
        "Pi is 3.14 exactly.",
        # vs. guard holds even before a capital
        "Costs rose vs. Last year.",
    ]


def test_lowercase_continuation_not_split(spark):
    # ellipsis-style or lowercase continuation stays in one sentence
    got = _sents(spark, "It went on. and on. Then stopped.")
    assert got == ["It went on. and on.", "Then stopped."]


# ------------------------------------------------------- unicode normalize

def test_normalize_unicode(spark):
    rows = [
        (0, "Aéb"),            # decomposed -> precomposed
        (1, "z​w­x\x07"),  # ZWSP, soft hyphen, BEL stripped
        (2, "a\r\nb\rc"),            # CRLF -> LF, bare CR kept
        (3, None),
        (4, "keep \t tab \n newline"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["norm_text"]
        for r in textclean.normalize_unicode(df).collect()
    }
    assert got[0] == "Aéb" and len(got[0]) == 3
    assert got[1] == "zwx"
    assert got[2] == "a\nb\rc"
    assert got[3] is None
    assert got[4] == "keep \t tab \n newline"


def test_normalize_unicode_is_pandas_udf_not_row_udf(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = (
        textclean.normalize_unicode(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan  # Arrow path, not row-at-a-time
