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
