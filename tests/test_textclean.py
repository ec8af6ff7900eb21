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
