"""Char-trigram LM scoring (charlm.py): discrimination + exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from mechaml_spark import charlm


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_in_model_text_beats_gibberish(spark):
    ref = _df(
        spark,
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)],
    )
    model = charlm.train_char_lm(ref)
    scored = charlm.score_docs(
        _df(
            spark,
            [
                (0, "the quick brown fox"),     # pure in-model
                (1, "xqzj vkwp zzqx jjvv"),     # out-of-model gibberish
            ],
        ),
        model,
    )
    got = {r["doc_id"]: r["score"] for r in scored.collect()}
    assert got[0] > 0 and got[1] == 0


def test_normalization_is_pinned(spark):
    # case, digits, punctuation all collapse before trigram counting:
    # same normalized stream => identical model.
    a = charlm.train_char_lm(_df(spark, [(0, "The  Cat!! 99 sat")]))
    b = charlm.train_char_lm(_df(spark, [(0, "the cat sat")]))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_short_docs_dropped(spark):
    model = charlm.train_char_lm(_df(spark, [(0, "abcabc")]))
    scored = charlm.score_docs(
        _df(spark, [(0, "ab"), (1, "abc")]), model
    )
    assert [r["doc_id"] for r in scored.collect()] == [1]


def test_score_is_mean_familiarity(spark):
    # tiny corpus: total trigrams < 10^6, so the pre-divided
    # denominator is 1 and familiarity = raw reference count.
    model = charlm.train_char_lm(_df(spark, [(0, "aaaa")]))  # aaa x2
    r = charlm.score_docs(_df(spark, [(1, "aaab")]), model).collect()[0]
    # trigrams: aaa (cnt 2), aab (cnt 0) -> mean = (2 + 0) div 2 = 1
    assert (r["n_tri"], r["score"]) == (2, 1)
