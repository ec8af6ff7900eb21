"""BPE corpus statistics (bpe.py): hand-checked tiny corpus."""

from __future__ import annotations

from mechaml_spark import bpe


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_freqs_normalized(spark):
    d = _docs(spark, ["The cat, the CAT!", "cat"])
    got = {r["word"]: r["freq"] for r in bpe.word_freqs(d).collect()}
    assert got == {"the": 2, "cat": 3}


def test_pair_counts_weighted(spark):
    # words: low x3, lot x1 -> pairs l+o:4, o+w:3, w+</w>:3, o+t:1,
    # t+</w>:1
    d = _docs(spark, ["low low lot", "low"])
    pc = {
        r["pair"]: r["cnt"]
        for r in bpe.pair_counts(bpe.word_freqs(d)).collect()
    }
    assert pc == {
        "l+o": 4, "o+w": 3, "w+</w>": 3, "o+t": 1, "t+</w>": 1
    }


def test_single_char_word_has_only_eow_pair(spark):
    d = _docs(spark, ["a a b"])
    pc = {
        r["pair"]: r["cnt"]
        for r in bpe.pair_counts(bpe.word_freqs(d)).collect()
    }
    assert pc == {"a+</w>": 2, "b+</w>": 1}


def test_top_candidates_pinned_tiebreak(spark):
    d = _docs(spark, ["low low lot", "low"])
    top = bpe.top_merge_candidates(
        bpe.pair_counts(bpe.word_freqs(d)), k=3
    ).collect()
    assert [(r["rnk"], r["pair"], r["cnt"]) for r in top] == [
        (1, "l+o", 4),
        (2, "o+w", 3),   # ties (cnt 3) break lexicographically:
        (3, "w+</w>", 3),  # 'o+w' < 'w+</w>'
    ]


def test_encode_tokens_boundary_semantics(spark):
    from pyspark.sql import functions as F

    merges = [("t h", "th"), ("h e", "he"), ("a a", "aa")]
    df = spark.createDataFrame(
        [("the",), ("he",), ("other",), ("aaaa",), ("aaa",)],
        "word string",
    )
    got = {
        r["word"]: r["toks"]
        for r in df.select(
            "word", bpe.encode_tokens(F.col("word"), merges).alias("toks")
        ).collect()
    }
    # 'the': t+h merges first; then 'h e' must NOT fire across the
    # new 'th' symbol boundary (the h is inside 'th')
    assert got["the"] == ["th", "e", "</w>"]
    assert got["other"] == ["o", "th", "e", "r", "</w>"]
    # ...but a real standalone h+e pair does merge
    assert got["he"] == ["he", "</w>"]
    # adjacency chain: simultaneous left-to-right merge
    assert got["aaaa"] == ["aa", "aa", "</w>"]
    assert got["aaa"] == ["aa", "a", "</w>"]
