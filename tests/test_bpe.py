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
