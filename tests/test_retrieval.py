"""BM25: ln mode vs an independent per-row computation; rational mode
bit-reproducibility and formula pinning."""

import math

from mechaml_spark.retrieval import bm25

DOCS = [
    (0, "spark shuffles data across the cluster and spark broadcasts"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "data pipelines clean data dedupe data and score data"),
    (3, "unrelated text with none of the query words at all -- almost"),
    (4, "spark spark spark spark spark spark spark spark spark spark"),
]
TERMS = ["spark", "data"]


def _reference_scores(k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in DOCS}
    dl = {i: len(t) for i, t in toks.items()}
    n = len(DOCS)
    avg = sum(dl.values()) / n
    out = {}
    for term in TERMS:
        df = sum(1 for t in toks.values() if term in t)
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, t in toks.items():
            tf = t.count(term)
            if not tf:
                continue
            ts = idf * tf * (1 + k1) / (tf + k1 * (1 - b + b * dl[i] / avg))
            out[i] = out.get(i, 0.0) + ts
    return out


def test_bm25_ln_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25(df, TERMS).collect()}
    want = _reference_scores()
    assert set(got) == set(want) == {0, 2, 4}
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9
    # tf saturation: ten-fold "spark" repetition must NOT score 10x
    assert got[4] < 3 * got[0]


def test_bm25_rational_bit_reproducible(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {r["doc_id"]: r["score_scaled"]
         for r in bm25(df.repartition(7), TERMS, idf="rational").collect()}
    c = {r["doc_id"]: r["score_scaled"]
         for r in bm25(df.repartition(2), TERMS, idf="rational").collect()}
    assert a == c and set(a) == {0, 2, 4}
    # same ORDERING as the ln mode on this corpus
    ln = {r["doc_id"]: r["score"]
          for r in bm25(df, TERMS).collect()}
    assert sorted(a, key=a.get) == sorted(ln, key=ln.get)


def test_bm25_rational_hand_computed(spark):
    # one doc, one term, trivially checkable integers:
    # N=1, TL=dl=4, tf=2, df=1 -> idf = 10^6 * (2*0+1) // 3 = 333333
    # ts = 333333 * (2*44*4) // (2*20*4 + 6*4 + 18*4*1) = 333333*352//256
    df = spark.createDataFrame(
        [(0, "a b a c")], "doc_id long, text string"
    )
    [row] = bm25(df, ["a"], idf="rational").collect()
    assert row["score_scaled"] == 333333 * 352 // 256


def test_bm25_case_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, "SPARK Spark spark"), (1, ""), (2, "   ")],
        "doc_id long, text string",
    )
    got = bm25(df, ["Spark"]).collect()
    assert [r["doc_id"] for r in got] == [0]
