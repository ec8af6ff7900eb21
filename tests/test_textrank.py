"""TextRank keyword scores (queries.textrank_scores): hand-computed
integer fixed-point power iteration on tiny graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mechaml_spark.queries import textrank_scores


def _scores(spark, docs, iters=3):
    df = spark.createDataFrame(docs, "doc_id long, ws array<string>")
    rows = textrank_scores(df, iters=iters).collect()
    out = {}
    for r in rows:
        out.setdefault(r["doc_id"], {})[r["w"]] = r["s"]
    return out


def test_triangle_is_stationary(spark):
    # spark-table-join triangle: every node degree 2, perfectly
    # symmetric, so 1M is a fixed point of the update.
    got = _scores(spark, [(1, ["spark", "table", "spark", "join", "table"])])
    assert got == {1: {"spark": 1_000_000, "table": 1_000_000,
                       "join": 1_000_000}}


def test_star_hand_computed(spark):
    # alpha-beta, alpha-gamma star.  By hand (floor division):
    #   iter1: alpha 150000+850000*2000000//1M = 1850000
    #          beta=gamma 150000+850000*(1000000//2)//1M = 575000
    #   iter2: alpha 150000+850000*1150000//1M  = 1127500
    #          beta=gamma 150000+850000*925000//1M = 936250
    #   iter3: alpha 150000+850000*1872500//1M  = 1741625
    #          beta=gamma 150000+850000*563750//1M = 629187 (floor .5)
    got = _scores(spark, [(7, ["alpha", "beta", "alpha", "gamma"])])
    assert got == {7: {"alpha": 1_741_625, "beta": 629_187,
                       "gamma": 629_187}}


def test_self_loops_and_short_docs_drop(spark):
    # "aaa aaa" is a self-loop only -> no edges -> doc emits nothing;
    # a 1-token doc likewise.
    got = _scores(spark, [(1, ["aaa", "aaa"]), (2, ["solo"])])
    assert got == {}


def test_duplicate_edges_count_once(spark):
    # The bigram (foo, bar) appears 3 times but the graph is the
    # DISTINCT edge set: identical to seeing it once.
    once = _scores(spark, [(1, ["foo", "bar"])])
    thrice = _scores(spark, [(1, ["foo", "bar", "foo", "bar"])])
    assert once[1] == thrice[1]


def test_docs_do_not_mix(spark):
    # Same vocabulary in two docs with different shapes: per-doc
    # graphs stay independent.
    got = _scores(
        spark,
        [
            (1, ["alpha", "beta", "alpha", "gamma"]),
            (2, ["alpha", "beta"]),
        ],
    )
    assert got[1]["alpha"] == 1_741_625
    # doc 2 is a symmetric pair: stationary at 1M.
    assert got[2] == {"alpha": 1_000_000, "beta": 1_000_000}
