"""BM25 relevance scoring over the documents table, Spark-first.

Training-data curation constantly runs retrieval-shaped scans: score
every crawled document against a query-term set (topic filtering,
quality-targeted sampling, dedup-cluster representative selection).
This module implements Okapi BM25 (Robertson & Zaragoza 2009, "The
Probabilistic Relevance Framework") as pure DataFrame algebra:

* document length — expression-only ``size(filter(split(...)))``, no
  explode, no Python;
* term frequencies — explode restricted to the (tiny, broadcast)
  query-term set BEFORE the shuffle, so the exchange carries
  ``(doc_id, term, tf)`` for matching terms only, never full token
  streams;
* document frequencies — a groupBy over that same small relation,
  broadcast back;
* corpus stats (N, total length) — a one-row aggregate crossJoined in.

Two idf modes share the plan:

* ``idf='ln'`` — the standard Lucene/ES formula
  ``ln(1 + (N - df + 0.5)/(df + 0.5))``, float scores (deployment
  mode, unit-tested against an independent per-row computation);
* ``idf='rational'`` — a log-free surrogate
  ``scale*(2(N-df)+1) // (2df+1)`` with the tf-saturation term
  evaluated in exact integer arithmetic (k1, b as small fractions,
  one pinned floor division) — bit-reproducible across partitionings
  and mirrored exactly by the DuckDB oracle, same discipline as
  :mod:`mechaml_spark.linkgraph`.  Ranking behavior matches BM25's
  shape (monotone-decreasing idf, tf saturation, length
  normalization); the absolute scores differ, documented.

Reference parity: the reference engine has no scoring operator; this
is engine-brief breadth for the documents pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25"]

_TOK_RE = r"\s+"


def _doclen(text_col: str):
    return F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), _TOK_RE),
            lambda x: x != "",
        )
    )


def bm25(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: tuple[int, int] = (6, 5),     # 1.2
    b: tuple[int, int] = (3, 4),      # 0.75
    idf: str = "ln",
    scale: int = 10**6,
) -> DataFrame:
    """Score every document containing at least one query term.

    Returns ``(id_col, score)`` (double, ``idf='ln'``) or
    ``(id_col, score_scaled)`` (long, ``idf='rational'``).  k1 and b
    are exact fractions ``(num, den)`` so the rational mode has no
    float anywhere.
    """
    if not terms:
        raise ValueError("empty query-term set")
    terms_l = sorted({t.lower() for t in terms})
    p, q = k1
    r, s = b

    base = docs.select(
        F.col(id_col), F.col(text_col), _doclen(text_col).alias("dl")
    ).where(F.col("dl") > 0)
    meta = base.agg(
        F.count("*").alias("n"), F.sum("dl").alias("tl")
    )
    tf = (
        base.select(
            id_col, "dl",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), _TOK_RE),
                    lambda x: x.isin(terms_l),
                )
            ).alias("term"),
        )
        .groupBy(id_col, "term", "dl")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    j = tf.join(F.broadcast(df_), "term").crossJoin(F.broadcast(meta))

    if idf == "ln":
        idf_c = F.log(
            1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        denom = (
            F.col("tf")
            + (p / q) * (1 - r / s + (r / s) * F.col("dl") * F.col("n")
                         / F.col("tl"))
        )
        term_score = idf_c * F.col("tf") * (1 + p / q) / denom
        return (
            j.select(id_col, term_score.alias("ts"))
            .groupBy(id_col)
            .agg(F.sum("ts").alias("score"))
        )
    if idf != "rational":
        raise ValueError(idf)
    # exact integer arithmetic, one pinned floor division per term:
    #   idf_i = scale*(2(N-df)+1) div (2df+1)
    #   ts    = idf_i * tf*(p+q)*s*TL
    #           div (tf*q*s*TL + p*(s-r)*TL + p*r*dl*N)
    ts = F.expr(
        f"(({scale} * (2 * (n - df) + 1)) div (2 * df + 1))"
        f" * (tf * {(p + q) * s} * tl)"
        f" div (tf * {q * s} * tl + {p * (s - r)} * tl"
        f" + {p * r} * dl * n)"
    )
    return (
        j.select(id_col, ts.alias("ts"))
        .groupBy(id_col)
        .agg(F.sum("ts").alias("score_scaled"))
    )


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    *,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    hybrid-retrieval combiner: each input list contributes
    ``1/(k + rank)`` per document and the fused ranking is the sum,
    which is how lexical (BM25) and dense (embedding) scores are
    merged without calibrating their incomparable scales.

    Ranks are per-query windows with the PINNED tie rule (score
    desc, then doc asc) so fusion is deterministic; documents present
    in only one list contribute only that list's term (full-outer
    join).  Returns the top ``top_n`` per query with ``rrf_micro``
    (fused score ×10^6 floored to a long — exact cross-engine
    comparison without float-hash drift).

    Scale posture: every window partitions by ``query_col`` (never a
    global sort); shuffles carry (query, doc, rank) triples, not
    text or vectors.
    """
    from pyspark.sql import Window

    def ranked(df: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy(query_col).orderBy(
            F.col(score_col).desc(), F.col(doc_col)
        )
        return df.select(
            query_col, doc_col, F.row_number().over(w).alias(out)
        )

    ra, rb = ranked(a, "r1"), ranked(b, "r2")
    fused = ra.join(rb, [query_col, doc_col], "full_outer").select(
        query_col,
        doc_col,
        "r1",
        "r2",
        (
            F.coalesce(1.0 / (F.lit(k) + F.col("r1")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k) + F.col("r2")), F.lit(0.0))
        ).alias("_rrf"),
    )
    wtop = Window.partitionBy(query_col).orderBy(
        F.col("_rrf").desc(), F.col(doc_col)
    )
    return (
        fused.withColumn("pos", F.row_number().over(wtop))
        .where(F.col("pos") <= top_n)
        .select(
            query_col, "pos", doc_col, "r1", "r2",
            F.floor(F.col("_rrf") * 1000000).cast("long")
            .alias("rrf_micro"),
        )
    )
