"""BPE tokenizer training, the distributed half (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

BPE training alternates two very differently-sized steps:

  1. **corpus statistics** — word frequencies and adjacent symbol-pair
     counts.  This is the step that touches all 100 TB, and it is
     pure relational algebra: normalize -> explode words -> one
     partial-aggregated groupBy(word) -> explode pairs weighted by
     word frequency -> one partial-aggregated groupBy(pair).  After
     the first groupBy the data is the WORD-FREQUENCY table
     (|vocab| rows, millions not billions) — every later merge
     iteration runs on that compact table, never the corpus again.
  2. **merge selection/application** — argmax over ~10^5 pair rows,
     re-segment the word table.  Driver-scale work by construction.

This module implements step 1 (plus the ranked merge-candidate
output) Spark-first.  Symbols at iteration 0 are single characters
with the conventional ``</w>`` end-of-word marker, so pairs are
2-char substrings plus one ``(last_char, </w>)`` pair per word —
expression-only ``substr``/``sequence`` arithmetic, no per-char
explode, no Python.  Pair keys use ``+`` between symbols (pinned,
engine-portable).

Shuffle discipline at scale: both groupBys partial-aggregate
map-side, so the word shuffle is bounded by per-task distinct words
and the pair shuffle by per-task distinct pairs (~alphabet^2), NOT by
corpus tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mechaml_spark.charlm import normalize_col

EOW = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the pinned-normalized corpus ([a-z] words)."""
    words = df.select(
        F.explode(
            F.filter(
                F.split(normalize_col(F.col(text_col)), " "),
                lambda w: w != "",
            )
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _pairs_col(word: Column) -> Column:
    """Array of iteration-0 BPE pair keys for one word:
    ``c_i + c_{i+1}`` for each adjacent char pair, then
    ``c_last + </w>``."""
    inner = F.when(
        F.length(word) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(word) - 1),
            lambda i: F.concat(
                word.substr(i, F.lit(1)),
                F.lit("+"),
                word.substr(i + 1, F.lit(1)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    last = F.array(
        F.concat(word.substr(F.length(word), F.lit(1)), F.lit("+" + EOW))
    )
    return F.concat(inner, last)


def pair_counts(freqs: DataFrame) -> DataFrame:
    """(pair, cnt): adjacent-symbol counts weighted by word frequency
    — the statistics a BPE merge iteration ranks.  One partial-agg
    groupBy over the compact word table."""
    pairs = freqs.select(
        "freq", F.explode(_pairs_col(F.col("word"))).alias("pair")
    )
    return pairs.groupBy("pair").agg(F.sum("freq").alias("cnt"))


def top_merge_candidates(pc: DataFrame, k: int = 20) -> DataFrame:
    """The k best merge candidates, ranked by (cnt desc, pair asc) —
    the tie-break is pinned so the selected merge can never differ
    between runs or engines.  The global window is a deliberate
    single-partition sort: its input is the PAIR table (bounded by
    ~|alphabet|^2 at iteration 0, by |vocab| later), never corpus-
    sized — the same justification as the one-row aggregates in
    linkgraph."""
    w = F.row_number().over(
        Window.orderBy(F.col("cnt").desc(), F.col("pair"))
    )
    return (
        pc.withColumn("rnk", w.cast("long"))
        .where(F.col("rnk") <= k)
        .select("rnk", "pair", "cnt")
    )


def encode_tokens(
    word: Column, merges: list[tuple[str, str]]
) -> Column:
    """Apply a trained merge list to one word and return its BPE
    symbol array.

    The word becomes the spaced symbol string ``c1 c2 ... cn </w>``;
    each merge ``("t h", "th")`` is ONE string replace.

    Symbol-boundary correctness: every symbol carries a LEADING
    space (`` l o w </w>``), and a merge rewrites `` t h`` ->
    `` th``.  The leading separator makes cross-symbol false matches
    impossible (`` th e`` cannot match pair ``h e`` — the ``h`` is
    not space-preceded) and keeps adjacency chains intact
    (`` a a a a`` -> `` aa aa``, the simultaneous left-to-right
    merge of the reference BPE encoder, Sennrich et al. 2016).  The
    whole encode is a chain of ``replace`` expressions: pure
    codegen, no Python, and mirrorable verbatim by a SQL oracle.
    The merge list is tiny (trained via iterated
    :func:`top_merge_candidates`) and compiles into the plan."""
    spaced = F.concat(
        F.regexp_replace(word, "(.)", " $1"), F.lit(" " + EOW)
    )
    for pair, joined in merges:
        a, b = pair.split(" ")
        spaced = F.replace(
            spaced, F.lit(f" {a} {b}"), F.lit(f" {joined}")
        )
    return F.split(F.ltrim(spaced), " ")
