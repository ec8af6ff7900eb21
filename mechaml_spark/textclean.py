"""C4-style corpus cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", §2.2) — the standard first-pass text
filter a web-scale training corpus runs after boilerplate removal:

  line rules (a line survives iff ALL hold):
    * ends in a terminal punctuation mark (. ! ? or closing quote);
    * has at least ``min_words`` (5) whitespace words;
    * does not contain the word "javascript" (case-insensitive) —
      "please enable javascript" chrome;
  document rules (a document survives iff ALL hold):
    * at least ``min_lines`` (3) surviving lines ("fewer than 3
      sentences" in the paper, with C4's line≈sentence reading);
    * does not contain the phrase "lorem ipsum" (case-insensitive);
    * does not contain a curly brace "{" (code leakage).

Everything here is expression-only ``pyspark.sql.functions`` over
higher-order array lambdas: the whole cleaner is ONE WholeStageCodegen
project per document — no Python worker, no shuffle, and as a pure
per-row filter it pushes below downstream joins.  That is the property
that matters at 100 TB: C4 cleaning is the highest-row-count stage in
the pipeline (it sees every fetched page) and must cost one codegen'd
pass, never a Python round-trip.

The reference engine has no corpus layer; this extends the graft's
training-data surface (SURVEY.md §2.12) like quality_filter /
line_dedupe do.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C4's terminal punctuation set: period, exclamation, question,
# closing double quote (straight or curly).
TERMINAL_RE = '[.!?"”]$'
MIN_WORDS = 5
MIN_LINES = 3


def line_keep(line: Column, min_words: int = MIN_WORDS) -> Column:
    """Boolean Column: does one line survive C4's line rules."""
    words = F.filter(F.split(line, r"\s+"), lambda w: w != "")
    return (
        line.rlike(TERMINAL_RE)
        & (F.size(words) >= min_words)
        & ~F.lower(line).contains("javascript")
    )


def doc_keep(text: Column, n_kept: Column, min_lines: int = MIN_LINES) -> Column:
    """Boolean Column: does the document survive C4's doc rules,
    given its raw text and the count of surviving lines."""
    low = F.lower(text)
    return (
        (n_kept >= min_lines)
        & ~low.contains("lorem ipsum")
        & ~text.contains("{")
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = MIN_WORDS,
    min_lines: int = MIN_LINES,
) -> DataFrame:
    """Apply the C4 cleaning rules to ``df[text_col]``.

    Adds columns:
      * ``n_lines``    — non-empty input lines;
      * ``n_kept``     — lines surviving the line rules;
      * ``keep_doc``   — document survives the doc rules;
      * ``cleaned_text`` — surviving lines re-joined with ``\\n``
        (NULL when the document is dropped).

    Pure expression chain: split -> filter(lambda) -> size /
    array_join — one codegen project, zero shuffle.
    """
    text = F.col(text_col)
    lines = F.filter(F.split(text, r"\n"), lambda x: F.trim(x) != "")
    kept = F.filter(lines, lambda x: line_keep(x, min_words))
    n_kept = F.size(kept)
    keep = doc_keep(text, n_kept, min_lines)
    return df.select(
        "*",
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        keep.alias("keep_doc"),
        F.when(keep, F.array_join(kept, "\n")).alias("cleaned_text"),
    )


# ------------------------------------------------------- sentence split

# Boundary: terminal punctuation, whitespace, then an uppercase letter
# or an opening double quote.  Guards: a pinned abbreviation list
# (title abbreviations never end a sentence) — decimals like 3.14
# never split because the boundary requires whitespace.  Java regex
# (bounded lookbehind); the DuckDB oracles use closed-form expected
# text, since RE2 has no lookaround.
SENT_SPLIT_RE = (
    r"(?<!\b(?:Mr|Dr|St|vs)\.)(?<!\betc\.)"
    r'(?:(?<=[.!?])|(?<=[.!?]["”]))\s+(?=["A-Z])'
)


def split_sentences(text: Column) -> Column:
    """Array of sentences under the pinned rule set; whitespace-only
    pieces dropped.  Expression-only — the pre-tokenization pass
    quality filters (>=N sentences) and span tools key on."""
    return F.filter(
        F.split(text, SENT_SPLIT_RE), lambda s: F.trim(s) != ""
    )


def sentences(df: DataFrame, key_col: str, text_col: str = "text") -> DataFrame:
    """Explode to one row per (key, sid, sentence), sid 0-based in
    document order."""
    return df.select(
        key_col,
        F.posexplode(split_sentences(F.col(text_col))).alias(
            "sid", "sentence"
        ),
    )


# ------------------------------------------------------- unicode normalize

# Stripped after NFC (pinned): C0 controls except \t \n \r, DEL,
# zero-widths ZWSP/ZWNJ/ZWJ, BOM/ZWNBSP, soft hyphen.
_STRIP_RE = (
    "[\u0000-\u0008\u000B\u000C\u000E-\u001F"
    "\u007F\u200B-\u200D\uFEFF\u00AD]"
)


def normalize_unicode(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """NFC-normalize text and strip invisible characters — the
    canonical first text pass (combining sequences collapse to their
    precomposed forms; zero-widths and soft hyphens that break
    tokenizers and dedup hashing disappear).  Pinned order: NFC
    first, then strip, then CRLF -> LF.

    This is the engine's one deliberate Python-worker text op: the
    JVM has no NFC expression, so an Arrow-batched ``pandas_udf``
    (never a row-at-a-time F.udf) runs ``unicodedata.normalize`` —
    per-row pure work that scales linearly and shuffles nothing.
    DuckDB mirrors it exactly with ``nfc_normalize`` + RE2 strips.
    """
    import re as _re

    from pyspark.sql.functions import pandas_udf

    strip = _re.compile(_STRIP_RE)

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        def one(x):
            if x is None:
                return None
            return strip.sub(
                "", unicodedata.normalize("NFC", x)
            ).replace("\r\n", "\n")

        return s.map(one)

    return df.withColumn(out_col, _norm(F.col(text_col)))
