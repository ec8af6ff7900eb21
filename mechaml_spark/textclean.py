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


# ------------------------------------------------------------- mojibake

# UTF-8-bytes-read-as-cp1252/latin-1 leaves telltale lead-byte
# characters: the full 2-byte lead class 0xC2-0xDF ('Â'..'ß' —
# Latin-1-range text but also Cyrillic 'Ð'/'Ñ', Greek 'Î'/'Ï',
# Hebrew '×'…), the 3-byte leads 0xE0-0xEF ('à'..'ï', incl. 'â' for
# curly punctuation and 'ã' for CJK) and the 4-byte leads 0xF0-0xF4
# ('ð'..'ô', emoji/astral).  The hint only gates the repair ATTEMPT;
# legit text containing these letters (château, SÃO, coração) fails
# the strict UTF-8 re-decode and is left alone — the round-trip is
# the proof.
#
# r5 tightening (ADVICE): a bare lead-class match fired the repair
# attempt on virtually every clean accented Western word, eroding the
# cheap-gate purpose.  Genuine damage ALWAYS puts a continuation byte
# (0x80-0xBF) right after the lead, and the cp1252/latin-1 characters
# those bytes decode to are exactly: raw C1 controls U+0080-U+009F
# (latin-1 damage), U+00A0-U+00BF ('¡'..'¿' incl. '©'/'°'), and the
# 27 cp1252 remaps of 0x80-0x9F ('€', curly quotes, dashes, 'Š'…).
# Requiring one of those AFTER the lead keeps every repairable string
# matched (undefined cp1252 bytes can't appear in decodable damage)
# while 'château'/'coração' no longer trigger the encode round trip.
_MOJIBAKE_CONT = (
    "-¿"  # raw C1 + latin-1 A0-BF block
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"  # cp1252 0x80-0x9F remaps
)
_MOJIBAKE_HINT = f"[Â-ô][{_MOJIBAKE_CONT}]"

# When the damage came from a latin-1 decode, C1 control codepoints
# (U+0080-U+009F) ride along raw; "sloppy cp1252" (ftfy's name) maps
# any cp1252-unencodable char <= U+00FF back by byte value — the
# unencodable ones are exactly those C1 controls, since cp1252 covers
# 0x00-0x7F and 0xA0-0xFF identically to latin-1.


def _sloppy_cp1252_encode(s: str) -> bytes | None:
    try:
        return s.encode("cp1252")
    except UnicodeEncodeError:
        pass
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(ch)
            if o <= 0xFF:
                out.append(o)
            else:
                return None
    return bytes(out)


def fix_mojibake(s: str, max_passes: int = 2) -> tuple[str, int]:
    """Repair UTF-8-decoded-as-cp1252 mojibake (the ftfy core move):
    while the hint pattern matches, re-encode as (sloppy) cp1252 and
    re-decode as strict UTF-8; keep the result only when the full
    round-trip succeeds and changes the string.  ``max_passes`` = 2
    covers the doubly-encoded case; clean text with real 'Ã'
    characters fails the strict UTF-8 re-decode and is left alone.
    """
    import re as _re

    hint = _re.compile(_MOJIBAKE_HINT)
    n = 0
    while n < max_passes and hint.search(s):
        b = _sloppy_cp1252_encode(s)
        if b is None:
            break
        try:
            s2 = b.decode("utf-8")
        except UnicodeDecodeError:
            break
        if s2 == s:
            break
        s = s2
        n += 1
    return s, n


def repair_mojibake(
    df: DataFrame, text_col: str = "text",
    fixed_col: str = "fixed", n_col: str = "n_fixes",
) -> DataFrame:
    """Column form of :func:`fix_mojibake` — one Arrow-batched
    ``pandas_udf`` returning a struct (the JVM has no charset
    round-trip expression), projected to (fixed, n_fixes) columns.
    Per-row pure work, shuffles nothing."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<fixed:string,n_fixes:int>")
    def _fix(s: pd.Series) -> pd.DataFrame:
        fixed, counts = [], []
        for x in s:
            if x is None:
                fixed.append(None)
                counts.append(None)
            else:
                f, n = fix_mojibake(x)
                fixed.append(f)
                counts.append(n)
        return pd.DataFrame({"fixed": fixed, "n_fixes": counts})

    st = _fix(F.col(text_col))
    return df.withColumn(fixed_col, st["fixed"]).withColumn(
        n_col, st["n_fixes"]
    )
