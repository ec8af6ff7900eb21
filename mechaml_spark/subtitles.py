"""SRT / WebVTT subtitle-cue parsing as pure Catalyst expressions —
the caption-alignment stage of a video-text training pipeline
(VideoCC-style corpora pair sampled frames with the cue text that
overlaps them; crawled .srt/.vtt sidecars are how those captions
arrive).

The reference has no media ops (src/agent.ml stores raw bytes); this
is engine breadth for the crawl corpus.  Everything here is
``split`` / ``transform`` / ``filter`` / ``regexp_extract`` under
whole-stage codegen — zero Python, zero shuffle; parsing N billion
cue files costs one projection.

Grammar (the intersection real players accept):
* cue blocks separated by blank lines (CRLF or LF);
* a block's TIMING line is the first line matching
  ``H{1,2}:MM:SS[.,]mmm --> H{1,2}:MM:SS[.,]mmm`` (SRT uses a comma,
  WebVTT a dot — both accepted either way; SRT's numeric index line
  above it and WebVTT's optional cue-settings after the arrow are
  ignored);
* every line after the timing line is cue text, joined with ``\\n``;
* blocks with no timing line (the ``WEBVTT`` header, NOTE comments,
  malformed cues) are dropped — parse, don't crash, the crawl rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ARROW = (
    r"^\s*(\d{1,2}):(\d{2}):(\d{2})[.,](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[.,](\d{3})"
)


def _ms(line: Column, base: int) -> Column:
    """Milliseconds from capture groups base..base+3 of _ARROW."""
    g = lambda k: F.regexp_extract(line, _ARROW, k).try_cast("long")  # noqa
    return (
        (g(base) * 3600 + g(base + 1) * 60 + g(base + 2)) * 1000
        + g(base + 3)
    )


def cues_col(text: Column) -> Column:
    """``array<struct<start_ms:long, end_ms:long, text:string>>`` of
    the parseable cues of one subtitle document, in document order."""
    blocks = F.split(text, r"\r?\n[ \t]*\r?\n+")

    def parse(block: Column) -> Column:
        lines = F.split(block, r"\r?\n")
        timing = F.try_element_at(
            F.filter(lines, lambda ln: ln.rlike(_ARROW)), F.lit(1)
        )
        pos = F.array_position(lines, timing)
        body = F.regexp_replace(
            F.array_join(
                F.slice(
                    lines,
                    (pos + 1).cast("int"),
                    F.greatest(F.size(lines) - pos.cast("int"), F.lit(0)),
                ),
                "\n",
            ),
            # a document-final newline leaves one empty trailing line
            # in the last block; interior blanks can't occur (blank
            # lines separate blocks)
            r"\n+$",
            "",
        )
        return F.struct(
            _ms(timing, 1).alias("start_ms"),
            _ms(timing, 5).alias("end_ms"),
            body.alias("text"),
        )

    return F.filter(
        F.transform(blocks, parse), lambda c: c["start_ms"].isNotNull()
    )
