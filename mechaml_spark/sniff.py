"""Content sniffing over raw crawl bytes — expression-only, no UDF.

A 100-TB crawl cannot trust Content-Type headers (the reference's
``Agent.save_image`` trusts the server and just writes bytes,
agent.ml: save_image) — real pipelines route rows by magic numbers.
Both sniffers here compile to pure Catalyst expressions (substring /
decode / comparisons over the first <=64 bytes), so they run inside
WholeStageCodegen on the JVM: no Python worker, no Arrow transfer,
and the scan can prune every other column.

Signatures follow the WHATWG MIME-sniffing spec's table plus the
classic magic numbers (PNG ISO 15948 §5.2, JPEG ITU T.81 SOI, GIF89a,
BMP, TIFF 6.0, RIFF/WAVE/AVI/WEBP, PDF, gzip RFC 1952, zip).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["sniff_mime", "sniff_charset", "decode_text"]


def _prefix_eq(data: Column, sig: bytes, offset: int = 1) -> Column:
    return F.substring(data, offset, len(sig)) == F.lit(sig)


def sniff_mime(data: Column) -> Column:
    """Magic-byte MIME type of a binary column (expression-only).

    Returns e.g. ``image/png``; ``text/html`` via the WHATWG tag
    heuristic on the first 64 bytes (decoded ISO-8859-1, which is
    total — every byte sequence decodes); ``application/octet-stream``
    when nothing matches; NULL for NULL input.
    """
    # NB: Spark's ltrim strips only ' ' — the WHATWG algorithm skips
    # all leading ASCII whitespace, hence the regexp.
    head = F.lower(
        F.regexp_replace(
            F.decode(F.substring(data, 1, 64), "ISO-8859-1"), r"^\s+", ""
        )
    )
    html = (
        head.startswith("<!doctype html")
        | head.startswith("<html")
        | head.startswith("<head")
        | head.startswith("<body")
    )
    xml = head.startswith("<?xml")
    riff = _prefix_eq(data, b"RIFF")
    riff_kind = F.substring(data, 9, 4)
    return (
        F.when(data.isNull(), F.lit(None).cast("string"))
        .when(_prefix_eq(data, b"\x89PNG\r\n\x1a\n"), "image/png")
        .when(_prefix_eq(data, b"\xff\xd8\xff"), "image/jpeg")
        .when(
            _prefix_eq(data, b"GIF87a") | _prefix_eq(data, b"GIF89a"),
            "image/gif",
        )
        .when(
            _prefix_eq(data, b"II*\x00") | _prefix_eq(data, b"MM\x00*"),
            "image/tiff",
        )
        .when(riff & (riff_kind == F.lit(b"WEBP")), "image/webp")
        .when(riff & (riff_kind == F.lit(b"WAVE")), "audio/wav")
        .when(riff & (riff_kind == F.lit(b"AVI ")), "video/x-msvideo")
        .when(_prefix_eq(data, b"BM"), "image/bmp")
        .when(
            _prefix_eq(data, b"P6\n") | _prefix_eq(data, b"P6 "),
            "image/x-portable-pixmap",
        )
        .when(_prefix_eq(data, b"%PDF"), "application/pdf")
        .when(_prefix_eq(data, b"\x1f\x8b"), "application/gzip")
        .when(_prefix_eq(data, b"PK\x03\x04"), "application/zip")
        .when(_prefix_eq(data, b"\x00\x00\x01\x00"), "image/x-icon")
        .when(html, "text/html")
        .when(xml, "text/xml")
        .otherwise("application/octet-stream")
    )


def sniff_charset(data: Column) -> Column:
    """Charset of a text-ish binary column (expression-only).

    Detection order (WHATWG encoding sniffing, trimmed to what a
    crawler meets): BOM (UTF-8 / UTF-16LE / UTF-16BE), then an HTML
    ``<meta charset=...>`` in the first 1024 bytes (quoted or bare,
    any case), else the UTF-8 default the spec recommends.
    """
    head = F.lower(F.decode(F.substring(data, 1, 1024), "ISO-8859-1"))
    meta = F.regexp_extract(
        head, r"""<meta[^>]*charset\s*=\s*["']?\s*([a-z0-9_\-]+)""", 1
    )
    return (
        F.when(data.isNull(), F.lit(None).cast("string"))
        .when(_prefix_eq(data, b"\xef\xbb\xbf"), "utf-8")
        .when(_prefix_eq(data, b"\xff\xfe"), "utf-16le")
        .when(_prefix_eq(data, b"\xfe\xff"), "utf-16be")
        .when(meta != "", meta)
        .otherwise("utf-8")
    )


def decode_text(data: Column, charset: Column) -> Column:
    """Decode crawl bytes to a string column using a (sniffed) charset
    — expression-only for the charsets a crawler actually meets.

    BOMs are stripped (substring before decode); unknown charsets fall
    back to ISO-8859-1, which is total, so this never throws a task.
    """
    body_u8 = F.when(
        F.substring(data, 1, 3) == F.lit(b"\xef\xbb\xbf"),
        F.substring(data, 4, 2**31 - 1),
    ).otherwise(data)
    body_u16 = F.substring(data, 3, 2**31 - 1)
    # UTF-8 path: cast(binary as string) wraps the bytes without
    # validation, make_valid_utf8 replaces malformed sequences with
    # U+FFFD — lenient without any session config, so one poison row
    # can never fail a task.  The UTF-16 decodes rely on the session's
    # codingErrorAction=REPLACE (mechaml_spark.session.get_spark).
    return (
        F.when(charset == "utf-8", F.make_valid_utf8(body_u8.cast("string")))
        .when(charset == "utf-16le", F.decode(body_u16, "UTF-16LE"))
        .when(charset == "utf-16be", F.decode(body_u16, "UTF-16BE"))
        .when(
            charset.isin("iso-8859-1", "latin-1", "latin1", "windows-1252"),
            F.decode(data, "ISO-8859-1"),
        )
        .when(charset.isin("us-ascii", "ascii"), F.decode(data, "US-ASCII"))
        .otherwise(F.decode(data, "ISO-8859-1"))
    )
