"""WARC 1.1 (ISO 28500) segment writer + reader, Spark-first.

The Web ARChive format is the interchange format every production
crawl speaks (Common Crawl, Heritrix, wget --warc).  This module
gives the engine a WARC sink and source with the scale shape right:

- **sink**: one WARC *segment* per input partition — records are
  serialized inside ``mapInPandas`` and concatenated per partition,
  so no shuffle and no driver involvement; a 1000-executor crawl
  writes 1000s of independent segment objects, which is exactly how
  Common Crawl shards its corpus.  Optional per-record gzip members
  (the ``.warc.gz`` convention: each record its own gzip member so
  readers can seek to member boundaries).
- **source**: segments split back into records by honest
  Content-Length framing (never regex over the block), again inside
  ``mapInPandas`` — one segment is one task, records never cross
  segment boundaries by construction.

Determinism: record ids are UUIDv5-style names derived from the
target URI, and WARC-Date is caller-provided — same input, same
bytes, which is what the snapshot/equivalence testing story needs.

Spec: https://iipc.github.io/warc-specifications/ (WARC/1.1).
Reference parity note: the reference engine has no archive sink; this
is engine-brief breadth for the crawl tier (BASELINE.json category
"crawl").
"""

from __future__ import annotations

import hashlib
import io
import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CRLF = b"\r\n"


def build_http_response(
    body: bytes,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/plain",
) -> bytes:
    """Serialize a minimal HTTP/1.1 response message (the payload of
    a WARC ``response`` record per the spec's
    ``application/http;msgtype=response`` block type)."""
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode("ascii") + body


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split an HTTP response block into (status, headers, body)."""
    sep = block.index(b"\r\n\r\n")
    head_lines = block[:sep].decode("iso-8859-1").split("\r\n")
    status = int(head_lines[0].split(" ", 2)[1])
    headers = {}
    for line in head_lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, block[sep + 4 :]


def record_id_for(uri: str) -> str:
    """Deterministic ``urn:uuid:`` record id: UUIDv5-shaped name from
    the target URI (md5-based so no uuid module variance)."""
    h = hashlib.md5(uri.encode("utf-8")).hexdigest()
    return (
        f"urn:uuid:{h[0:8]}-{h[8:12]}-5{h[13:16]}-"
        f"a{h[17:20]}-{h[20:32]}"
    )


def warc_record(
    warc_type: str,
    uri: str,
    date: str,
    block: bytes,
    content_type: str = "application/http;msgtype=response",
    extra_headers: dict[str, str] | None = None,
    record_id: str | None = None,
) -> bytes:
    """One WARC/1.1 record: named headers, CRLF framing, the block,
    and the spec's two trailing CRLFs.  Header order is fixed for
    byte-determinism (``extra_headers`` — e.g. ``WARC-Refers-To`` on
    conversion records — in insertion order before Content-Type)."""
    extras = "".join(
        f"{k}: {v}\r\n" for k, v in (extra_headers or {}).items()
    )
    head = (
        "WARC/1.1\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <{record_id or record_id_for(uri)}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"{extras}"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    )
    return head.encode("ascii") + block + CRLF + CRLF


def gzip_member(data: bytes) -> bytes:
    """One gzip member (mtime pinned to 0 for byte-determinism)."""
    co = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS | 16)
    # wbits|16 writes a gzip header with mtime taken from time() — so
    # build the member manually: fixed header, raw deflate, crc+size
    raw = zlib.compressobj(9, zlib.DEFLATED, -zlib.MAX_WBITS)
    del co
    body = raw.compress(data) + raw.flush()
    header = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
    import struct as _struct

    trailer = _struct.pack(
        "<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) & 0xFFFFFFFF
    )
    return header + body + trailer


def gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz
    layout) back into one byte stream."""
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(zlib.MAX_WBITS | 16)
        out.write(d.decompress(data[pos:]))
        rest = d.unused_data
        if not rest:
            break
        pos = len(data) - len(rest)
    return out.getvalue()


def warc_split_offsets(
    stream: bytes,
) -> Iterator[tuple[dict[str, str], bytes, int, int]]:
    """Iterate ``(headers, block, record_start, record_end)`` over a
    WARC stream using the spec's Content-Length framing — the offset
    form :func:`cdx_index` needs for uncompressed segments."""
    pos = 0
    n = len(stream)
    while pos < n:
        sep = stream.find(b"\r\n\r\n", pos)
        if sep < 0:
            raise ValueError("truncated WARC header")
        head = stream[pos:sep].decode("iso-8859-1").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line {head[0]!r}")
        headers = {"WARC-Version": head[0]}
        for line in head[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        length = int(headers["Content-Length"])
        start = sep + 4
        block = stream[start : start + length]
        if len(block) != length:
            raise ValueError("truncated WARC block")
        if stream[start + length : start + length + 4] != CRLF + CRLF:
            raise ValueError("missing record trailer CRLFs")
        yield headers, block, pos, start + length + 4
        pos = start + length + 4


def warc_split(stream: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Iterate (headers, block) over a WARC stream using the spec's
    Content-Length framing."""
    for headers, block, _s, _e in warc_split_offsets(stream):
        yield headers, block


SEGMENT_T = T.StructType(
    [
        T.StructField("segment", T.BinaryType()),
        T.StructField("n_records", T.LongType()),
    ]
)

RECORD_T = T.StructType(
    [
        T.StructField("uri", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("refers_to", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("block", T.BinaryType()),
        # revisit-record surface (WARC 1.1 §6.7.2); NULL elsewhere
        T.StructField("profile", T.StringType()),
        T.StructField("payload_digest", T.StringType()),
        T.StructField("refers_to_target_uri", T.StringType()),
        # request-record pairing (WARC 1.1 5.7); NULL elsewhere
        T.StructField("concurrent_to", T.StringType()),
    ]
)


def to_warc_segments(
    df: DataFrame,
    uri_col: str = "uri",
    body_col: str = "body",
    date_col: str = "date",
    compress: bool = False,
    content_type: str = "text/plain",
) -> DataFrame:
    """Sink: one WARC segment per input partition.  Each row becomes
    a ``response`` record whose block is a minimal HTTP/1.1 response
    wrapping ``body_col``; with ``compress`` each record is its own
    gzip member (.warc.gz convention)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = io.BytesIO()
        count = 0
        for pdf in batches:
            for uri, body, date in zip(
                pdf[uri_col], pdf[body_col], pdf[date_col]
            ):
                body_b = (
                    body if isinstance(body, (bytes, bytearray))
                    else str(body).encode("utf-8")
                )
                rec = warc_record(
                    "response", str(uri), str(date),
                    build_http_response(
                        bytes(body_b), content_type=content_type
                    ),
                )
                buf.write(gzip_member(rec) if compress else rec)
                count += 1
        if count:
            yield pd.DataFrame(
                [{"segment": buf.getvalue(), "n_records": count}]
            )

    return df.mapInPandas(run, schema=SEGMENT_T)


def parse_warc_segments(
    seg_df: DataFrame, segment_col: str = "segment", compressed: bool = False
) -> DataFrame:
    """Source: explode WARC segments back into records — one segment
    per task, Content-Length framing, loud failure on malformed
    streams."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seg in pdf[segment_col]:
                stream = bytes(seg)
                if compressed:
                    stream = gunzip_members(stream)
                for headers, block in warc_split(stream):
                    rows.append(
                        {
                            "uri": headers.get("WARC-Target-URI"),
                            "warc_type": headers.get("WARC-Type"),
                            "warc_date": headers.get("WARC-Date"),
                            "record_id": headers.get(
                                "WARC-Record-ID", ""
                            ).strip("<>"),
                            "refers_to": headers.get(
                                "WARC-Refers-To", ""
                            ).strip("<>") or None,
                            "content_length": int(headers["Content-Length"]),
                            "block": block,
                            "profile": headers.get("WARC-Profile"),
                            "payload_digest": headers.get(
                                "WARC-Payload-Digest"
                            ),
                            "refers_to_target_uri": headers.get(
                                "WARC-Refers-To-Target-URI"
                            ),
                            "concurrent_to": headers.get(
                                "WARC-Concurrent-To", ""
                            ).strip("<>") or None,
                        }
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "uri", "warc_type", "warc_date", "record_id",
                        "refers_to", "content_length", "block",
                        "profile", "payload_digest",
                        "refers_to_target_uri", "concurrent_to",
                    ],
                )

    return seg_df.mapInPandas(run, schema=RECORD_T)


# --------------------------------------------------------------------------
# CDX(J) index — what makes a 100-TB WARC corpus randomly accessible
# --------------------------------------------------------------------------

def gzip_member_bounds(data: bytes) -> list[tuple[int, int]]:
    """Byte bounds ``(offset, length)`` of each gzip member in a
    concatenated-member stream (the .warc.gz layout) — the member
    boundary walk a CDX indexer records so a reader can seek straight
    to one record without touching the rest of the segment."""
    bounds = []
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(zlib.MAX_WBITS | 16)
        d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member")
        end = n - len(d.unused_data)
        bounds.append((pos, end - pos))
        pos = end
    return bounds


def surt_key(url: str) -> str:
    """Sort-friendly URI Reordering Transform (SURT), the canonical
    CDX key: lowercase, scheme dropped, host labels reversed and
    comma-joined, default ports dropped, query parameters sorted —
    so one host's records sort contiguously and the same URL written
    with cosmetic differences collides.  Matches the shape pywb /
    OpenWayback use (``com,example)/path?a=1&b=2``)."""
    from urllib.parse import urlsplit

    p = urlsplit(url.strip())
    host = (p.hostname or "").lower().strip(".")
    key = ",".join(reversed(host.split("."))) if host else ""
    port = p.port
    default = {"http": 80, "": 80, "https": 443}.get(p.scheme.lower())
    if port is not None and port != default:
        key += f":{port}"
    path = (p.path or "/").lower()
    key += ")" + path
    if p.query:
        key += "?" + "&".join(sorted(p.query.lower().split("&")))
    return key


CDX_T = T.StructType(
    [
        T.StructField("surt", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("payload_length", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
        T.StructField("filename", T.StringType()),
    ]
)


def _cdx_row(headers: dict, block: bytes, off: int, length: int,
             filename: str) -> dict:
    status, http_headers, payload = parse_http_response(block)
    date = headers.get("WARC-Date", "")
    ts = "".join(c for c in date if c.isdigit())[:14]
    url = headers.get("WARC-Target-URI", "")
    mime = http_headers.get("content-type", "").split(";")[0].strip()
    return {
        "surt": surt_key(url),
        "ts": ts,
        "url": url,
        "mime": mime,
        "status": status,
        # sha256-hex rather than CDX-legacy sha1-b32: stdlib-stable,
        # stronger, and SQL-mirrorable; documented deviation.
        "digest": "sha256:" + hashlib.sha256(payload).hexdigest(),
        "payload_length": len(payload),
        "offset": off,
        "length": length,
        "filename": filename,
    }


def cdx_index(
    seg_df: DataFrame,
    segment_col: str = "segment",
    filename_col: str | None = None,
    compressed: bool = True,
) -> DataFrame:
    """CDX index over WARC segments: one row per ``response`` record
    with its SURT key, 14-digit timestamp, HTTP status/mime, payload
    digest, and — the point of the exercise — the byte ``(offset,
    length)`` a reader seeks to.  For ``.warc.gz`` segments that is
    the record's own gzip-member bounds (each record is one member by
    construction in :func:`to_warc_segments`); for plain segments the
    Content-Length record frame.  Runs inside ``mapInPandas`` — one
    segment per task, no shuffle; sort the result by ``(surt, ts)``
    (a range-partitioned Spark sort) to materialize the classic
    merged CDX artifact."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            fn_series = (
                pdf[filename_col] if filename_col is not None
                else ["" for _ in range(len(pdf))]
            )
            for seg, fn in zip(pdf[segment_col], fn_series):
                stream = bytes(seg)
                if compressed:
                    for off, mlen in gzip_member_bounds(stream):
                        rec = gunzip_members(stream[off:off + mlen])
                        for headers, block in warc_split(rec):
                            if headers.get("WARC-Type") != "response":
                                continue
                            rows.append(
                                _cdx_row(headers, block, off, mlen, str(fn))
                            )
                else:
                    for headers, block, s, e in warc_split_offsets(stream):
                        if headers.get("WARC-Type") != "response":
                            continue
                        rows.append(
                            _cdx_row(headers, block, s, e - s, str(fn))
                        )
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in CDX_T])

    return seg_df.mapInPandas(run, schema=CDX_T)


def cdx_line(row: dict) -> str:
    """Serialize one index row as a CDXJ line (``surt ts {json}``) —
    fixed field order, no whitespace variance, byte-deterministic."""
    import json

    payload = {
        k: row[k]
        for k in (
            "url", "mime", "status", "digest", "length", "offset", "filename",
        )
    }
    return (
        f"{row['surt']} {row['ts']} "
        + json.dumps(payload, separators=(",", ":"), sort_keys=True)
    )


# --------------------------------------------------------------------------
# WET — the Common Crawl "conversion" sidecar product: one text-only
# record per response record, linked via WARC-Refers-To.
# --------------------------------------------------------------------------

def wet_conversion(recs: DataFrame) -> DataFrame:
    """WET-style conversion rows from parsed ``response`` records,
    expression-only: strip the HTTP header block (first CRLFCRLF) and
    run the shared visible-text extractor
    (:func:`mechaml_spark.extract.html_visible_text`) — comments,
    script/style bodies, entities, and whitespace collapse all handled
    JVM-side, so deriving WET from a 100-TB WARC corpus is codegen +
    the segment-parse mapInPandas it already paid for.

    Output: (uri, warc_date, refers_to = source record id, text)."""
    from pyspark.sql import functions as F

    from mechaml_spark.extract import html_visible_text

    block_s = F.col("block").cast("string")
    body = F.split(block_s, "\r\n\r\n", 2)[1]
    return recs.where(F.col("warc_type") == "response").select(
        "uri",
        "warc_date",
        F.col("record_id").alias("refers_to"),
        html_visible_text(body).alias("text"),
    )


def to_wet_segments(wet: DataFrame) -> DataFrame:
    """Sink WET rows as real WARC segments: one ``conversion`` record
    per row (``Content-Type: text/plain``, ``WARC-Refers-To`` linking
    back to the response record), one segment per partition — the
    same no-shuffle sharding as :func:`to_warc_segments`."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = io.BytesIO()
        count = 0
        for pdf in batches:
            for uri, date, ref, text in zip(
                pdf["uri"], pdf["warc_date"], pdf["refers_to"], pdf["text"]
            ):
                rec = warc_record(
                    "conversion",
                    str(uri),
                    str(date),
                    ("" if text is None else str(text)).encode("utf-8"),
                    content_type="text/plain",
                    extra_headers={"WARC-Refers-To": f"<{ref}>"},
                )
                buf.write(rec)
                count += 1
        if count:
            yield pd.DataFrame(
                [{"segment": buf.getvalue(), "n_records": count}]
            )

    return wet.mapInPandas(run, schema=SEGMENT_T)


# ----------------------------------------------------------------- WAT

_HREF_ALL_DQ = r'(?i)<a\b[^>]*?href\s*=\s*"([^"]*)"'
_HREF_ALL_SQ = r"(?i)<a\b[^>]*?href\s*=\s*'([^']*)'"


def wat_metadata(recs: DataFrame) -> DataFrame:
    """WAT-style metadata rows from parsed ``response`` records,
    expression-only — the Common Crawl WAT product's payload (a JSON
    envelope of HTTP + HTML metadata per response record), in the
    engine's compact shape::

        {"http": {"status": N, "content_type": "..."},
         "html": {"title": "...", "links": ["...", ...]}}

    Fields: status + Content-Type from the HTTP header block, title
    via the shared metadata extractor, links = every <a href>
    (double-quoted hrefs first, then single-quoted — two linear
    regexp scans, NOT interleaved document order; use the full parse
    path when order matters).  ``to_json`` is a JVM
    expression with pinned struct field order, so the payload bytes
    are deterministic.  Like WET, deriving WAT from a 100-TB WARC
    corpus costs codegen on top of the segment-parse mapInPandas
    already paid for — no extra shuffle, bodies never leave the task.

    Output: (uri, warc_date, refers_to = source record id, payload).
    """
    from pyspark.sql import functions as F

    from mechaml_spark.metadata import title_col

    block_s = F.col("block").cast("string")
    parts = F.split(block_s, "\r\n\r\n", 2)
    head, body = parts[0], parts[1]
    status = F.regexp_extract(head, r"^HTTP/1\.[01] (\d{3})", 1).cast("int")
    ctype = F.regexp_extract(
        head, r"(?im)^Content-Type:\s*([^\r\n]+)", 1
    )
    links = F.concat(
        F.regexp_extract_all(body, F.lit(_HREF_ALL_DQ), F.lit(1)),
        F.regexp_extract_all(body, F.lit(_HREF_ALL_SQ), F.lit(1)),
    )
    payload = F.to_json(
        F.struct(
            F.struct(
                status.alias("status"), ctype.alias("content_type")
            ).alias("http"),
            F.struct(
                title_col(body).alias("title"), links.alias("links")
            ).alias("html"),
        )
    )
    return recs.where(F.col("warc_type") == "response").select(
        "uri",
        "warc_date",
        F.col("record_id").alias("refers_to"),
        payload.alias("payload"),
    )


def to_wat_segments(wat: DataFrame) -> DataFrame:
    """Sink WAT rows as real WARC segments: one ``metadata`` record
    per row (``Content-Type: application/json``, ``WARC-Refers-To``
    linking back to the response record), one segment per partition —
    the same no-shuffle sharding as :func:`to_warc_segments`."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = io.BytesIO()
        count = 0
        for pdf in batches:
            for uri, date, ref, payload in zip(
                pdf["uri"], pdf["warc_date"], pdf["refers_to"],
                pdf["payload"],
            ):
                rec = warc_record(
                    "metadata",
                    str(uri),
                    str(date),
                    ("" if payload is None else str(payload)).encode("utf-8"),
                    content_type="application/json",
                    extra_headers={"WARC-Refers-To": f"<{ref}>"},
                )
                buf.write(rec)
                count += 1
        if count:
            yield pd.DataFrame(
                [{"segment": buf.getvalue(), "n_records": count}]
            )

    return wat.mapInPandas(run, schema=SEGMENT_T)


# ------------------------------------------------------- revisit records

REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"


def mark_revisits(
    df: DataFrame,
    uri_col: str = "uri",
    body_col: str = "body",
    date_col: str = "date",
) -> DataFrame:
    """Payload-level archive dedup (the Heritrix/Common Crawl revisit
    convention): rows sharing a payload sha-256 keep ONE full copy —
    the pinned-minimum ``(date, uri)`` occurrence — and every other
    occurrence is marked as a revisit pointing at it.  At a 10^10-page
    recrawl most fetches are unchanged pages; writing revisit records
    instead of bodies is what keeps the archive linear in UNIQUE
    bytes, not fetched bytes.

    Adds ``payload_digest`` (``sha256:<hex>``), ``is_revisit``, and
    ``refers_to_uri`` (the kept copy's URI; NULL on originals).
    Scale: one partial-agg groupBy(digest) + one equi-join back on
    digest — the shuffle carries (digest, date, uri), never bodies.
    """
    from pyspark.sql import functions as F

    digest = F.sha2(F.col(body_col).cast("binary"), 256)
    d = df.withColumn("_digest", digest)
    first = d.groupBy("_digest").agg(
        F.min(F.struct(F.col(date_col), F.col(uri_col))).alias("_f")
    )
    me = F.struct(F.col(date_col), F.col(uri_col))
    return (
        d.join(first, "_digest")
        .select(
            *df.columns,
            F.concat(F.lit("sha256:"), F.col("_digest")).alias(
                "payload_digest"
            ),
            (me != F.col("_f")).alias("is_revisit"),
            F.when(me != F.col("_f"), F.col("_f")[uri_col]).alias(
                "refers_to_uri"
            ),
        )
    )


def to_warc_segments_dedup(
    marked: DataFrame,
    uri_col: str = "uri",
    body_col: str = "body",
    date_col: str = "date",
    content_type: str = "text/plain",
) -> DataFrame:
    """Sink :func:`mark_revisits` output as real WARC segments:
    originals become ``response`` records (with WARC-Payload-Digest),
    duplicates become ``revisit`` records under the
    identical-payload-digest profile — empty block, WARC-Refers-To
    the kept record's id, WARC-Refers-To-Target-URI its URI.  One
    segment per partition, no shuffle (the dedup join already ran)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = io.BytesIO()
        count = 0
        for pdf in batches:
            for uri, body, date, dig, rev, ref in zip(
                pdf[uri_col], pdf[body_col], pdf[date_col],
                pdf["payload_digest"], pdf["is_revisit"],
                pdf["refers_to_uri"],
            ):
                if rev:
                    rec = warc_record(
                        "revisit", str(uri), str(date), b"",
                        content_type="application/http;msgtype=response",
                        extra_headers={
                            "WARC-Profile": REVISIT_PROFILE,
                            "WARC-Refers-To":
                                f"<{record_id_for(str(ref))}>",
                            "WARC-Refers-To-Target-URI": str(ref),
                            "WARC-Payload-Digest": str(dig),
                        },
                    )
                else:
                    body_b = (
                        body if isinstance(body, (bytes, bytearray))
                        else str(body).encode("utf-8")
                    )
                    rec = warc_record(
                        "response", str(uri), str(date),
                        build_http_response(
                            bytes(body_b), content_type=content_type
                        ),
                        extra_headers={"WARC-Payload-Digest": str(dig)},
                    )
                buf.write(rec)
                count += 1
        if count:
            yield pd.DataFrame(
                [{"segment": buf.getvalue(), "n_records": count}]
            )

    return marked.mapInPandas(run, schema=SEGMENT_T)


# --------------------------------------------------------------------------
# request records (WARC 1.1 §6.4) — the full capture pair
# --------------------------------------------------------------------------

def build_http_request(
    url: str,
    method: str = "GET",
    headers: dict[str, str] | None = None,
    body: bytes = b"",
) -> bytes:
    """Serialize a minimal HTTP/1.1 request message (the
    ``application/http;msgtype=request`` block of a WARC ``request``
    record): request line from the URL's path+query, Host from its
    authority, caller headers in insertion order, Content-Length
    only when a body rides along."""
    from urllib.parse import urlsplit

    p = urlsplit(url)
    target = (p.path or "/") + (f"?{p.query}" if p.query else "")
    lines = [f"{method} {target} HTTP/1.1", f"Host: {p.netloc}"]
    for k, v in (headers or {}).items():
        lines.append(f"{k}: {v}")
    if body:
        lines.append(f"Content-Length: {len(body)}")
    return ("\r\n".join(lines) + "\r\n\r\n").encode("ascii") + body


def parse_http_request(block: bytes) -> tuple[str, str, dict, bytes]:
    """Split an HTTP request block into (method, target, headers,
    body)."""
    sep = block.index(b"\r\n\r\n")
    head = block[:sep].decode("iso-8859-1").split("\r\n")
    method, target, _ = head[0].split(" ", 2)
    hdrs = {}
    for line in head[1:]:
        k, _, v = line.partition(":")
        hdrs[k.strip().lower()] = v.strip()
    return method, target, hdrs, block[sep + 4 :]


def to_warc_segments_paired(
    df: DataFrame,
    uri_col: str = "uri",
    body_col: str = "body",
    date_col: str = "date",
    method_col: str | None = None,
    compress: bool = False,
    content_type: str = "text/plain",
) -> DataFrame:
    """Sink: one WARC segment per partition with the FULL capture
    pair per row — a ``request`` record (block =
    ``msgtype=request``) immediately followed by its ``response``,
    linked the Common-Crawl way: the request carries
    ``WARC-Concurrent-To: <response id>``.  Request record ids are
    derived from ``req:<uri>`` so the pair never collides."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = io.BytesIO()
        count = 0
        for pdf in batches:
            methods = (
                pdf[method_col] if method_col is not None
                else ["GET"] * len(pdf)
            )
            for uri, body, date, method in zip(
                pdf[uri_col], pdf[body_col], pdf[date_col], methods
            ):
                uri, date, method = str(uri), str(date), str(method)
                body_b = (
                    bytes(body) if isinstance(body, (bytes, bytearray))
                    else str(body).encode("utf-8")
                )
                resp_id = record_id_for(uri)
                req = warc_record(
                    "request", uri, date,
                    build_http_request(uri, method=method),
                    content_type="application/http;msgtype=request",
                    extra_headers={"WARC-Concurrent-To": f"<{resp_id}>"},
                    record_id=record_id_for("req:" + uri),
                )
                resp = warc_record(
                    "response", uri, date,
                    build_http_response(body_b, content_type=content_type),
                )
                for rec in (req, resp):
                    buf.write(gzip_member(rec) if compress else rec)
                count += 2
        if count:
            yield pd.DataFrame(
                [{"segment": buf.getvalue(), "n_records": count}]
            )

    return df.mapInPandas(run, schema=SEGMENT_T)
