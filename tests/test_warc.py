"""WARC 1.1 segment sink/source tests (ISO 28500 framing, .warc.gz
member convention, determinism, loud failures)."""

import zlib

import pytest

from mechaml_spark import warc


def _mk(uri="http://h.test/a", body=b"hello world", date="2026-01-01T00:00:00Z"):
    return warc.warc_record("response", uri, date, warc.build_http_response(body))


def test_record_roundtrip_and_framing():
    rec = _mk()
    [(headers, block)] = list(warc.warc_split(rec))
    assert headers["WARC-Version"] == "WARC/1.1"
    assert headers["WARC-Type"] == "response"
    assert headers["WARC-Target-URI"] == "http://h.test/a"
    assert int(headers["Content-Length"]) == len(block)
    status, http_headers, body = warc.parse_http_response(block)
    assert status == 200
    assert http_headers["content-length"] == str(len(b"hello world"))
    assert body == b"hello world"


def test_multi_record_stream_and_byte_determinism():
    recs = [_mk(uri=f"http://h.test/{i}", body=f"b{i}".encode()) for i in range(5)]
    stream = b"".join(recs)
    got = list(warc.warc_split(stream))
    assert [h["WARC-Target-URI"] for h, _ in got] == [
        f"http://h.test/{i}" for i in range(5)
    ]
    # same inputs -> identical bytes (record id derived from URI, date pinned)
    assert b"".join(
        _mk(uri=f"http://h.test/{i}", body=f"b{i}".encode()) for i in range(5)
    ) == stream


def test_gzip_members_roundtrip():
    recs = [_mk(uri=f"http://h.test/{i}") for i in range(3)]
    gz = b"".join(warc.gzip_member(r) for r in recs)
    # each record its own member: decompressing the concatenation
    # restores the exact plain stream
    assert warc.gunzip_members(gz) == b"".join(recs)
    # a member boundary really exists after the first record
    d = zlib.decompressobj(zlib.MAX_WBITS | 16)
    first = d.decompress(gz)
    assert first == recs[0] and d.unused_data


def test_split_rejects_malformed():
    rec = _mk()
    with pytest.raises(ValueError):
        list(warc.warc_split(rec[: len(rec) // 2]))  # truncated block
    with pytest.raises(ValueError):
        list(warc.warc_split(b"HTTP/1.1 200 OK\r\n\r\n"))  # not WARC
    with pytest.raises(ValueError):
        list(warc.warc_split(rec[:-2]))  # missing trailer CRLFs


def test_segments_spark_roundtrip(spark):
    rows = [
        {
            "uri": f"http://h{i % 3}.test/p{i}",
            "body": f"payload {i} " * (i + 1),
            "date": "2026-01-01T00:00:00Z",
        }
        for i in range(20)
    ]
    df = spark.createDataFrame(rows).repartition(4)
    for compress in (False, True):
        segs = warc.to_warc_segments(df, compress=compress)
        seg_rows = segs.collect()
        # one segment per non-empty partition, record counts sum up
        assert sum(r["n_records"] for r in seg_rows) == 20
        assert 1 <= len(seg_rows) <= 4
        recs = warc.parse_warc_segments(segs, compressed=compress).collect()
        assert len(recs) == 20
        got = {r["uri"]: r for r in recs}
        for i in range(20):
            r = got[f"http://h{i % 3}.test/p{i}"]
            assert r["warc_type"] == "response"
            status, _, body = warc.parse_http_response(bytes(r["block"]))
            assert status == 200
            assert body.decode() == f"payload {i} " * (i + 1)
            assert r["record_id"].startswith("urn:uuid:")


def test_crawl_payload_archives_through_warc(spark):
    """End-to-end: a real crawl's image+caption payload rows archive
    into gzipped WARC segments and restore byte-exact — the Common
    Crawl export shape for the engine's flagship table."""
    from pyspark.sql import functions as F

    from mechaml_spark import corpus as cp
    from mechaml_spark.frontier.scheduler import crawl

    spec = cp.CorpusSpec(n_hosts=2, pages_per_host=6, img_fmt_mix=True)
    seeds = [cp.page_url(spec, 0, 0), cp.page_url(spec, 1, 1)]
    res = crawl(spark, spec, seeds, budget_per_host=2, max_epochs=4,
                n_shards=4, n_bits=1 << 16)
    pay = res.payload.select(
        F.concat(F.lit("http://payload.test/"), F.col("image_id"))
        .alias("uri"),
        F.col("bytes").alias("body"),
        F.lit("2026-01-01T00:00:00Z").alias("date"),
    )
    want = {
        "http://payload.test/" + r["image_id"]: bytes(r["bytes"])
        for r in res.payload.collect()
    }
    assert want  # crawl actually fetched images
    segs = warc.to_warc_segments(
        pay, compress=True, content_type="application/octet-stream"
    )
    recs = warc.parse_warc_segments(segs, compressed=True).collect()
    assert len(recs) == len(want)
    for r in recs:
        status, headers, body = warc.parse_http_response(bytes(r["block"]))
        assert status == 200
        assert headers["content-type"] == "application/octet-stream"
        assert body == want[r["uri"]]


# --------------------------------------------------------------------------
# CDX index
# --------------------------------------------------------------------------

def test_surt_key_canonicalization():
    assert warc.surt_key("https://WWW.Example.COM/Path") == \
        "com,example,www)/path"
    assert warc.surt_key("http://a.b.org:80/x") == "org,b,a)/x"
    assert warc.surt_key("http://a.b.org:8080/x") == "org,b,a:8080)/x"
    assert warc.surt_key("https://h.net:443/") == "net,h)/"
    # query params sorted, path defaulted
    assert warc.surt_key("http://h.net?b=2&a=1") == "net,h)/?a=1&b=2"


def test_gzip_member_bounds_cover_stream():
    parts = [b"alpha" * 10, b"beta" * 33, b"g" * 7]
    stream = b"".join(warc.gzip_member(p) for p in parts)
    bounds = warc.gzip_member_bounds(stream)
    assert len(bounds) == 3
    assert bounds[0][0] == 0
    assert sum(b[1] for b in bounds) == len(stream)
    for (off, ln), want in zip(bounds, parts):
        assert warc.gunzip_members(stream[off:off + ln]) == want
    with pytest.raises(ValueError):
        warc.gzip_member_bounds(stream[:-4])


def _cdx_fixture(spark, n=20, compress=True):
    rows = [
        (
            f"HTTPS://H{i % 3}.Example.COM/P/{i}?b=2&a={i % 5}",
            f"payload-{i}-" + "y" * (i % 13),
            "2026-08-18T12:34:56Z",
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "uri string, body string, date string")
    return rows, warc.to_warc_segments(
        df.repartition(3), compress=compress
    )


def test_cdx_index_seekable_gzip_members(spark):
    import hashlib

    rows, segs = _cdx_fixture(spark, compress=True)
    seg_bytes = [bytes(r["segment"]) for r in segs.collect()]
    fdf = spark.createDataFrame(
        [(s, str(i)) for i, s in enumerate(seg_bytes)],
        "segment binary, filename string",
    )
    idx = warc.cdx_index(fdf, filename_col="filename").collect()
    assert len(idx) == len(rows)
    by_url = {r["url"]: r for r in idx}
    for uri, body, _date in rows:
        row = by_url[uri]
        assert row["ts"] == "20260818123456"
        assert row["status"] == 200 and row["mime"] == "text/plain"
        assert row["payload_length"] == len(body)
        assert row["digest"] == (
            "sha256:" + hashlib.sha256(body.encode()).hexdigest()
        )
        # THE seek contract: slice the named segment at (offset, length),
        # gunzip that one member, get exactly this record back
        seg = seg_bytes[int(row["filename"])]
        rec = warc.gunzip_members(
            seg[row["offset"]:row["offset"] + row["length"]]
        )
        [(hdrs, block)] = list(warc.warc_split(rec))
        assert hdrs["WARC-Target-URI"] == uri
        _, _, payload = warc.parse_http_response(block)
        assert payload == body.encode()


def test_cdx_index_plain_segment_offsets(spark):
    rows, segs = _cdx_fixture(spark, compress=False)
    seg_bytes = [bytes(r["segment"]) for r in segs.collect()]
    fdf = spark.createDataFrame(
        [(s, str(i)) for i, s in enumerate(seg_bytes)],
        "segment binary, filename string",
    )
    idx = warc.cdx_index(fdf, filename_col="filename",
                         compressed=False).collect()
    assert len(idx) == len(rows)
    for row in idx:
        seg = seg_bytes[int(row["filename"])]
        rec = seg[row["offset"]:row["offset"] + row["length"]]
        [(hdrs, _block)] = list(warc.warc_split(rec))
        assert hdrs["WARC-Target-URI"] == row["url"]


def test_cdx_line_deterministic():
    row = {
        "surt": "com,example)/p?a=1", "ts": "20260818123456",
        "url": "https://example.com/p?a=1", "mime": "text/plain",
        "status": 200, "digest": "sha256:ab", "length": 10, "offset": 0,
        "filename": "seg-0",
    }
    line = warc.cdx_line(row)
    assert line.startswith("com,example)/p?a=1 20260818123456 {")
    assert warc.cdx_line(dict(row)) == line
    import json
    payload = json.loads(line.split(" ", 2)[2])
    assert payload["offset"] == 0 and payload["status"] == 200


def test_wet_conversion_links_and_text(spark):
    from mechaml_spark import warc

    pages = spark.createDataFrame(
        [
            (
                "http://w.test/1",
                "<html><head><script>x<y</script></head>"
                "<body><p>hello &amp; bye</p></body></html>",
                "2026-01-01T00:00:00Z",
            )
        ],
        "uri string, body string, date string",
    )
    recs = warc.parse_warc_segments(
        warc.to_warc_segments(pages, content_type="text/html")
    )
    wet = warc.wet_conversion(recs)
    back = warc.parse_warc_segments(warc.to_wet_segments(wet)).collect()
    assert len(back) == 1
    r = back[0]
    assert r["warc_type"] == "conversion"
    assert bytes(r["block"]).decode() == "hello & bye"
    # refers_to links back to the response record's id
    orig = recs.collect()[0]
    assert r["refers_to"] == orig["record_id"]
    assert orig["refers_to"] is None  # response records carry none


def test_wat_metadata_envelope_pinned(spark):
    import json

    from mechaml_spark import warc

    pages = spark.createDataFrame(
        [
            (
                "http://w.test/1",
                "<html><head><title> My Page </title></head><body>"
                '<a href="http://w.test/a">a</a>'
                "<a rel='x' href='http://w.test/b'>b</a></body></html>",
                "2026-01-01T00:00:00Z",
            )
        ],
        "uri string, body string, date string",
    )
    recs = warc.parse_warc_segments(
        warc.to_warc_segments(pages, content_type="text/html")
    )
    wat = warc.wat_metadata(recs)
    back = warc.parse_warc_segments(warc.to_wat_segments(wat)).collect()
    assert len(back) == 1
    r = back[0]
    assert r["warc_type"] == "metadata"
    env = json.loads(bytes(r["block"]).decode())
    assert env == {
        "http": {"status": 200, "content_type": "text/html"},
        "html": {
            "title": "My Page",
            "links": ["http://w.test/a", "http://w.test/b"],
        },
    }
    orig = recs.collect()[0]
    assert r["refers_to"] == orig["record_id"]


def test_wat_metadata_no_title_no_links(spark):
    import json

    from mechaml_spark import warc

    pages = spark.createDataFrame(
        [("http://w.test/2", "<p>bare</p>", "2026-01-01T00:00:00Z")],
        "uri string, body string, date string",
    )
    recs = warc.parse_warc_segments(
        warc.to_warc_segments(pages, content_type="text/html")
    )
    row = warc.wat_metadata(recs).collect()[0]
    env = json.loads(row["payload"])
    # to_json drops NULL title; empty link array survives
    assert env["html"] == {"links": []}
    assert env["http"]["status"] == 200


def test_revisit_records_dedup_archive(spark):
    from mechaml_spark import warc

    pages = spark.createDataFrame(
        [
            ("http://w.test/a", "same body", "2026-01-01T00:00:00Z"),
            ("http://w.test/b", "same body", "2026-01-02T00:00:00Z"),
            ("http://w.test/c", "other", "2026-01-01T00:00:00Z"),
            # same URI refetched later with identical payload
            ("http://w.test/a", "same body", "2026-01-03T00:00:00Z"),
        ],
        "uri string, body string, date string",
    )
    marked = warc.mark_revisits(pages)
    rows = {
        (r["uri"], r["date"]): r for r in marked.collect()
    }
    assert not rows[("http://w.test/a", "2026-01-01T00:00:00Z")]["is_revisit"]
    assert not rows[("http://w.test/c", "2026-01-01T00:00:00Z")]["is_revisit"]
    for k in (("http://w.test/b", "2026-01-02T00:00:00Z"),
              ("http://w.test/a", "2026-01-03T00:00:00Z")):
        assert rows[k]["is_revisit"]
        assert rows[k]["refers_to_uri"] == "http://w.test/a"

    back = warc.parse_warc_segments(
        warc.to_warc_segments_dedup(marked.coalesce(1))
    ).collect()
    by_type = {}
    for r in back:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert len(by_type["response"]) == 2
    assert len(by_type["revisit"]) == 3 - 1  # two dup fetches
    rev = by_type["revisit"][0]
    assert rev["content_length"] == 0 and bytes(rev["block"]) == b""
    assert rev["profile"] == warc.REVISIT_PROFILE
    assert rev["refers_to_target_uri"] == "http://w.test/a"
    # a reader can restore the body by following refers_to
    originals = {r["record_id"]: r for r in by_type["response"]}
    src = originals[rev["refers_to"]]
    assert b"same body" in bytes(src["block"])
    # digests agree between the revisit and its original
    assert rev["payload_digest"] == src["payload_digest"]
    assert rev["payload_digest"].startswith("sha256:")


def test_request_records_pure():
    req = warc.build_http_request(
        "http://h.test/a/b?x=1", method="POST",
        headers={"Accept": "*/*"}, body=b"k=v",
    )
    m, target, hdrs, body = warc.parse_http_request(req)
    assert (m, target, body) == ("POST", "/a/b?x=1", b"k=v")
    assert hdrs["host"] == "h.test"
    assert hdrs["accept"] == "*/*"
    assert hdrs["content-length"] == "3"
    # bare path defaults to /
    m2, t2, h2, b2 = warc.parse_http_request(
        warc.build_http_request("http://h.test")
    )
    assert (m2, t2, b2) == ("GET", "/", b"")
    assert "content-length" not in h2


def test_paired_segments_roundtrip(spark):
    import pandas as pd

    rows = [
        {"uri": f"http://h{i % 3}.test/p{i}", "body": f"b{i}",
         "date": "2026-01-02T03:04:05Z",
         "method": "POST" if i % 2 else "GET"}
        for i in range(6)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    segs = warc.to_warc_segments_paired(df, method_col="method")
    recs = warc.parse_warc_segments(segs).collect()
    reqs = {r["record_id"]: r for r in recs if r["warc_type"] == "request"}
    resps = {r["record_id"]: r for r in recs if r["warc_type"] == "response"}
    assert len(reqs) == 6 and len(resps) == 6
    for r in reqs.values():
        # the Concurrent-To link lands on the SAME URI's response
        assert r["concurrent_to"] in resps
        assert resps[r["concurrent_to"]]["uri"] == r["uri"]
        # ids never collide pairwise
        assert r["record_id"] != r["concurrent_to"]
        m, target, hdrs, _ = warc.parse_http_request(bytes(r["block"]))
        assert target == "/" + r["uri"].split("/", 3)[3]
        assert hdrs["host"] == r["uri"].split("/")[2]
    # responses carry no concurrent_to
    assert all(r["concurrent_to"] is None for r in resps.values())
