"""HttpFetcher (real-network backend) — hermetic loopback tests.

No outbound network exists in-sandbox, so an in-process
``http.server`` on 127.0.0.1 plays origin server: every test drives
the REAL Spark fetch stage (applyInPandas over loopback TCP) and
then inspects what actually arrived on the wire — the transport
parity the reference gets from Cohttp (src/agent.ml:99-130):

  * the matched ``Cookie`` header is sent, on EVERY hop, including
    the empty header (cookiejar.ml:123-137);
  * POST method + body + form content-type are transmitted
    (src/agent.ml:110-130); redirects re-issue a plain GET
    (src/agent.ml:79-80);
  * client default headers ride along (src/agent.ml:154-159);
  * one TCP connection per origin is reused across same-host rows;
  * transport failures yield ``status == 0`` + ``error`` (never 404,
    which is reserved for a server actually answering Not Found).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from mechaml_spark import agent
from mechaml_spark import cookies as ck


class _Recorder:
    def __init__(self):
        self.lock = threading.Lock()
        self.requests: list[dict] = []
        self.connections = 0


def _make_handler(rec: _Recorder):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # keep-alive => reuse observable

        def setup(self):
            super().setup()
            with rec.lock:
                rec.connections += 1

        def log_message(self, *a):
            pass

        def _record(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n).decode() if n else ""
            with rec.lock:
                rec.requests.append(
                    {
                        "method": self.command,
                        "path": self.path,
                        "cookie": self.headers.get("Cookie"),
                        "aenc": self.headers.get("Accept-Encoding"),
                        "xhdr": self.headers.get("X-Client"),
                        "ctype": self.headers.get("Content-Type"),
                        "body": body,
                    }
                )
            return body

        def _reply(self, status, body=b"", headers=()):
            self.send_response(status)
            for k, v in headers:
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._record()
            if self.path.startswith("/echo"):
                out = json.dumps(
                    {"cookie": self.headers.get("Cookie"),
                     "method": "GET"}
                ).encode()
                self._reply(200, out)
            elif self.path.startswith("/setcookie"):
                self._reply(
                    200, b"ok",
                    [("Set-Cookie", "sid=abc; Path=/"),
                     ("Set-Cookie", "t=1")],
                )
            elif self.path.startswith("/redir"):
                self._reply(302, b"", [("Location", "/echo")])
            elif self.path.startswith("/varies"):
                c = self.headers.get("Cookie") or ""
                body = (f"hello:{c}" if "sid=" in c else "anon").encode()
                self._reply(200, body)
            elif self.path.startswith("/missing"):
                self._reply(404, b"nope")
            elif self.path.startswith("/gz"):
                import gzip
                self._reply(200, gzip.compress(b"unzipped!"),
                            [("Content-Encoding", "gzip")])
            elif self.path.startswith("/defl"):
                import zlib
                self._reply(200, zlib.compress(b"inflated-zlib"),
                            [("Content-Encoding", "deflate")])
            elif self.path.startswith("/rawdefl"):
                import zlib
                co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
                raw = co.compress(b"inflated-raw") + co.flush()
                self._reply(200, raw, [("Content-Encoding", "deflate")])
            elif self.path.startswith("/badgz"):
                self._reply(200, b"\x1f\x8bgarbage",
                            [("Content-Encoding", "gzip")])
            elif self.path.startswith("/br"):
                self._reply(200, _brotli_compress(b"brotli-body!"),
                            [("Content-Encoding", "br")])
            elif self.path.startswith("/zst"):
                self._reply(200, _zstd_compress(b"zstd-body!"),
                            [("Content-Encoding", "zstd")])
            elif self.path.startswith("/flaky429"):
                with rec.lock:
                    n = sum(
                        1 for r in rec.requests
                        if r["path"].startswith("/flaky429")
                    )
                if n <= 1:  # _record already counted this request
                    self._reply(429, b"slow down",
                                [("Retry-After", "0")])
                else:
                    self._reply(200, b"recovered")
            elif self.path.startswith("/always429"):
                self._reply(429, b"rate limited",
                            [("Retry-After", "7")])
            elif self.path.startswith("/cond"):
                etag = '"v7"'
                lm = "Tue, 18 Aug 2026 00:00:00 GMT"
                if self.headers.get("If-None-Match") == etag or (
                    self.headers.get("If-Modified-Since") == lm
                ):
                    self._reply(304, b"", [("ETag", etag)])
                else:
                    self._reply(
                        200, b"fresh-content",
                        [("ETag", etag), ("Last-Modified", lm)],
                    )
            else:
                self._reply(200, b"root")

        def do_POST(self):
            body = self._record()
            if self.path.startswith("/postredir"):
                self._reply(302, b"", [("Location", "/echo")])
            else:
                self._reply(200, f"posted:{body}".encode())

    return Handler


@pytest.fixture()
def loopback():
    rec = _Recorder()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(rec))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, rec
    srv.shutdown()
    srv.server_close()


def _jar_df(spark, host, cookies):
    return spark.createDataFrame(
        [(n, v, None, host, "", False) for n, v in cookies], ck.COOKIE_T
    )


def test_cookie_header_sent_and_cookie_sensitive_response(spark, loopback):
    base, rec = loopback
    jar = _jar_df(spark, "127.0.0.1", [("sid", "abc"), ("u", "x")])
    reqs = spark.createDataFrame([(f"{base}/varies",)], "url_norm string")
    res = agent.fetch(reqs, agent.HttpFetcher(timeout_s=5.0), jar=jar)
    row = res.finals.collect()[0]
    # jar key order: name^domain^path ascending
    assert row["status"] == 200 and row["body"] == "hello:sid=abc; u=x"
    assert rec.requests[-1]["cookie"] == "sid=abc; u=x"


def test_empty_cookie_header_still_sent(spark, loopback):
    """cookiejar.ml:136-137 adds the Cookie header even when no
    cookie matches — transport parity includes the empty header."""
    base, rec = loopback
    jar = _jar_df(spark, "elsewhere.test", [("sid", "abc")])
    reqs = spark.createDataFrame([(f"{base}/echo",)], "url_norm string")
    agent.fetch(reqs, agent.HttpFetcher(timeout_s=5.0), jar=jar).finals.collect()
    assert rec.requests[-1]["cookie"] == ""


def test_cookie_injected_on_every_hop(spark, loopback):
    base, rec = loopback
    jar = _jar_df(spark, "127.0.0.1", [("sid", "abc")])
    reqs = spark.createDataFrame([(f"{base}/redir",)], "url_norm string")
    res = agent.fetch(reqs, agent.HttpFetcher(timeout_s=5.0), jar=jar)
    row = res.finals.collect()[0]
    assert row["status"] == 200 and row["final_url"].endswith("/echo")
    paths = [(r["path"], r["cookie"]) for r in rec.requests]
    assert ("/redir", "sid=abc") in paths and ("/echo", "sid=abc") in paths


def test_post_body_transmitted_and_get_on_redirect(spark, loopback):
    base, rec = loopback
    reqs = spark.createDataFrame(
        [(f"{base}/postredir", "POST", "q=hello&x=1")],
        "url_norm string, method string, req_body string",
    )
    res = agent.fetch(
        reqs, agent.HttpFetcher(timeout_s=5.0),
        carry_cols=("method", "req_body"),
    )
    row = res.finals.collect()[0]
    # redirect landed with a GET (src/agent.ml:79-80); carry cols
    # still report the ORIGINAL request verb/body
    assert row["status"] == 200 and row["method"] == "POST"
    by_path = {r["path"]: r for r in rec.requests}
    assert by_path["/postredir"]["method"] == "POST"
    assert by_path["/postredir"]["body"] == "q=hello&x=1"
    assert by_path["/postredir"]["ctype"] == "application/x-www-form-urlencoded"
    assert by_path["/echo"]["method"] == "GET"
    assert by_path["/echo"]["body"] == ""


def test_plain_post_roundtrip(spark, loopback):
    base, rec = loopback
    reqs = spark.createDataFrame(
        [(f"{base}/post", "POST", "a=1")],
        "url_norm string, method string, req_body string",
    )
    res = agent.fetch(
        reqs, agent.HttpFetcher(timeout_s=5.0),
        carry_cols=("method", "req_body"),
    )
    assert res.finals.collect()[0]["body"] == "posted:a=1"


def test_default_client_headers_merged(spark, loopback):
    base, rec = loopback
    f = agent.HttpFetcher(timeout_s=5.0).add_client_header("X-Client", "m1")
    reqs = spark.createDataFrame([(f"{base}/echo",)], "url_norm string")
    agent.fetch(reqs, f).finals.collect()
    assert rec.requests[-1]["xhdr"] == "m1"
    # functional removal returns a fetcher without the header
    f2 = f.remove_client_header("X-Client")
    agent.fetch(reqs, f2).finals.collect()
    assert rec.requests[-1]["xhdr"] is None


def test_set_cookie_headers_collected_verbatim(spark, loopback):
    base, rec = loopback
    reqs = spark.createDataFrame([(f"{base}/setcookie",)], "url_norm string")
    res = agent.fetch(reqs, agent.HttpFetcher(timeout_s=5.0))
    ev = res.cookie_events.collect()
    assert sorted(e["hv"] for e in ev) == ["sid=abc; Path=/", "t=1"]


def test_connection_reused_per_origin(spark, loopback):
    base, rec = loopback
    n = 8
    reqs = spark.createDataFrame(
        [(f"{base}/echo?i={i}",) for i in range(n)], "url_norm string"
    )
    out = agent.HttpFetcher(timeout_s=5.0).fetch(reqs, "url_norm")
    assert out.count() == n
    # all rows share one host group -> one task -> (about) one socket;
    # allow slack for a stray reconnect but forbid one-per-request
    assert rec.connections < n


def test_transport_error_is_status_zero_not_404(spark, loopback):
    base, rec = loopback
    reqs = spark.createDataFrame(
        [
            ("http://localhost:1/nope", "a"),   # connection refused
            ("http://invalid.invalid/x", "b"),  # DNS failure (RFC 2606)
            (f"{base}/missing", "c"),           # server answers 404
        ],
        "url_norm string, tag string",
    )
    out = agent.HttpFetcher(timeout_s=2.0).fetch(reqs, "url_norm")
    rows = {r["tag"]: r for r in out.collect()}
    for tag in ("a", "b"):
        assert rows[tag]["status"] == 0 and rows[tag]["body"] is None
        assert rows[tag]["error"]  # exception text preserved
    assert rows["c"]["status"] == 404 and rows["c"]["error"] is None


def test_content_encoding_negotiated_and_inflated(spark, loopback):
    """Accept-Encoding goes on the wire; gzip, zlib-deflate, and the
    raw-deflate server quirk all inflate transparently; an
    undecodable encoded body is the status-0 transport sentinel,
    never a garbage page."""
    base, rec = loopback
    reqs = spark.createDataFrame(
        [(f"{base}/gz", "g"), (f"{base}/defl", "d"),
         (f"{base}/rawdefl", "r"), (f"{base}/badgz", "x")],
        "url_norm string, tag string",
    )
    rows = {
        r["tag"]: r
        for r in agent.HttpFetcher(timeout_s=5.0)
        .fetch(reqs, "url_norm").collect()
    }
    assert rows["g"]["body"] == "unzipped!"
    assert rows["d"]["body"] == "inflated-zlib"
    assert rows["r"]["body"] == "inflated-raw"
    assert rows["x"]["status"] == 0 and "error" in rows["x"]["error"].lower()
    assert all(
        r["aenc"].startswith("gzip, deflate")
        for r in rec.requests
        if r["path"].startswith(("/gz", "/defl", "/rawdefl", "/badgz"))
    )


def _brotli_compress(data: bytes) -> bytes:
    """Test-server-side brotli via the system libbrotlienc."""
    import ctypes

    lib = ctypes.CDLL("libbrotlienc.so.1")
    lib.BrotliEncoderCompress.restype = ctypes.c_int
    lib.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
    ]
    out = ctypes.create_string_buffer(len(data) + 512)
    n = ctypes.c_size_t(len(out))
    assert lib.BrotliEncoderCompress(
        5, 22, 0, len(data), data, ctypes.byref(n), out
    ) == 1
    return out.raw[: n.value]


def test_brotli_content_encoding(spark, loopback):
    """`br` negotiated and inflated when the system brotli libs are
    present (gated: absent libs mean br is simply not advertised)."""
    import ctypes

    try:
        ctypes.CDLL("libbrotlidec.so.1")
        ctypes.CDLL("libbrotlienc.so.1")
    except OSError:
        pytest.skip("brotli libs not present")
    base, rec = loopback
    reqs = spark.createDataFrame([(f"{base}/br",)], "url_norm string")
    [row] = agent.HttpFetcher(timeout_s=5.0).fetch(reqs, "url_norm").collect()
    assert row["body"] == "brotli-body!"
    assert "br" in rec.requests[-1]["aenc"].split(", ")


def _zstd_compress(data: bytes) -> bytes:
    """Test-server-side zstd via the system libzstd."""
    import ctypes

    lib = ctypes.CDLL("libzstd.so.1")
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
    cap = lib.ZSTD_compressBound(len(data))
    out = ctypes.create_string_buffer(cap)
    n = lib.ZSTD_compress(out, cap, data, len(data), 3)
    assert lib.ZSTD_isError(n) == 0
    return out.raw[:n]


def test_zstd_content_encoding(spark, loopback):
    """`zstd` negotiated and inflated when the system libzstd is
    present (gated: an absent lib means zstd is not advertised)."""
    import ctypes

    try:
        ctypes.CDLL("libzstd.so.1")
    except OSError:
        pytest.skip("libzstd not present")
    base, rec = loopback
    reqs = spark.createDataFrame([(f"{base}/zst",)], "url_norm string")
    [row] = agent.HttpFetcher(timeout_s=5.0).fetch(reqs, "url_norm").collect()
    assert row["body"] == "zstd-body!"
    assert rec.requests[-1]["aenc"].endswith("zstd")


def test_conditional_get_revisit(spark, loopback):
    """RFC 9110 conditional requests: validators captured on first
    fetch, If-None-Match/If-Modified-Since go on the wire from the
    optional request columns, a match is a 304 with a NULL body (the
    revisit pipeline reuses its stored payload), a stale validator
    refetches in full."""
    base, rec = loopback
    first = (
        agent.HttpFetcher(timeout_s=5.0)
        .fetch(
            spark.createDataFrame([(f"{base}/cond",)], "url_norm string"),
            "url_norm",
        )
        .collect()[0]
    )
    assert first["status"] == 200 and first["body"] == "fresh-content"
    assert first["etag"] == '"v7"'
    assert first["last_modified"] == "Tue, 18 Aug 2026 00:00:00 GMT"
    revisit = spark.createDataFrame(
        [
            (f"{base}/cond", "match", first["etag"], None),
            (f"{base}/cond", "stale", '"v0"', None),
            (f"{base}/cond", "lm", None, first["last_modified"]),
        ],
        "url_norm string, tag string, if_none_match string, "
        "if_modified_since string",
    )
    rows = {
        r["tag"]: r
        for r in agent.HttpFetcher(timeout_s=5.0)
        .fetch(revisit, "url_norm").collect()
    }
    assert rows["match"]["status"] == 304 and rows["match"]["body"] is None
    assert rows["lm"]["status"] == 304 and rows["lm"]["body"] is None
    assert rows["stale"]["status"] == 200
    assert rows["stale"]["body"] == "fresh-content"


def test_revisit_schedule_operator(spark):
    """Change-rate policy: a fast-changing URL comes due before a
    static one; single-fetch URLs get min_interval."""
    from mechaml_spark.frontier.revisit import revisit_schedule

    hist = spark.createDataFrame(
        [
            # changes every fetch: est = span//(changes+1) = 300//3
            ("u/hot", 0, "a"), ("u/hot", 150, "b"), ("u/hot", 300, "c"),
            # never changes: est = 300//1 = 300 -> clamped to 200
            ("u/cold", 0, "x"), ("u/cold", 150, "x"), ("u/cold", 300, "x"),
            ("u/new", 300, "y"),
        ],
        "url string, ts long, content_hash string",
    )
    rows = {
        r["url"]: r
        for r in revisit_schedule(
            hist, now_ts=410, min_interval=50, max_interval=200
        ).collect()
    }
    assert rows["u/hot"]["n_changes"] == 2
    assert rows["u/hot"]["next_due"] == 400 and rows["u/hot"]["due"]
    assert rows["u/cold"]["n_changes"] == 0
    assert rows["u/cold"]["next_due"] == 500 and not rows["u/cold"]["due"]
    assert rows["u/new"]["n_fetches"] == 1
    assert rows["u/new"]["next_due"] == 350 and rows["u/new"]["due"]


def test_http_fetcher_composes_with_hop_loop(spark):
    """agent.fetch() over the HTTP backend builds and runs: the
    bounded hop loop's plan is backend-agnostic; unreachable rows are
    per-row transport-error finals, never task failures."""
    reqs = spark.createDataFrame(
        [("http://localhost:1/nope", "h", 0, 0)],
        "url_norm string, host string, depth int, discovered_epoch int",
    )
    res = agent.fetch(
        reqs, agent.HttpFetcher(timeout_s=2.0), jar=None,
        carry_cols=("host", "depth", "discovered_epoch"),
    )
    finals = res.finals.collect()
    assert len(finals) == 1 and finals[0]["status"] == 0
    assert finals[0]["error"]


def test_http_loop_fetcher_equivalent_to_hop_loop(spark, loopback):
    """HttpLoopFetcher (redirects chased inside the task — ONE Spark
    stage) must produce the same finals / cookie events / hop targets
    as agent.fetch's relational hop loop over HttpFetcher, jar
    included."""
    base, rec = loopback
    jar = _jar_df(spark, "127.0.0.1", [("sid", "abc")])
    reqs = spark.createDataFrame(
        [(f"{base}/redir",), (f"{base}/setcookie",), (f"{base}/missing",),
         ("http://localhost:1/nope",)],
        "url_norm string",
    )
    slow = agent.fetch(reqs, agent.HttpFetcher(timeout_s=5.0), jar=jar)
    jar_rows = [r.asDict() for r in jar.collect()]
    fast = agent.HttpLoopFetcher(timeout_s=5.0).fetch_result(
        reqs, jar_rows=jar_rows
    )

    def finals_rows(fr):
        return sorted(
            (r["url_norm"], r["final_url"], r["status"], r["body"])
            for r in fr.finals.collect()
        )

    assert finals_rows(slow) == finals_rows(fast)

    def events(fr):
        return sorted(
            (r["url_norm"], r["hop"], r["idx"], r["hv"], r["src_url"])
            for r in fr.cookie_events.collect()
        )

    assert events(slow) == events(fast)

    def hops(fr):
        if fr.hop_targets is None:
            return []
        return sorted(tuple(r) for r in fr.hop_targets.collect())

    assert hops(slow) == hops(fast)


def test_http_loop_fetcher_post_and_cap(spark, loopback):
    base, rec = loopback
    reqs = spark.createDataFrame(
        [(f"{base}/postredir", "POST", "z=9")],
        "url_norm string, method string, req_body string",
    )
    fast = agent.HttpLoopFetcher(timeout_s=5.0).fetch_result(
        reqs, carry_cols=("method", "req_body")
    )
    row = fast.finals.collect()[0]
    assert row["status"] == 200 and row["final_url"].endswith("/echo")
    assert row["method"] == "POST"  # carry reports the original verb
    by_path = {r["path"]: r for r in rec.requests}
    assert by_path["/postredir"]["method"] == "POST"
    assert by_path["/postredir"]["body"] == "z=9"
    assert by_path["/echo"]["method"] == "GET"


def test_http_loop_fetcher_no_jar_sends_no_cookie_header(spark, loopback):
    """jar_rows=None means no jar configured -> no Cookie header at
    all (parity with agent.fetch(jar=None)); an EMPTY jar still sends
    the empty header (cookiejar.ml:136-137)."""
    base, rec = loopback
    reqs = spark.createDataFrame([(f"{base}/echo",)], "url_norm string")
    agent.HttpLoopFetcher(timeout_s=5.0).fetch_result(reqs).finals.collect()
    assert rec.requests[-1]["cookie"] is None
    agent.HttpLoopFetcher(timeout_s=5.0).fetch_result(
        reqs, jar_rows=[]
    ).finals.collect()
    assert rec.requests[-1]["cookie"] == ""


def test_loop_fetcher_normalizes_lowercase_post(spark, loopback):
    """A lowercase 'post' method must be uppercased (like
    HttpFetcher.fetch does) so the body is transmitted — not sent
    verbatim as a bodyless 'post'."""
    base, rec = loopback
    reqs = spark.createDataFrame(
        [(f"{base}/post", "post", "a=1")],
        "url_norm string, method string, req_body string",
    )
    row = agent.HttpLoopFetcher(timeout_s=5.0).fetch_result(
        reqs, carry_cols=("method", "req_body")
    ).finals.collect()[0]
    assert row["status"] == 200 and row["body"] == "posted:a=1"
    assert rec.requests[-1]["method"] == "POST"
    assert rec.requests[-1]["body"] == "a=1"


def test_client_header_update_preserves_fetcher_class(spark, loopback):
    """add/remove_client_header are functional updates on ANY backend:
    updating headers on HttpLoopFetcher must not downgrade it to the
    base HttpFetcher (which lacks fetch_result's in-task hop loop)."""
    base, rec = loopback
    f = agent.HttpLoopFetcher(timeout_s=5.0).add_client_header("X-Client", "m1")
    assert type(f) is agent.HttpLoopFetcher
    reqs = spark.createDataFrame([(f"{base}/echo",)], "url_norm string")
    f.fetch_result(reqs).finals.collect()
    assert rec.requests[-1]["xhdr"] == "m1"
    f2 = f.remove_client_header("X-Client")
    assert type(f2) is agent.HttpLoopFetcher
    f2.fetch_result(reqs).finals.collect()
    assert rec.requests[-1]["xhdr"] is None


def test_retry_after_backoff_and_surface(spark, loopback):
    base, rec = loopback
    f = agent.HttpFetcher(rate_retries=2)
    df = spark.createDataFrame(
        [(base + "/flaky429",), (base + "/always429",)], "url string"
    )
    out = {r["url"]: r for r in f.fetch(df, "url").collect()}

    # throttled once, then recovers: final row is the 200, no
    # retry_after leaks from the transient 429
    a = out[base + "/flaky429"]
    assert (a["status"], a["body"], a["retry_after"]) == (
        200, "recovered", None
    )
    # persistently throttled: true 429 + parsed Retry-After surface
    # after the bounded in-task retries
    b = out[base + "/always429"]
    assert (b["status"], b["retry_after"], b["error"]) == (429, 7, None)
    n = sum(
        1 for r in rec.requests if r["path"].startswith("/always429")
    )
    assert n == 1 + 2  # original + rate_retries, no more


def test_retry_after_disabled(spark, loopback):
    base, rec = loopback
    f = agent.HttpFetcher(rate_retries=0)
    df = spark.createDataFrame([(base + "/always429",)], "url string")
    r = f.fetch(df, "url").collect()[0]
    assert (r["status"], r["retry_after"]) == (429, 7)
    assert sum(
        1 for q in rec.requests if q["path"].startswith("/always429")
    ) == 1
