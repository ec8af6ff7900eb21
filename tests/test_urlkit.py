"""urlkit unit + property tests (resolution parity, canonicalization)."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from mechaml_spark import urlkit


def test_resolve_basic():
    base = "http://example.com/dir/page.html"
    assert urlkit.resolve(base, "img.png") == "http://example.com/dir/img.png"
    assert urlkit.resolve(base, "/abs.png") == "http://example.com/abs.png"
    assert urlkit.resolve(base, "../up.png") == "http://example.com/up.png"
    assert urlkit.resolve(base, "http://other.org/x") == "http://other.org/x"
    assert urlkit.resolve(base, "//cdn.org/x") == "http://cdn.org/x"
    assert urlkit.resolve(base, "?q=1") == "http://example.com/dir/page.html?q=1"


def test_canonicalize():
    c = urlkit.canonicalize
    assert c("HTTP://ExAmPle.COM/a") == "http://example.com/a"
    assert c("http://example.com") == "http://example.com/"
    assert c("http://example.com:80/a") == "http://example.com/a"
    assert c("https://example.com:443/a") == "https://example.com/a"
    assert c("http://example.com:8080/a") == "http://example.com:8080/a"
    assert c("http://example.com/a/../b") == "http://example.com/b"
    assert c("http://example.com/a/./b/") == "http://example.com/a/b/"
    assert c("http://example.com/a#frag") == "http://example.com/a"
    assert c("http://example.com/a?y=2&x=1") == "http://example.com/a?y=2&x=1"
    assert c("http://example.com/%7Euser") == "http://example.com/%7Euser"


def test_host_path():
    assert urlkit.host_of("http://A.B.c/x") == "a.b.c"
    assert urlkit.host_of("not a url") == ""
    assert urlkit.path_of("http://h/x/y?q") == "/x/y"


_hosts = st.from_regex(r"[a-z][a-z0-9]{0,8}(\.[a-z]{2,3}){1,2}", fullmatch=True)
_paths = st.lists(
    st.text(alphabet=string.ascii_lowercase + string.digits + "._-", min_size=1, max_size=8),
    max_size=4,
).map(lambda segs: "/" + "/".join(segs))


@settings(max_examples=200, deadline=None)
@given(host=_hosts, path=_paths, scheme=st.sampled_from(["http", "https"]))
def test_canonicalize_idempotent(host, path, scheme):
    url = f"{scheme}://{host}{path}"
    once = urlkit.canonicalize(url)
    assert urlkit.canonicalize(once) == once


@settings(max_examples=200, deadline=None)
@given(
    host=_hosts,
    path=_paths,
    ref=st.text(
        alphabet=string.ascii_lowercase + string.digits + "./-", min_size=1, max_size=16
    ),
)
def test_resolve_absolute_is_fixpoint(host, path, ref):
    base = f"http://{host}{path}"
    resolved = urlkit.resolve(base, ref)
    # resolving an already-absolute URL against the same base is a no-op
    assert urlkit.resolve(base, resolved) == resolved


def test_resolve_canon_host_pairs_matches_rowwise():
    """The memoized batch resolver must be byte-identical to the
    row-wise path: its cache key carries exactly the base components
    RFC 3986 resolution consults per reference form."""
    import itertools

    import pandas as pd

    from mechaml_spark import urlkit

    bases = ["http://a.test/x/y", "http://a.test/x/y/", "http://a.test",
             "https://A.test:443/q", "http://a.test/p?q=/z",
             "http://a.test/p#f", "ftp://a.test/d/e", "not a url", ""]
    refs = ["p", "./p", "../p", "", "#f", "?q=1", "/abs", "//other.test/z",
            "http://c.test/K", "HTTPS://D.TEST:443/e/../f", "p/../../q"]
    bs, rs = zip(*itertools.product(bases, refs))
    slow_u = [urlkit.canonicalize(urlkit.resolve(b, r)) for b, r in zip(bs, rs)]
    slow_h = [urlkit.host_of(u) for u in slow_u]
    fast_u, fast_h = urlkit.resolve_canon_host_pairs(
        pd.Series(bs), pd.Series(rs)
    )
    assert slow_u == fast_u
    assert slow_h == fast_h


def test_hygiene_flags_each_heuristic(spark):
    from pyspark.sql import functions as F

    from mechaml_spark.urlkit import hygiene_flags

    rows = [
        (0, "http://h.test/pa/pb"),                               # clean
        (1, "http://h.test/" + "x" * 250),                        # long
        (2, "http://h.test/p?" + "&".join(f"a{i}=1" for i in range(7))),
        (3, "http://h.test/p?PHPSESSID=deadbeef"),                # session
        (4, "http://h.test/cal/cal/2026"),                        # trap
        (5, "http://h.test/a/b/c/d/e/f/g/h/i/j"),                 # deep
        (6, "http://h.test/9876543210/123456789"),                # digits
        (7, "http://h.test/p?sid=1"),                             # session
        (8, "http://h.test/calendar/call"),      # NOT a repeat
        (9, "http://h.test/p?aside=1"),          # 'sid' needs [?&] prefix
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    out = df.select(
        "i", *[c for _n, c in hygiene_flags(F.col("url"))]
    ).collect()
    got = {r["i"]: r for r in out}
    assert not got[0]["spam"] and not got[8]["spam"] and not got[9]["spam"]
    assert got[1]["long_url"] and got[1]["spam"]
    assert got[2]["many_params"]
    assert got[3]["has_session"] and got[7]["has_session"]
    assert got[4]["trap"] and not got[5]["trap"]
    assert got[5]["deep"] and not got[4]["deep"]
    assert got[6]["digit_heavy"] and not got[0]["digit_heavy"]
    # expression-only: no Python workers in this plan
    plan = df.select(
        [c for _n, c in hygiene_flags(F.col("url"))]
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


_URL_ATOMS = st.sampled_from(
    list("abXY09.:/@?#%[]-_~ ") + ["http://", "https://", "../", "./"]
)


@settings(max_examples=400, deadline=None)
@given(st.lists(_URL_ATOMS, max_size=30).map("".join))
def test_canon2_parity(s):
    # the fused (canonical, host) pair must agree with the composed
    # path exactly — including pathological inputs where dot-segment
    # removal makes the OUTPUT reparse with a scheme ("./https://h/x")
    canon, host = urlkit._canon2(s)
    assert canon == urlkit.canonicalize(s)
    assert host == urlkit.host_of(canon)


def test_resolve_cache_module_level_and_bounded():
    import pandas as pd

    bases = pd.Series(["http://h.test/dir/"] * 4)
    refs = pd.Series(["a", "./b#f", "/abs", "http://o.test/z"])
    want_urls = [
        urlkit.canonicalize(urlkit.resolve(b, r))
        for b, r in zip(bases, refs)
    ]
    urls, hosts = urlkit.resolve_canon_host_pairs(bases, refs)
    assert urls == want_urls
    assert hosts == [urlkit.host_of(x) for x in want_urls]
    # memo persists across calls (module-level), answers unchanged
    assert (set(urlkit._resolution_key(b or "", r or "") for b, r in zip(bases, refs))
            <= set(urlkit._RESOLVE_CACHE))
    assert urlkit.resolve_canon_host_pairs(bases, refs) == (urls, hosts)
    # eviction clears but never changes results
    old_max = urlkit._RESOLVE_CACHE_MAX
    try:
        urlkit._RESOLVE_CACHE_MAX = 0
        assert urlkit.resolve_canon_host_pairs(bases, refs) == (urls, hosts)
    finally:
        urlkit._RESOLVE_CACHE_MAX = old_max
