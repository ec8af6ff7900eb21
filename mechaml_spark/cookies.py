"""Cookie jar as a DataFrame + Set-Cookie parsing + request matching.

Parity target: reference src/cookiejar.ml (plus Cohttp's
``Set_cookie_hdr`` parsing behavior that the reference inherits).

Replicated quirks (cited; do NOT "fix"):
  * jar key = (name, domain, path); ordering = lexicographic on the
    CONCATENATION ``name ^ domain ^ path`` (cookiejar.ml:94-96);
  * ``add`` with ``Max_age 0`` DELETES the key; any other max-age is
    stored but never expires — no clock anywhere (cookiejar.ml:110-113);
  * ``domain_match host dom``: equal, or host ends with dom and the
    char just before the suffix is '.'; a stored leading-dot domain
    therefore never matches its subdomains (cookiejar.ml:48-54);
  * ``path_match``: plain prefix; default path "" matches everything
    (cookiejar.ml:56-59);
  * the ``secure`` flag is stored but never consulted when matching
    (cookiejar.ml:61-66);
  * Set-Cookie values are split on BOTH ';' and ',' with the first
    token the cookie pair and the rest attributes — a comma-joined
    multi-cookie header yields only its first cookie (Cohttp parser
    behavior, asserted by reference test.ml:159-166);
  * absent Domain attr defaults to the request host, absent Path to
    "" (cookiejar.ml:77-83, 17-19);
  * the matched ``Cookie`` header is built in jar key order and is
    added even when empty (cookiejar.ml:123-137).

Scale notes: request matching has two physical strategies behind one
API (:func:`add_to_headers`): a map-only broadcast-array scan for
small session jars (no shuffle of the request stream, O(|jar|) per
row) and a host-suffix-chain explode + hash equi-join on cookie
domain for crawl-wide jars (per-request cost independent of jar
size); an ``auto`` gate picks by jar row count.  Both serialize the
header in jar key order and are pinned equal to the pure jar oracle
in tests.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

COOKIE_FIELDS = [
    T.StructField("name", T.StringType()),
    T.StructField("value", T.StringType()),
    T.StructField("max_age", T.LongType()),  # NULL = session
    T.StructField("domain", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("secure", T.BooleanType()),
]
COOKIE_T = T.StructType(COOKIE_FIELDS)


def empty_jar(spark) -> DataFrame:
    return spark.createDataFrame([], COOKIE_T)


# ------------------------------------------------------------- pure parsing


def parse_set_cookie(header_value: str, request_url: str) -> dict | None:
    """One Set-Cookie header -> cookie dict (Cohttp-parity, see module
    docstring)."""
    if not header_value:
        return None
    tokens = [t.strip() for t in _split_multi(header_value)]
    if not tokens or "=" not in tokens[0]:
        return None
    name, value = tokens[0].split("=", 1)
    name = name.strip()
    if not name:
        return None
    cookie = {
        "name": name,
        "value": value.strip(),
        "max_age": None,
        "domain": _host_from_url(request_url),
        "path": "",
        "secure": False,
    }
    for tok in tokens[1:]:
        if "=" in tok:
            k, v = tok.split("=", 1)
            k = k.strip().lower()
            v = v.strip()
            if k == "domain":
                cookie["domain"] = v
            elif k == "path":
                cookie["path"] = v
            elif k == "max-age":
                try:
                    cookie["max_age"] = int(v)
                except ValueError:
                    pass
        else:
            if tok.strip().lower() == "secure":
                cookie["secure"] = True
    return cookie


def _split_multi(s: str) -> list[str]:
    out, cur = [], []
    for ch in s:
        if ch in ";,":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [t for t in out if t.strip()]


def _host_from_url(url: str) -> str:
    try:
        return urlsplit(url).hostname or ""
    except ValueError:
        return ""


def domain_match_py(host: str, dom: str) -> bool:
    """cookiejar.ml:48-54 — equality, or dotted-suffix with the char
    before the suffix being '.' (leading-dot quirk preserved)."""
    if host == dom:
        return True
    delta = len(host) - len(dom)
    return delta > 0 and host.endswith(dom) and host[delta - 1] == "."


def path_match_py(uri_path: str, cookie_path: str) -> bool:
    return uri_path.startswith(cookie_path)


def match_uri_py(url: str, cookie: dict) -> bool:
    host = _host_from_url(url)
    if not host:
        return False
    return domain_match_py(host, cookie["domain"]) and path_match_py(
        urlsplit(url).path or "", cookie["path"]
    )


class Jar:
    """Pure-Python jar used by the sequential oracle and tests."""

    def __init__(self) -> None:
        self._map: dict[tuple[str, str, str], dict] = {}

    @staticmethod
    def _key(c: dict) -> tuple[str, str, str]:
        return (c["name"], c["domain"], c["path"])

    def add(self, c: dict) -> None:
        if c["max_age"] == 0:
            self._map.pop(self._key(c), None)
        else:
            self._map[self._key(c)] = c

    def remove(self, c: dict) -> None:
        self._map.pop(self._key(c), None)

    def is_empty(self) -> bool:
        return not self._map

    def cookies(self) -> list[dict]:
        """Jar key order: lexicographic on name^domain^path."""
        return [
            self._map[k]
            for k in sorted(self._map, key=lambda k: "".join(k))
        ]

    def add_from_headers(self, url: str, set_cookie_values: list[str]) -> None:
        for hv in set_cookie_values:
            c = parse_set_cookie(hv, url)
            if c is not None:
                self.add(c)

    def header_for(self, url: str) -> str:
        """`Cookie` header value (may be ""), jar key order."""
        return "; ".join(
            f"{c['name']}={c['value']}"
            for c in self.cookies()
            if match_uri_py(url, c)
        )


# ------------------------------------------------------------- Spark layer


def jar_upsert(jar_df: DataFrame, new_df: DataFrame) -> DataFrame:
    """MERGE semantics of repeated ``Cookiejar.add``: new cookies win
    on key (name,domain,path); ``max_age == 0`` deletes."""
    key = ["name", "domain", "path"]
    kept = jar_df.join(new_df.select(*key), on=key, how="left_anti")
    merged = kept.unionByName(new_df)
    return merged.where(F.col("max_age").isNull() | (F.col("max_age") != 0))


def fold_cookie_events(base_jar: DataFrame, events: DataFrame | None) -> DataFrame:
    """ONE global last-write-wins fold over parsed cookie events
    carrying ``(epoch, depth, discovered_epoch, url_norm, hop, idx,
    c)`` — the whole-crawl equivalent of the per-epoch winner window +
    :func:`jar_upsert` chain, collapsed to a single window + filter.

    Equivalence: chained upserts mean "the last epoch to touch a key
    owns it, with the within-epoch winner picked by the (depth,
    discovered_epoch, url_norm, hop, idx) visit-order tuple, and a
    winning ``max_age == 0`` deleting the key".  Making ``epoch`` the
    LEADING sort key of one global window reproduces exactly that
    (later epoch always wins; within an epoch the original tuple
    decides), and applying the delete filter to the single global
    winner matches the chain because an upsert's delete only ever
    removes what a later epoch doesn't re-add.  ``base_jar`` (a
    resumed snapshot jar, one row per key, deletes already applied)
    enters as epoch ``-1`` pseudo-events so any new touch of its key
    wins.  Scale: the shuffle carries one row per Set-Cookie EVENT
    (not per URL), partitioned by cookie key — no epoch-count factor
    in plan depth, which is what makes a 10^4-epoch crawl's jar plan
    O(1) instead of O(epochs)."""
    base_ev = base_jar.select(
        F.lit(-1).alias("epoch"),
        F.lit(-1).alias("depth"),
        F.lit(-1).alias("discovered_epoch"),
        F.lit("").alias("url_norm"),
        F.lit(-1).alias("hop"),
        F.lit(-1).alias("idx"),
        F.struct(*[F.col(f.name) for f in COOKIE_FIELDS]).alias("c"),
    )
    ev = base_ev if events is None else base_ev.unionByName(
        events.select(
            "epoch", "depth", "discovered_epoch", "url_norm", "hop", "idx", "c"
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(
        F.col("c")["name"], F.col("c")["domain"], F.col("c")["path"]
    ).orderBy(
        F.desc("epoch"),
        F.desc("depth"),
        F.desc("discovered_epoch"),
        F.desc("url_norm"),
        F.desc("hop"),
        F.desc("idx"),
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("c.*")
        .where(F.col("max_age").isNull() | (F.col("max_age") != 0))
    )


def jar_remove(jar_df: DataFrame, remove_df: DataFrame) -> DataFrame:
    key = ["name", "domain", "path"]
    return jar_df.join(remove_df.select(*key), on=key, how="left_anti")


@F.pandas_udf(COOKIE_T)
def parse_set_cookie_udf(url: pd.Series, header_value: pd.Series) -> pd.DataFrame:
    """One Set-Cookie header string -> cookie struct (NULL name when
    unparseable)."""
    rows = []
    for u, hv in zip(url, header_value):
        c = parse_set_cookie(hv or "", u or "")
        rows.append(
            c
            if c is not None
            else {
                "name": None,
                "value": None,
                "max_age": None,
                "domain": None,
                "path": None,
                "secure": None,
            }
        )
    return pd.DataFrame(
        rows, columns=["name", "value", "max_age", "domain", "path", "secure"]
    )


_COOKIES_ARR_T = T.ArrayType(COOKIE_T)


@F.pandas_udf(_COOKIES_ARR_T)
def _parse_set_cookies_udf(url: pd.Series, values: pd.Series) -> pd.Series:
    out = []
    for u, vals in zip(url, values):
        cookies = []
        for hv in (vals if vals is not None else []):
            c = parse_set_cookie(hv, u or "")
            if c is not None:
                cookies.append(c)
        out.append(cookies)
    return pd.Series(out)


def cookies_from_responses(
    responses: DataFrame, url_col: str = "url", headers_col: str = "headers"
) -> DataFrame:
    """Explode Set-Cookie headers of fetch responses into cookie rows.
    ``headers`` is ``map<string, array<string>>`` (lowercased names);
    later responses must be upserted after earlier ones — the caller
    controls that by per-hop sequencing (src/agent.ml:84-88)."""
    sc = F.coalesce(
        F.element_at(F.col(headers_col), "set-cookie"),
        F.expr("CAST(array() AS array<string>)"),
    )
    parsed = responses.select(
        F.col(url_col).alias("_url"), _parse_set_cookies_udf(F.col(url_col), sc).alias("_cs")
    )
    return parsed.select(F.explode("_cs").alias("c")).select("c.*")


def cookie_match_cond(host: Column, uri_path: Column, jar) -> Column:
    """Theta-join condition (requests x jar) — cookiejar.ml:48-66."""
    dom = jar["domain"]
    delta = F.length(host) - F.length(dom)
    char_before = F.substr(host, delta, F.lit(1))
    domain_ok = (host == dom) | (
        (delta > 0) & host.endswith(dom) & (char_before == ".")
    )
    path_ok = uri_path.startswith(jar["path"])
    return domain_ok & path_ok


# jar sizes up to this ride the broadcast-scan strategy; beyond it the
# suffix-chain hash equi-join wins (shared with agent.fetch's
# count-free jar_size_hint gate)
SMALL_JAR_THRESHOLD = 4096


def add_to_headers(
    requests: DataFrame,
    jar_df: DataFrame,
    url_col: str = "url",
    out_col: str = "cookie_header",
    strategy: str = "auto",
    small_jar_threshold: int = SMALL_JAR_THRESHOLD,
) -> DataFrame:
    """Append the matched ``Cookie`` header value (jar key order,
    possibly "") to every request row (cookiejar.ml:123-137).

    Two physical strategies, same result (tested equal):

    * ``"scan"`` — the whole jar folded into ONE sorted
      ``array<struct>`` row, broadcast, matched per request with
      ``filter``/``transform`` higher-order functions. Map-only (the
      request stream never shuffles) but O(|jar|) work per request
      row: optimal while the jar is orders of magnitude smaller than
      the request stream (an agent's session jar).
    * ``"join"`` — the request host is exploded into its dotted
      suffix chain (``a.b.com`` -> [``a.b.com``, ``b.com``, ``com``],
      exactly the candidate set cookiejar.ml:48-54's ``domain_match``
      can accept, boundary-dot quirk included) and hash equi-joined
      against the jar on ``domain`` (small side broadcast), then
      path-prefix filtered and re-aggregated per request in jar key
      order. Per-request cost is O(host depth + matches), independent
      of jar size — the scale path for a crawl-wide jar (10^7+
      cookies), where the broadcast degrades to a shuffled hash join
      but never a per-row linear scan.

    ``"auto"`` counts the jar once and picks ``scan`` iff it has at
    most ``small_jar_threshold`` rows."""
    if strategy == "auto":
        strategy = "scan" if jar_df.count() <= small_jar_threshold else "join"
    if strategy == "join":
        return _add_to_headers_join(requests, jar_df, url_col, out_col)
    if strategy != "scan":
        raise ValueError(f"unknown add_to_headers strategy: {strategy!r}")
    return _add_to_headers_scan(requests, jar_df, url_col, out_col)


def _add_to_headers_scan(
    requests: DataFrame,
    jar_df: DataFrame,
    url_col: str,
    out_col: str,
) -> DataFrame:
    from mechaml_spark.page import host_col, path_col

    # one row: the jar serialized in key order (name^domain^path)
    jar_arr = jar_df.select(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.concat_ws("", "name", "domain", "path").alias("k"),
                    F.col("name").alias("name"),
                    F.col("value").alias("value"),
                    F.col("domain").alias("domain"),
                    F.col("path").alias("path"),
                )
            )
        ).alias("_jar")
    )
    host = F.col("_req_host")
    path = F.col("_req_path")

    def _match(c):
        # cookiejar.ml:48-66 — domain equality or dotted-suffix (the
        # leading-dot quirk preserved); plain path prefix; `secure`
        # never consulted
        delta = F.length(host) - F.length(c["domain"])
        domain_ok = (host == c["domain"]) | (
            (delta > 0)
            & host.endswith(c["domain"])
            & (F.substring(host, delta, F.lit(1)) == ".")
        )
        # match_uri guard: a URL without a host matches nothing (even
        # an empty-domain cookie) — mirrors match_uri_py's early False
        return (F.length(host) > 0) & domain_ok & path.startswith(c["path"])

    header = F.array_join(
        F.transform(
            F.filter(F.col("_jar"), _match),
            lambda c: F.concat_ws("=", c["name"], c["value"]),
        ),
        "; ",
    )
    return (
        requests
        # host/path as real columns first: a Python UDF may not appear
        # inside a higher-order-function lambda, so the lambda below
        # references these attributes instead
        .withColumn("_req_host", host_col(F.col(url_col)))
        .withColumn("_req_path", path_col(F.col(url_col)))
        .join(F.broadcast(jar_arr))
        .withColumn(out_col, F.coalesce(header, F.lit("")))
        .drop("_jar", "_req_host", "_req_path")
    )


def _host_suffix_chain(host: Column) -> Column:
    """All domains that cookiejar.ml:48-54's ``domain_match`` can accept
    for ``host``: the host itself (equality arm) plus every suffix that
    starts right after a '.' (the dotted-suffix arm — the char before
    the suffix must be '.').  A stored leading-dot domain is therefore
    reachable only through the equality arm, preserving the quirk that
    it never matches its subdomains.  Pure expression, codegen'd."""
    dots = F.filter(
        F.sequence(F.lit(1), F.greatest(F.length(host), F.lit(1))),
        lambda i: host.substr(i, F.lit(1)) == ".",
    )
    suffixes = F.transform(dots, lambda i: host.substr(i + 1, F.length(host)))
    return F.array_distinct(F.concat(F.array(host), suffixes))


def _add_to_headers_join(
    requests: DataFrame,
    jar_df: DataFrame,
    url_col: str,
    out_col: str,
) -> DataFrame:
    """Hash-join strategy: explode the host suffix chain, equi-join the
    jar on ``domain``, path-prefix filter, regroup per request.

    Equivalence with ``domain_match`` (cookiejar.ml:48-54): a cookie
    domain matches a host iff it equals the host or equals a suffix
    preceded by '.', i.e. iff it appears in ``_host_suffix_chain`` —
    so one equi-join replaces the theta scan, and each jar cookie can
    match a given request through at most one chain element (the
    chain's elements have pairwise distinct lengths), so no dedup is
    needed before the regroup.

    Plan shape: explode_outer (keeps zero-candidate rows, e.g. null
    hosts from invalid URLs) -> BroadcastHashJoin(left outer) on the
    exploded domain -> groupBy on a per-request id with map-side
    partial aggregation (exploded rows of one request are adjacent, so
    the shuffle carries ~1 row per request).  Single linear plan: the
    monotonically_increasing_id is generated and consumed once, never
    compared across plan branches."""
    from mechaml_spark.page import host_col, path_col

    orig_cols = list(requests.columns)
    req = (
        requests.withColumn("_rid", F.monotonically_increasing_id())
        .withColumn("_req_host", host_col(F.col(url_col)))
        .withColumn("_req_path", path_col(F.col(url_col)))
    )
    # match_uri guard: hostless URLs get a NULL chain -> explode_outer
    # keeps the row with _dom NULL -> zero matches (match_uri_py parity)
    chain = F.when(
        F.length("_req_host") > 0, _host_suffix_chain(F.col("_req_host"))
    )
    exploded = req.select("*", F.explode_outer(chain).alias("_dom"))
    jar = jar_df.select(
        F.col("domain").alias("_dom"),
        F.struct(
            F.concat_ws("", "name", "domain", "path").alias("k"),
            F.col("name").alias("name"),
            F.col("value").alias("value"),
            F.col("domain").alias("domain"),
            F.col("path").alias("path"),
        ).alias("_ck"),
    )
    joined = exploded.join(F.broadcast(jar), on="_dom", how="left").withColumn(
        "_ck",
        # path_match (cookiejar.ml:56-59): plain prefix; a failing
        # cookie becomes a non-match but the request row survives
        F.when(F.col("_req_path").startswith(F.col("_ck.path")), F.col("_ck")),
    )
    header = F.array_join(
        F.transform(
            # same sort struct as the scan strategy: jar key order =
            # lexicographic on name^domain^path (cookiejar.ml:94-96)
            F.array_sort(F.collect_list("_ck")),
            lambda c: F.concat_ws("=", c["name"], c["value"]),
        ),
        "; ",
    )
    aggs = [F.first(F.col(c)).alias(c) for c in orig_cols]
    aggs.append(F.coalesce(header, F.lit("")).alias(out_col))
    return joined.groupBy("_rid").agg(*aggs).select(*orig_cols, out_col)


