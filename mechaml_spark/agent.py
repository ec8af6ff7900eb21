"""Agent facade: the reference's HTTP verbs as DataFrame stages.

Maps src/agent.ml onto Spark (SURVEY.md §2.1, §2.6, §2.7):
  * ``Agent.get/post`` -> :func:`fetch` — one bounded redirect-loop
    stage over a request DataFrame (301/302-only, GET-on-redirect,
    ``max_redirect`` = 5 default, per-hop Set-Cookie collection —
    src/agent.ml:65, 73-97);
  * ``Agent.click`` -> :func:`click` — fetch the resolved link uris;
  * ``Agent.submit`` -> :func:`submit` — synthesize the request from
    form method/state (src/agent.ml:119-130) then fetch;
  * ``Agent.save_content``/``save_image`` -> :func:`save_content` —
    parquet sink append (the reference's fire-and-forget write race,
    src/agent.ml:132-137, is deliberately NOT replicated);
  * ``HttpResponse.*`` accessors -> plain columns of the response
    frame; ``.page`` -> deferred :func:`mechaml_spark.extract.parse_pages`;
  * the state monad (src/agent.ml:164-228) -> driver-side transform
    composition; ``List.map_p`` fan-out -> the stage's inherent task
    parallelism with a read-only jar snapshot per superstep.

The fetcher is pluggable: :class:`CorpusFetcher` joins the synthetic
corpus (sandbox default — network-free, deterministic);
:class:`HttpFetcher` is the real-network backend, stubbed in-sandbox.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mechaml_spark import cookies as ck
from mechaml_spark import page

MAX_REDIRECT = 5  # src/agent.ml:65


class CorpusFetcher:
    """Network-free fetcher: LEFT-join requests against a response
    table keyed by canonical URL (missing rows -> 404).  On a real
    deployment the same stage shape becomes a host-partitioned
    ``applyInPandas`` HTTP batch."""

    def __init__(self, corpus: DataFrame) -> None:
        self.corpus = corpus  # (url_norm, status, location, set_cookie, body)

    def fetch(self, requests: DataFrame, url_col: str) -> DataFrame:
        # explicit side aliases: request frames often derive from a
        # previous fetch of the SAME corpus (click/submit chains), which
        # would otherwise trip Spark's ambiguous-self-join detection
        r = requests.alias("_req")
        c = self.corpus.alias("_corpus")
        j = r.join(
            c, F.col(f"_req.{url_col}") == F.col("_corpus.url_norm"), "left"
        )
        return j.select(
            *[F.col(f"_req.{col}") for col in requests.columns],
            F.coalesce(F.col("_corpus.status"), F.lit(404)).alias("status"),
            F.col("_corpus.location").alias("location"),
            F.col("_corpus.set_cookie").alias("set_cookie"),
            F.col("_corpus.body").alias("body"),
        )


class HttpFetcher:
    """Real-network backend: host-partitioned ``applyInPandas`` HTTP
    batches (stdlib urllib — no extra deps).

    Contract matches :class:`CorpusFetcher`: one request per row, NO
    client-side auto-redirects (the bounded hop loop in :func:`fetch`
    owns redirect semantics so 301/302-only / GET-on-redirect /
    max-hop parity holds for every backend), all ``Set-Cookie``
    headers collected verbatim.  Rows are grouped by host so each
    task reuses one connection per origin and applies ``delay_s``
    between same-host requests (politeness inside the task; the
    scheduler's per-host budget bounds the per-epoch volume).
    Network errors never fail the task: ``status`` is the HTTP status,
    404 for DNS/connect failures, and ``body`` is NULL (per-row catch
    semantics, src/agent.ml:187-198).

    The sandbox has no network, so this class is exercised only for
    plan construction in tests; the synthetic :class:`CorpusFetcher` /
    :class:`ResolvedCorpusFetcher` are the hermetic backends.
    """

    def __init__(
        self,
        timeout_s: float = 10.0,
        delay_s: float = 0.0,
        max_body: int = 8 << 20,
        user_agent: str = "mechaml-spark/1.0",
    ) -> None:
        self.timeout_s = timeout_s
        self.delay_s = delay_s
        self.max_body = max_body
        self.user_agent = user_agent

    def fetch(self, requests: DataFrame, url_col: str) -> DataFrame:
        from pyspark.sql import types as T

        in_fields = list(requests.schema.fields)
        out_schema = T.StructType(
            in_fields
            + [
                T.StructField("status", T.IntegerType()),
                T.StructField("location", T.StringType()),
                T.StructField("set_cookie", T.ArrayType(T.StringType())),
                T.StructField("body", T.StringType()),
            ]
        )
        timeout_s, delay_s = self.timeout_s, self.delay_s
        max_body, ua = self.max_body, self.user_agent
        cols = [f.name for f in in_fields]

        def run(_key, pdf):
            import time as _time
            import urllib.error
            import urllib.request

            import pandas as pd

            class _NoRedirect(urllib.request.HTTPRedirectHandler):
                def redirect_request(self, *a, **kw):  # never follow
                    return None

            opener = urllib.request.build_opener(_NoRedirect)
            rows = []
            first = True
            for rec in pdf.to_dict("records"):
                if not first and delay_s:
                    _time.sleep(delay_s)
                first = False
                url = rec[url_col]
                status, location, cookies, body = 404, None, [], None
                try:
                    req = urllib.request.Request(
                        url, headers={"User-Agent": ua}
                    )
                    with opener.open(req, timeout=timeout_s) as resp:
                        status = resp.status
                        location = resp.headers.get("Location")
                        cookies = resp.headers.get_all("Set-Cookie") or []
                        body = resp.read(max_body).decode(
                            "utf-8", errors="replace"
                        )
                except urllib.error.HTTPError as e:
                    # includes unfollowed 3xx (redirect handler
                    # returns None -> HTTPError with full headers)
                    status = e.code
                    location = e.headers.get("Location")
                    cookies = e.headers.get_all("Set-Cookie") or []
                    try:
                        body = e.read(max_body).decode(
                            "utf-8", errors="replace"
                        )
                    except Exception:
                        body = None
                except Exception:
                    pass  # DNS/connect/timeout -> 404, NULL body
                rows.append(
                    {
                        **{c: rec[c] for c in cols},
                        "status": status,
                        "location": location,
                        "set_cookie": cookies,
                        "body": body,
                    }
                )
            return pd.DataFrame(rows, columns=cols + [
                "status", "location", "set_cookie", "body"
            ])

        tagged = requests.withColumn(
            "_fetch_host", page.host_col(F.col(url_col))
        )
        return tagged.groupBy("_fetch_host").applyInPandas(
            lambda key, pdf: run(key, pdf.drop(columns=["_fetch_host"])),
            schema=out_schema,
        )


def resolve_redirect_closure(
    corpus: DataFrame, max_redirect: int = MAX_REDIRECT
) -> DataFrame:
    """Redirect closure of a response corpus: for every corpus URL,
    the final landing response plus per-hop metadata, following the
    reference's redirect semantics exactly (301/302-only, ``Location``
    required, GET on redirect, counter cap ``max_redirect`` with the
    3xx returned as-is at the cap — src/agent.ml:65, 73-97).

    A real distributed fetch stage chases redirects *inside* the fetch
    task (the HTTP client loops per row); relationally simulating that
    per superstep costs a bounded join loop per epoch.  The closure is
    that chase precomputed ONCE per crawl over the corpus — epochs then
    fetch with a single equi-join (see :class:`ResolvedCorpusFetcher`).

    Output columns: ``url_norm`` (request), ``final_url``, ``status``,
    ``body``, ``cookie_hops: array<struct<hop,src_url,set_cookie>>``,
    ``hop_urls: array<struct<url_norm,host>>`` (landing URLs of hops
    >= 1, in hop order, regardless of landing status — matching the
    loop path, which records a redirect target before fetching it).
    """
    hop_t = (
        "array<struct<hop:int,src_url:string,set_cookie:array<string>>>"
    )
    cur = corpus.select(
        F.col("url_norm").alias("req_url"),
        F.col("url_norm").alias("cur_url"),
        "status",
        "location",
        "body",
        F.array(
            F.struct(
                F.lit(0).alias("hop"),
                F.col("url_norm").alias("src_url"),
                F.col("set_cookie").alias("set_cookie"),
            )
        ).cast(hop_t).alias("cookie_hops"),
        F.array().cast("array<struct<url_norm:string,host:string>>").alias(
            "hop_urls"
        ),
    )
    c = corpus.select(
        F.col("url_norm").alias("_lu"),
        F.col("status").alias("_ls"),
        F.col("location").alias("_ll"),
        F.col("set_cookie").alias("_lc"),
        F.col("body").alias("_lb"),
    )
    out_cols = [
        F.col("req_url").alias("url_norm"),
        F.col("cur_url").alias("final_url"),
        "status",
        "body",
        "cookie_hops",
        "hop_urls",
    ]
    redir = lambda: (  # noqa: E731
        F.col("status").isin(301, 302) & F.col("location").isNotNull()
    )
    finals = None
    for hop in range(max_redirect):
        done = cur.where(~redir()).select(*out_cols)
        finals = done if finals is None else finals.unionByName(done)
        nxt_url = page.canonicalize_col(
            page.resolve_col(F.col("cur_url"), F.col("location"))
        )
        stepped = cur.where(redir()).withColumn("_nu", nxt_url)
        joined = stepped.join(c, stepped["_nu"] == c["_lu"], "left")
        cur = joined.select(
            "req_url",
            F.col("_nu").alias("cur_url"),
            F.coalesce(F.col("_ls"), F.lit(404)).alias("status"),
            F.col("_ll").alias("location"),
            F.col("_lb").alias("body"),
            F.concat(
                F.col("cookie_hops"),
                F.array(
                    F.struct(
                        F.lit(hop + 1).alias("hop"),
                        F.col("_nu").alias("src_url"),
                        F.col("_lc").alias("set_cookie"),
                    )
                ).cast(hop_t),
            ).alias("cookie_hops"),
            F.concat(
                F.col("hop_urls"),
                F.array(
                    F.struct(
                        F.col("_nu").alias("url_norm"),
                        page.host_col(F.col("_nu")).alias("host"),
                    )
                ),
            ).alias("hop_urls"),
        )
    # at the cap: whatever remains (redirecting or not) is final as-is
    finals = finals.unionByName(cur.select(*out_cols))
    return finals


class ResolvedCorpusFetcher:
    """Single-join fetcher over a precomputed redirect closure.

    Produces the identical :class:`FetchResult` contract as the
    bounded hop loop in :func:`fetch`, but each superstep costs ONE
    equi-join — the per-epoch driver-side planning of the hop chain
    (serial, non-scaling) disappears.  Requests absent from the
    closure yield per-row 404 error rows (catch semantics,
    src/agent.ml:187-198)."""

    def __init__(self, closure: DataFrame) -> None:
        self.closure = closure  # resolve_redirect_closure output, cached

    def fetch_result(
        self,
        requests: DataFrame,
        url_col: str = "url_norm",
        carry_cols: tuple[str, ...] = (),
    ) -> FetchResult:
        carry = [col for col in carry_cols]
        r = requests.alias("_req")
        cl = self.closure.alias("_cl")
        j = r.join(
            cl, F.col(f"_req.{url_col}") == F.col("_cl.url_norm"), "left"
        ).select(
            *[F.col(f"_req.{col}") for col in [*carry, url_col]],
            F.coalesce(
                F.col("_cl.final_url"), F.col(f"_req.{url_col}")
            ).alias("final_url"),
            F.coalesce(F.col("_cl.status"), F.lit(404)).alias("status"),
            F.col("_cl.body").alias("body"),
            F.col("_cl.cookie_hops").alias("cookie_hops"),
            F.col("_cl.hop_urls").alias("hop_urls"),
        ).localCheckpoint(eager=False)
        finals = j.select(*carry, url_col, "final_url", "status", "body")
        cookie_events = (
            j.select(*carry, url_col, F.explode("cookie_hops").alias("ch"))
            .select(
                *carry,
                url_col,
                F.col("ch.hop").alias("hop"),
                F.posexplode(F.col("ch.set_cookie")).alias("idx", "hv"),
                F.col("ch.src_url").alias("src_url"),
            )
        )
        hop_targets = (
            j.select(F.explode("hop_urls").alias("hu"))
            .select(F.col("hu.url_norm").alias("url_norm"),
                    F.col("hu.host").alias("host"))
        )
        return FetchResult(
            finals=finals, cookie_events=cookie_events, hop_targets=hop_targets
        )


@dataclass
class FetchResult:
    finals: DataFrame
    # carry cols + (final_url, status, body)
    cookie_events: DataFrame
    # carry cols + (hop, idx, hv, src_url) — fold order = carry-key + hop + idx
    hop_targets: DataFrame | None
    # (url_norm, host) canonical redirect-landing URLs (None if no redirects)


def fetch(
    requests: DataFrame,
    fetcher,
    jar: DataFrame | None = None,
    url_col: str = "url_norm",
    max_redirect: int = MAX_REDIRECT,
    carry_cols: tuple[str, ...] = (),
) -> FetchResult:
    """The fetch stage: cookie injection, bounded redirect following,
    per-hop cookie collection.

    ``requests`` must be UNIQUE on ``url_col`` (dedupe upstream —
    the frontier is deduped by construction); ``carry_cols`` pass
    through untouched and key the cookie-fold ordering.  ``finals``
    keeps the original URL under ``url_col`` plus
    ``(final_url, status, body)``.
    """
    carry = list(carry_cols)
    cur = requests.select(
        *carry,
        F.col(url_col).alias("req_url"),
        F.col(url_col).alias("cur_url"),
        F.lit(0).alias("hops"),
    )
    finals = None
    cookie_events = None
    hop_targets = None
    # The whole bounded hop chain is built as ONE lazy plan — no
    # driver actions per hop.  A real fetch stage follows redirects
    # inside the fetch task (the HTTP client loops per row), so the
    # chain is data-parallel; expressing it as chained plan branches
    # keeps the superstep at a single job instead of 2 jobs per hop.
    # Exhausted hops contribute empty branches that AQE collapses at
    # run time (the filter after the cached-corpus join yields 0 rows
    # and the downstream joins/unions are near-free).
    for _hop in range(max_redirect + 1):
        req = cur
        if jar is not None:
            req = ck.add_to_headers(cur, jar, url_col="cur_url")
        # lazy checkpoint per hop: ev/done/nxt all branch off `j`, so
        # materializing it once (blocks cached, lineage truncated)
        # stops the downstream unions from re-running the join chain —
        # while still issuing NO driver-side job here
        j = fetcher.fetch(req, "cur_url").localCheckpoint(eager=False)
        ev = j.select(
            *carry,
            F.col("req_url").alias(url_col) if url_col not in carry
            else F.col("req_url").alias("_req_url_dup"),
            F.col("hops").alias("hop"),
            F.posexplode("set_cookie").alias("idx", "hv"),
            F.col("cur_url").alias("src_url"),
        )
        if url_col in carry:
            ev = ev.drop("_req_url_dup")
        cookie_events = ev if cookie_events is None else cookie_events.unionByName(ev)
        redirecting = j.where(
            F.col("status").isin(301, 302)
            & F.col("location").isNotNull()
            & (F.col("hops") < max_redirect)
        )
        done = j.where(
            ~(
                F.col("status").isin(301, 302)
                & F.col("location").isNotNull()
                & (F.col("hops") < max_redirect)
            )
        ).select(
            *carry,
            *([] if url_col in carry else [F.col("req_url").alias(url_col)]),
            F.col("cur_url").alias("final_url"),
            "status",
            "body",
        )
        finals = done if finals is None else finals.unionByName(done)
        if _hop == max_redirect:
            break
        nxt = redirecting.select(
            *carry,
            "req_url",
            page.canonicalize_col(
                page.resolve_col(F.col("cur_url"), F.col("location"))
            ).alias("cur_url"),
            (F.col("hops") + 1).alias("hops"),
        )
        tgt = nxt.select(
            F.col("cur_url").alias("url_norm"),
            page.host_col(F.col("cur_url")).alias("host"),
        )
        hop_targets = tgt if hop_targets is None else hop_targets.unionByName(tgt)
        cur = nxt
    return FetchResult(
        finals=finals, cookie_events=cookie_events, hop_targets=hop_targets
    )


def get(urls: DataFrame, fetcher, jar: DataFrame | None = None,
        url_col: str = "url_norm", **kw) -> FetchResult:
    """``Agent.get`` over a URL frame (src/agent.ml:99-106)."""
    return fetch(urls, fetcher, jar, url_col=url_col, **kw)


def click(links: DataFrame, fetcher, jar: DataFrame | None = None,
          **kw) -> FetchResult:
    """``Agent.click`` (src/agent.ml:108): follow resolved link uris.
    ``links`` = output of :func:`mechaml_spark.page.links_with`."""
    reqs = links.select(page.canonicalize_col(F.col("uri")).alias("url_norm"))
    return fetch(reqs, fetcher, jar, **kw)


def submit(forms: DataFrame, fetcher, jar: DataFrame | None = None,
           state_col=None, **kw) -> FetchResult:
    """``Agent.submit`` (src/agent.ml:119-130): synthesize the request
    from the form's method/action/state, then fetch.  ``forms`` =
    output of :func:`mechaml_spark.page.forms_with`; pass ``state_col``
    to submit a filled state instead of the defaults."""
    from mechaml_spark.forms import synthesize_submit_udf

    st = state_col if state_col is not None else F.col("node")["state"]
    req = forms.select(
        synthesize_submit_udf(F.col("uri"), F.col("node")["method"], st).alias("r")
    ).select(
        page.canonicalize_col(F.col("r")["url"]).alias("url_norm"),
        F.col("r")["method"].alias("method"),
        F.col("r")["body"].alias("req_body"),
    )
    return fetch(req, fetcher, jar, carry_cols=("method", "req_body"), **kw)


def save_content(responses: DataFrame, path: str, mode: str = "append") -> None:
    """``Agent.save_content``/``save_image`` sink: durable parquet
    append (NOT the reference's ignored write promise)."""
    responses.write.mode(mode).parquet(path)
