"""Sequential reference-semantics crawler — THE crawl specification.

The Spark scheduler (:mod:`mechaml_spark.frontier.scheduler`) must
reproduce this oracle's visit ordering and final URL-seen membership
byte-for-byte (BASELINE.json north_rule).  Both operate on the same
deterministic corpus (:mod:`mechaml_spark.corpus`).

CRAWL SEMANTICS (normative)
===========================

State: frontier of pending rows ``(url_norm, host, depth,
discovered_epoch)``; ``seen`` set of canonical URLs; cookie jar;
visit log; pages log; payload table.

Epoch ``e`` = 0, 1, ... while pending URLs remain and ``e < max_epochs``:

1. **Robots filter.** Pending URLs whose path starts with a
   disallowed prefix for their host are removed permanently and
   logged with status ``-1`` (robots rules are known per host ahead
   of the epoch — broadcast state; robots.txt fetches are not part
   of the visit order).
2. **Politeness scheduling.** Per host, order candidates by the
   total priority key ``(depth, discovered_epoch, url_norm)`` and
   select the first ``budget_per_host``; the rest stay pending
   unchanged.  The epoch's **visit order** is the selected set
   sorted by the same key globally (host-interleaved,
   deterministic; at scale this is a sort key, never a counter).
3. **Fetch** each selected URL, in visit order.  Every fetch starts
   from the epoch-start jar copy (the reference's parallel-map
   semantics: each item gets a copy of the initial agent and
   updated states are discarded, src/agent.ml:270-278).  Redirect
   loop (src/agent.ml:65, 73-97): follow ONLY 301/302 with a
   ``Location`` header, with a GET, while ``hops < max_redirect``
   (default 5); each hop's Set-Cookie headers are collected in hop
   order; each hop target's canonical URL joins ``seen``.  At the
   cap the 3xx response is the final response.  A URL absent from
   the corpus is a 404 with no body.
4. **Extract.** For final responses with status 200: parse HTML;
   links resolve against the page's base URI (``<base href>``
   override) using the FINAL landing URL as location; canonicalize;
   keep http(s) only.  New-URL depth = parent depth + 1 (min across
   parents within the epoch).  URLs already in ``seen`` are
   dropped; survivors enter the frontier with
   ``discovered_epoch = e`` and join ``seen`` immediately.
5. **Payload.** ``<img>`` src URLs of the form
   ``http://images.test/im/{image_id}.{ext}`` are deduped globally
   by image_id (first occurrence in visit order wins) and joined
   against the images table; each payload row must satisfy the
   decoded-pixel invariant + caption equality (caption = img alt).
6. **Cookies.** All Set-Cookie values collected this epoch are
   folded into the epoch-start jar in (visit order, hop order) —
   last write per (name, domain, path) wins — producing the next
   epoch's jar.

Seeds enter the frontier (and ``seen``) at depth 0,
``discovered_epoch = 0``, deduped, before epoch 0.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from mechaml_spark import urlkit
from mechaml_spark.cookies import Jar, parse_set_cookie
from mechaml_spark.corpus import CorpusSpec, robots_rules, server_response
from mechaml_spark.extract import parse_page
from mechaml_spark.frontier.robots import robots_allowed

MAX_REDIRECT = 5  # src/agent.ml:65


@dataclass
class OracleResult:
    visit_log: list[tuple] = field(default_factory=list)
    # (epoch, depth, discovered_epoch, url_norm, final_url, status)
    pages_log: list[tuple] = field(default_factory=list)
    # (epoch, url_norm, status)  incl. robots (-1) and 404
    seen: set[str] = field(default_factory=set)
    payload_ids: list[str] = field(default_factory=list)  # first-visit order
    cookies: list[dict] = field(default_factory=list)
    epochs: int = 0


def crawl_oracle(
    spec: CorpusSpec,
    seeds: list[str],
    budget_per_host: int = 2,
    max_epochs: int = 10,
    max_redirect: int = MAX_REDIRECT,
    host_budgets: dict[str, int] | None = None,
) -> OracleResult:
    rules = robots_rules(spec)
    res = OracleResult()
    jar = Jar()

    frontier: dict[str, tuple[int, int]] = {}  # url -> (depth, disc_epoch)
    for s in seeds:
        u = urlkit.canonicalize(s)
        if u not in res.seen:
            res.seen.add(u)
            frontier[u] = (0, 0)

    payload_seen: set[str] = set()

    for epoch in range(max_epochs):
        if not frontier:
            break
        res.epochs = epoch + 1
        # 1. robots
        blocked = [
            u
            for u in frontier
            if not robots_allowed(
                urlkit.path_of(u), rules.get(urlkit.host_of(u), [])
            )
        ]
        for u in sorted(blocked):
            res.pages_log.append((epoch, u, -1))
            del frontier[u]
        # 2. politeness scheduling
        by_host: dict[str, list[tuple]] = {}
        for u, (d, de) in frontier.items():
            by_host.setdefault(urlkit.host_of(u), []).append((d, de, u))
        selected: list[tuple] = []
        for host, items in by_host.items():
            items.sort()
            b = (
                host_budgets.get(host, budget_per_host)
                if host_budgets
                else budget_per_host
            )
            selected.extend(items[:b])
        selected.sort()  # global visit order: (depth, disc_epoch, url)
        # 3. fetch
        epoch_set_cookies: list[tuple[str, str]] = []  # (url, header) ordered
        fetched: list[tuple] = []  # (depth, de, url, final_url, status, body)
        for d, de, u in selected:
            del frontier[u]
            current, hops = u, 0
            # each fetch uses a copy of the epoch-start jar (map_p);
            # cookies are injected on EVERY hop — the reference's
            # redirect loop recursively calls `get`, which re-matches
            # the jar per request (src/agent.ml:79-80, 99-101)
            _ = jar.header_for(current)  # hop-0 cookie injection
            resp = server_response(spec, current)
            while True:
                if resp is not None:
                    for hv in resp["set_cookie"]:
                        epoch_set_cookies.append((current, hv))
                status = resp["status"] if resp is not None else 404
                if (
                    resp is not None
                    and status in (301, 302)
                    and resp["location"]
                    and hops < max_redirect
                ):
                    hops += 1
                    current = urlkit.canonicalize(
                        urlkit.resolve(current, resp["location"])
                    )
                    res.seen.add(current)
                    _ = jar.header_for(current)  # per-hop re-injection
                    resp = server_response(spec, current)
                    continue
                break
            fetched.append((d, de, u, current, status,
                            resp["body"] if resp is not None else None))
            res.visit_log.append((epoch, d, de, u, current, status))
            res.pages_log.append((epoch, u, status))
        # 4. extract + 5. payload
        discovered: dict[str, int] = {}  # url -> min depth
        for d, de, u, final_url, status, body in fetched:
            if status != 200 or not body:
                continue
            parsed = parse_page(final_url, body)
            for ln in parsed["links"]:
                if ln["href"] is None:
                    continue
                target = urlkit.canonicalize(
                    urlkit.resolve(parsed["base_uri"], ln["href"])
                )
                if not target.startswith(("http://", "https://")):
                    continue
                nd = d + 1
                if target not in discovered or discovered[target] > nd:
                    discovered[target] = nd
            for im in parsed["images"]:
                src = im["src"] or ""
                if src.startswith("http://images.test/im/"):
                    iid = src.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                    if iid not in payload_seen:
                        payload_seen.add(iid)
                        res.payload_ids.append(iid)
        for target in sorted(discovered):
            if target not in res.seen:
                res.seen.add(target)
                frontier[target] = (discovered[target], epoch)
        # 6. cookies: fold in order, last write wins
        for u, hv in epoch_set_cookies:
            c = parse_set_cookie(hv, u)
            if c is not None:
                jar.add(c)
    res.cookies = jar.cookies()
    return res
