"""Link-graph authority scoring for frontier prioritization.

A production crawl orders its frontier by more than (depth, discovery
time): link authority — PageRank over the crawled link graph (Page,
Brin, Motwani, Winograd 1999, "The PageRank Citation Ranking") — is
the classic signal, feeding the same total-key priority sort the
scheduler already runs (frontier/scheduler.py).  This module gives the
engine that operator Spark-first:

* the iteration is the canonical Pregel-as-relational-algebra loop:
  one equi-join (ranks → edges on src) + one partial-aggregated
  groupBy (contributions by dst) per iteration — no RDDs, no GraphX
  dependency, no driver-side adjacency;
* **exact integer fixed-point arithmetic** (ranks in ``1/scale``
  units, floor divisions in a pinned order) so results are
  bit-reproducible across partitionings, parallelism levels, AND the
  DuckDB oracle — float summation-order drift can never flip a
  priority comparison between two runs of the same crawl;
* dangling mass (pages with no outlinks — at web scale, a third of
  the graph) is redistributed uniformly each iteration via a one-row
  aggregate broadcast-crossJoined back in, never a driver collect.

Scale posture at 10^10 edges: both per-iteration shuffles key on node
ids; a hub page's in-edges land in one groupBy key, which partial
aggregation (map-side combine) flattens before the exchange, and AQE
skew-join handles the join side.  The rank table is O(nodes), edges
are never materialized per-iteration beyond the shuffle.

Reference parity: the reference engine has no graph operator (it is a
single-agent scraping monad, src/agent.ml); this is engine-brief
breadth for the crawl tier's priority queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "hits", "opic", "connected_components"]


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = 10**9,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over ``edges(src, dst)`` in exact integer fixed-point.

    Per node v, with N = |nodes| and in-sum(v) the floor-divided
    contributions ``rank(u) // outdeg(u)`` over in-edges (u, v):

        rank'(v) = (damping_pct' * scale) // N
                   + damping_pct * (in_sum(v) + dangling // N) // 100

    where ``damping_pct' = (100 - damping_pct) // 1`` is applied as
    ``((100 - damping_pct) * scale // 100) // N`` and ``dangling`` is
    the rank mass parked on zero-outdegree nodes.  Every division is
    an integer floor in this exact order — the DuckDB oracle unrolls
    the same formula and matches bit-for-bit.

    Returns ``(node, rank)`` with ranks in ``1/scale`` units.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # one scalar job up front; N is plan metadata
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = ((100 - damping_pct) * scale // 100) // n

    ranks = nodes.withColumn("rank", F.lit(scale // n).cast("long"))
    for _ in range(n_iter):
        # per-edge share: rank(u) // outdeg(u), then partial-agg by dst
        shares = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                # `div`: exact JVM integer division, no float round-trip
                F.expr("rank div outdeg").alias("share"),
            )
        )
        insum = shares.groupBy("node").agg(F.sum("share").alias("insum"))
        # dangling mass: one-row aggregate, broadcast back — no collect
        dangling = (
            ranks.join(e.select("src").distinct(),
                       ranks["node"] == F.col("src"), "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dm"))
        )
        ranks = (
            nodes.join(insum, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.expr(
                    f"CAST({base} + ({damping_pct} * "
                    f"(coalesce(insum, 0) + (dm div {n}))) div 100 "
                    "AS LONG)"
                ).alias("rank"),
            )
        )
        # truncate lineage so n_iter doesn't stack into one mega-plan
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def hits(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 10**6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, "Authoritative
    Sources in a Hyperlinked Environment") in exact integer
    fixed-point — the complement to :func:`pagerank` for frontier
    prioritization: authorities are the pages worth fetching,
    hubs the directory/listing pages worth re-parsing for links.

    Per iteration:

        auth_raw(v) = sum over in-edges (u, v) of hub(u)
        auth(v)     = auth_raw(v) div max(1, total_auth_raw div scale)
        hub_raw(u)  = sum over out-edges (u, v) of auth(v)
        hub(u)      = hub_raw(u) div max(1, total_hub_raw div scale)

    The normalization divides by a PRE-DIVIDED total (never
    ``x * scale // tot``), so no intermediate exceeds
    ``|E| * scale`` — with ``scale = 10^6`` that stays inside int64
    to 10^12 edges.  The price is a coarse L1: each iteration's total
    lands in ``(scale/2, 2*scale]`` rather than at scale exactly —
    fine for ranking, which only compares scores within one
    iteration.  Every division is a pinned integer floor:
    bit-reproducible across partitionings/parallelism and unrollable
    by the DuckDB oracle (same discipline as :func:`pagerank`).

    Scale posture: per iteration two equi-joins on node ids + two
    partial-aggregated groupBys; the L1 totals are one-row aggregates
    broadcast-crossJoined back (never a driver collect).  Returns
    ``(node, hub, auth)`` in ``1/scale`` units.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    norm = f"coalesce(raw, 0) div greatest(1, tot div {scale})"
    hubs = nodes.withColumn("hub", F.lit(scale).cast("long"))
    auths = nodes.withColumn("auth", F.lit(0).cast("long"))

    def half(scores: DataFrame, score: str, join_on: str, out: str,
             out_name: str) -> DataFrame:
        raw = (
            e.join(scores, e[join_on] == scores["node"])
            .groupBy(F.col(out).alias("node"))
            .agg(F.sum(score).alias("raw"))
        )
        tot = raw.agg(F.coalesce(F.sum("raw"), F.lit(0)).alias("tot"))
        return (
            nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(tot))
            .select("node", F.expr(norm).cast("long").alias(out_name))
        )

    for _ in range(n_iter):
        auths = half(hubs, "hub", "src", "dst", "auth")
        auths = auths.localCheckpoint(eager=False)
        hubs = half(auths, "auth", "dst", "src", "hub")
        hubs = hubs.localCheckpoint(eager=False)
    return hubs.join(auths, "node").select("node", "hub", "auth")


def opic(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 10**9,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """OPIC — Adaptive On-Line Page Importance Computation (Abiteboul,
    Preda & Cobena, WWW 2003) in exact integer fixed-point: the
    frontier-prioritization signal designed FOR crawlers.  Unlike
    PageRank it needs no converged global iteration before it is
    useful — each page carries ``cash`` (importance flowing through it
    right now) and ``history`` (importance already observed), and
    ``importance = history + cash`` is meaningful after any number of
    steps, which is why a crawl scheduler can consume it mid-crawl.

    Synchronous batch form, every division an integer floor in a
    pinned order (same bit-reproducibility discipline as
    :func:`pagerank` — the DuckDB oracle unrolls the identical
    formula):

        cash_0(v)    = scale div N            history_0(v) = 0
        insum_i(v)   = sum over distinct in-edges (u, v) of
                       cash_i(u) div outdeg(u)
        dangling_i   = sum of cash_i(u) over zero-outdegree u
        cash_{i+1}(v)    = insum_i(v) + dangling_i div N
        history_{i+1}(v) = history_i(v) + cash_i(v)

    (the dangling term is the virtual-root page of the paper: cash
    parked on sinks re-enters uniformly, floor-div remainders are
    deliberately burned — deterministic, and a vanishing fraction at
    ``scale = 10^9``).

    Scale posture at 10^10 edges: one equi-join (cash → edges on src)
    + one partial-aggregated groupBy(dst) per iteration, identical
    shuffle shape to :func:`pagerank`; the dangling mass is a one-row
    aggregate broadcast-crossJoined back, never a driver collect; hub
    in-degree skew is flattened map-side by the partial agg.

    Returns ``(node, cash, history, importance)`` in ``1/scale``
    units.  Reference parity: the reference engine has no crawl
    scheduler at all (single-agent monad, src/agent.ml); this is
    engine-brief breadth for the frontier priority queue.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # one scalar job up front; N is plan metadata
    if n == 0:
        return (
            nodes.withColumn("cash", F.lit(0).cast("long"))
            .withColumn("history", F.lit(0).cast("long"))
            .withColumn("importance", F.lit(0).cast("long"))
        )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))

    state = nodes.select(
        "node",
        F.lit(scale // n).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("history"),
    )
    for _ in range(n_iter):
        insum = (
            e.join(state, e["src"] == state["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("cash div outdeg").alias("share"),
            )
            .groupBy("node")
            .agg(F.sum("share").alias("insum"))
        )
        dangling = (
            state.join(e.select("src").distinct(),
                       state["node"] == F.col("src"), "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0)).alias("dm"))
        )
        state = (
            state.join(insum, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.expr(f"coalesce(insum, 0) + (dm div {n})")
                .cast("long").alias("cash"),
                (F.col("history") + F.col("cash")).alias("history"),
            )
        )
        # truncate lineage so n_iter doesn't stack into one mega-plan
        state = state.localCheckpoint(eager=False)
    return state.select(
        "node", "cash", "history",
        (F.col("history") + F.col("cash")).alias("importance"),
    )


def connected_components(
    edges: DataFrame,
    n_iter: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Connected components over an undirected edge list — the
    cluster step a dedup pipeline runs on near-dup PAIRS (minhash
    bands, phash Hamming bands) to pick one canonical row per group:
    ``component`` is the MIN node id of the component, so "keep the
    keeper" is a groupBy(component).

    Algorithm: hash-min label propagation with pointer jumping
    (label(v) <- min over neighbors, then label(v) <- label(label(v))),
    the relational form of HashMin + pointer doubling — convergence in
    O(log diameter) rounds instead of O(diameter).  Labels only ever
    decrease toward the component min (integer min — bit-reproducible
    across partitionings and parallelism, like :func:`pagerank`).

    Per round: one equi-join (labels -> symmetric edges) + one
    partial-aggregated groupBy(min) + one self-equi-join on the label.
    Scale posture at 10^10 edges: both shuffles key on node/label ids;
    the groupBy collapses hub fan-in map-side before the exchange.
    The known hot spot is the jump join once a giant component forms
    (its label is a hot key) — AQE skew-join splits it; the
    small-star/large-star reformulation (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond") is the documented
    upgrade path if that ever dominates.

    ``n_iter`` must be >= ceil(log2(diameter)) + 1; results are a
    fixpoint thereafter (asserted in tests via an extra round).
    Returns ``(node, component)`` for every node with at least one
    edge (isolated vertices never enter an edge list — union them in
    upstream if they must appear)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    sym = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(n_iter):
        nbr = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(F.col("b").alias("nnode"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        labels = labels.join(
            nbr, labels["node"] == nbr["nnode"], "left"
        ).select(
            "node",
            F.least(
                F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))
            ).alias("comp"),
        )
        # pointer jump: comp is itself a node id, and labels are
        # monotone non-increasing, so label(label(v)) <= label(v).
        jump = labels.select(
            F.col("node").alias("jnode"), F.col("comp").alias("jcomp")
        )
        labels = labels.join(
            jump, labels["comp"] == jump["jnode"], "left"
        ).select(
            "node",
            F.coalesce(F.col("jcomp"), F.col("comp")).alias("comp"),
        )
        # truncate lineage per round (same reasoning as pagerank)
        labels = labels.localCheckpoint(eager=False)
    return labels.select("node", F.col("comp").alias("component"))
