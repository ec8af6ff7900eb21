"""PageRank in exact integer fixed-point: hand-computed values,
dangling-mass redistribution, and bit-reproducibility across
partitionings (the property float PageRank cannot give)."""

from pyspark.sql import functions as F

from mechaml_spark.linkgraph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_cycle_is_stationary(spark):
    """A 2-cycle starts uniform and must STAY uniform at every
    iteration count (the uniform vector is the stationary point)."""
    e = _edges(spark, [(1, 2), (2, 1)])
    for k in (1, 3):
        got = {r["node"]: r["rank"] for r in pagerank(e, n_iter=k).collect()}
        assert got == {1: 500_000_000, 2: 500_000_000}


def test_dangling_mass_hand_computed(spark):
    """a -> {b, c}; b and c dangle.  One iteration, every floor
    division done by hand:

      N=3, r0 = 333_333_333 each, base = 150_000_000 // 3 = 50_000_000
      share(a->b) = share(a->c) = 333_333_333 // 2 = 166_666_666
      dm = r(b)+r(c) = 666_666_666, dm // 3 = 222_222_222
      r1(a) = 50e6 + 85*(0 + 222_222_222) // 100          = 238_888_888
      r1(b) = 50e6 + 85*(166_666_666 + 222_222_222) // 100 = 380_555_554
    """
    e = _edges(spark, [(0, 1), (0, 2)])
    got = {r["node"]: r["rank"] for r in pagerank(e, n_iter=1).collect()}
    assert got == {0: 238_888_888, 1: 380_555_554, 2: 380_555_554}


def test_hub_outranks_leaves(spark):
    # star: many leaves all pointing at one hub
    e = _edges(spark, [(i, 0) for i in range(1, 21)])
    got = {r["node"]: r["rank"] for r in pagerank(e, n_iter=3).collect()}
    assert got[0] == max(got.values())
    assert got[0] > 5 * got[1]
    # leaves are symmetric: identical ranks
    assert len({got[i] for i in range(1, 21)}) == 1


def test_bit_reproducible_across_partitionings(spark):
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(50), rng.randrange(50)) for _ in range(300)]
    e = _edges(spark, pairs)
    a = {r["node"]: r["rank"]
         for r in pagerank(e.repartition(2), n_iter=3).collect()}
    b = {r["node"]: r["rank"]
         for r in pagerank(e.repartition(13), n_iter=3).collect()}
    assert a == b  # exact equality, not approx — integer fixed-point


def test_duplicate_edges_collapse(spark):
    e1 = _edges(spark, [(1, 2), (2, 1)])
    e2 = _edges(spark, [(1, 2), (1, 2), (1, 2), (2, 1)])
    a = {r["node"]: r["rank"] for r in pagerank(e1, n_iter=2).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(e2, n_iter=2).collect()}
    assert a == b


def test_rank_mass_approximately_conserved(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0), (3, 0), (0, 3)])
    total = (
        pagerank(e, n_iter=3)
        .agg(F.sum("rank").alias("t")).collect()[0]["t"]
    )
    # floor divisions only ever LOSE mass, and at most a few units per
    # node per iteration
    assert 0.999 * 10**9 < total <= 10**9


# ----------------------------------------------------------------- HITS

def test_hits_hub_authority_separation(spark):
    # classic bipartite shape: 0,1,2 all point at 8 and 9; 8,9 have
    # no out-edges.  0-2 must be pure hubs, 8-9 pure authorities.
    from mechaml_spark.linkgraph import hits

    e = _edges(spark, [(s, d) for s in (0, 1, 2) for d in (8, 9)])
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e).collect()}
    for n in (0, 1, 2):
        assert got[n][0] > 0 and got[n][1] == 0
    for n in (8, 9):
        assert got[n][0] == 0 and got[n][1] > 0
    # symmetric roles get identical scores
    assert got[0] == got[1] == got[2] and got[8] == got[9]


def test_hits_partitioning_invariance(spark):
    from mechaml_spark.linkgraph import hits

    pairs = [(i % 17, (i * 5 + 3) % 17) for i in range(60)]
    e = _edges(spark, pairs)
    a = {r["node"]: (r["hub"], r["auth"])
         for r in hits(e.repartition(2), n_iter=3).collect()}
    b = {r["node"]: (r["hub"], r["auth"])
         for r in hits(e.repartition(13), n_iter=3).collect()}
    assert a == b  # exact equality — integer fixed-point


def test_hits_l1_normalization_bound(spark):
    from mechaml_spark.linkgraph import hits

    e = _edges(spark, [(0, 1), (1, 2), (2, 0), (3, 0), (0, 3)])
    r = hits(e, n_iter=3).agg(
        F.sum("hub").alias("h"), F.sum("auth").alias("a")
    ).collect()[0]
    # pre-divided L1 normalization bounds each total within a factor
    # of 2 of scale: denom = floor(tot/scale) >= 1, so the normalized
    # total is tot/denom in (scale/2, 2*scale].  Relative scores are
    # what the frontier sorts on; the absolute magnitude only needs
    # to stay bounded (no drift across iterations).
    assert 0.5 * 10**6 < r["h"] <= 2 * 10**6
    assert 0.5 * 10**6 < r["a"] <= 2 * 10**6


# ------------------------------------------------------------- OPIC


def test_opic_hand_computed(spark):
    """a -> {b, c}; b dangles; c -> a.  One synchronous step, every
    floor division by hand:

      N=3, cash0 = 333_333_333 each, history0 = 0
      share(a->b) = share(a->c) = 333_333_333 // 2 = 166_666_666
      insum(a) = cash0(c) = 333_333_333 (c's outdeg is 1)
      dangling = cash0(b) = 333_333_333, dm // 3 = 111_111_111
      cash1(a) = 333_333_333 + 111_111_111 = 444_444_444
      cash1(b) = cash1(c) = 166_666_666 + 111_111_111 = 277_777_777
      history1 = cash0 = 333_333_333 everywhere
    """
    from mechaml_spark.linkgraph import opic

    e = _edges(spark, [(0, 1), (0, 2), (2, 0)])
    got = {r["node"]: (r["cash"], r["history"], r["importance"])
           for r in opic(e, n_iter=1).collect()}
    assert got == {
        0: (444_444_444, 333_333_333, 777_777_777),
        1: (277_777_777, 333_333_333, 611_111_110),
        2: (277_777_777, 333_333_333, 611_111_110),
    }


def test_opic_cash_nearly_conserved_and_history_monotone(spark):
    """Total cash per step only shrinks by floor-div remainders
    (< |E| + N per step at these sizes), and history equals the sum
    of the cash snapshots — the OPIC invariant importance builds on."""
    import random

    from mechaml_spark.linkgraph import opic

    rng = random.Random(11)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(200)]
    e = _edges(spark, pairs)
    r1 = {r["node"]: r for r in opic(e, n_iter=1).collect()}
    r3 = {r["node"]: r for r in opic(e, n_iter=3).collect()}
    n = len(r1)
    tot1 = sum(r["cash"] for r in r1.values())
    tot3 = sum(r["cash"] for r in r3.values())
    assert 10**9 - (len(pairs) + n) * 1 <= tot1 <= 10**9
    assert 10**9 - (len(pairs) + n) * 3 <= tot3 <= 10**9
    # history is cumulative: 3-step history >= 1-step history per node
    assert all(r3[k]["history"] >= r1[k]["history"] for k in r3)


def test_opic_bit_reproducible_across_partitionings(spark):
    import random

    from mechaml_spark.linkgraph import opic

    rng = random.Random(23)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(400)]
    e = _edges(spark, pairs)
    a = {r["node"]: (r["cash"], r["history"])
         for r in opic(e.repartition(2), n_iter=3).collect()}
    b = {r["node"]: (r["cash"], r["history"])
         for r in opic(e.repartition(13), n_iter=3).collect()}
    assert a == b
