"""linkgraph.connected_components — hash-min + pointer jumping."""

from __future__ import annotations

from mechaml_spark.linkgraph import connected_components


def _cc(spark, edges, n_iter=8, parts=None):
    df = spark.createDataFrame(edges, "src long, dst long")
    if parts:
        df = df.repartition(parts)
    got = connected_components(df, n_iter=n_iter).collect()
    return {r["node"]: r["component"] for r in got}


def test_path_star_ring_mixed(spark):
    edges = (
        [(v, v + 1) for v in range(5)]           # path 0..5
        + [(10, s) for s in (11, 12, 13)]        # star at 10
        + [(20, 21), (21, 22), (22, 20)]         # ring
    )
    got = _cc(spark, edges)
    assert {v: got[v] for v in range(6)} == {v: 0 for v in range(6)}
    assert all(got[v] == 10 for v in (10, 11, 12, 13))
    assert all(got[v] == 20 for v in (20, 21, 22))


def test_bridge_merges_components(spark):
    base = [(0, 1), (1, 2), (10, 11), (11, 12)]
    two = _cc(spark, base)
    assert two[12] == 10 and two[2] == 0
    merged = _cc(spark, base + [(2, 10)])
    assert all(c == 0 for c in merged.values())


def test_fixpoint_after_log_diameter_rounds(spark):
    # path of 16 has diameter 15; jumping converges in 5 rounds
    # (simulated) — one extra round must change nothing.
    edges = [(v, v + 1) for v in range(15)]
    assert _cc(spark, edges, n_iter=5) == _cc(spark, edges, n_iter=6)
    assert all(c == 0 for c in _cc(spark, edges, n_iter=5).values())


def test_reproducible_across_partitionings(spark):
    edges = [(v, (v * 7) % 40) for v in range(40)]
    assert _cc(spark, edges, parts=2) == _cc(spark, edges, parts=16)


def test_self_loops_and_duplicate_edges_ignored(spark):
    got = _cc(spark, [(1, 1), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}
