"""Unit tests for PageRank (operators/graph.py); the lineitem-derived
catalog entry is oracle-checked by test_entry_oracle.py."""

from __future__ import annotations

import pytest


def _brute_pagerank(edge_list, iters, damping=0.85):
    """Reference power iteration on plain dicts."""
    edges = sorted(set(edge_list))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(r for v, r in rank.items() if v not in out)
        nxt = {v: (1 - damping) / n + damping * dang / n for v in nodes}
        for s, d in edges:
            nxt[d] += damping * rank[s] / out[s]
        rank = nxt
    return rank


def _run(spark, edge_list, iters, **kw):
    from cassandra_slow_queries_spark.operators.graph import pagerank

    df = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r["node"]: r["rank"] for r in pagerank(df, iters=iters, **kw).collect()
    }


def test_pagerank_matches_reference_iteration(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]  # 4 nodes, no sink
    got = _run(spark, edges, iters=5)
    want = _brute_pagerank(edges, iters=5)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_mass_conserved(spark):
    # node 3 is a pure sink; without redistribution total mass decays
    edges = [(1, 2), (2, 3), (1, 3)]
    got = _run(spark, edges, iters=8)
    want = _brute_pagerank(edges, iters=8)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # the sink accumulates the most rank here
    assert got[3] == max(got.values())


def test_pagerank_duplicate_edges_collapse_and_iter0(spark):
    got = _run(spark, [(1, 2), (1, 2), (1, 2), (2, 1)], iters=0)
    assert got == {1: 0.5, 2: 0.5}
    one = _run(spark, [(1, 2), (1, 2), (2, 1)], iters=3)
    clean = _run(spark, [(1, 2), (2, 1)], iters=3)
    assert one == clean

    with pytest.raises(ValueError):
        _run(spark, [(1, 2)], iters=-1)


def _bfs(spark, edge_list, srcs, **kw):
    from cassandra_slow_queries_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    sources = spark.createDataFrame([(s,) for s in srcs], "node long")
    return {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, sources, **kw).collect()
    }


def test_bfs_shortest_paths_and_unreachable(spark):
    # 0→1→2→3, shortcut 0→2; 9→0 points INTO the component (9 unreachable)
    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (9, 0)]
    got = _bfs(spark, edges, [0])
    # shortcut wins: dist(2) is 1, not 2; 9 emits no row
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_multi_source_min_and_cycle(spark):
    # cycle 0→1→2→0 plus tail 2→3→4; sources 0 and 4
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    got = _bfs(spark, edges, [0, 4])
    assert got[0] == 0 and got[4] == 0
    assert got == {0: 0, 4: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_max_hops_and_undirected(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    assert _bfs(spark, edges, [0], max_hops=1) == {0: 0, 1: 1}
    assert _bfs(spark, edges, [0], max_hops=0) == {0: 0}
    # undirected: source 3 walks the chain backwards
    got = _bfs(spark, edges, [3], directed=False)
    assert got == {3: 0, 2: 1, 1: 2, 0: 3}
    with pytest.raises(ValueError):
        _bfs(spark, edges, [0], max_hops=-1)


def test_pagerank_null_edges_do_not_leak_mass(spark):
    from cassandra_slow_queries_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, None), (1, 2), (2, 1), (None, 2)], "src long, dst long"
    )
    out = pagerank(edges, iters=5).collect()
    assert sorted(r["node"] for r in out) == [1, 2]
    total = sum(r["rank"] for r in out)
    assert abs(total - 1.0) < 1e-9  # the invariant NULL edges broke


def test_bfs_null_edges_no_duplicate_rows_and_early_exit(spark):
    from cassandra_slow_queries_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(0, None), (0, 1), (1, None)], "src long, dst long"
    )
    srcs = spark.createDataFrame([(0,), (None,)], "node long")
    out = bfs_distances(edges, srcs, max_hops=10).collect()
    # one row per reachable real node, minimum distance, no NULL rows
    got = {r["node"]: r["dist"] for r in out}
    assert got == {0: 0, 1: 1}
    assert len(out) == 2


def test_triangle_cap_keeps_stable_node_universe(spark):
    from cassandra_slow_queries_spark.operators.graph import triangle_counts

    # star 1-2, 1-3: with max_degree=1 node 1 is hot and both edges go,
    # but all three nodes must still appear with 0 triangles
    edges = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    out = {r["node"]: r["n_triangles"]
           for r in triangle_counts(edges, max_degree=1).collect()}
    assert out == {1: 0, 2: 0, 3: 0}
