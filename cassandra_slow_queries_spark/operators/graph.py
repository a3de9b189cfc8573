"""Iterative graph algorithms as keyed DataFrame passes.

Connected components live in ``operators/dedup.py`` (label propagation
+ large-star/small-star contraction, built for the near-dup pair
graphs). This module holds the traversal/rank iterations — PageRank
(Brin & Page 1998) by power iteration, frontier BFS shortest
distances, and triangle counting.

Scale shape: one iteration = one shuffle of the edge list keyed on the
destination plus two 1-row aggregates (total/dangling mass). Ranks are
one narrow row per node; edges never change, so at real scale you
persist the ``(src, dst)`` frame partitioned by ``dst`` once and every
iteration's join reuses that layout. Iteration count is a fixed small
constant (power iteration converges geometrically at the damping
factor), so the whole computation is ~``iters`` shuffles of the edge
list — the same plan GraphX/Pregel would execute, expressed in plain
DataFrame ops so Catalyst/AQE keep working.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    persist_each: bool = True,
) -> DataFrame:
    """PageRank by ``iters`` power iterations over a directed edge list
    (duplicate edges are collapsed). Returns ``(node, rank)`` for every
    node appearing as a source or destination; ranks sum to 1.

    Semantics (the standard formulation):

    - rank⁰ = 1/N for all N nodes;
    - rankⁱ⁺¹(v) = (1−d)/N + d·(Σ_{u→v} rankⁱ(u)/outdeg(u) + D ⁱ/N),
      where Dⁱ is the total rank mass sitting on DANGLING nodes (no
      out-edges) — redistributed uniformly so mass is conserved (drop
      this and ranks leak toward 0 on any graph with sinks, e.g. a
      bipartite item side).

    ``persist_each`` (default) cuts each iteration's rank frame — N
    narrow rows — out of the lineage with an eager ``localCheckpoint``.
    This is NOT an optimization knob: every iteration references the
    previous ranks three times (dangling mass, contributions, final
    join), so the un-truncated logical plan grows ~3^iters subtrees —
    measured as a driver OOM from AQE's plan string at 8 iterations on
    a 3-node graph. ``persist()`` alone does not help (it caches
    execution, not planning). ``False`` is only for callers who
    checkpoint externally.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    # an edge with a NULL endpoint is not an edge: kept, its
    # contributions would aggregate into a node=NULL group the
    # (non-null-safe) rank back-join can never match, silently leaking
    # d/outdeg of rank mass per iteration — the Σrank=1 invariant the
    # gates pin would decay
    e = e.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if persist_each:
        # r13 opt (guide §5): every iteration's contribution join
        # references ``e``, and ``outdeg`` rides the with_deg join —
        # without materialization each of the ``iters`` iterations
        # re-executes the full edge subtree (source scan + DISTINCT
        # shuffle) and the outdeg aggregation from scratch (sf0.1 warm:
        # ~2.6 → ~2.2 s with the two checkpoints — small there because
        # the folded graph is tiny; the point is the scale shape: one
        # edge pass instead of ``iters``+1 full scans at 100 TB).
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if persist_each:
        nodes = nodes.localCheckpoint(eager=False)
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    if persist_each:
        outdeg = outdeg.localCheckpoint(eager=False)
    n_total = nodes.agg(F.count(F.lit(1)).alias("_n"))
    ranks = nodes.crossJoin(n_total).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for _ in range(iters):
        with_deg = ranks.join(outdeg, "node", "left")
        dangling = with_deg.agg(
            F.coalesce(
                F.sum(F.when(F.col("outdeg").isNull(), F.col("rank"))),
                F.lit(0.0),
            ).alias("_dangling")
        )
        contribs = (
            e.join(
                with_deg.filter(F.col("outdeg").isNotNull()).select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("outdeg")).alias("_share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("_share").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(n_total)
            .crossJoin(dangling)
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("_n")
                    + damping
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.col("_dangling") / F.col("_n")
                    )
                ).alias("rank"),
            )
        )
        if persist_each:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """Minimum hop count from ANY source node, by frontier BFS —
    ``(node, dist)`` for every node reachable within ``max_hops``
    (sources themselves at dist 0; unreachable nodes emit no row).
    ``sources`` is a one-column frame of node ids; ``directed=False``
    unions the reversed edges first. Cycles are safe: a node joins the
    frontier at most once (the visited anti-join), which is also what
    guarantees hop = SHORTEST distance — BFS reaches every node first
    along a minimum path.

    Shape (the Pregel BFS plan in plain DataFrames): each hop is one
    src-keyed join of the CURRENT FRONTIER against the edge list plus
    one node-keyed anti-join against the visited set — per-hop shuffle
    bounded by the frontier's out-edges, never the whole graph re-
    walked. At real scale persist the edge frame partitioned by
    ``src`` once so every hop's join reuses that layout (same note as
    :func:`pagerank`). The loop is a bounded driver loop over
    ``max_hops`` with an empty-frontier early exit; per-hop frames are
    eagerly ``localCheckpoint``-ed — the same lineage-truncation
    requirement as pagerank's iterations (each hop references the
    visited union of all prior hops).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    # NULL endpoints: the visited anti-join is not null-safe, so a NULL
    # dst would count as "unvisited" EVERY hop — duplicate (NULL, dist)
    # rows and a frontier that never empties (no early exit)
    e = e.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct()
    frontier = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .filter(F.col(sources.columns[0]).isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = frontier.select("node", F.lit(0).alias("dist"))
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.select("node", F.lit(hop).alias("dist"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def canonical_edges(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Undirected edge list in canonical ``(a < b)`` form: direction
    collapsed, self-loops and duplicates dropped. Triangle counting
    (and most undirected-graph work) starts here so each edge exists
    exactly once."""
    return (
        edges.select(
            F.least(src_col, dst_col).alias("a"),
            F.greatest(src_col, dst_col).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph:
    ``(node, n_triangles)`` for every node of the (optionally
    degree-capped) graph, including zero rows — the clustering-
    coefficient numerator and a standard spam/anomaly feature.

    Plan: canonicalize edges, enumerate wedges ``a<b<c`` by joining the
    edge list with itself on the middle vertex-pair order (edge (a,b) ⋈
    edge (b,c)), close each wedge against the edge set with a third
    equi-join, then explode each triangle's three corners into the
    per-node aggregate. Three shuffles total, all on small keys.

    Scale: wedge count is Σ_b deg(b)² — a single hub node (a celebrity
    account, a boilerplate token) dominates it quadratically. Passing
    ``max_degree`` removes nodes above the cap from the graph FIRST
    (the standard bounded-arboricity trick): hubs rarely carry triangle
    signal worth their quadratic cost, and the cap bounds per-key
    fan-out the same way every blocked operator in this repo does.
    Capped nodes still appear in the output with the triangles they
    form in the capped graph (possibly 0), so the result NODE SET is
    stable under the cap — the universe comes from the UNCAPPED
    canonical edges, so a hub (or a node whose every neighbor was a
    hub) reports 0 rather than vanishing, and capped vs uncapped runs
    diff row-for-row.
    """
    ec = canonical_edges(edges, src_col, dst_col)
    e = ec
    if max_degree is not None:
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("_deg"))
        )
        hot = deg.filter(F.col("_deg") > max_degree).select("node")
        e = e.join(
            hot, e["a"] == hot["node"], "left_anti"
        ).join(hot, e["b"] == hot["node"], "left_anti")
    # localCheckpoint, not persist: the blocks release when the caller's
    # result frame is garbage-collected (block lifetime = caller's
    # frame, the assign_global_ids rule) instead of pinning a cached
    # edge list in executor storage for the session per call
    e = e.localCheckpoint(eager=True)
    # wedge (a<b<c): (a,b) and (b,c) share the middle vertex b
    e2 = e.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    wedges = e.join(e2, e["b"] == e2["b2"]).select("a", "b", "c")
    tri = wedges.join(
        e.select(F.col("a").alias("ta"), F.col("b").alias("tc")),
        (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
    ).select("a", "b", "c")
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        ec.select(F.col("a").alias("node"))
        .unionAll(ec.select(F.col("b").alias("node")))
        .distinct()
    )
    out = nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0).cast("long")).alias("n_triangles")
    )
    return out
