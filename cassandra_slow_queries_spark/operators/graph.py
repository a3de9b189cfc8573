"""Iterative graph algorithms as keyed DataFrame passes.

Connected components live in ``operators/dedup.py`` (label propagation
+ large-star/small-star contraction, built for the near-dup pair
graphs). This module holds the rank-style iterations — currently
PageRank (Brin & Page 1998) by power iteration.

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
