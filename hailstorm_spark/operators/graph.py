"""Iterative graph algorithms as DataFrame loops: integer PageRank.

The engine already has one iterative-fixpoint operator (connected
components, operators/dedup.py — label propagation with large/small-star
steps); this module adds the weighted-centrality counterpart. The
driver-side loop only ever touches DataFrame handles — each iteration is
a join + aggregation that shuffles on the node key, exactly the
Pregel-on-relational pattern GraphX/GraphFrames use, so a 10^9-node
graph runs it unchanged with the shuffle partitioned across the
cluster.

All arithmetic is INTEGER: ranks are scaled by 10^9 and every
per-edge contribution is ``(rank * w) div wdeg`` (floor division of
non-negative operands — identical in Spark and ANSI SQL), so a DuckDB
oracle can replay the same iterations and compare ranks value-for-value
instead of hiding behind a float tolerance. Convergence is by fixed
iteration count for the same reason (a float-threshold stop is
engine-dependent).

Overflow bound: rank mass is conserved at ~N·SCALE; with SCALE=10^9
even a pathological hub holding the entire mass of a 10^6-node graph
multiplied by a 10^4 edge weight stays < 10^19 ≈ int64 max. Larger
graphs: drop SCALE one decade per 10× node count.

The reference has no graph surface at all; this derives from the public
PageRank formulation (Page et al. 1999) with the damping update
r' = (1-d) + d·Σ r_u·w_uv / Σ_v' w_uv'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**9
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank_integer(edges: DataFrame, iters: int = 4, scale: int = SCALE) -> DataFrame:
    """Weighted PageRank over directed ``(src, dst, w)`` edges.

    Returns ``(node, pr)`` with pr on the integer scale. Every node is
    assumed to have at least one out-edge (true for any symmetrized
    graph — callers project undirected graphs by unioning both
    directions, which also removes the dangling-mass correction).
    """
    # Persist the loop-invariant sides for the duration of the loop
    # (each of the `iters` plan layers references them; without the
    # cache the edge aggregation would recompute once per layer), then
    # materialize the small final rank vector and RELEASE the caches —
    # a long-lived cache entry would otherwise short-circuit identical
    # later runs (bench distortion) and pin executor memory.
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.sum("w").cast("long").alias("wdeg")).persist()
    teleport = ((DAMP_DEN - DAMP_NUM) * scale) // DAMP_DEN
    ranks = deg.select(F.col("src").alias("node"), F.lit(scale).cast("long").alias("pr"))
    for _ in range(iters):
        r = ranks.withColumnRenamed("node", "src")
        ranks = (
            edges.join(deg, "src")
            .join(r, "src")
            .select("dst", F.expr("(pr * w) div wdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"cast({teleport} + ({DAMP_NUM} * s) div {DAMP_DEN} as bigint)"
                ).alias("pr"),
            )
        )
    out = ranks.localCheckpoint(eager=True)
    edges.unpersist()
    deg.unpersist()
    return out


def pagerank_iteration_sql(scale: int = SCALE) -> str:
    """One oracle iteration as a SQL template over CTEs ``edges``/``deg``
    and the previous iteration ``{prev}`` — the exact twin of the loop
    body above (DuckDB sums to HUGEINT, hence the BIGINT casts)."""
    teleport = ((DAMP_DEN - DAMP_NUM) * scale) // DAMP_DEN
    return f"""
      SELECT e.dst AS node,
             CAST({teleport} + ({DAMP_NUM} *
               CAST(SUM((r.pr * e.w) // d.wdeg) AS BIGINT)) // {DAMP_DEN}
               AS BIGINT) AS pr
      FROM edges e
      JOIN deg d ON d.node = e.src
      JOIN {{prev}} r ON r.node = e.src
      GROUP BY e.dst
    """
