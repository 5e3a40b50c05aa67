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

from hailstorm_spark.operators.checkpointing import materialize

SCALE = 10**9
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank_integer(
    edges: DataFrame,
    iters: int = 4,
    scale: int = SCALE,
    checkpoint_dir: str | None = None,
) -> DataFrame:
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
    out = materialize(ranks, checkpoint_dir)
    edges.unpersist()
    deg.unpersist()
    return out


def bfs_multi_source(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source BFS over directed ``(src, dst)`` edges.

    ``seeds`` is ``(seed, node)`` start rows (normally ``node == seed``);
    returns ``(seed, node, dist)`` with the EXACT hop distance for every
    node within ``iters`` hops of its seed. Each round is one frontier
    expansion — join the reached set to the edge list on the node key,
    add 1, and keep the minimum per (seed, node): the min-plus
    relaxation whose fixpoint is BFS distance, run for a fixed number of
    rounds so an oracle can replay it as ``iters`` unrolled CTEs.

    Scale shape: the reached set and the edge list both partition by the
    node key, so every round is one co-partitioned shuffle (the same
    relational-Pregel pattern as ``pagerank_integer`` above and the
    connected-components loop in operators/dedup.py). The reached set is
    eagerly checkpointed per round — it appears TWICE in the next
    round's plan (carry-over union expansion), so without truncation the
    lineage would double per round (2^iters leaves), the classic
    iterative-DataFrame trap.

    All-integer: ``dist`` is a plain INT counter, no float anywhere, so
    the DuckDB replay compares distances value-for-value.
    """
    edges = edges.persist()
    reach = materialize(
        seeds.select("seed", "node", F.lit(0).cast("int").alias("dist")),
        checkpoint_dir,
    )
    for _ in range(iters):
        expanded = (
            reach.join(edges, reach["node"] == edges["src"])
            .select("seed", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        reach = materialize(
            reach.unionByName(expanded)
            .groupBy("seed", "node")
            .agg(F.min("dist").cast("int").alias("dist")),
            checkpoint_dir,
        )
    edges.unpersist()
    return reach


def bfs_iteration_sql() -> str:
    """One oracle BFS round over CTEs ``edges``/``{prev}`` — the exact
    twin of the loop body above (carry the reached set forward, expand
    one hop, keep the min distance per (seed, node))."""
    return """
      SELECT seed, node, CAST(MIN(dist) AS INT) AS dist FROM (
        SELECT seed, node, dist FROM {prev}
        UNION ALL
        SELECT r.seed, e.dst AS node, r.dist + 1 AS dist
        FROM {prev} r JOIN edges e ON e.src = r.node
      ) GROUP BY seed, node
    """


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


def label_propagation(
    edges: DataFrame, iters: int, checkpoint_dir: str | None = None
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over
    weighted directed ``(src, dst, w)`` edges (callers symmetrize for
    undirected graphs): every node starts as its own label; each round
    every node adopts the label carrying the MAX total incident weight
    among its neighbors, ties to the smallest label. Deterministic by
    construction (synchronous rounds + total tie order), fixed
    iteration count — so an oracle replays the rounds as unrolled CTEs,
    unlike classical asynchronous LPA whose result depends on visit
    order.

    Community detection complements the other graph members: connected
    components ask "is there any path", LPA asks "where does the edge
    MASS concentrate" — on a word graph, topical word clusters.

    Each round is one join + one (node, label) aggregation + one
    node-partitioned top-1 window — all shuffles key on node/label;
    eager per-round checkpoint truncates the iterative lineage.
    Returns ``(node, label)`` after ``iters`` rounds.
    """
    from pyspark.sql import Window

    edges = edges.persist()
    labels = materialize(
        edges.select("src").union(edges.select("dst")).distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label")),
        checkpoint_dir,
    )
    w_top = Window.partitionBy("node").orderBy(
        F.col("wsum").desc(), F.col("label")
    )
    for _ in range(iters):
        labels = materialize(
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.sum("w").cast("long").alias("wsum"))
            .withColumn("rn", F.row_number().over(w_top))
            .filter(F.col("rn") == 1)
            .select("node", "label"),
            checkpoint_dir,
        )
    edges.unpersist()
    return labels


def label_propagation_iteration_sql() -> str:
    """One oracle LPA round over CTEs ``edges``/``{prev}`` — the exact
    twin of the loop body above."""
    return """
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY wsum DESC, label) AS rn
        FROM (
          SELECT e.src AS node, l.label, CAST(SUM(e.w) AS BIGINT) AS wsum
          FROM edges e JOIN {prev} l ON l.node = e.dst
          GROUP BY e.src, l.label
        )
      ) WHERE rn = 1
    """


def kcore_peel(
    edges: DataFrame, k: int, iters: int, checkpoint_dir: str | None = None
) -> DataFrame:
    """Iterative k-core peeling over undirected symmetrized ``(src,
    dst)`` edges: each round drops every node whose CURRENT degree is
    below ``k`` (and the edges touching it), the standard
    dense-subgraph / spam-cluster extraction primitive (Seidman 1983).
    A fixed number of synchronous rounds — after ``iters`` rounds the
    survivor set is exactly the nodes whose peel depth exceeds
    ``iters``, and a fixpoint (no node dropped in a round) IS the
    k-core; callers size ``iters`` to the expected peel depth the same
    way the CC loop sizes its rounds, and the oracle replays the
    identical rounds as unrolled CTEs.

    Per round: one degree aggregation on the node key + two semi-joins
    restricting the edge list to survivors — every shuffle keys on
    node ids; the edge list only ever SHRINKS, and the eager checkpoint
    truncates the loop lineage. Returns the surviving ``(src, dst)``
    edges after ``iters`` rounds.
    """
    cur = materialize(edges, checkpoint_dir)
    for _ in range(iters):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("src")
        cur = materialize(
            cur.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst"),
            checkpoint_dir,
        )
    return cur


def kcore_iteration_sql(k: int) -> str:
    """One oracle peel round over the CTE ``{prev}`` — the exact twin
    of the loop body above."""
    return f"""
      SELECT e.src, e.dst FROM {{prev}} e
      JOIN (SELECT src FROM {{prev}} GROUP BY src HAVING COUNT(*) >= {k}) ka
        ON ka.src = e.src
      JOIN (SELECT src FROM {{prev}} GROUP BY src HAVING COUNT(*) >= {k}) kb
        ON kb.src = e.dst
    """
