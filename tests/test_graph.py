"""Integer PageRank: exactness against a pure-Python replay, invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.operators.graph import DAMP_DEN, DAMP_NUM, pagerank_integer


def _python_pagerank(edges, iters, scale):
    """Independent replay of the integer recurrence (dict-based)."""
    wdeg = {}
    for s, _, w in edges:
        wdeg[s] = wdeg.get(s, 0) + w
    pr = {n: scale for n in wdeg}
    teleport = ((DAMP_DEN - DAMP_NUM) * scale) // DAMP_DEN
    for _ in range(iters):
        nxt = {}
        for s, d, w in edges:
            nxt[d] = nxt.get(d, 0) + (pr[s] * w) // wdeg[s]
        pr = {d: teleport + (DAMP_NUM * v) // DAMP_DEN for d, v in nxt.items()}
    return pr


EDGES = [
    # symmetrized weighted triangle + pendant
    ("a", "b", 3), ("b", "a", 3),
    ("b", "c", 1), ("c", "b", 1),
    ("a", "c", 2), ("c", "a", 2),
    ("c", "d", 1), ("d", "c", 1),
]


def test_matches_pure_python_replay(spark):
    """The DataFrame loop must reproduce the integer recurrence exactly
    — not approximately — on a hand-sized graph."""
    df = spark.createDataFrame(EDGES, ["src", "dst", "w"])
    got = {r["node"]: r["pr"] for r in pagerank_integer(df, iters=5, scale=10**9).collect()}
    assert got == _python_pagerank(EDGES, 5, 10**9)


def test_symmetric_pair_stays_at_scale(spark):
    """Two nodes exchanging all mass: rank is a fixpoint at SCALE
    (modulo the integer floor in the damping split)."""
    df = spark.createDataFrame([("x", "y", 1), ("y", "x", 1)], ["src", "dst", "w"])
    scale = 10**9
    got = {r["node"]: r["pr"] for r in pagerank_integer(df, iters=3, scale=scale).collect()}
    for v in got.values():
        assert abs(v - scale) <= 3  # ≤1 ulp of floor-loss per iteration


def test_hub_outranks_pendant(spark):
    """Centrality sanity on the triangle+pendant graph: the hub (c,
    member of the triangle AND cut vertex to d) must outrank the
    pendant d."""
    df = spark.createDataFrame(EDGES, ["src", "dst", "w"])
    got = {r["node"]: r["pr"] for r in pagerank_integer(df, iters=5, scale=10**9).collect()}
    assert got["c"] > got["d"]


def test_keywords_topk_avoids_global_sort(spark):
    """text_pagerank_keywords' final top-30 must be
    TakeOrderedAndProject, not a global Sort."""
    from hailstorm_spark.registry import all_queries
    from tests.conftest import SF_DIR

    df = all_queries()["text_pagerank_keywords"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_kmeans_integer_separates_planted_clusters(spark):
    """Three well-separated planted blobs: Lloyd's must recover them
    exactly, and the per-point distances must equal a python replay."""
    from hailstorm_spark.operators.clustering import kmeans_integer

    blobs = {0: [0, 0, 0, 0], 1: [1000, 1000, 0, 0], 2: [0, 0, 1000, 1000]}
    rows = []
    # round-robin ids across blobs so the id<k seeding starts one
    # centroid inside EACH blob
    for j in range(10):
        for b, center in blobs.items():
            rid = 3 * j + b
            rows.append((rid, [c + ((rid * 7 + j) % 5) - 2 for c in center]))
    df = spark.createDataFrame(rows, "id long, qv array<long>")
    assigned, cents = kmeans_integer(df, "id", "qv", k=3, iters=4)
    got = {r["id"]: r["k"] for r in assigned.collect()}
    # each blob (ids ≡ b mod 3) lands wholly in one cluster
    groups = [set(got[3 * j + b] for j in range(10)) for b in (0, 1, 2)]
    assert all(len(g) == 1 for g in groups)
    assert len(set.union(*groups)) == 3
    # centroids land within the jitter radius of the planted centers
    for comps in cents.values():
        matched = any(
            all(abs(c - t) <= 3 for c, t in zip(comps, center))
            for center in blobs.values()
        )
        assert matched


def test_kmeans_empty_cluster_disappears(spark):
    """A seed centroid that attracts nothing must vanish, not crash or
    linger: seed ids 0,1 but every point sits on one blob."""
    from hailstorm_spark.operators.clustering import kmeans_integer

    # both seeds sit on identical points: every distance ties, the
    # lowest-k rule sends all members to cluster 0, and cluster 1 must
    # vanish from the centroid table after the first update
    rows = [(i, [500, 500]) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, qv array<long>")
    assigned, cents = kmeans_integer(df, "id", "qv", k=2, iters=3)
    assert set(cents.keys()) == {0}
    assert assigned.select("k").distinct().count() == 1
