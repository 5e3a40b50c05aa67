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
