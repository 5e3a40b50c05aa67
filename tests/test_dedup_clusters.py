"""Duplicate-cluster formation: pairs → connected components → keep-one.

The augmented corpus plants a mutated near-copy of every doc_id < 50
(id + 100000), so each planted pair must land in one cluster whose
survivor is the original (minimum) id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.operators.dedup import connected_components
from hailstorm_spark.queries.dedup import MUTATE_ID_SHIFT, dedup_clusters_keep_one
from tests.conftest import SF_DIR


def test_planted_pairs_collapse_to_one_survivor(spark):
    out = dedup_clusters_keep_one(spark, SF_DIR)
    rows = {r.doc_id: r for r in out.collect()}
    planted = [d for d in rows if d >= MUTATE_ID_SHIFT]
    assert len(planted) > 0, "planted mutated docs must appear in clusters"
    for d in planted:
        orig = d - MUTATE_ID_SHIFT
        # the mutated copy is never the survivor, and it clusters with
        # a smaller-id doc (its original, unless a chain merges further)
        assert not rows[d].keep
        assert rows[d].cluster_id <= orig
    # exactly one keep per cluster, and it is the cluster minimum
    keeps = out.filter("keep").select("cluster_id", "doc_id").collect()
    assert len(keeps) == out.select("cluster_id").distinct().count()
    assert all(r.cluster_id == r.doc_id for r in keeps)


def test_connected_components_on_known_graph(spark):
    # two components: a 4-chain {1,2,3,4} and a triangle {10,11,12}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_id, r.cluster_id) for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (12, 10)}


def test_jaccard_stop_shingle_cap(spark):
    """A shingle shared by more docs than the cap must not generate
    candidate pairs (it is boilerplate, and at scale it is the join
    bomb); docs that only share capped shingles drop out entirely."""
    from hailstorm_spark.operators.dedup import jaccard_pairs

    boiler = "all rights reserved forever"
    rows = [(i, f"{boiler} unique{i} tokens{i} here{i}") for i in range(5)]
    rows += [(10, "real duplicate text body one two"), (11, "real duplicate text body one two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {(r.doc_a, r.doc_b) for r in jaccard_pairs(df, "doc_id", "text", None).collect()}
    capped = {(r.doc_a, r.doc_b) for r in jaccard_pairs(df, "doc_id", "text", 4).collect()}
    # boilerplate shingles link all 5 docs pairwise without the cap
    assert (0, 1) in uncapped
    # with df cap 4, the 5-doc boilerplate shingles are dropped; only
    # the genuine duplicate pair (all its shingles have df=2) remains
    assert capped == {(10, 11)}
    dup = [r for r in jaccard_pairs(df, "doc_id", "text", 4).collect() if r.doc_a == 10]
    assert dup[0].jaccard == 1.0


def test_star_contraction_matches_min_label_on_random_graphs(spark):
    """Star contraction and min-label propagation must produce identical
    labelings — including on long chains, where min-label needs
    O(length) rounds but star contraction stays logarithmic."""
    import random

    from hailstorm_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(17)
    edges = {tuple(sorted(rng.sample(range(80), 2))) for _ in range(60)}
    # a 30-node chain: diameter 30 — the star algorithm's home turf
    edges |= {(1000 + i, 1000 + i + 1) for i in range(30)}
    edf = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")

    ml = {(r.doc_id, r.cluster_id) for r in connected_components(edf, max_iter=50).collect()}
    st = {(r.doc_id, r.cluster_id) for r in connected_components_star(edf).collect()}
    assert st == ml
    # chain collapsed to its minimum
    assert (1030, 1000) in st
