"""Two-phase selection and prefix-filter set-similarity: edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hailstorm_spark.operators.selection import exact_kth_smallest
from hailstorm_spark.operators.similarity import set_similarity_join


@pytest.fixture(scope="module")
def vals(spark):
    # includes negatives, duplicates, and a skewed hot value
    data = [-50, -50, -3, 0, 0, 0, 0, 7, 7, 9, 100, 100, 100, 2**40]
    return spark.createDataFrame([(v,) for v in data], ["v"]), sorted(data)


def test_every_rank_matches_sorted_order(spark, vals):
    df, ref = vals
    for k in (1, 2, len(ref) // 2, len(ref) - 1, len(ref)):
        assert exact_kth_smallest(df, "v", k, buckets=4) == ref[k - 1]


def test_all_equal_short_circuits(spark):
    df = spark.createDataFrame([(5,)] * 10, ["v"])
    assert exact_kth_smallest(df, "v", 7) == 5


def test_k_out_of_range_raises(spark, vals):
    df, ref = vals
    with pytest.raises(ValueError):
        exact_kth_smallest(df, "v", 0)
    with pytest.raises(ValueError):
        exact_kth_smallest(df, "v", len(ref) + 1)


def _jaccard_pairs_brute(rows, tau_num, tau_den):
    out = set()
    for i, (ida, sa) in enumerate(rows):
        for idb, sb in rows[i + 1 :]:
            a, b = set(sa), set(sb)
            inter = len(a & b)
            union = len(a | b)
            if union and inter * tau_den >= union * tau_num:
                lo, hi = min(ida, idb), max(ida, idb)
                out.add((lo, hi, (100 * inter) // union))
    return out


SETS = [
    (1, ["a", "b", "c", "d"]),
    (2, ["a", "b", "c", "e"]),      # J(1,2)=3/5=0.6 — boundary, must be kept
    (3, ["a", "b", "x", "y", "z"]), # J(1,3)=2/7 — dropped
    (4, ["a", "b", "c", "d"]),      # exact dup of 1
    (5, ["q"]),                     # singleton
    (6, ["q"]),                     # J(5,6)=1
    (7, []),                        # empty set — must be ignored, not crash
]


def test_prefix_filter_matches_bruteforce_with_boundary(spark):
    """τ exactly met (0.6) must be INCLUDED (the ≥ in the lemma), empty
    sets ignored, exact dups found — all against a python brute force."""
    df = spark.createDataFrame(SETS, ["doc_id", "s"])
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard_pct"])
        for r in set_similarity_join(df, tau_num=6, tau_den=10).collect()
    }
    assert got == _jaccard_pairs_brute(SETS, 6, 10)
    assert (1, 2, 60) in got   # the boundary pair
    assert (1, 4, 100) in got  # the exact dup


def test_higher_tau_prunes_boundary(spark):
    df = spark.createDataFrame(SETS, ["doc_id", "s"])
    got = {
        (r["doc_a"], r["doc_b"])
        for r in set_similarity_join(df, tau_num=7, tau_den=10).collect()
    }
    assert got == {(a, b) for a, b, _ in _jaccard_pairs_brute(SETS, 7, 10)}
    assert (1, 2) not in got
