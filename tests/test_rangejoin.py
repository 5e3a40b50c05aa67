"""Unit tests for the bucketed point-in-interval join — equivalence to
the naive inequality join on adversarial shapes (boundary points,
bucket-straddling intervals, zero-length intervals, no-match points)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hailstorm_spark.operators.rangejoin import point_in_interval_join


def _naive(points, intervals):
    return points.join(
        intervals,
        (F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e")),
        "inner",
    )


@pytest.mark.parametrize("width", [1, 7, 100, 10_000])
def test_matches_naive_inequality_join(spark, width):
    points = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 1, 49, 50, 51, 99, 100, 150, 999, 1000])],
        "pid LONG, t LONG",
    )
    intervals = spark.createDataFrame(
        [
            (0, 0, 0),        # zero-length at origin
            (1, 1, 99),       # straddles buckets at every width
            (2, 50, 50),      # zero-length mid-range
            (3, 100, 1000),   # long interval
            (4, 2000, 3000),  # matches nothing
        ],
        "iid LONG, s LONG, e LONG",
    )
    got = {
        (r.pid, r.iid)
        for r in point_in_interval_join(
            points, "t", intervals, "s", "e", bucket_width=width
        ).collect()
    }
    want = {(r.pid, r.iid) for r in _naive(points, intervals).collect()}
    assert got == want
    assert ("4", "4") not in got  # no phantom matches


def test_rejects_column_collision(spark):
    p = spark.createDataFrame([(1, 2)], "t LONG, x LONG")
    i = spark.createDataFrame([(1, 2, 3)], "s LONG, e LONG, x LONG")
    with pytest.raises(ValueError):
        point_in_interval_join(p, "t", i, "s", "e", bucket_width=10)


def test_candidate_pairs_are_unique(spark):
    """Each (point, interval) match must appear exactly once even when
    the interval spans many buckets (the point has ONE bucket, so the
    explode can't duplicate the pair)."""
    points = spark.createDataFrame([(0, 500)], "pid LONG, t LONG")
    intervals = spark.createDataFrame([(0, 0, 1000)], "iid LONG, s LONG, e LONG")
    out = point_in_interval_join(points, "t", intervals, "s", "e", bucket_width=10)
    assert out.count() == 1


def test_interval_overlap_join_matches_bruteforce(spark):
    """Adversarial interval shapes vs an O(n·m) python reference:
    touching endpoints (inclusive), containment, disjoint, negative
    coordinates, multi-bucket spans — and each pair exactly ONCE
    (the first-shared-bucket rule under test)."""
    from hailstorm_spark.operators.rangejoin import interval_overlap_join

    left = [(1, 0, 10), (2, -25, -5), (3, 100, 400), (4, 50, 50), (5, 7, 7)]
    right = [(10, 10, 20), (11, -7, -1), (12, 390, 800), (13, 51, 60),
             (14, -1000, 1000), (15, 401, 402)]
    ldf = spark.createDataFrame(left, "lid long, ls long, le long")
    rdf = spark.createDataFrame(right, "rid long, rs long, re long")
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            ldf, "ls", "le", rdf, "rs", "re", bucket_width=16
        ).collect()
    )
    want = sorted(
        (lid, rid)
        for lid, ls, le in left
        for rid, rs, re in right
        if ls <= re and rs <= le
    )
    assert got == want
    assert len(got) == len(set(got))  # exactly-once, no per-bucket dupes
