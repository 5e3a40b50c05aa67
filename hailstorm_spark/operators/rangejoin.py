"""Bucketed range join — point-in-interval matching without a nested
loop.

Spark plans a pure inequality join (``p.t BETWEEN i.start AND i.end``
with no equi-key) as BroadcastNestedLoopJoin: every point is tested
against every interval — O(P·I), the classic range-join scale killer.
The standard fix (the same one range-join-hinted engines apply
internally) is to QUANTIZE time into fixed-width buckets:

- each point belongs to exactly one bucket (``t div width``);
- each interval is exploded to the buckets it covers
  (``sequence(start div width, end div width)``);
- bucket equality becomes the equi-join key Catalyst can hash or
  broadcast, and the exact BETWEEN predicate runs as a post-join
  filter on the (vastly reduced) candidate pairs.

Cost model: the interval side grows by ~len/width rows per interval —
pick ``width`` near the typical interval length so the blow-up is a
small constant while each point still meets only the intervals near it
in time. Correct for ANY width: a point inside an interval shares at
least its own bucket with that interval's coverage, and each
(point, interval) candidate appears exactly once (the point has one
bucket).

The reference has no joins at all (SURVEY.md §2.3); this is additive
temporal surface alongside operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RESERVED = ("__bucket",)


def point_in_interval_join(
    points: DataFrame,
    t_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
    extra_on: Column | None = None,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= t <= end`` (inclusive both ends), via bucket equi-join +
    exact filter. ``t_col``/``start_col``/``end_col`` must be integers
    in the same unit (e.g. epoch microseconds); ``bucket_width`` is in
    that unit. Column sets must be disjoint (rename beforehand).

    ``how='inner'`` returns matched pairs. ``extra_on`` adds an extra
    equi-condition (e.g. a shared key column) into the join.

    Plan: one equi-join on ``__bucket`` — broadcastable when the
    exploded interval side is small, shuffle-partitioned by bucket
    otherwise (time-locality means adjacent data lands together; a
    pathological interval spanning the whole timeline should be split
    upstream).
    """
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"point/interval column collision: {sorted(clash)}")
    reserved = [c for c in _RESERVED if c in points.columns or c in intervals.columns]
    if reserved:
        raise ValueError(f"reserved column name(s) in input: {reserved}")
    if how != "inner":
        raise ValueError("only inner point-in-interval joins are supported")

    # floor (not truncate-toward-zero) so pre-epoch values still bucket
    # consistently
    p = points.withColumn("__bucket", F.floor(F.col(t_col) / bucket_width))
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor(F.col(end_col) / bucket_width),
            )
        ),
    )
    cond = (
        (p["__bucket"] == i["__bucket"])
        & (F.col(t_col) >= F.col(start_col))
        & (F.col(t_col) <= F.col(end_col))
    )
    if extra_on is not None:
        cond = cond & extra_on
    return p.join(i, cond, "inner").drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    l_start: str,
    l_end: str,
    right: DataFrame,
    r_start: str,
    r_end: str,
    bucket_width: int,
) -> DataFrame:
    """Interval × interval overlap join (``l_start ≤ r_end ∧
    r_start ≤ l_end``, inclusive) via the same bucket quantization —
    with the twist the point case doesn't need: two overlapping
    intervals share EVERY bucket their intersection covers, so a naive
    bucket equi-join emits each pair once per shared bucket. Rather
    than a dropDuplicates shuffle over the candidate pairs, the join
    keeps a pair only in its FIRST shared bucket —
    ``bucket = greatest(floor(l_start/w), floor(r_start/w))`` — which
    the intersection always covers (it contains the later of the two
    starts), making the output exactly-once by construction and purely
    map-side after the one bucket equi-join.

    Same unit/disjoint-column/width-selection contract as
    :func:`point_in_interval_join`; both sides explode by
    ~len/width rows.
    """
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"interval column collision: {sorted(clash)}")
    reserved = [c for c in _RESERVED if c in left.columns or c in right.columns]
    if reserved:
        raise ValueError(f"reserved column name(s) in input: {reserved}")
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(l_start) / bucket_width),
                F.floor(F.col(l_end) / bucket_width),
            )
        ),
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(r_start) / bucket_width),
                F.floor(F.col(r_end) / bucket_width),
            )
        ),
    )
    cond = (
        (lb["__bucket"] == rb["__bucket"])
        & (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        & (
            lb["__bucket"]
            == F.greatest(
                F.floor(F.col(l_start) / bucket_width),
                F.floor(F.col(r_start) / bucket_width),
            )
        )
    )
    return lb.join(rb, cond, "inner").drop("__bucket")
