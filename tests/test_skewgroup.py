"""The two-path skew-aware cogroup (operators/skewgroup.py): both
paths must agree with each other and with a brute-force Python replay,
on data where one key is deliberately fat.

The fixture-level oracle parity for cogroup_clicks_before_purchase
never exercises the heavy path (no fixture user crosses the default
threshold), so these tests force it with a tiny threshold: the split
must be invisible in the output for ANY threshold — that invariance IS
the correctness statement of the mitigation.
"""

from __future__ import annotations

import pytest

from hailstorm_spark.operators.skewgroup import (
    SLICE_US,
    clicks_before_purchase_cogroup,
)

WINDOW_US = 1_800_000_000


def _py_truth(purchases, clicks, window_us=WINDOW_US):
    by_user: dict[int, list[int]] = {}
    for u, t in clicks:
        if u is None:  # SQL equi-join: NULL matches nothing
            continue
        by_user.setdefault(u, []).append(t)
    out = {}
    for eid, u, t in purchases:
        cs = by_user.get(u, []) if u is not None else []
        out[eid] = (u, t, sum(1 for c in cs if t - window_us <= c < t))
    return out


def _skewed_data():
    """User 7 is fat: clicks every ~4 minutes across 5 days (spanning
    many SLICE_US slices, with windows straddling slice boundaries
    and exact boundary timestamps); users 1-5 are sparse; user 9 has
    purchases but zero clicks; negative timestamps cover the
    truncating-div slice around zero."""
    clicks = []
    for i in range(1800):
        clicks.append((7, i * 240_000_000))  # every 240s over ~5 days
    for u in range(1, 6):
        for i in range(10):
            clicks.append((u, i * 900_000_000 + u))
    clicks.append((3, -100))  # negative-ts click
    purchases = []
    eid = 0
    # purchases for the fat user: on slice boundaries, just after, just
    # before, and far inside
    for t in (
        0, 1, SLICE_US, SLICE_US + 1, SLICE_US - 1, 2 * SLICE_US,
        3 * SLICE_US + 17, 100 * SLICE_US, 399_999_999_999,
        240_000_000 * 900, 240_000_000 * 900 + WINDOW_US,
    ):
        purchases.append((eid, 7, t)); eid += 1
    for u in range(1, 6):
        for t in (0, 450_000_000, 8_999_999_999, -50):
            purchases.append((eid, u, t)); eid += 1
    purchases.append((eid, 9, 1_000)); eid += 1
    # NULL-key rows (ADVICE r8): NULL purchases must SURVIVE the split
    # with count 0 for any threshold (pre-fix they vanished whenever
    # the heavy set was non-empty — isin() NULL semantics dropped them
    # from both paths), and NULL clicks must never pair with them
    # (SQL equi-join: NULL matches nothing, even NULL).
    purchases.append((eid, None, 500_000_000)); eid += 1
    purchases.append((eid, None, -7)); eid += 1
    clicks.append((None, 499_999_999))  # in-window were NULL==NULL a match
    return purchases, clicks


@pytest.mark.parametrize("threshold", [2, 100, 10**9])
def test_split_is_invisible_for_any_threshold(spark, threshold):
    purchases, clicks = _skewed_data()
    p = spark.createDataFrame(purchases, "event_id long, user_id long, ts_us long")
    c = spark.createDataFrame(clicks, "user_id long, ts_us long")
    got = {
        int(r["event_id"]): (
            None if r["user_id"] is None else int(r["user_id"]),
            int(r["ts_us"]),
            int(r["n_recent_clicks"]),
        )
        for r in clicks_before_purchase_cogroup(
            p, c, WINDOW_US, heavy_threshold=threshold
        ).collect()
    }
    assert got == _py_truth(purchases, clicks)


def test_heavy_path_actually_engages(spark):
    """With threshold 2, user 7 (1800 clicks) and users 1-5 (10-11
    each) are ALL heavy while user 9 stays light — both code paths run
    in one call, and the result above already proved them equal. Here
    we only pin that the heavy classification sees what we think it
    sees (guards against a silently-empty heavy set making the
    invariance test vacuous)."""
    purchases, clicks = _skewed_data()
    c = spark.createDataFrame(clicks, "user_id long, ts_us long")
    from pyspark.sql import functions as F

    heavy = {
        int(r["user_id"])
        for r in c.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter("n > 2")
        .collect()
    }
    assert 7 in heavy and heavy >= {1, 2, 3, 4, 5}
    assert 9 not in heavy


def test_threshold_misconfiguration_fails_loudly(spark, monkeypatch):
    import hailstorm_spark.operators.skewgroup as sg

    monkeypatch.setattr(sg, "_MAX_HEAVY_KEYS", 2)
    purchases, clicks = _skewed_data()
    p = spark.createDataFrame(purchases, "event_id long, user_id long, ts_us long")
    c = spark.createDataFrame(clicks, "user_id long, ts_us long")
    with pytest.raises(ValueError, match="threshold does not describe skew"):
        sg.clicks_before_purchase_cogroup(p, c, WINDOW_US, heavy_threshold=2)


def test_window_wider_than_slice_rejected(spark):
    p = spark.createDataFrame([(0, 1, 0)], "event_id long, user_id long, ts_us long")
    c = spark.createDataFrame([(1, 0)], "user_id long, ts_us long")
    with pytest.raises(ValueError, match="widen the slice"):
        clicks_before_purchase_cogroup(p, c, SLICE_US + 1)
