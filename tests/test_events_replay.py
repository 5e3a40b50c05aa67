"""Third-engine replays for the events analytics family.

Seeded random events staged as parquet, registered queries run through
Spark, and the statistic replayed in pure Python — planting the
boundary shapes each formula owns: the (n desc, path asc) tie cut at
rank 20 in the trigram top-k, an equi-depth histogram over fewer rows
than buckets and a duplicate block spanning bucket boundaries, the
cascade==direct rollup identity across minute/hour/day bucket edges,
and clamped out-of-band values in the equi-width histogram."""

from __future__ import annotations

import datetime
import random

import pandas as pd
import pytest

import hailstorm_spark.queries.events  # noqa: F401
import hailstorm_spark.queries.integrity  # noqa: F401
from hailstorm_spark.queries.events import (
    HIST_LO,
    HIST_NB,
    HIST_W,
    SESSION_GAP_MIN,
)
from hailstorm_spark.registry import QUERIES


def _stage_events(tmp_path, rows) -> str:
    """rows: (event_id, ts: datetime, user_id, event_type, value)."""
    pdf = pd.DataFrame(
        [(eid, ts, uid, et, float(v), "{}") for eid, ts, uid, et, v in rows],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)
    return str(tmp_path)


def _quarter(rng: random.Random, lo: float, hi: float) -> float:
    return rng.randrange(int(lo * 4), int(hi * 4) + 1) / 4.0


# ------------------------------------------------- session path trigrams


@pytest.mark.parametrize("seed", [53, 7777])
def test_session_path_trigrams_match_python_replay(spark, tmp_path, seed):
    """events_session_path_trigrams vs a Python replay of 30-min-gap
    sessionization + within-session trigram counting + the (n desc,
    path asc) top-20 cut. Planted: sessions split EXACTLY at the gap
    boundary (gap == 30 min stays, gap > 30 min splits), two-event
    sessions (no trigram), duplicate timestamps tiebroken by event_id,
    and enough distinct paths that the rank-20 cut lands inside a
    count tie."""
    rng = random.Random(seed)
    base = datetime.datetime(2024, 4, 1, 8, 0, 0)
    types = ["a", "b", "c", "d"]
    rows, eid = [], 0
    for uid in range(25):
        t = base + datetime.timedelta(minutes=rng.randrange(0, 600))
        n = rng.choice([1, 2, 3, 5, 9])
        for i in range(n):
            rows.append((eid, t, uid, rng.choice(types), 1.0))
            eid += 1
            if i == 1 and uid % 5 == 0:
                gap = 30 if uid % 2 == 0 else 31  # exactly-at vs just-over
                t = t + datetime.timedelta(minutes=gap)
            else:
                t = t + datetime.timedelta(minutes=rng.randrange(0, 4))
    # duplicate-timestamp pair: order decided by event_id
    dup_t = base + datetime.timedelta(minutes=700)
    for et in ("a", "b", "c", "d"):
        rows.append((eid, dup_t, 99, et, 1.0))
        eid += 1
    sf_dir = _stage_events(tmp_path, rows)

    got = [
        (r.path, r.n)
        for r in QUERIES["events_session_path_trigrams"].fn(spark, sf_dir).collect()
    ]

    by_user: dict = {}
    for e, t, u, et, _ in rows:
        by_user.setdefault(u, []).append((t, e, et))
    counts: dict = {}
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    for u, evs in by_user.items():
        evs.sort()
        sessions, cur, prev = [], [], None
        for t, e, et in evs:
            ts_us = int(t.timestamp() * 1_000_000)
            if prev is not None and ts_us - prev > gap_us:
                sessions.append(cur)
                cur = []
            cur.append(et)
            prev = ts_us
        sessions.append(cur)
        for s in sessions:
            for i in range(len(s) - 2):
                p = f"{s[i]}>{s[i+1]}>{s[i+2]}"
                counts[p] = counts.get(p, 0) + 1
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == expected
    # the exactly-30-min gap did NOT split (a trigram spans it for the
    # planted uid%10==0 user with >=3 events)
    assert len(counts) > 20  # the cut is real


# ------------------------------------------------- equi-depth histogram


def _stage_orders(tmp_path, prices) -> str:
    pdf = pd.DataFrame(
        [(i, float(p)) for i, p in enumerate(prices)],
        columns=["o_orderkey", "o_totalprice"],
    )
    pdf.to_parquet(str(tmp_path / "orders.parquet"), index=False)
    return str(tmp_path)


@pytest.mark.parametrize("seed,n_rows", [(67, 5), (67, 41), (3131, 1000)])
def test_equidepth_histogram_matches_python_replay(spark, tmp_path, seed, n_rows):
    """stats_equidepth_price_histogram vs a Python replay of the rank
    arithmetic rn ∈ ((b-1)n//8, bn//8]. Planted: fewer rows than
    buckets (empty buckets absent), a duplicate block spanning several
    bucket boundaries (rank cuts inside ties stay well-defined because
    only the sorted multiset matters), and the equi-depth invariant
    (populations differ by ≤ 1 when n ≥ 8)."""
    rng = random.Random(seed)
    prices = [_quarter(rng, 1, 900) for _ in range(n_rows)]
    if n_rows >= 40:
        prices[10:30] = [444.25] * 20  # tie block across boundaries
    sf_dir = _stage_orders(tmp_path, prices)

    got = {
        r.bucket: (r.upper_cents, r.n_rows)
        for r in QUERIES["stats_equidepth_price_histogram"].fn(spark, sf_dir).collect()
    }

    cents = sorted(int(p * 100) for p in prices)
    n = len(cents)
    expected = {}
    for b in range(1, 9):
        lo, hi = ((b - 1) * n) // 8, (b * n) // 8
        if hi > lo:
            expected[b] = (cents[hi - 1], hi - lo)
    assert got == expected
    if n >= 8:
        pops = [v[1] for v in expected.values()]
        assert max(pops) - min(pops) <= 1
    else:
        assert len(expected) < 8  # empty buckets really absent


# --------------------------------------------------- cascading rollup


@pytest.mark.parametrize("seed", [71, 5959])
def test_rollup_multires_matches_python_replay(spark, tmp_path, seed):
    """events_rollup_multires vs a direct Python aggregation at each
    resolution — proving cascade == direct (the associativity the
    continuous-aggregate pattern relies on). Planted: events exactly ON
    minute/hour/day boundaries, a minute straddling an hour edge, and
    quarter-cent values so decimal sums are engine-exact."""
    rng = random.Random(seed)
    base = datetime.datetime(2024, 4, 1, 0, 0, 0)
    rows, eid = [], 0
    specials = [
        base,                                               # day boundary
        base + datetime.timedelta(hours=1),                 # hour boundary
        base + datetime.timedelta(hours=1, minutes=59, seconds=59),
        base + datetime.timedelta(hours=2),                 # next hour
        base + datetime.timedelta(days=1),                  # next day
    ]
    for t in specials:
        rows.append((eid, t, 1, "click", 2.25))
        eid += 1
    for _ in range(300):
        t = base + datetime.timedelta(
            seconds=rng.randrange(0, 2 * 86400)
        )
        rows.append((eid, t, rng.randrange(9), rng.choice(["click", "view"]),
                     _quarter(rng, 0, 60)))
        eid += 1
    sf_dir = _stage_events(tmp_path, rows)

    got = {
        (r.resolution, r.bucket_epoch, r.event_type): (r.n, r.sum_value)
        for r in QUERIES["events_rollup_multires"].fn(spark, sf_dir).collect()
    }

    expected = {}
    for res, width in (("minute", 60), ("hour", 3600), ("day", 86400)):
        agg: dict = {}
        for _, t, _, et, v in rows:
            ep = int(t.replace(tzinfo=datetime.timezone.utc).timestamp())
            k = (res, (ep // width) * width, et)
            n, c = agg.get(k, (0, 0))
            agg[k] = (n + 1, c + round(v * 100))
        for k, (n, c) in agg.items():
            expected[k] = (n, c / 100)
    assert got == expected


# ------------------------------------------------ equi-width histogram


@pytest.mark.parametrize("seed", [83, 1717])
def test_value_histogram_matches_python_replay(spark, tmp_path, seed):
    """events_value_histogram vs a Python replay of the clamped
    floor((v-lo)/w) bucket rule. Planted: values exactly ON bucket
    edges (floor lands them in the upper bucket), a negative value
    (clamped to bucket 0), and values beyond the last edge (clamped to
    NB-1)."""
    rng = random.Random(seed)
    base = datetime.datetime(2024, 4, 2, 9, 0, 0)
    vals = [_quarter(rng, 0, 600) for _ in range(250)]
    vals += [HIST_LO + k * HIST_W for k in range(HIST_NB)]  # exact edges
    vals += [-3.25, HIST_LO + HIST_NB * HIST_W + 123.5]     # clamps
    rows = [
        (i, base + datetime.timedelta(seconds=i), i % 7, "click", v)
        for i, v in enumerate(vals)
    ]
    sf_dir = _stage_events(tmp_path, rows)

    got = {
        r.bucket: (r.n, r.sum_value)
        for r in QUERIES["events_value_histogram"].fn(spark, sf_dir).collect()
    }

    import math

    agg: dict = {}
    for v in vals:
        b = min(max(math.floor((v - HIST_LO) / HIST_W), 0), HIST_NB - 1)
        n, c = agg.get(b, (0, 0))
        agg[b] = (n + 1, c + round(v * 100))
    expected = {b: (n, c / 100) for b, (n, c) in agg.items()}
    assert got == expected
    assert 0 in got and (HIST_NB - 1) in got  # both clamps exercised


# ------------------------------------------------- 3-step temporal funnel


@pytest.mark.parametrize("seed", [29, 9090])
def test_funnel_3step_matches_python_replay(spark, tmp_path, seed):
    """events_funnel_3step vs a Python replay of the staged existence
    semantics: view → click in (v_ts, v_ts+6h] → purchase in
    (c_ts, c_ts+6h]. Planted boundary shapes the fixtures never hold:
    a click at EXACTLY view+6h (inclusive, converts) vs 6h+1µs (does
    not), a click at the same instant as the view (strict >, does
    not), a purchase within 6h of an EARLIER click but not the one
    that followed a view (must not convert), and a user whose
    conversion only works through their SECOND view (any-pair
    existence, not first-view)."""
    rng = random.Random(seed)
    base = datetime.datetime(2024, 5, 1, 0, 0, 0)
    h6 = datetime.timedelta(hours=6)
    us1 = datetime.timedelta(microseconds=1)
    rows, eid = [], 0

    def add(uid, t, et):
        nonlocal eid
        rows.append((eid, t, uid, et, 1.0))
        eid += 1

    # u0: click exactly at view+6h, purchase exactly at click+6h -> converts
    add(0, base, "view"); add(0, base + h6, "click"); add(0, base + h6 + h6, "purchase")
    # u1: click at view+6h+1us -> view-only
    add(1, base, "view"); add(1, base + h6 + us1, "click")
    # u2: click at the same instant as the view (strict >) -> view-only
    add(2, base, "view"); add(2, base, "click")
    # u3: purchase 1us after the 6h click window closes -> vc only
    add(3, base, "view"); add(3, base + h6, "click")
    add(3, base + h6 + h6 + us1, "purchase")
    # u4: purchase precedes the click -> vc only
    add(4, base, "view"); add(4, base + datetime.timedelta(hours=1), "purchase")
    add(4, base + datetime.timedelta(hours=2), "click")
    # u5: first view's click is out of window; second view converts
    add(5, base, "view")
    add(5, base + datetime.timedelta(hours=7), "view")
    add(5, base + datetime.timedelta(hours=8), "click")
    add(5, base + datetime.timedelta(hours=9), "purchase")
    # u6: click with NO prior view, then purchase -> not even a view user
    add(6, base, "click"); add(6, base + datetime.timedelta(hours=1), "purchase")
    # random tail: 40 users with 1-6 events of any type
    for uid in range(10, 50):
        t = base + datetime.timedelta(minutes=rng.randrange(0, 1440))
        for _ in range(rng.randrange(1, 7)):
            add(uid, t, rng.choice(["view", "click", "purchase", "scroll"]))
            t = t + datetime.timedelta(minutes=rng.randrange(1, 500))
    sf_dir = _stage_events(tmp_path, rows)

    got = QUERIES["events_funnel_3step"].fn(spark, sf_dir).collect()[0]

    views: dict = {}
    clicks: dict = {}
    purchases: dict = {}
    for _, t, u, et, _v in rows:
        {"view": views, "click": clicks, "purchase": purchases}.get(
            et, {}
        ).setdefault(u, []).append(t)
    n_view = len(views)
    vc_users = set()
    vc_click_ts: dict = {}
    for u, vts in views.items():
        for vt in vts:
            for ct in clicks.get(u, []):
                if vt < ct <= vt + h6:
                    vc_users.add(u)
                    vc_click_ts.setdefault(u, set()).add(ct)
    vcp_users = {
        u
        for u, cts in vc_click_ts.items()
        for ct in cts
        for pt in purchases.get(u, [])
        if ct < pt <= ct + h6
    }
    assert (got.n_view_users, got.n_view_click_users, got.n_funnel_users) == (
        n_view, len(vc_users), len(vcp_users)
    )
    # the planted users decided as designed
    assert 0 in vcp_users and 5 in vcp_users
    assert {1, 2} & vc_users == set() and 3 in vc_users - vcp_users
    assert 4 in vc_users - vcp_users and 6 not in views


# --------------------------------------------- latest-event compaction


@pytest.mark.parametrize("seed", [31, 5151])
def test_latest_per_user_matches_python_replay(spark, tmp_path, seed):
    """events_latest_per_user (CDC upsert compaction) vs a Python
    max-by replay of the (ts desc, event_id desc) order. Planted:
    duplicate (user, ts) pairs where ONLY the event_id tiebreak
    decides, a user whose latest ts carries the SMALLEST event_id of
    their history (ts dominates id), and single-event users."""
    rng = random.Random(seed)
    base = datetime.datetime(2024, 5, 2, 0, 0, 0)
    rows, eid = [], 0
    for uid in range(30):
        n = rng.choice([1, 1, 2, 4, 7])
        for _ in range(n):
            t = base + datetime.timedelta(seconds=rng.randrange(0, 86400))
            rows.append((eid, t, uid, rng.choice(["a", "b"]), float(eid % 13)))
            eid += 1
    # duplicate-ts pair: event_id 10_000 vs 10_001 at the same instant
    dup_t = base + datetime.timedelta(days=2)
    rows.append((10_000, dup_t, 77, "x", 1.0))
    rows.append((10_001, dup_t, 77, "y", 2.0))
    # latest ts carries the smallest event_id for user 78
    rows.append((20_005, base + datetime.timedelta(days=1), 78, "old", 5.0))
    rows.append((20_001, base + datetime.timedelta(days=3), 78, "new", 7.0))
    sf_dir = _stage_events(tmp_path, rows)

    got = sorted(
        (r.user_id, r.event_id, r.event_type, r.value)
        for r in QUERIES["events_latest_per_user"].fn(spark, sf_dir).collect()
    )

    best: dict = {}
    for e, t, u, et, v in rows:
        k = (t, e)
        if u not in best or k > (best[u][1], best[u][0]):
            best[u] = (e, t, et, v)
    expected = sorted((u, e, et, v) for u, (e, t, et, v) in best.items())
    assert got == expected
    assert best[77][0] == 10_001 and best[78][0] == 20_001


# ------------------------------------- matview incremental == full


@pytest.mark.parametrize("seed", [37, 7373])
def test_matview_incremental_matches_python_replay(spark, tmp_path, seed):
    """events_matview_incremental_daily vs a Python replay of the full
    per-type rollup — proving the partial-merge algebra (sum-of-sums /
    sum-of-counts / count-of-days) AND the floor(value*1e6) integer
    scaling identical to raw-scan semantics. Planted: NEGATIVE values
    (floor != truncate below zero), an event type that exists ONLY on
    the newest day (delta-only partial), one that exists only in
    history, and a type spanning both."""
    import math

    rng = random.Random(seed)
    base = datetime.datetime(2024, 6, 1, 12, 0, 0)
    rows, eid = [], 0

    def add(day, et, v):
        nonlocal eid
        rows.append(
            (eid, base + datetime.timedelta(days=day,
                                            seconds=rng.randrange(0, 3600)),
             eid % 9, et, v)
        )
        eid += 1

    for day in range(5):
        for _ in range(rng.randrange(3, 12)):
            add(day, rng.choice(["a", "b"]), rng.randrange(-4000, 4000) / 16)
    add(4, "delta_only", -0.0000015)  # newest day only; -1.5 micros
    add(4, "delta_only", 0.0000015)
    add(0, "hist_only", 2.5)
    sf_dir = _stage_events(tmp_path, rows)

    got = sorted(
        (r.event_type, r.n_events, r.sum_value_micros, r.n_days)
        for r in QUERIES["events_matview_incremental_daily"].fn(spark, sf_dir).collect()
    )

    agg: dict = {}
    for _e, t, _u, et, v in rows:
        n, s, days = agg.get(et, (0, 0, set()))
        agg[et] = (n + 1, s + math.floor(v * 1_000_000), days | {t.date()})
    expected = sorted(
        (et, n, s, len(days)) for et, (n, s, days) in agg.items()
    )
    assert got == expected
    # the negative-value floor really differs from truncation:
    # -1.5 micros floors to -2, truncates to -1
    assert math.floor(-0.0000015 * 1_000_000) == -2
    assert math.trunc(-0.0000015 * 1_000_000) == -1


# ------------------------------------------------ nearest-in-time as-of


@pytest.mark.parametrize("seed", [71, 4747])
def test_asof_nearest_click_matches_python_replay(spark, tmp_path, seed):
    """join_asof_nearest_click vs a Python replay of the two-sided
    nearest rule. Planted ties the fixtures never produce: a click at
    EXACTLY the purchase instant (backward side claims it, gap 0), a
    purchase exactly midway between two clicks (|gap| tie -> the
    EARLIER click), duplicate click timestamps collapsed to
    max(event_id), a purchase before any click (forward only), after
    all clicks (backward only), and a user with no clicks (all-null
    row)."""
    rng = random.Random(seed)
    base = datetime.datetime(2024, 7, 1, 0, 0, 0)
    rows, eid = [], 0

    def add(uid, t, et):
        nonlocal eid
        rows.append((eid, t, uid, et, 1.0))
        eid += 1
        return eid - 1

    m = datetime.timedelta
    # u0: click exactly at the purchase instant
    add(0, base + m(minutes=10), "click"); add(0, base + m(minutes=10), "purchase")
    # u1: purchase midway between clicks at +0 and +20 -> earlier wins
    add(1, base, "click"); add(1, base + m(minutes=20), "click")
    add(1, base + m(minutes=10), "purchase")
    # u2: duplicate click ts -> max(event_id) represents the instant
    add(2, base + m(minutes=5), "click"); add(2, base + m(minutes=5), "click")
    add(2, base + m(minutes=6), "purchase")
    # u3: purchase BEFORE any click (forward only)
    add(3, base, "purchase"); add(3, base + m(minutes=30), "click")
    # u4: purchase AFTER all clicks (backward only)
    add(4, base, "click"); add(4, base + m(minutes=90), "purchase")
    # u5: no clicks at all
    add(5, base + m(minutes=7), "purchase")
    # random tail
    for uid in range(10, 40):
        t = base + m(minutes=rng.randrange(0, 600))
        for _ in range(rng.randrange(1, 8)):
            add(uid, t, rng.choice(["click", "purchase", "view"]))
            t = t + m(seconds=rng.randrange(1, 4000))
    sf_dir = _stage_events(tmp_path, rows)

    got = {
        r.event_id: (r.near_click_id, r.near_click_ts_us, r.near_gap_us)
        for r in QUERIES["join_asof_nearest_click"].fn(spark, sf_dir).collect()
    }

    clicks: dict = {}
    purchases = []
    for e, t, u, et, _v in rows:
        us = int(t.timestamp() * 1_000_000)
        if et == "click":
            k = (u, us)
            clicks[k] = max(clicks.get(k, -1), e)
        elif et == "purchase":
            purchases.append((e, u, us))
    by_user: dict = {}
    for (u, us), e in clicks.items():
        by_user.setdefault(u, []).append((us, e))
    expected = {}
    for e, u, us in purchases:
        cs = sorted(by_user.get(u, []))
        bwd = max(((cus, cid) for cus, cid in cs if cus <= us), default=None)
        fwd = min(((cus, cid) for cus, cid in cs if cus > us), default=None)
        if bwd is not None and (fwd is None or us - bwd[0] <= fwd[0] - us):
            expected[e] = (bwd[1], bwd[0], us - bwd[0])
        elif fwd is not None:
            expected[e] = (fwd[1], fwd[0], fwd[0] - us)
        else:
            expected[e] = (None, None, None)
    assert got == expected
    # planted rule checks: same-instant -> gap 0 backward; midway -> earlier
    assert expected[1][2] == 0
    u1_purchase = [e for e, u, _ in purchases if u == 1][0]
    assert expected[u1_purchase][0] == 2  # the base (earlier) click's id
    u2_purchase = [e for e, u, _ in purchases if u == 2][0]
    assert expected[u2_purchase][0] == 6  # max event_id of the dup instant
    u5_purchase = [e for e, u, _ in purchases if u == 5][0]
    assert expected[u5_purchase] == (None, None, None)


# ------------------------------------- cogrouped clicks-before-purchase


@pytest.mark.parametrize("seed", [73, 6464])
def test_cogroup_clicks_before_purchase_matches_python_replay(spark, tmp_path, seed):
    """cogroup_clicks_before_purchase vs a Python replay of the
    half-open [ts-30min, ts) attribution window. Planted: a click at
    EXACTLY ts-30min (included), at exactly ts (excluded), duplicate
    click timestamps (each copy counts), a purchase whose user never
    clicked (count 0 — the empty cogroup side), and a clicks-only user
    (no output row)."""
    rng = random.Random(seed)
    base = datetime.datetime(2024, 7, 2, 12, 0, 0)
    m = datetime.timedelta
    rows, eid = [], 0

    def add(uid, t, et):
        nonlocal eid
        rows.append((eid, t, uid, et, 1.0))
        eid += 1

    # u0: clicks at exactly -30min (in), -1us (in), 0 (out), +1s (out)
    pt = base + m(hours=2)
    add(0, pt - m(minutes=30), "click")
    add(0, pt - m(microseconds=1), "click")
    add(0, pt, "click")
    add(0, pt + m(seconds=1), "click")
    add(0, pt, "purchase")
    # u1: duplicate click ts inside the window -> both count
    add(1, pt - m(minutes=5), "click"); add(1, pt - m(minutes=5), "click")
    add(1, pt, "purchase")
    # u2: purchase, never clicked
    add(2, pt, "purchase")
    # u3: clicks only
    add(3, pt, "click")
    for uid in range(10, 45):
        t = base + m(seconds=rng.randrange(0, 20000))
        for _ in range(rng.randrange(1, 9)):
            add(uid, t, rng.choice(["click", "purchase"]))
            t = t + m(seconds=rng.randrange(1, 2500))
    sf_dir = _stage_events(tmp_path, rows)

    got = {
        r.event_id: r.n_recent_clicks
        for r in QUERIES["cogroup_clicks_before_purchase"].fn(spark, sf_dir).collect()
    }

    win = 30 * 60 * 1_000_000
    clicks: dict = {}
    expected = {}
    for e, t, u, et, _v in rows:
        if et == "click":
            clicks.setdefault(u, []).append(int(t.timestamp() * 1_000_000))
    for e, t, u, et, _v in rows:
        if et == "purchase":
            us = int(t.timestamp() * 1_000_000)
            expected[e] = sum(
                1 for c in clicks.get(u, []) if us - win <= c < us
            )
    assert got == expected
    # the planted boundary decisions
    u0p = [e for e, t, u, et, _ in rows if u == 0 and et == "purchase"][0]
    u1p = [e for e, t, u, et, _ in rows if u == 1 and et == "purchase"][0]
    u2p = [e for e, t, u, et, _ in rows if u == 2 and et == "purchase"][0]
    assert expected[u0p] == 2 and expected[u1p] == 2 and expected[u2p] == 0


# ------------------------------------- running distinct types window


@pytest.mark.parametrize("seed", [79, 3434])
def test_running_distinct_types_matches_python_replay(spark, tmp_path, seed):
    """window_running_distinct_types (the size(collect_set) OVER w
    workaround for Spark's unsupported DISTINCT window aggregate) vs a
    Python running-set replay. Planted: re-occurrences that must NOT
    bump the count, duplicate timestamps ordered by the event_id
    tiebreak (a NEW type and a SEEN type at the same instant), and
    single-event users. Only user_id % 100 == 7 rows are in scope —
    staged users both in and out of the shard."""
    rng = random.Random(seed)
    base = datetime.datetime(2024, 7, 3, 0, 0, 0)
    m = datetime.timedelta
    rows, eid = [], 0
    types = ["a", "b", "c", "d", "e"]
    for uid in [7, 107, 207, 307, 12, 55]:  # last two: outside the shard
        t = base + m(minutes=rng.randrange(0, 60))
        for _ in range(rng.randrange(1, 12)):
            rows.append((eid, t, uid, rng.choice(types), 1.0))
            eid += 1
            t = t + m(seconds=rng.randrange(0, 90))  # 0 => duplicate ts
    # engineered duplicate-instant pair: seen type then new type, order
    # decided by event_id alone
    t = base + m(hours=5)
    rows.append((90_000, t, 407, "a", 1.0))
    rows.append((90_001, t + m(minutes=1), 407, "a", 1.0))  # repeat: no bump
    rows.append((90_002, t + m(minutes=2), 407, "b", 1.0))
    rows.append((90_003, t + m(minutes=2), 407, "c", 1.0))  # same instant
    sf_dir = _stage_events(tmp_path, rows)

    got = sorted(
        (r.user_id, r.ts_us, r.n_types_seen)
        for r in QUERIES["window_running_distinct_types"].fn(spark, sf_dir).collect()
    )

    by_user: dict = {}
    for e, t, u, et, _v in rows:
        if u % 100 == 7:
            by_user.setdefault(u, []).append((int(t.timestamp() * 1_000_000), e, et))
    expected = []
    for u, evs in by_user.items():
        seen: set = set()
        for ts_us, e, et in sorted(evs):
            seen.add(et)
            expected.append((u, ts_us, len(seen)))
    assert got == sorted(expected)
    assert all(u % 100 == 7 for u, _, _ in got)
    u407 = [n for u, _, n in sorted(expected) if u == 407]
    assert u407 == [1, 1, 2, 3]


# --------------------------------------- partition digest reconciliation


@pytest.mark.parametrize("seed", [97, 5252])
def test_partition_digest_diff_matches_python_replay(spark, tmp_path, seed):
    """integrity_partition_digest_diff vs a Python replay of the
    order-insensitive mod-2^60 sum of per-row md5 digests and the
    replica-B perturbation rule (event_id % 1000 == 7 rows hash +1).
    Planted: a day containing NO perturbed rows (replicas must agree),
    days with exactly one and with many perturbed rows (must diverge),
    and negative/fractional values whose floor(value*1e6) canonical
    form the digest depends on."""
    import hashlib

    rng = random.Random(seed)
    base = datetime.datetime(2024, 7, 10, 6, 0, 0)
    rows, eid = [], 0

    def add(day, e, uid, et, v):
        rows.append((e, base + datetime.timedelta(days=day,
                                                  minutes=rng.randrange(600)),
                     uid, et, v))

    # day 0: clean (no event_id % 1000 == 7)
    for k in range(12):
        add(0, 1000 + k * 10 + (1 if k * 10 % 1000 == 7 else 0), k, "a",
            rng.randrange(-800, 800) / 16)
    # day 1: exactly one perturbed row
    add(1, 2007, 3, "b", -0.0000015)
    for k in range(8):
        add(1, 3000 + k, k, "b", rng.randrange(0, 500) / 4)
    # day 2: many perturbed rows
    for k in range(6):
        add(2, 4007 + 1000 * k, k, "c", rng.randrange(-200, 200) / 8)
    sf_dir = _stage_events(tmp_path, rows)

    got = {
        str(r.day): (r.n_rows, r.replicas_agree)
        for r in QUERIES["integrity_partition_digest_diff"].fn(spark, sf_dir).collect()
    }

    import math

    MOD = 1 << 60
    agg: dict = {}
    for e, t, u, et, v in rows:
        canon = f"{e}|{u}|{et}|{math.floor(v * 1_000_000)}"
        h = int(hashlib.md5(canon.encode()).hexdigest()[:15], 16)
        hb = (h + 1) % MOD if e % 1000 == 7 else h
        day = str(t.date())
        n, sa, sb = agg.get(day, (0, 0, 0))
        agg[day] = (n + 1, (sa + h) % MOD, (sb + hb) % MOD)
    expected = {d: (n, sa == sb) for d, (n, sa, sb) in agg.items()}
    assert got == expected
    days = sorted(expected)
    assert expected[days[0]][1] is True
    assert expected[days[1]][1] is False and expected[days[2]][1] is False
