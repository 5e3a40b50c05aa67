"""Randomized Python-replay parity for the SPC/forensics statistics.

Same layer as tests/test_sketch_parity.py: the oracle sweep pins the
p-chart / CUSUM / KS queries value-for-value against DuckDB on the
fixed events table; here each statistic is re-derived by an
independent pure-Python implementation on seeded random series with
PLANTED signal (an out-of-control day, a level shift, a distribution
shift), so the tests also check the statistics DETECT what they exist
to detect — a property the fixed fixtures exercise only incidentally.

All generated values are exact multiples of 0.25 (binary-exact
doubles), so ``round(value * 100)`` is the same integer in Spark,
DuckDB, and the replay — no float-rounding hazard enters the parity.
"""

from __future__ import annotations

import datetime
import random

import pandas as pd
import pytest

import hailstorm_spark.queries.events  # noqa: F401  (registers the queries)
from hailstorm_spark.registry import QUERIES


def _write_events(tmp_path, rows) -> str:
    """rows: (event_id, day: date, user_id, event_type, value)"""
    pdf = pd.DataFrame(
        [
            (eid, pd.Timestamp(day) + pd.Timedelta(hours=eid % 24), uid, et, v, "{}")
            for eid, day, uid, et, v in rows
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)
    return str(tmp_path)


def _quarter(rng: random.Random, lo: float, hi: float) -> float:
    return rng.randrange(int(lo * 4), int(hi * 4) + 1) / 4.0


DAY0 = datetime.date(2024, 3, 1)


@pytest.mark.parametrize("seed", [17, 404])
def test_pchart_matches_python_replay_and_flags_planted_day(spark, tmp_path, seed):
    """events_pchart_out_of_control == exact integer replay of the
    denominator-cleared 3-sigma binomial band; the planted 40%-bad day
    trips the chart, typical ~2%-bad days stay in control."""
    rng = random.Random(seed)
    rows, eid = [], 0
    planted = DAY0 + datetime.timedelta(days=7)
    for d in range(20):
        day = DAY0 + datetime.timedelta(days=d)
        n = rng.randrange(80, 160)
        p_bad = 0.4 if day == planted else 0.02
        for _ in range(n):
            bad = rng.random() < p_bad
            v = _quarter(rng, 401, 500) if bad else _quarter(rng, 0, 400)
            rows.append((eid, day, rng.randrange(50), "click", v))
            eid += 1
    sf_dir = _write_events(tmp_path, rows)

    got = {
        r.day: (r.n_events, r.n_bad, r.deviation_num, r.out_of_control)
        for r in QUERIES["events_pchart_out_of_control"].fn(spark, sf_dir).collect()
    }

    per_day: dict[datetime.date, list[int]] = {}
    for _, day, _, _, v in rows:
        n, nb = per_day.get(day, [0, 0])
        per_day[day] = [n + 1, nb + (0 if 0.0 <= v <= 400.0 else 1)]
    nn = sum(n for n, _ in per_day.values())
    bb = sum(nb for _, nb in per_day.values())
    expected = {}
    for day, (n, nb) in per_day.items():
        dev = nb * nn - n * bb
        expected[day] = (n, nb, dev, dev * dev > 9 * bb * (nn - bb) * n)
    assert got == expected
    assert got[planted][3] is True
    in_control = [d for d in per_day if d != planted]
    assert sum(not got[d][3] for d in in_control) >= len(in_control) - 2


@pytest.mark.parametrize("seed", [29, 91])
def test_cusum_matches_python_replay_and_textbook_recursion(spark, tmp_path, seed):
    """stats_cusum_changepoint_daily == integer replay of the
    closed-form charts, AND the closed form C_d - min C_j equals the
    textbook recursion S_d = max(0, S_{d-1} + dev_d) on the same
    series; the post-shift chart dominates every pre-shift value."""
    rng = random.Random(seed)
    rows, eid = [], 0
    n_days, shift_at = 24, 16
    for d in range(n_days):
        day = DAY0 + datetime.timedelta(days=d)
        base = 200.0 if d >= shift_at else 100.0  # planted level shift up
        for _ in range(rng.randrange(20, 40)):
            rows.append(
                (eid, day, rng.randrange(50), "click", _quarter(rng, base, base + 50))
            )
            eid += 1
    sf_dir = _write_events(tmp_path, rows)

    got = {
        r.day: (r.day_cents, r.cusum_high, r.cusum_low)
        for r in QUERIES["stats_cusum_changepoint_daily"].fn(spark, sf_dir).collect()
    }

    x: dict[datetime.date, int] = {}
    for _, day, _, _, v in rows:
        x[day] = x.get(day, 0) + int(v * 4) * 25  # exact cents
    days = sorted(x)
    nd, tot = len(days), sum(x.values())
    # The query's running extrema are over ROWS ONLY (no virtual C_0=0);
    # the textbook recursion S_d = max(0, S_{d-1}+dev) corresponds to the
    # closed form WITH the virtual zero — assert both, each exactly.
    cum, cmin, cmax, s_high = 0, None, None, 0
    expected = {}
    for day in days:
        dev = x[day] * nd - tot
        cum += dev
        cmin = cum if cmin is None else min(cmin, cum)
        cmax = cum if cmax is None else max(cmax, cum)
        expected[day] = (x[day], cum - cmin, cmax - cum)
        s_high = max(0, s_high + dev)  # textbook CUSUM recursion
        assert s_high == cum - min(0, cmin)
    assert got == expected
    post = min(got[d][1] for d in days[shift_at + 1 :])
    pre = max(got[d][1] for d in days[:shift_at])
    assert post > pre  # the shift is visible in the upward chart


@pytest.mark.parametrize("seed", [37, 808])
def test_ks_drift_matches_python_replay_and_float_definition(spark, tmp_path, seed):
    """stats_ks_drift_click_vs_purchase == integer replay of
    max|cum1*n2 - cum2*n1| with min-x witness, and the integer
    numerator over n1*n2 equals the float max|F1 - F2| definition; the
    planted +30 shift yields a large D."""
    rng = random.Random(seed)
    rows, eid = [], 0
    for _ in range(400):
        rows.append((eid, DAY0, rng.randrange(99), "click", _quarter(rng, 0, 100)))
        eid += 1
    for _ in range(350):
        rows.append(
            (eid, DAY0, rng.randrange(99), "purchase", _quarter(rng, 30, 130))
        )
        eid += 1
    # noise rows of other types must be ignored by the filter
    for _ in range(100):
        rows.append((eid, DAY0, rng.randrange(99), "view", _quarter(rng, 0, 500)))
        eid += 1
    sf_dir = _write_events(tmp_path, rows)

    [r] = QUERIES["stats_ks_drift_click_vs_purchase"].fn(spark, sf_dir).collect()

    c1: dict[int, int] = {}
    c2: dict[int, int] = {}
    for _, _, _, et, v in rows:
        cents = int(v * 4) * 25
        if et == "click":
            c1[cents] = c1.get(cents, 0) + 1
        elif et == "purchase":
            c2[cents] = c2.get(cents, 0) + 1
    n1, n2 = sum(c1.values()), sum(c2.values())
    xs = sorted(set(c1) | set(c2))
    cum1 = cum2 = 0
    best, best_x = -1, None
    for xv in xs:
        cum1 += c1.get(xv, 0)
        cum2 += c2.get(xv, 0)
        gap = abs(cum1 * n2 - cum2 * n1)
        if gap > best:
            best, best_x = gap, xv
    assert (r.n1, r.n2, r.ks_num, r.ks_at_x) == (n1, n2, best, best_x)
    d_float = r.ks_num / (n1 * n2)
    assert abs(d_float - best / (n1 * n2)) < 1e-12
    assert d_float > 0.15  # the planted shift is detected


@pytest.mark.parametrize("seed", [59, 1212])
def test_benford_matches_python_replay(spark, tmp_path, seed):
    """stats_benford_first_digit == integer replay: first digit of the
    exact cents string over log-uniform magnitudes (0.25 .. ~20k), the
    value >= 0.01 filter dropping planted zero/negative rows, ppm
    truncating division, and digits absent from the data absent from
    the result (inner join against the 9-row expectation table)."""
    import math as _math

    from hailstorm_spark.queries.events import BENFORD_PPM

    rng = random.Random(seed)
    rows, eid = [], 0
    cents_kept = []
    for _ in range(600):
        # log-uniform quarters: organic multi-scale magnitudes
        q = max(1, int(_math.exp(rng.uniform(0, 11))) // 25 * 25 or 25)
        v = q / 100.0
        rows.append((eid, DAY0, rng.randrange(30), "click", v))
        cents_kept.append(q)
        eid += 1
    for _ in range(40):  # filtered out: zero and negative values
        rows.append((eid, DAY0, rng.randrange(30), "click", -_quarter(rng, 0, 10)))
        eid += 1
    sf_dir = _write_events(tmp_path, rows)

    got = {
        r.digit: (r.n_values, r.observed_ppm, r.expected_ppm, r.deviation_ppm)
        for r in QUERIES["stats_benford_first_digit"].fn(spark, sf_dir).collect()
    }

    counts: dict[int, int] = {}
    for c in cents_kept:
        d = int(str(c)[0])
        counts[d] = counts.get(d, 0) + 1
    total = sum(counts.values())
    expected = {
        d: (
            n,
            n * 1_000_000 // total,
            BENFORD_PPM[d],
            n * 1_000_000 // total - BENFORD_PPM[d],
        )
        for d, n in counts.items()
    }
    assert got == expected
    assert total == 600


@pytest.mark.parametrize("seed", [43, 606])
def test_sessionize_matches_python_replay(spark, tmp_path, seed):
    """events_sessionize on random event streams vs a pure-Python
    replay of gap-based sessionization: ordering by (ts, event_id)
    with planted DUPLICATE timestamps, a gap of EXACTLY the session
    threshold (<= keeps the session alive), a gap one microsecond
    over (splits), and single-event zero-duration sessions."""
    from hailstorm_spark.queries.events import SESSION_GAP_MIN

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    rng = random.Random(seed)
    base = pd.Timestamp("2024-04-01 00:00:00")
    rows, eid = [], 0
    stream: dict[int, list[tuple[int, int]]] = {}  # uid -> [(ts_us, eid)]
    for uid in range(12):
        t = rng.randrange(0, 10**6)
        for _ in range(rng.randrange(1, 25)):
            # mix of small gaps, exact-threshold gaps, threshold+1, big
            t += rng.choice([0, 1, 500, gap_us, gap_us + 1, 2 * gap_us])
            stream.setdefault(uid, []).append((t, eid))
            rows.append((eid, base + pd.Timedelta(microseconds=t), uid, "click", 1.0, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)

    got = {
        (r.user_id, r.session_id): (r.n_events, r.duration_sec)
        for r in QUERIES["events_sessionize"].fn(spark, str(tmp_path)).collect()
    }

    expected = {}
    for uid, evts in stream.items():
        evts.sort()  # (ts_us, event_id)
        sid, prev = 0, None
        sess: dict[int, list[int]] = {}
        for ts_us, _ in evts:
            if prev is None or ts_us - prev > gap_us:
                sid += 1
            sess.setdefault(sid, []).append(ts_us)
            prev = ts_us
        for s, tss in sess.items():
            expected[(uid, s)] = (len(tss), (max(tss) - min(tss)) // 1_000_000)
    assert got == expected


@pytest.mark.parametrize("seed", [73, 505])
def test_pack_training_sequences_matches_python_replay(spark, tmp_path, seed):
    """pack_training_sequences on a random corpus vs a pure-Python
    replay of the greedy layout: within each source, docs in doc_id
    order, a doc starts in the bin floor(cum_prev / 256) — exercising
    docs LARGER than the whole budget (they occupy their landing bin
    and push the cursor several bins forward), zero-token docs (land
    in the current bin, advance nothing), and single-doc sources."""
    rng = random.Random(seed)
    vocab = ["tok%d" % i for i in range(30)]
    docs = []
    did = 0
    for s in range(6):
        n_docs = 1 if s == 5 else rng.randrange(3, 20)
        for _ in range(n_docs):
            n = rng.choice([0, 1, 5, 30, 120, 250, 400, 600])  # incl. > budget
            docs.append((did, " ".join(rng.choice(vocab) for _ in range(n)), "en",
                         f"src{s}", n))
            did += 1
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)

    import hailstorm_spark.queries.corpus_pipeline  # noqa: F401
    from hailstorm_spark.queries.corpus_pipeline import PACK_BUDGET

    got = {
        (r.source, r.seq_id): (r.n_docs, r.seq_tokens)
        for r in QUERIES["pack_training_sequences"].fn(spark, str(tmp_path)).collect()
    }

    expected: dict = {}
    by_src: dict = {}
    for did_, text, _, src, _ in docs:
        by_src.setdefault(src, []).append((did_, len(text.split())))
    for src, items in by_src.items():
        cum = 0
        for _, n in sorted(items):
            seq = cum // PACK_BUDGET
            k = (src, seq)
            nd, nt = expected.get(k, (0, 0))
            expected[k] = (nd + 1, nt + n)
            cum += n
    assert got == expected


@pytest.mark.parametrize("seed", [79, 303])
def test_consecutive_funnel_matches_python_replay(spark, tmp_path, seed):
    """events_pattern_consecutive_funnel on random event streams vs a
    Python replay of the strict view->click->purchase triple over the
    (ts, event_id)-ordered per-user stream: overlapping matches count
    separately, near-misses (anything between the steps) don't match,
    and duplicate timestamps resolve by event_id."""
    rng = random.Random(seed)
    types = ["view", "click", "purchase", "error", "signup"]
    base = pd.Timestamp("2024-05-01")
    rows, eid = [], 0
    stream: dict[int, list[tuple[int, int, str]]] = {}
    for uid in range(15):
        t = rng.randrange(10**6)
        for _ in range(rng.randrange(2, 40)):
            t += rng.choice([0, 1, 1000])  # duplicate-ts ties included
            et = rng.choice(types)
            stream.setdefault(uid, []).append((t, eid, et))
            rows.append((eid, base + pd.Timedelta(microseconds=t), uid, et, 1.0, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)

    got = {
        r.user_id: (r.n_matches, r.first_match_event_id)
        for r in QUERIES["events_pattern_consecutive_funnel"]
        .fn(spark, str(tmp_path))
        .collect()
    }

    expected = {}
    for uid, evts in stream.items():
        seq = [e for _, _, e in sorted(evts)]
        ids = [i for _, i, _ in sorted(evts)]
        hits = [
            ids[k]
            for k in range(2, len(seq))
            if seq[k] == "purchase" and seq[k - 1] == "click" and seq[k - 2] == "view"
        ]
        if hits:
            expected[uid] = (len(hits), min(hits))
    assert got == expected


@pytest.mark.parametrize("seed", [89, 707])
def test_gap_fill_locf_matches_python_replay(spark, tmp_path, seed):
    """events_gap_fill_locf on random sparse streams vs a pure-Python
    replay of the hourly grid + last-observation-carry-forward:
    per-(user, hour) the LAST event by (ts, event_id) wins, gaps of
    many hours repeat the carried value, single-hour users produce a
    one-cell grid, and quarter-valued cents are exact."""
    rng = random.Random(seed)
    base = pd.Timestamp("2024-06-01")
    rows, eid = [], 0
    obs: dict[int, list[tuple[int, int, int]]] = {}  # uid -> (us, eid, cents)
    for uid in range(10):
        t = rng.randrange(3_600_000_000)
        for _ in range(rng.randrange(1, 15)):
            t += rng.choice([0, 1, 1800_000_000, 3600_000_000, 7 * 3600_000_000])
            q = rng.randrange(0, 1600)  # quarters
            obs.setdefault(uid, []).append((t, eid, q * 25))
            rows.append(
                (eid, base + pd.Timedelta(microseconds=t), uid, "click", q / 4.0, "{}")
            )
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)

    got = {
        r.user_id: (r.n_hours, r.n_filled, r.locf_sum_cents)
        for r in QUERIES["events_gap_fill_locf"].fn(spark, str(tmp_path)).collect()
    }

    HOUR = 3_600_000_000
    expected = {}
    for uid, evts in obs.items():
        per_hr: dict[int, tuple] = {}
        for us, e, cents in evts:
            hr = us // HOUR
            k = (us, e)
            if hr not in per_hr or k > per_hr[hr][0]:
                per_hr[hr] = (k, cents)
        h0, h1 = min(per_hr), max(per_hr)
        carried, total, filled = None, 0, 0
        for hr in range(h0, h1 + 1):
            if hr in per_hr:
                carried = per_hr[hr][1]
            else:
                filled += 1
            total += carried
        expected[uid] = (h1 - h0 + 1, filled, total)
    assert got == expected


@pytest.mark.parametrize("seed", [83, 909])
def test_scd2_history_matches_python_replay(spark, tmp_path, seed):
    """events_scd2_type_history on random streams vs a pure-Python
    gaps-and-islands replay: runs of equal consecutive types compress
    to [valid_from, valid_to) intervals closed by the next run's start,
    the final run stays open (NULL valid_to), single-event runs and
    duplicate-timestamp ties included."""
    rng = random.Random(seed)
    base = pd.Timestamp("2024-07-01")
    types = ["click", "view", "purchase"]
    rows, eid = [], 0
    stream: dict[int, list[tuple[int, int, str]]] = {}
    for uid in range(12):
        t = rng.randrange(10**6)
        for _ in range(rng.randrange(1, 30)):
            t += rng.choice([0, 1, 10**6])
            et = rng.choice(types)
            stream.setdefault(uid, []).append((t, eid, et))
            rows.append((eid, base + pd.Timedelta(microseconds=t), uid, et, 1.0, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)

    base_us = int(pd.Timestamp("2024-07-01").value // 1000)
    got = {
        (r.user_id, r.valid_from_us): (r.event_type, r.valid_to_us, r.n_events)
        for r in QUERIES["events_scd2_type_history"].fn(spark, str(tmp_path)).collect()
    }

    expected = {}
    for uid, evts in stream.items():
        runs = []  # (type, from_us, n)
        for us, _, et in sorted(evts):
            if runs and runs[-1][0] == et:
                runs[-1][2] += 1
            else:
                runs.append([et, base_us + us, 1])
        for i, (et, frm, n) in enumerate(runs):
            to = runs[i + 1][1] if i + 1 < len(runs) else None
            expected[(uid, frm)] = (et, to, n)
    assert got == expected


@pytest.mark.parametrize("seed", [97, 404])
def test_cohort_retention_matches_python_replay(spark, tmp_path, seed):
    """events_cohort_retention on random multi-week activity vs a
    pure-Python replay of epoch-week cohorting: week-0 rows always
    cover the full cohort (retention exactly 1.0), users active in
    scattered later weeks contribute distinct-counted offsets, and the
    retention double divides the same two integers on both sides."""
    rng = random.Random(seed)
    rows, eid = [], 0
    activity: dict[int, set[int]] = {}
    for uid in range(40):
        first = rng.randrange(0, 4)
        weeks = {first} | {
            first + rng.randrange(0, 6) for _ in range(rng.randrange(0, 5))
        }
        activity[uid] = weeks
        for wk in weeks:
            for _ in range(rng.randrange(1, 3)):  # multiple events per week
                us = wk * 604800000000 + rng.randrange(604800000000)
                rows.append(
                    (eid, pd.Timestamp(1970, 1, 1) + pd.Timedelta(microseconds=us),
                     uid, "click", 1.0, "{}")
                )
                eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)

    got = {
        (r.cohort_week, r.week_offset): (r.n_active, r.cohort_size, r.retention)
        for r in QUERIES["events_cohort_retention"].fn(spark, str(tmp_path)).collect()
    }

    cohort = {u: min(w) for u, w in activity.items()}
    sizes: dict[int, int] = {}
    for u, c in cohort.items():
        sizes[c] = sizes.get(c, 0) + 1
    act: dict[tuple[int, int], set] = {}
    for u, weeks in activity.items():
        for w in weeks:
            act.setdefault((cohort[u], w - cohort[u]), set()).add(u)
    expected = {
        k: (len(us), sizes[k[0]], len(us) / sizes[k[0]]) for k, us in act.items()
    }
    assert got == expected
    for (cw, off), (n, size, r) in got.items():
        if off == 0:
            assert n == size and r == 1.0


@pytest.mark.parametrize("seed", [103, 606])
def test_markov_transitions_match_python_replay(spark, tmp_path, seed):
    """events_markov_transitions on random per-user streams vs a
    pure-Python replay: transitions never cross users (each user's
    first event has no predecessor), duplicate-timestamp ties order by
    event_id, and the integer-scaled probabilities truncate the same
    positive division."""
    rng = random.Random(seed)
    base = pd.Timestamp("2024-08-01")
    types = ["click", "view", "purchase", "error"]
    rows, eid = [], 0
    stream: dict[int, list[tuple[int, int, str]]] = {}
    for uid in range(14):
        t = rng.randrange(10**6)
        for _ in range(rng.randrange(1, 25)):
            t += rng.choice([0, 1, 10**6])
            et = rng.choice(types)
            stream.setdefault(uid, []).append((t, eid, et))
            rows.append((eid, base + pd.Timedelta(microseconds=t), uid, et, 1.0, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)

    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.p_x10000)
        for r in QUERIES["events_markov_transitions"].fn(spark, str(tmp_path)).collect()
    }

    counts: dict[tuple[str, str], int] = {}
    for uid, evts in stream.items():
        seq = [e for _, _, e in sorted(evts)]
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    totals: dict[str, int] = {}
    for (a, _), n in counts.items():
        totals[a] = totals.get(a, 0) + n
    expected = {
        k: (n, n * 10000 // totals[k[0]]) for k, n in counts.items()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [109, 808])
def test_bootstrap_replicates_match_python_replay(spark, tmp_path, seed):
    """stats_bootstrap_replicates on random events vs a pure-Python
    replay of the deterministic Poisson bootstrap: md5(b:event_id)
    60-bit draws against the integer CDF thresholds, replicate sums
    exact — plus the statistical sanity that each replicate resamples
    ~n rows (Poisson(1) weights sum to n in expectation)."""
    import hashlib

    from hailstorm_spark.queries.events import BOOT_B, BOOT_T

    rng = random.Random(seed)
    rows = []
    for eid in range(300):
        rows.append(
            (eid, DAY0, rng.randrange(40), rng.choice(["click", "view"]),
             _quarter(rng, 0, 400))
        )
    sf_dir = _write_events(tmp_path, rows)

    got = {
        (r.event_type, r.replicate): (r.n_resampled, r.sum_cents)
        for r in QUERIES["stats_bootstrap_replicates"].fn(spark, sf_dir).collect()
    }

    def draw(b: int, eid: int) -> int:
        h = int(hashlib.md5(f"{b}:{eid}".encode()).hexdigest()[:15], 16)
        for k, t in enumerate(BOOT_T):
            if h < t:
                return k
        return 4

    expected: dict = {}
    per_rep_n: dict = {}
    for eid, _, _, et, v in rows:
        cents = int(v * 4) * 25
        for b in range(BOOT_B):
            wt = draw(b, eid)
            n, s = expected.get((et, b), (0, 0))
            expected[(et, b)] = (n + wt, s + wt * cents)
            per_rep_n[b] = per_rep_n.get(b, 0) + wt
    assert got == expected
    for b, n in per_rep_n.items():  # Poisson(1): mean n=300, sd ~ sqrt(300)
        assert 200 < n < 400, (b, n)


@pytest.mark.parametrize("seed", [113, 202])
def test_decayed_engagement_matches_python_replay(spark, tmp_path, seed):
    """events_decayed_engagement on random events vs a pure-Python
    replay of the power-of-two day decay: the anchor is the corpus max
    date, weights are 2^(H - age), events exactly AT the horizon keep
    weight 1, events one day past it are excluded entirely."""
    from hailstorm_spark.queries.events import DECAY_HORIZON_DAYS as H

    rng = random.Random(seed)
    rows, eid = [], 0
    anchor_day = DAY0 + datetime.timedelta(days=40)
    rows.append((eid, anchor_day, 0, "click", _quarter(rng, 1, 10))); eid += 1
    for _ in range(400):
        age = rng.choice([0, 1, 2, H - 1, H, H + 1, 30])  # boundary ages planted
        day = anchor_day - datetime.timedelta(days=age)
        rows.append((eid, day, rng.randrange(25), "click", _quarter(rng, 0, 400)))
        eid += 1
    sf_dir = _write_events(tmp_path, rows)

    got = {
        r.user_id: (r.decayed_score, r.n_recent)
        for r in QUERIES["events_decayed_engagement"].fn(spark, sf_dir).collect()
    }

    expected: dict = {}
    for _, day, uid, _, v in rows:
        age = (anchor_day - day).days
        if age > H:
            continue
        term = int(v * 4) * 25 * (1 << (H - age))
        s, n = expected.get(uid, (0, 0))
        expected[uid] = (s + term, n + 1)
    assert got == expected


@pytest.mark.parametrize("seed", [127, 515])
def test_mad_outliers_match_python_replay(spark, tmp_path, seed):
    """events_mad_robust_outliers on random heavy-tailed values vs a
    pure-Python replay of the histogram lower-median (smallest value
    whose cumulative count reaches (n+1)//2) applied twice (median,
    then MAD) and the strict 5xMAD fence — planted gross outliers must
    be counted without recentering the fence, and a constant-valued
    type has MAD 0 (every deviation > 0 is then an outlier)."""
    rng = random.Random(seed)
    rows, eid = [], 0
    for _ in range(300):
        v = _quarter(rng, 90, 110) if rng.random() < 0.9 else _quarter(rng, 5000, 9000)
        rows.append((eid, DAY0, rng.randrange(40), "click", v)); eid += 1
    for _ in range(60):  # constant-valued type: MAD = 0
        rows.append((eid, DAY0, rng.randrange(40), "view", 50.0)); eid += 1
    rows.append((eid, DAY0, 0, "view", 51.0)); eid += 1  # lone deviant
    sf_dir = _write_events(tmp_path, rows)

    got = {
        r.event_type: (r.med_cents, r.mad_cents, r.n_rows, r.n_outliers)
        for r in QUERIES["events_mad_robust_outliers"].fn(spark, sf_dir).collect()
    }

    def lower_median(vals: list) -> int:
        vals = sorted(vals)
        n = len(vals)
        cum, target = 0, (n + 1) // 2
        counts: dict = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        for v in sorted(counts):
            cum += counts[v]
            if cum >= target:
                return v
        raise AssertionError

    by_type: dict = {}
    for _, _, _, et, v in rows:
        by_type.setdefault(et, []).append(int(v * 4) * 25)
    expected = {}
    for et, xs in by_type.items():
        med = lower_median(xs)
        devs = [abs(x - med) for x in xs]
        mad = lower_median(devs)
        expected[et] = (med, mad, len(xs), sum(d > 5 * mad for d in devs))
    assert got == expected
    assert got["view"][1] == 0 and got["view"][3] == 1  # MAD 0, lone deviant flagged


@pytest.mark.parametrize("seed", [139, 919])
def test_interarrival_histogram_matches_python_replay(spark, tmp_path, seed):
    """events_interarrival_magnitude_histogram on random streams vs a
    pure-Python replay: gaps in whole seconds via floor division
    (sub-second gaps land in magnitude 0 along with exact-zero gaps),
    digit-count magnitudes, per-bucket min/max, and the in-session
    count at the exact threshold boundary."""
    from hailstorm_spark.queries.events import SESSION_GAP_MIN

    rng = random.Random(seed)
    base = pd.Timestamp("2024-09-01")
    rows, eid = [], 0
    stream: dict[int, list[int]] = {}
    choices = [0, 1, 999_999, 1_000_000, 5_000_000,
               SESSION_GAP_MIN * 60 * 1_000_000,          # exactly at threshold
               SESSION_GAP_MIN * 60 * 1_000_000 + 1_000_000,  # one second past
               7_200_000_000]
    for uid in range(10):
        t = rng.randrange(10**6)
        for _ in range(rng.randrange(1, 20)):
            t += rng.choice(choices)
            stream.setdefault(uid, []).append(t)
            rows.append((eid, base + pd.Timedelta(microseconds=t), uid, "click", 1.0, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)

    got = {
        r.magnitude: (r.n_gaps, r.min_gap_s, r.max_gap_s, r.n_within_session_gap)
        for r in QUERIES["events_interarrival_magnitude_histogram"]
        .fn(spark, str(tmp_path))
        .collect()
    }

    buckets: dict = {}
    thr_s = SESSION_GAP_MIN * 60
    for uid, ts in stream.items():
        ts = sorted(ts)
        for a, b in zip(ts, ts[1:]):
            gap_s = (b - a) // 1_000_000
            mag = 0 if gap_s == 0 else len(str(gap_s))
            n, lo, hi, ins = buckets.get(mag, (0, None, None, 0))
            buckets[mag] = (
                n + 1,
                gap_s if lo is None else min(lo, gap_s),
                gap_s if hi is None else max(hi, gap_s),
                ins + (1 if gap_s <= thr_s else 0),
            )
    assert got == buckets


@pytest.mark.parametrize("seed", [149, 321])
def test_cooccurrence_lift_matches_python_replay(spark, tmp_path, seed):
    """events_type_cooccurrence_lift on random (user, type) baskets vs
    a pure-Python replay of the pair-support count and the integer
    lift (n_ab * n_users * 10^4) div (n_a * n_b): ordered pairs ta <
    tb only, distinct (user, type) multiplicity collapsed, and users
    with a single type contribute to marginals but no pair."""
    rng = random.Random(seed)
    types = ["click", "view", "purchase", "error", "signup"]
    rows, eid = [], 0
    baskets: dict[int, set] = {}
    for uid in range(30):
        k = rng.choice([1, 1, 2, 2, 3, 4])
        basket = set(rng.sample(types, k))
        baskets[uid] = basket
        for et in basket:
            for _ in range(rng.randrange(1, 4)):  # multiplicity collapses
                rows.append((eid, DAY0, uid, et, 1.0)); eid += 1
    sf_dir = _write_events(tmp_path, rows)

    got = {
        (r.ta, r.tb): (r.n_ab, r.lift_x10000)
        for r in QUERIES["events_type_cooccurrence_lift"].fn(spark, sf_dir).collect()
    }

    n_users = len(baskets)
    n_t: dict = {}
    for b in baskets.values():
        for t in b:
            n_t[t] = n_t.get(t, 0) + 1
    pairs: dict = {}
    for b in baskets.values():
        for ta in b:
            for tb in b:
                if ta < tb:
                    pairs[(ta, tb)] = pairs.get((ta, tb), 0) + 1
    expected = {
        k: (n, n * n_users * 10000 // (n_t[k[0]] * n_t[k[1]]))
        for k, n in pairs.items()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [151, 424])
def test_value_percentiles_match_python_replay(spark, tmp_path, seed):
    """events_value_percentiles on random per-type values vs a
    pure-Python replay of the percentile_disc index arithmetic
    (rank (k*n + k) // m with (value, event_id) tiebreak): tiny groups
    where p50/p90/p99 collapse onto the same rank, heavy duplicate
    values resolved by event_id, and a single-row group where all
    three percentiles are that row."""
    rng = random.Random(seed)
    rows, eid = [], 0
    for et, n in [("click", 137), ("view", 3), ("purchase", 1), ("error", 40)]:
        for _ in range(n):
            # heavy duplicates: few distinct quarter values
            rows.append((eid, DAY0, rng.randrange(30), et, _quarter(rng, 0, 8)))
            eid += 1
    sf_dir = _write_events(tmp_path, rows)

    got = {
        r.event_type: (r.n, r.p50, r.p90, r.p99)
        for r in QUERIES["events_value_percentiles"].fn(spark, sf_dir).collect()
    }

    by_type: dict = {}
    for eid_, _, _, et, v in rows:
        by_type.setdefault(et, []).append((v, eid_))
    expected = {}
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        def at(k, m):
            return vals[(k * n + k) // m - 1][0]
        expected[et] = (n, at(1, 2), at(9, 10), at(99, 100))
    assert got == expected
    assert got["purchase"][1] == got["purchase"][2] == got["purchase"][3]


# ------------------------------------------------------------- RFM segments


@pytest.mark.parametrize("seed,n_users", [(61, 13), (1212, 57)])
def test_rfm_segments_match_python_replay(spark, tmp_path, seed, n_users):
    """events_rfm_segments vs a pure-Python replay of the three global
    (rank, user_id)-tiebroken rankings and the equal-width quartile
    formula ((rank-1)*4) div n + 1. Planted shapes: user counts NOT
    divisible by 4 (remainder distribution decided by the integer
    formula, not NTILE), heavy ties on every axis (clusters of users
    sharing last-active day, row count, and exact cents), and a lone
    best-everything user who must land in segment 111."""
    rng = random.Random(seed)
    days = [datetime.date(2024, 3, d) for d in (1, 3, 4, 9, 15, 16, 22)]
    rows = []
    eid = 0
    for uid in range(1, n_users + 1):
        if uid <= n_users // 3:
            # tie cluster: same day, same freq, same cents
            udays, per_day, cents = [days[1]], 2, 12.25
        else:
            udays = sorted(rng.sample(days[:-1], rng.randrange(1, 4)))
            per_day, cents = rng.randrange(1, 4), _quarter(rng, 1, 80)
        for d in udays:
            for _ in range(per_day):
                rows.append((eid, d, uid, "purchase", cents))
                eid += 1
    # the champion: most recent, most frequent, biggest spender
    champ = n_users + 1
    for _ in range(40):
        rows.append((eid, days[-1], champ, "purchase", 99.5))
        eid += 1
    sf_dir = _write_events(tmp_path, rows)

    got = {
        r.segment: r.n_users
        for r in QUERIES["events_rfm_segments"].fn(spark, sf_dir).collect()
    }

    per_user: dict = {}
    for _, d, uid, _, v in rows:
        last, freq, m = per_user.get(uid, (datetime.date.min, 0, 0))
        per_user[uid] = (max(last, d), freq + 1, m + round(v * 100))
    anchor = max(last for last, _, _ in per_user.values())
    users = sorted(per_user)
    nu = len(users)
    rec = {u: (anchor - per_user[u][0]).days for u in users}
    rrn = {u: i + 1 for i, u in enumerate(sorted(users, key=lambda u: (rec[u], u)))}
    frn = {
        u: i + 1
        for i, u in enumerate(sorted(users, key=lambda u: (-per_user[u][1], u)))
    }
    mrn = {
        u: i + 1
        for i, u in enumerate(sorted(users, key=lambda u: (-per_user[u][2], u)))
    }
    expected: dict = {}
    for u in users:
        seg = (
            (((rrn[u] - 1) * 4) // nu + 1) * 100
            + (((frn[u] - 1) * 4) // nu + 1) * 10
            + (((mrn[u] - 1) * 4) // nu + 1)
        )
        expected[seg] = expected.get(seg, 0) + 1
    assert got == expected
    # the champion ranks first on every axis → segment 111
    assert rrn[champ] == frn[champ] == mrn[champ] == 1
    assert 111 in got


# ----------------------------------------------------------- Lorenz curve


@pytest.mark.parametrize("seed,n_users", [(73, 7), (9090, 55)])
def test_lorenz_deciles_match_python_replay(spark, tmp_path, seed, n_users):
    """events_lorenz_activity_deciles vs a Python replay of the
    ascending (cents, user_id) rank, the ((rank-1)*10) div n + 1 decile
    formula, and the integer-scaled cumulative share. Planted: fewer
    users than deciles (empty deciles simply absent), heavy cent ties,
    and one whale holding most of the total so the top decile's
    cumulative share is visibly dominant and ends at exactly 10000."""
    rng = random.Random(seed)
    day = datetime.date(2024, 3, 5)
    rows, eid = [], 0
    for uid in range(1, n_users + 1):
        # half the users tie at exactly 10.00
        v = 10.0 if uid % 2 == 0 else _quarter(rng, 1, 30)
        for _ in range(rng.randrange(1, 3)):
            rows.append((eid, day, uid, "click", v))
            eid += 1
    whale = n_users + 1
    rows.append((eid, day, whale, "purchase", 5000.0))
    sf_dir = _write_events(tmp_path, rows)

    got = {
        r.decile: (r.n_users, r.decile_cents, r.cum_share_x10000)
        for r in QUERIES["events_lorenz_activity_deciles"].fn(spark, sf_dir).collect()
    }

    m: dict = {}
    for _, _, uid, _, v in rows:
        m[uid] = m.get(uid, 0) + round(v * 100)
    users = sorted(m, key=lambda u: (m[u], u))
    nu, total = len(users), sum(m.values())
    dec: dict = {}
    for i, u in enumerate(users):
        d = (i * 10) // nu + 1
        nup, cents = dec.get(d, (0, 0))
        dec[d] = (nup + 1, cents + m[u])
    expected, cum = {}, 0
    for d in sorted(dec):
        nup, cents = dec[d]
        cum += cents
        expected[d] = (nup, cents, (cum * 10000) // total)
    assert got == expected
    assert max(expected) <= 10 and expected[max(expected)][2] == 10000
    if n_users + 1 < 10:
        assert len(expected) == n_users + 1  # sub-decile population


# ----------------------------------------------- contingency residuals


@pytest.mark.parametrize("seed", [85, 4321])
def test_contingency_residuals_match_python_replay(spark, tmp_path, seed):
    """events_contingency_residuals vs a Python replay of the exact
    integer Pearson-residual numerator obs*N - rowtotal*coltotal, with
    a PLANTED association: type 'flash' fires only on one day-bucket,
    so its on-bucket residual must be positive and every other type's
    residual on that bucket is pushed negative-or-smaller — the
    detection property the statistic exists for."""
    rng = random.Random(seed)
    # March 2024: day-of-month % 7 buckets; days 1..27
    rows, eid = [], 0
    for _ in range(400):
        d = datetime.date(2024, 3, rng.randrange(1, 28))
        rows.append((eid, d, rng.randrange(50), rng.choice(["click", "view"]), 1.0))
        eid += 1
    flash_days = [d for d in range(1, 28) if d % 7 == 3]
    for _ in range(60):
        d = datetime.date(2024, 3, rng.choice(flash_days))
        rows.append((eid, d, rng.randrange(50), "flash", 1.0))
        eid += 1
    sf_dir = _write_events(tmp_path, rows)

    out = QUERIES["events_contingency_residuals"].fn(spark, sf_dir).collect()
    got = {
        (r.event_type, r.day_bucket): (
            r.obs, r.row_total, r.col_total, r.residual_num
        )
        for r in out
    }

    obs: dict = {}
    for _, d, _, et, _ in rows:
        k = (et, d.day % 7)
        obs[k] = obs.get(k, 0) + 1
    rt: dict = {}
    ct: dict = {}
    for (et, b), o in obs.items():
        rt[et] = rt.get(et, 0) + o
        ct[b] = ct.get(b, 0) + o
    total = sum(obs.values())
    expected = {
        (et, b): (o, rt[et], ct[b], o * total - rt[et] * ct[b])
        for (et, b), o in obs.items()
    }
    assert got == expected
    # the planted association: flash exists only in bucket 3, residual > 0
    assert set(b for (et, b) in expected if et == "flash") == {3}
    assert expected[("flash", 3)][3] > 0
