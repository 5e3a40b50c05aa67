"""Third-engine replays: negative sampling, mixture smoothing, exact
second moments, multiset set operations, and the value-based RANGE
window frame.

Each test stages seeded random parquet, runs the registered query, and
recomputes the result with pure Python (hashlib + integer/IEEE
arithmetic) — planting self-pair hash hits, pass-whole tiny sources,
left-only/right-only/equal-count multiset priorities, and same-second
RANGE-frame peers."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

import pandas as pd
import pytest

import hailstorm_spark.queries.aggregates  # noqa: F401
import hailstorm_spark.queries.corpus_extras  # noqa: F401
import hailstorm_spark.queries.corpus_pipeline  # noqa: F401
import hailstorm_spark.queries.setops  # noqa: F401
import hailstorm_spark.queries.windows  # noqa: F401
from hailstorm_spark.queries.corpus_pipeline import MIXTURE_C, MIXTURE_DENOM
from hailstorm_spark.registry import QUERIES


def _h60(s: str, salt: str | None = None) -> int:
    if salt is not None:
        s = f"{salt}:{s}"
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _stage_documents(tmp_path, rows) -> str:
    pdf = pd.DataFrame(
        [(d, t, "en", s, len(t)) for d, t, s in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)
    return str(tmp_path)


# -------------------------------------------------- negative sampling


@pytest.mark.parametrize("seed,n_docs", [(127, 23), (8888, 120)])
def test_negative_sampling_pairs_match_python_replay(spark, tmp_path, seed, n_docs):
    """corpus_negative_sampling_pairs vs a hash-for-hash replay of rank
    targeting: rn by doc_id asc, trn = (h60(neg{j}:doc_id) mod n) + 1,
    self-pairs dropped. Small n makes self-hits near-certain, so the
    per-j pair counts fall short of n exactly where the replay says."""
    rng = random.Random(seed)
    # non-contiguous, shuffled doc_ids so rank ≠ id
    ids = rng.sample(range(10_000), n_docs)
    sf_dir = _stage_documents(tmp_path, [(d, "t", "src0") for d in ids])

    got = {
        r.j: (r.n_pairs, r.pair_fingerprint)
        for r in QUERIES["corpus_negative_sampling_pairs"].fn(spark, sf_dir).collect()
    }

    K_NEG = 4  # corpus_extras registration-thunk constant

    by_rank = {i + 1: d for i, d in enumerate(sorted(ids))}
    n = len(ids)
    expected = {}
    self_hits = 0
    for j in range(K_NEG):
        cnt = fp = 0
        for d in ids:
            trn = (_h60(str(d), salt=f"neg{j}") % n) + 1
            neg = by_rank[trn]
            if neg == d:
                self_hits += 1
                continue
            cnt += 1
            fp += d * 100003 + neg
        expected[j] = (cnt, fp)
    assert got == expected
    if n_docs <= 30:
        assert self_hits > 0 or all(
            got[j][0] == n for j in range(K_NEG)
        )  # replay decides; fingerprints pin the pairs regardless


# -------------------------------------------------- inv-sqrt mixture


@pytest.mark.parametrize("seed", [131, 7272])
def test_mixture_inv_sqrt_matches_python_replay(spark, tmp_path, seed):
    """sample_mixture_inv_sqrt vs a replay of the per-source threshold
    floor(min(1, C/sqrt(n))*DENOM) and the keyed-hash keep rule.
    Planted: a tiny source with C/sqrt(n) >= 1 (threshold == DENOM,
    passes WHOLE), a huge source visibly downsampled, and exact
    membership equality doc-by-doc."""
    rng = random.Random(seed)
    rows = []
    did = 0
    for _ in range(10):  # tiny source: n=10 ≤ C²=16 → kept whole
        rows.append((did, "t", "tiny")); did += 1
    for _ in range(900):
        rows.append((did, "t", "huge")); did += 1
    for _ in range(60):
        rows.append((did, "t", "mid")); did += 1
    sf_dir = _stage_documents(tmp_path, rows)

    got = {
        (r.doc_id, r.source)
        for r in QUERIES["sample_mixture_inv_sqrt"].fn(spark, sf_dir).collect()
    }

    counts = Counter(s for _, _, s in rows)
    thr = {
        s: int(math.floor(min(1.0, MIXTURE_C / math.sqrt(float(n))) * float(MIXTURE_DENOM)))
        for s, n in counts.items()
    }
    expected = {
        (d, s)
        for d, _, s in rows
        if _h60(str(d), salt="mix") % MIXTURE_DENOM < thr[s]
    }
    assert got == expected
    assert thr["tiny"] == MIXTURE_DENOM  # pass-whole branch
    assert sum(1 for _, s in expected if s == "tiny") == 10
    kept_huge = sum(1 for _, s in expected if s == "huge")
    assert 0 < kept_huge < 900  # really downsampled


# ------------------------------------------------ exact second moments


@pytest.mark.parametrize("seed", [137, 4545])
def test_second_moments_match_python_replay(spark, tmp_path, seed):
    """agg_exact_second_moments vs a Python replay of the integer-cents
    moment sums and the IDENTICAL IEEE closed-form sequence. Planted: a
    perfectly-correlated group (corr exactly 1.0 via y = 3x), an
    anti-correlated group, and a ZERO-VARIANCE group — the edge this
    test caught live: plain ANSI division faulted the whole aggregation
    on the one degenerate group until corr/slope moved to try_divide
    (NULL, matching DuckDB's native double-division-by-zero NULL)."""
    rng = random.Random(seed)
    rows = []
    for i in range(200):
        q = rng.randrange(1, 50) / 4.0
        rows.append(("P", q, 3.0 * q))  # corr exactly 1
    for i in range(150):
        q = rng.randrange(1, 50) / 4.0
        rows.append(("N", q, 500.0 - 2.0 * q))  # corr exactly -1
    for i in range(80):
        rows.append(("Z", 7.25, rng.randrange(1, 400) / 4.0))  # var_x = 0
    pdf = pd.DataFrame(
        [(i, f, q, p) for i, (f, q, p) in enumerate(rows)],
        columns=["l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"],
    )
    pdf.to_parquet(str(tmp_path / "lineitem.parquet"), index=False)

    got = {
        r.l_returnflag: (r.n, r.covar_pop_qty_price, r.corr_qty_price,
                         r.regr_slope_price_on_qty)
        for r in QUERIES["agg_exact_second_moments"].fn(spark, str(tmp_path)).collect()
    }

    agg: dict = {}
    for f, q, p in rows:
        x, y = round(q * 100), round(p * 100)
        n, sx, sy, sxx, syy, sxy = agg.get(f, (0, 0, 0, 0, 0, 0))
        agg[f] = (n + 1, sx + x, sy + y, sxx + x * x, syy + y * y, sxy + x * y)
    expected = {}
    for f, (n, sx, sy, sxx, syy, sxy) in agg.items():
        dsx, dsy = float(sx), float(sy)
        cov_num = float(sxy) - dsx * dsy / n
        var_x = float(sxx) - dsx * dsx / n
        var_y = float(syy) - dsy * dsy / n

        def tdiv(a, b):
            return None if b == 0.0 else a / b

        expected[f] = (
            n,
            (cov_num / n) / 10000.0,
            tdiv(cov_num, math.sqrt(var_x * var_y)),
            tdiv(cov_num, var_x),
        )
    assert got == expected
    assert got["P"][2] == 1.0  # y = 3x with no offset: exactly 1
    assert abs(got["N"][2] + 1.0) < 1e-9  # offset form rounds, engines agree
    # zero-variance group survives as NULLs instead of faulting the job
    assert got["Z"][2] is None and got["Z"][3] is None


# -------------------------------------------------- multiset set ops


@pytest.mark.parametrize("seed", [139, 6161])
def test_multiset_setops_match_python_counter_replay(spark, tmp_path, seed):
    """setop_intersect_all / setop_except_all vs Counter arithmetic:
    INTERSECT ALL keeps min(l,r) copies, EXCEPT ALL keeps max(0, l-r).
    Planted: a priority only on the even side (intersect drops it,
    except keeps all), only on the odd side (both drop it), and one
    with EQUAL counts (except emits zero copies — the off-by-one trap
    of implementing bag difference with a join)."""
    rng = random.Random(seed)
    rows = []
    oid = 0

    def add(prio, custkey_parity, k):
        nonlocal oid
        for _ in range(k):
            ck = 2 * rng.randrange(500) + custkey_parity
            rows.append((oid, ck, prio)); oid += 1

    add("LEFTONLY", 0, 5)
    add("RIGHTONLY", 1, 4)
    eq = rng.randrange(2, 6)
    add("EQUAL", 0, eq); add("EQUAL", 1, eq)
    for p in ("1-URGENT", "2-HIGH", "3-MEDIUM"):
        add(p, 0, rng.randrange(0, 8)); add(p, 1, rng.randrange(0, 8))
    pdf = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey", "o_orderpriority"])
    pdf.to_parquet(str(tmp_path / "orders.parquet"), index=False)

    left = Counter(p for _, ck, p in rows if ck % 2 == 0)
    right = Counter(p for _, ck, p in rows if ck % 2 == 1)

    got_i = Counter(
        r.priority
        for r in QUERIES["setop_intersect_all_priorities"].fn(spark, str(tmp_path)).collect()
    )
    exp_i = Counter({p: min(left[p], right[p]) for p in left if right[p] > 0})
    exp_i = +exp_i
    assert got_i == exp_i

    got_e = Counter(
        r.priority
        for r in QUERIES["setop_except_all_priorities"].fn(spark, str(tmp_path)).collect()
    )
    exp_e = Counter({p: left[p] - right[p] for p in left if left[p] > right[p]})
    assert got_e == exp_e
    assert "LEFTONLY" not in got_i and got_e["LEFTONLY"] == 5
    assert "RIGHTONLY" not in got_i and "RIGHTONLY" not in got_e
    assert got_i["EQUAL"] == eq and "EQUAL" not in got_e


# --------------------------------------------- value-based RANGE frame


@pytest.mark.parametrize("seed", [149, 8383])
def test_time_range_window_sum_matches_python_replay(spark, tmp_path, seed):
    """window_time_range_sum vs a Python replay of the 3600-second
    RANGE frame. Planted: same-second peers (in or out TOGETHER —
    each peer's sum includes the other), an event exactly 3600 s
    before another (inclusive boundary), and one 3601 s before
    (excluded)."""
    import datetime

    rng = random.Random(seed)
    base = datetime.datetime(2024, 5, 1, 0, 0, 0)
    rows = []
    eid = 0

    def ev(uid, sec, v):
        nonlocal eid
        rows.append((eid, base + datetime.timedelta(seconds=sec), uid, "click",
                     float(v), "{}"))
        eid += 1

    ev(1, 0, 1.25); ev(1, 3600, 2.0)       # inclusive boundary pair
    ev(2, 0, 1.0); ev(2, 3601, 4.0)        # excluded pair
    ev(3, 500, 3.0); ev(3, 500, 5.0)       # same-second peers
    for _ in range(200):
        ev(rng.randrange(4, 12), rng.randrange(0, 20000), rng.randrange(1, 200) / 4.0)
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)

    got = {
        r.event_id: r.hour_sum
        for r in QUERIES["window_time_range_sum"].fn(spark, str(tmp_path)).collect()
    }

    by_user: dict = {}
    for e, ts, u, _, v, _ in rows:
        sec = int(ts.replace(tzinfo=datetime.timezone.utc).timestamp())
        by_user.setdefault(u, []).append((sec, e, round(v * 100)))
    expected = {}
    for u, evs in by_user.items():
        for sec, e, _ in evs:
            cents = sum(c for s2, _, c in evs if sec - 3600 <= s2 <= sec)
            expected[e] = cents / 100
    assert got == expected
    assert got[1] == 3.25          # 3600 s back included
    assert got[3] == 4.0           # 3601 s back excluded
    assert got[4] == got[5] == 8.0  # peers share the frame


# ------------------------------------------------ pandas GROUPED_AGG median


@pytest.mark.parametrize("seed", [151, 9191])
def test_pandas_udaf_median_matches_python_replay(spark, tmp_path, seed):
    """agg_pandas_udaf_median vs statistics.median over exact integer
    cents. The Arrow-shipped pandas kernel, numpy's even-count midpoint,
    and DuckDB's median must all agree; planted shapes: an EVEN group
    whose two middle cents differ by 1 (the .5-cent dyadic midpoint), a
    singleton group, an odd group, and a group whose middle is a
    duplicate run (midpoint == the duplicated value)."""
    import statistics

    rng = random.Random(seed)
    rows, oid = [], 0

    def add(prio, cents_list):
        nonlocal oid
        for c in cents_list:
            rows.append((oid, prio, c / 100))
            oid += 1

    add("ODD", [rng.randrange(100, 10_000_000) for _ in range(7)])
    mid = rng.randrange(100, 10_000_000)
    add("EVENHALF", [mid - 500, mid - 10, mid, mid + 1, mid + 700, mid + 900])
    add("ONE", [rng.randrange(100, 10_000_000)])
    d = rng.randrange(100, 10_000_000)
    add("DUPMID", [d - 5, d, d, d, d + 9])
    for p in ("1-URGENT", "2-HIGH"):
        add(p, [rng.randrange(100, 10_000_000) for _ in range(rng.randrange(2, 15))])
    pdf = pd.DataFrame(rows, columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    pdf.to_parquet(str(tmp_path / "orders.parquet"), index=False)

    got = sorted(
        (r.o_orderpriority, r.median_cents, r.n)
        for r in QUERIES["agg_pandas_udaf_median"].fn(spark, str(tmp_path)).collect()
    )

    groups: dict = {}
    for _o, p, price in rows:
        groups.setdefault(p, []).append(round(price * 100))
    expected = sorted(
        (p, float(statistics.median(cs)), len(cs)) for p, cs in groups.items()
    )
    assert got == expected
    # the even group's midpoint really is a half-cent
    med = dict((p, m) for p, m, _ in expected)
    assert med["EVENHALF"] == mid + 0.5
    assert med["DUPMID"] == float(d)
