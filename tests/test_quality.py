"""Unit tests for operators.quality beyond the registered parity query:
three-valued-logic edge cases the fixture data cannot exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.operators.quality import (
    Expectation,
    check_expectations,
    expect_between,
    expect_in,
    expect_matches,
    expect_not_null,
)


def _report(df, rules, unique_cols=()):
    rows = check_expectations(df, rules, unique_cols=list(unique_cols)).collect()
    return {r.rule: (r.n_violations, r.passed) for r in rows}


def test_null_predicate_counts_as_violation(spark):
    """SQL three-valued logic: a NULL comparison is UNKNOWN, and an
    unknown must count as a violation, never a silent pass."""
    df = spark.createDataFrame([(1.0,), (None,), (500.0,)], "v double")
    rep = _report(df, [expect_between("v", 0.0, 100.0)])
    # both the NULL and the out-of-range row violate
    assert rep["v_between"] == (2, False)


def test_uniqueness_counts_duplicates_not_distincts(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (2,), (2,), (3,)], "k long")
    rep = _report(df, [], unique_cols=["k"])
    assert rep["k_unique"] == (3, False)  # 6 rows - 3 distinct


def test_all_rules_one_pass_all_green(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.5)], "id long, cat string, v double"
    )
    rep = _report(
        df,
        [
            expect_not_null("id"),
            expect_in("cat", ("a", "b")),
            expect_between("v", 0.0, 10.0),
            expect_matches("cat", "^[ab]$"),
        ],
        unique_cols=["id"],
    )
    assert all(passed for _v, passed in rep.values())
    assert {v for v, _p in rep.values()} == {0}


def test_report_is_single_aggregation_plan(spark):
    """All conditional counts must fuse into ONE aggregate over ONE
    scan — the whole point of the operator (no per-rule jobs)."""
    from hailstorm_spark.io import load_table
    from tests.conftest import SF_DIR

    df = load_table(spark, SF_DIR, "events")
    out = check_expectations(
        df,
        [Expectation("v_small", F.col("value") < 100), expect_not_null("event_id")],
        unique_cols=["event_type"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


# ---------------------------------------- DP release mechanism (r11)


def test_dp_noise_thresholds_are_a_valid_inverse_cdf():
    """The driver-precomputed ladder must be a monotone CDF over the
    full 60-bit domain whose implied distribution is symmetric and
    correctly ε-calibrated: adjacent-mass ratio = e^-ε for every step
    away from 0 (the definition of the discrete Laplace mechanism)."""
    import math

    from hailstorm_spark.queries.integrity import (
        _DP_EPS_DEN,
        _DP_EPS_NUM,
        _DP_K,
        _DP_SCALE,
        _DP_T,
    )

    ks = [k for k, _ in _DP_T]
    ts = [t for _, t in _DP_T]
    assert ks == list(range(-_DP_K, _DP_K + 1))
    assert ts == sorted(ts) and ts[-1] == _DP_SCALE
    # implied pmf from threshold deltas (integer/2^60 resolution)
    pmf = {ks[0]: ts[0]}
    for (k, t), (_, tp) in zip(_DP_T[1:], _DP_T[:-1]):
        pmf[k] = t - tp
    alpha = math.exp(-_DP_EPS_NUM / _DP_EPS_DEN)
    # calibration where the 2^-60 threshold quantization is negligible
    # (pmf[30] ~ 6e10 vs ~256 of cumsum noise); beyond that only
    # monotonicity/symmetry are meaningful at this resolution
    for k in range(0, 30):
        assert abs(pmf[k + 1] / pmf[k] - alpha) < 1e-6
        assert abs(pmf[-(k + 1)] / pmf[-k] - alpha) < 1e-6
        # symmetry to float-cumsum rounding: the thresholds are a
        # cumulative float sum scaled by 2^60, so deltas wobble by
        # ~2^60·eps ≈ a few hundred — irrelevant at pmf ~ 1e17, and
        # cross-engine exactness never depends on it (both engines get
        # the SAME literals)
        assert abs(pmf[k] - pmf[-k]) <= 256


def test_dp_release_noise_is_not_degenerate(spark):
    """Non-vacuity: over the sf0.001 cells the hash-seeded draws must
    actually perturb (some cell differs from its true count), in BOTH
    directions, and stay within the truncation envelope."""
    import duckdb

    from hailstorm_spark.queries.integrity import _DP_K
    from hailstorm_spark.registry import all_queries
    from tests.conftest import SF_DIR

    spec = all_queries()["privacy_dp_noised_release"]
    noised = {
        (str(r["day"]), r["event_type"]): r["noised_count"]
        for r in spec.fn(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    truth = {
        (str(d), t): n
        for d, t, n in con.execute(
            "SELECT CAST(ts AS DATE), event_type, COUNT(*) FROM "
            f"read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"
        ).fetchall()
    }
    assert set(noised) == set(truth)
    deltas = [noised[k] - truth[k] for k in truth]
    assert any(d > 0 for d in deltas), "no positive noise drawn"
    assert any(d < 0 for d in deltas), "no negative noise drawn"
    assert all(abs(d) <= _DP_K for d in deltas)


def test_dp_noise_case_sql_equals_python_bisect_on_random_uniforms():
    """Third-engine pin for the DP ladder: DuckDB evaluating the
    generated CASE text on random 60-bit uniforms must agree with a
    pure-Python bisect over the same thresholds — the ladder's
    translation to SQL (arm order, strict <, ELSE arm) is what this
    pins, independent of any engine's aggregate pipeline."""
    import bisect
    import random

    import duckdb

    from hailstorm_spark.queries.integrity import _DP_SCALE, _DP_T, _dp_noise_case

    rng = random.Random(7)
    ts = [t for _, t in _DP_T]
    ks = [k for k, _ in _DP_T]
    us = [rng.randrange(_DP_SCALE) for _ in range(2000)]
    # boundary probes: exactly at and adjacent to every threshold
    for _, t in _DP_T[:-1]:
        us.extend([max(t - 1, 0), t, min(t + 1, _DP_SCALE - 1)])
    con = duckdb.connect()
    con.execute("CREATE TABLE u(v BIGINT)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in us])
    got = dict(
        con.execute(f"SELECT v, {_dp_noise_case('v')} FROM u").fetchall()
    )
    for u in us:
        want = ks[bisect.bisect_right(ts[:-1], u)]
        assert got[u] == want, (u, got[u], want)


def test_long_key_bloom_has_no_false_negatives_on_random_longs(spark):
    """The hashed-shingle prefilter's correctness contract: every
    built key must pass bloom_might_contain_long (no false negatives —
    a dropped true duplicate would silently under-dedup; false
    positives only cost exact-join work)."""
    import random

    from pyspark.sql import functions as F

    from hailstorm_spark.operators.bloom import (
        bloom_build_long,
        bloom_might_contain_long,
    )

    rng = random.Random(3)
    keys = [rng.randrange(-(2**62), 2**62) for _ in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "h long")
    packed = bloom_build_long(df, F.col("h"), m_bits=4096, k=2)
    missed = df.filter(
        ~bloom_might_contain_long(F.col("h"), packed, m_bits=4096, k=2)
    ).count()
    assert missed == 0
