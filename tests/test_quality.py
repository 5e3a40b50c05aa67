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
