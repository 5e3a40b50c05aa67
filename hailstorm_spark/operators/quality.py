"""Data-quality expectations: declarative rules → one-pass violations
report.

The pattern every production ingest runs before publishing a table
(Deequ/Great-Expectations shaped, rebuilt Spark-first): each rule is a
Catalyst boolean expression, all rules aggregate in ONE scan as
conditional counts (map-side combinable), and the report is a tiny
rules×metrics frame. Nothing moves but per-rule counters; uniqueness
checks add the one aggregate that genuinely needs a distinct count.

No reference equivalent (the reference has no validation surface at
all); this is part of the additive 100 TB pipeline layer, like the
corpus-prep operators.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One rule: ``name`` plus a row-level predicate that must hold.

    ``predicate`` is a Column; rows where it is false/NULL count as
    violations (SQL three-valued logic: an unknown is NOT a pass).
    """

    name: str
    predicate: Column


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"{col}_not_null", F.col(col).isNotNull())


def expect_between(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"{col}_between", (F.col(col) >= lo) & (F.col(col) <= hi)
    )


def expect_in(col: str, allowed: tuple) -> Expectation:
    return Expectation(f"{col}_in_set", F.col(col).isin(list(allowed)))


def expect_matches(col: str, pattern: str) -> Expectation:
    return Expectation(f"{col}_matches", F.col(col).rlike(pattern))


def check_expectations(
    df: DataFrame, rules: list[Expectation], unique_cols: list[str] = ()
) -> DataFrame:
    """Run every rule in ONE aggregation pass; returns
    (rule, n_rows, n_violations, passed).

    Row-level rules become conditional counts inside a single
    multi-aggregate (one scan, map-side partial aggregation, a 1-row
    shuffle). Each ``unique_cols`` entry adds a COUNT DISTINCT — the
    only rule class that cannot ride the conditional-count pass; at
    extreme cardinalities swap in approx_count_distinct.
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for r in rules:
        aggs.append(
            F.sum(
                F.when(r.predicate, F.lit(0)).otherwise(F.lit(1))
            ).alias(f"v__{r.name}")
        )
    for c in unique_cols:
        aggs.append(F.count_distinct(F.col(c)).alias(f"d__{c}"))
    row = df.agg(*aggs)

    # unpivot the 1-row frame into (rule, n_rows, n_violations); a
    # uniqueness rule's violation count is rows - distinct
    pieces = []
    for r in rules:
        pieces.append(
            f"'{r.name}', CAST(__rows AS BIGINT), CAST(v__{r.name} AS BIGINT)"
        )
    for c in unique_cols:
        pieces.append(
            f"'{c}_unique', CAST(__rows AS BIGINT), CAST(__rows - d__{c} AS BIGINT)"
        )
    n = len(rules) + len(unique_cols)
    stacked = row.selectExpr(
        f"stack({n}, {', '.join(pieces)}) AS (rule, n_rows, n_violations)"
    )
    return stacked.select(
        "rule", "n_rows", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


def percentile_floor_thresholds(
    df: DataFrame,
    group_col: str,
    score_col: str,
    num: int = 1,
    den: int = 4,
) -> DataFrame:
    """Per-group score floor at the num/den percentile, computed WITHOUT
    shuffling the input rows: returns one ``(group_col,
    min_keep_score)`` row per group such that filtering
    ``score >= min_keep_score`` keeps exactly the rows whose group-wise
    ``den·(rank−1) ≥ num·(n−1)`` (rank = RANK() ordered by score asc) —
    the integer form of ``percent_rank() >= num/den``, including the
    n=1 group (kept).

    Shape: the input reduces to a per-(group, score) histogram (map-side
    combinable, orders of magnitude smaller than the data), a window
    over the histogram finds each group's floor, and the caller applies
    it via a broadcast join + scan filter — the corpus itself never
    shuffles. Groups where NO score qualifies (all rows tie on one
    score with n > 1) get no row, so the join drops every row — exactly
    what the rank inequality says.
    """
    w_grp = Window.partitionBy(group_col)
    w_cum = w_grp.orderBy(score_col).rowsBetween(Window.unboundedPreceding, -1)
    hist = df.groupBy(group_col, score_col).agg(F.count(F.lit(1)).alias("__cnt"))
    return (
        hist.withColumn("__n", F.sum("__cnt").over(w_grp))
        .withColumn("__less", F.coalesce(F.sum("__cnt").over(w_cum), F.lit(0)))
        .filter(den * F.col("__less") >= num * (F.col("__n") - 1))
        .groupBy(group_col)
        .agg(F.min(score_col).alias("min_keep_score"))
    )
