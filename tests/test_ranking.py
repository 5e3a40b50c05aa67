"""Unit tests for the distributed global ordering / percentile-gate
operators — the properties the oracle sweep can't see (equivalence to
the naive single-partition forms on adversarial shapes, and the plan
shape that is the operators' whole reason to exist)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hailstorm_spark.operators.quality import percentile_floor_thresholds
from hailstorm_spark.operators.ranking import global_row_number


def _naive_rank(df, key, tiebreak, descending):
    order = [F.desc(key) if descending else F.asc(key), F.asc(tiebreak)]
    return df.withColumn("rn_naive", F.row_number().over(Window.orderBy(*order)))


@pytest.mark.parametrize("descending", [False, True])
def test_global_row_number_matches_naive_window(spark, descending):
    # heavy ties (key=k%5) force equal keys across would-be boundaries;
    # the unique id column makes the ordering total
    rows = [(i, i % 5) for i in range(500)]
    df = spark.createDataFrame(rows, "id LONG, k LONG")
    got = global_row_number(
        df, key="k", tiebreak="id", descending=descending, num_buckets=8
    )
    joined = got.join(_naive_rank(df, "k", "id", descending), ["id", "k"])
    bad = joined.filter(F.col("rn") != F.col("rn_naive")).count()
    assert bad == 0
    # ranks are a permutation of 1..n
    assert got.agg(F.min("rn"), F.max("rn"), F.count_distinct("rn")).collect()[
        0
    ] == (1, 500, 500)


def test_global_row_number_single_value_key(spark):
    # all keys equal → one bucket; ordering falls entirely to tiebreak
    df = spark.createDataFrame([(i, 7) for i in range(50)], "id LONG, k LONG")
    got = global_row_number(df, key="k", tiebreak="id")
    rows = {r.id: r.rn for r in got.collect()}
    assert rows == {i: i + 1 for i in range(50)}


def test_global_row_number_rejects_collisions(spark):
    df = spark.createDataFrame([(1, 2)], "id LONG, rn LONG")
    with pytest.raises(ValueError):
        global_row_number(df, key="id", tiebreak="rn")  # out_col exists
    df2 = spark.createDataFrame([(1, 2)], "id LONG, __bucket LONG")
    with pytest.raises(ValueError):
        global_row_number(df2, key="id", tiebreak="__bucket")


def test_global_row_number_plan_stays_parallel(spark):
    """The operator's reason to exist: no single-partition exchange.
    The naive window plan has one; the two-phase plan must not."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    ranked = global_row_number(df, key="k", tiebreak="id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ranked.explain("simple")
    assert "SinglePartition" not in buf.getvalue()


def test_percentile_floor_matches_rank_form(spark):
    """Threshold-join form ≡ per-row rank inequality, on the shapes
    where they could diverge: a singleton group (kept: 0 ≥ 0), an
    all-tied group with n>1 (fully dropped), and a group whose quartile
    boundary lands exactly on a tie run."""
    rows = (
        [("solo", 10, 0)]
        + [("tied", 5, i) for i in range(1, 5)]
        + [("norm", s, 10 + i) for i, s in enumerate([1, 1, 2, 3, 4, 5, 6, 7])]
    )
    df = spark.createDataFrame(rows, "g STRING, s LONG, id LONG")
    thr = percentile_floor_thresholds(df, "g", "s", num=1, den=4)
    kept_thr = {
        (r.g, r.id)
        for r in df.join(thr, "g").filter(F.col("s") >= F.col("min_keep_score")).collect()
    }
    w = Window.partitionBy("g")
    ranked = df.withColumn("rk", F.rank().over(w.orderBy("s"))).withColumn(
        "n", F.count(F.lit(1)).over(w)
    )
    kept_rank = {
        (r.g, r.id)
        for r in ranked.filter(4 * (F.col("rk") - 1) >= F.col("n") - 1).collect()
    }
    assert kept_thr == kept_rank
    assert ("solo", 0) in kept_thr  # singleton survives
    assert not any(g == "tied" for g, _ in kept_thr)  # all-tied n>1 drops
