"""Unit tests for the as-of join operator (union+window formulation)."""

from __future__ import annotations

import pytest

from hailstorm_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 50, "p2"), (2, 10, "p3"), (3, 70, "p4")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 40, "b"), (1, 100, "c"), (2, 60, "d")],
        "k long, rts long, val string",
    )
    return left, right


def test_backward_inclusive(spark, frames):
    left, right = frames
    out = asof_join(left, right, "k", "ts", "rts", ("val", "rts"))
    got = {r.tag: (r.val, r.rts) for r in out.collect()}
    assert got == {
        "p1": ("c", 100),  # inclusive: right at ts==100 matches
        "p2": ("b", 40),
        "p3": (None, None),  # right row at 60 is AFTER left ts=10
        "p4": (None, None),  # key 3 has no right rows at all
    }


def test_forward(spark, frames):
    left, right = frames
    out = asof_join(left, right, "k", "ts", "rts", ("val",), direction="forward")
    got = {r.tag: r.val for r in out.collect()}
    assert got == {"p1": "c", "p2": "a", "p3": "d", "p4": None}


def test_tiebreak_picks_greatest(spark):
    left = spark.createDataFrame([(1, 100, "p")], "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 100, 7, "lo"), (1, 100, 9, "hi"), (1, 100, 8, "mid")],
        "k long, rts long, pri long, val string",
    )
    out = asof_join(left, right, "k", "ts", "rts", ("val",), tiebreak="pri")
    assert out.collect()[0].val == "hi"


def test_right_col_collision_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("val", "tag"), "k", "ts", "rts", ("tag",))


def test_plan_has_no_join_node(spark, frames):
    left, right = frames
    out = asof_join(left, right, "k", "ts", "rts", ("val",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # one shuffle + window, never a join


def test_null_right_value_is_not_replaced_by_staler_row(spark):
    """The matched right ROW travels as one struct: a NULL value in the
    true as-of row must survive (not be patched from an older row), and
    multiple right columns must never mix rows."""
    left = spark.createDataFrame([(1, 60, "p")], "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 40, "x", "ax"), (1, 50, None, "bx")],
        "k long, rts long, val string, aux string",
    )
    out = asof_join(left, right, "k", "ts", "rts", ("val", "aux")).collect()[0]
    assert out.val is None and out.aux == "bx"  # the rts=50 row, atomically


def test_reserved_left_column_raises(spark):
    left = spark.createDataFrame([(1, 60, 5)], "k long, ts long, __side long")
    right = spark.createDataFrame([(1, 40, "x")], "k long, rts long, val string")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, "k", "ts", "rts", ("val",))
