"""Salted-join correctness + plan shape, on a skewdata.txt-like input
(the reference's adversarial fixture: one key carrying ~90% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hailstorm_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # mirror data/skewdata.txt's shape: 12k 'hello' + a tail of others
    probe = spark.range(13_000).select(
        F.when(F.col("id") < 12_000, F.lit("hello"))
        .otherwise(F.concat(F.lit("w"), F.col("id") % 37))
        .alias("word"),
        F.col("id").alias("row_id"),
    )
    build = spark.createDataFrame(
        [("hello", 1), ("w1", 2), ("w2", 3), ("zzz", 4)], "word string, tag int"
    )
    return probe, build


def test_salted_inner_equals_plain(spark, skewed):
    probe, build = skewed
    plain = probe.join(build, "word").groupBy("word", "tag").count()
    salted = salted_join(probe, build, "word", salt=8).groupBy("word", "tag").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_keeps_unmatched(spark, skewed):
    probe, build = skewed
    plain = probe.join(build, "word", "left")
    salted = salted_join(probe, build, "word", salt=4, how="left")
    assert plain.count() == salted.count() == 13_000
    assert (
        salted.filter(F.col("tag").isNull()).count()
        == plain.filter(F.col("tag").isNull()).count()
    )


def test_salt_actually_splits_the_hot_key(spark, skewed):
    probe, _ = skewed
    p = probe.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(8)).cast("int"),
    )
    per_salt = (
        p.filter(F.col("word") == "hello").groupBy("__salt").count().collect()
    )
    # the hot key's rows must spread over (nearly) all salt buckets
    assert len(per_salt) >= 6
    assert max(r["count"] for r in per_salt) < 12_000 * 0.5


def test_unsupported_how_raises(spark, skewed):
    probe, build = skewed
    with pytest.raises(ValueError, match="inner|left"):
        salted_join(probe, build, "word", how="full")
