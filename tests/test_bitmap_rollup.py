"""Bitmap distinct rollup: the any-range merge claim, pinned."""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.io import load_table
from tests.conftest import SF_DIR


def test_or_merge_over_arbitrary_range_is_exact(spark):
    """Distinct users over a mid-month slice computed by OR-merging the
    DAILY bitmap partials must equal COUNT(DISTINCT) on the raw rows —
    the property that lets 100 TB dashboards answer range queries from
    per-day state alone."""
    e = load_table(spark, SF_DIR, "events")
    days = sorted(r["d"] for r in e.select(F.to_date("ts").alias("d")).distinct().collect())
    lo, hi = days[len(days) // 3], days[2 * len(days) // 3]

    partial = (
        e.select(
            F.to_date("ts").alias("day"),
            F.expr("user_id div 32").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.expr("cast(user_id % 32 as int)")
            ).alias("bit"),
        )
        .groupBy("day", "word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    merged = (
        partial.filter((F.col("day") >= F.lit(lo)) & (F.col("day") <= F.lit(hi)))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
        .agg(F.sum(F.bit_count("bits")).alias("n"))
        .collect()[0]["n"]
    )
    exact = (
        e.filter((F.to_date("ts") >= F.lit(lo)) & (F.to_date("ts") <= F.lit(hi)))
        .select("user_id")
        .distinct()
        .count()
    )
    assert merged == exact > 0
