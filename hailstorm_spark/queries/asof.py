"""As-of join queries over the events table (temporal surface).

DuckDB's native ASOF JOIN is the oracle — a genuinely independent
implementation of the same semantics (our Spark side is the union+window
formulation, no join node at all; see operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.io import load_table
from hailstorm_spark.operators.asof import asof_join
from hailstorm_spark.registry import register


@register(
    "join_asof_purchase_prior_click",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, epoch_us(ts) AS click_ts_us, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, epoch_us(ts)
    )
    SELECT p.event_id, p.user_id, p.ts_us,
           c.click_event_id, c.click_ts_us,
           (p.ts_us - c.click_ts_us) // 1000000 AS gap_sec
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.click_ts_us <= p.ts_us
    """,
    tags=("asof", "temporal", "events"),
)
def join_asof_purchase_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click at-or-before it
    (LEFT as-of: purchases with no prior click keep nulls).

    Clicks are pre-deduplicated to one row per (user_id, ts) keeping
    the max event_id so both engines resolve equal-timestamp ties
    identically. Integer-microsecond arithmetic throughout.
    """
    e = load_table(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts_us").alias("click_ts_us"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts_us",
        right_ts="click_ts_us",
        right_cols=("click_event_id", "click_ts_us"),
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_us",
        "click_event_id",
        "click_ts_us",
        F.expr("(ts_us - click_ts_us) div 1000000").alias("gap_sec"),
    )
