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


@register(
    "join_asof_nearest_click",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, epoch_us(ts) AS click_ts_us, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, epoch_us(ts)
    ),
    bwd AS (
      SELECT p.event_id, c.click_ts_us AS b_ts, c.click_event_id AS b_id
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND c.click_ts_us <= p.ts_us
    ),
    fwd AS (
      SELECT p.event_id, c.click_ts_us AS f_ts, c.click_event_id AS f_id
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND c.click_ts_us > p.ts_us
    )
    SELECT p.event_id, p.user_id, p.ts_us,
      CASE WHEN b_ts IS NOT NULL
                AND (f_ts IS NULL OR p.ts_us - b_ts <= f_ts - p.ts_us)
           THEN b_id ELSE f_id END AS near_click_id,
      CASE WHEN b_ts IS NOT NULL
                AND (f_ts IS NULL OR p.ts_us - b_ts <= f_ts - p.ts_us)
           THEN b_ts ELSE f_ts END AS near_click_ts_us,
      CASE WHEN b_ts IS NOT NULL
                AND (f_ts IS NULL OR p.ts_us - b_ts <= f_ts - p.ts_us)
           THEN p.ts_us - b_ts ELSE f_ts - p.ts_us END AS near_gap_us
    FROM p
    LEFT JOIN bwd ON bwd.event_id = p.event_id
    LEFT JOIN fwd ON fwd.event_id = p.event_id
    """,
    tags=("asof", "temporal", "events"),
)
def join_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join (direction="nearest" semantics, as in
    pandas merge_asof): for every purchase, the user's click closest in
    time in EITHER direction; ties in |gap| break to the earlier
    (backward) click. Built as backward ∘ forward composition of the
    union-trick as-of operator — two window passes, one key shuffle
    each, never a range join. The forward pass probes at ts+1µs so a
    click exactly at the purchase instant is claimed by the backward
    side only (strict '>' forward, matching the oracle).

    The oracle composes DuckDB's native ASOF JOIN twice with the same
    tie rule — independent machinery, same semantics.
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
    bwd = asof_join(
        purchases,
        clicks.select(
            "user_id",
            F.col("click_ts_us").alias("b_ts"),
            F.col("click_event_id").alias("b_id"),
        ),
        on="user_id",
        left_ts="ts_us",
        right_ts="b_ts",
        right_cols=("b_id", "b_ts"),
    )
    fwd = asof_join(
        bwd.withColumn("ts_us_fwd", F.col("ts_us") + 1),
        clicks.select(
            "user_id",
            F.col("click_ts_us").alias("f_ts"),
            F.col("click_event_id").alias("f_id"),
        ),
        on="user_id",
        left_ts="ts_us_fwd",
        right_ts="f_ts",
        right_cols=("f_id", "f_ts"),
        direction="forward",
    ).drop("ts_us_fwd")
    use_b = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull()
        | (F.col("ts_us") - F.col("b_ts") <= F.col("f_ts") - F.col("ts_us"))
    )
    return fwd.select(
        "event_id",
        "user_id",
        "ts_us",
        F.when(use_b, F.col("b_id")).otherwise(F.col("f_id")).alias("near_click_id"),
        F.when(use_b, F.col("b_ts")).otherwise(F.col("f_ts")).alias("near_click_ts_us"),
        F.when(use_b, F.col("ts_us") - F.col("b_ts"))
        .otherwise(F.col("f_ts") - F.col("ts_us"))
        .alias("near_gap_us"),
    )
