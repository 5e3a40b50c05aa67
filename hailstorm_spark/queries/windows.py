"""Window-function coverage: ranking, running totals, lag/lead, frames.

Absent in the reference (SURVEY §2.6); its hand-rolled per-key top-N
heap (A2) is the closest thing. Window specs here always carry a total
order (tie-broken by a key column) so results are deterministic and
oracle-comparable; running sums use exact decimals because a
double-accumulating frame would be order-sensitive.

Scale note: a window partitioned by a key is one shuffle on that key;
frames evaluate within partitions with no extra pass. The only
dangerous window at 100 TB is an un-partitioned ORDER BY over the whole
table — none of these do that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hailstorm_spark.functions.decimal import money
from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register


@register(
    "window_rank_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) t
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_rank_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — per-group top-k via row_number,
    the scalable form of the reference's per-instance top-N bolt."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "rn",
        )
    )


@register(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_custkey % 100 = 7
    """,
    tags=("window",),
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order date (exact decimal)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 7)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(money("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_lag_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           datediff('day',
                    LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate ASC, o_orderkey ASC),
                    o_orderdate) AS days_since_prev
    FROM orders
    WHERE o_custkey % 100 = 7
    """,
    tags=("window",),
)
def window_lag_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): days between a customer's consecutive orders (NULL for
    the first)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 7)
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ).alias("days_since_prev"),
    )


@register(
    "window_moving_avg_quantity",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           (CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) OVER w AS DOUBLE)
            / COUNT(*) OVER w) AS moving_avg_qty
    FROM lineitem
    WHERE l_suppkey <= 5
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame"),
)
def window_moving_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row moving average per supplier (bounded frame), computed as
    exact-decimal SUM / COUNT so both engines divide identical doubles
    (decimal AVG rounds differently per engine)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .rowsBetween(-4, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (
            F.sum(money("l_quantity")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_qty"),
    )


_NTILE_ORACLE = """
    SELECT quartile, COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM (
      SELECT o_totalprice,
             NTILE(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
      FROM orders
    ) t
    GROUP BY quartile
    """


@register(
    "window_ntile_quartiles_distributed",
    oracle=_NTILE_ORACLE,
    tags=("window", "scale"),
)
def window_ntile_quartiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global NTILE without a single-partition sort — the 100 TB
    form of window_ntile_price_quartiles (same oracle, same answer).

    An unpartitioned Window.orderBy pulls the whole table through one
    task. Instead: (1) approx_percentile split points assign each row a
    coarse range bucket — approximation only skews bucket BALANCE,
    never correctness, because equal prices always share a bucket and
    buckets are globally ordered; (2) one parallel window per bucket
    ranks rows locally; (3) the driver folds the 32 per-bucket counts
    into rank offsets (O(#buckets), not O(rows)); (4) global rank =
    local rank + bucket offset feeds the exact NTILE arithmetic.
    Two full-data shuffles (bucket exchange, 4-group agg), no global
    sort anywhere in the plan (pinned by test).
    """
    n_buckets = 32
    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    splits = o.agg(
        F.percentile_approx("o_totalprice", probs, 100_000).alias("s")
    ).collect()[0]["s"]
    if splits is None or o.limit(4).count() < 4:
        # empty table (no split points) or fewer rows than tiles: the
        # distributed arithmetic divides by total//4 — fall back to the
        # exact single-window form, which is trivially cheap here
        return window_ntile_price_quartiles(spark, sf_dir)
    bucket = sum(
        (F.when(F.col("o_totalprice") > F.lit(s), 1).otherwise(0) for s in splits),
        F.lit(0),
    ).alias("bucket")
    bucketed = o.select("o_totalprice", "o_orderkey", bucket)
    counts = {
        r["bucket"]: r["cnt"]
        for r in bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets, acc = [], 0
    for b in range(n_buckets):
        offsets.append(acc)
        acc += counts.get(b, 0)
    w = Window.partitionBy("bucket").orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    rank = (
        F.row_number().over(w)
        + F.element_at(F.array(*[F.lit(x) for x in offsets]), F.col("bucket") + 1)
    ).alias("rank")
    ranked = bucketed.select("o_totalprice", rank)
    # NTILE(4): first r buckets get s+1 rows, the rest s rows; integer
    # `div` keeps the arithmetic exact (float division would misround
    # at large n)
    s, r = total // 4, total % 4
    cut = r * (s + 1)
    quartile = (
        F.when(F.col("rank") <= cut, F.expr(f"(rank + {s}) div {s + 1}"))
        .otherwise(F.expr(f"{r} + (rank - {cut} + {s - 1}) div {s}"))
        .cast("int")
        .alias("quartile")
    )
    return (
        ranked.select("o_totalprice", quartile)
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
    )


@register(
    "window_ntile_price_quartiles",
    oracle=_NTILE_ORACLE,
    tags=("window",),
)
def window_ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles then re-aggregated — the output is 4 rows, so
    the global-order window is acceptable here; at 100 TB the same
    answer should come from approx quantiles instead (see
    text/quality ops)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_totalprice", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
    )


@register(
    "window_analytics_mix",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice ASC, o_orderkey ASC
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING) AS last_key,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice ASC, o_orderkey ASC
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                   AND UNBOUNDED FOLLOWING) AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    tags=("window",),
)
def window_analytics_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-function surface in one query:
    percent_rank / cume_dist / first_value / last_value / nth_value,
    all over per-customer price order (one shuffle, three frame
    variants sharing it). Deterministic orderkey tiebreak throughout.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(wfull).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_key"),
    )


@register(
    "window_time_range_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER w AS DOUBLE)
             AS hour_sum
    FROM (SELECT event_id, user_id, value,
                 epoch_us(ts) // 1000000 AS ts_sec
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "time-range"),
)
def window_time_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour running sum per user — a RANGE (value-based) frame,
    the time-window complement of the ROWS frames elsewhere: the frame
    holds every event within 3600 SECONDS of the current row, however
    many rows that is, and same-second peers share one frame (so no
    tiebreak column is needed for determinism — peers are in or out
    together). Sums are exact decimal; the order key is integer epoch
    seconds, identical in both engines. One shuffle on user_id.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("value").cast("decimal(14,2)").alias("v"),
        (F.unix_micros("ts") / F.lit(1000000)).cast("long").alias("ts_sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum("v").over(w).cast("double").alias("hour_sum"),
    )


@register(
    "window_null_ordering",
    oracle="""
    SELECT event_id, user_id, vn,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY vn DESC NULLS LAST, event_id ASC)
             AS rk_desc_nulls_last,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY vn ASC NULLS FIRST, event_id ASC)
             AS rk_asc_nulls_first
    FROM (SELECT event_id, user_id,
                 CASE WHEN event_type = 'error' THEN NULL ELSE value END AS vn
          FROM events)
    """,
    tags=("window", "null-semantics"),
)
def window_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in window ordering. The engines DISAGREE
    on defaults — Spark ASC puts nulls FIRST, DuckDB puts them LAST —
    so any ranking over a nullable key silently diverges unless the
    placement is spelled out on both sides (desc_nulls_last /
    asc_nulls_first here, with an event_id tiebreak making each rank
    total). The CASE planting nulls on 'error' events exercises the
    placement on real data.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("vn"),
    )
    w1 = Window.partitionBy("user_id").orderBy(
        F.desc_nulls_last("vn"), F.asc("event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_first("vn"), F.asc("event_id")
    )
    return e.select(
        "event_id",
        "user_id",
        "vn",
        F.row_number().over(w1).alias("rk_desc_nulls_last"),
        F.row_number().over(w2).alias("rk_asc_nulls_first"),
    )


@register(
    "window_running_distinct_types",
    oracle="""
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           CAST(COUNT(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
    FROM events
    WHERE user_id % 100 = 7
    """,
    tags=("window", "distinct", "events"),
)
def window_running_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — the aggregate Spark's
    window functions famously refuse (`DISTINCT_WINDOW_FUNCTION_
    UNSUPPORTED`), expressed with the standard workaround:
    ``size(collect_set(col) OVER w)``. collect_set's dedup gives the
    distinct count; set ORDER instability doesn't leak because only the
    size is taken. DuckDB supports the distinct window aggregate
    natively, so the oracle states the intent directly — the
    workaround's whole contract is that the two are equivalent.

    Semantics note: "running distinct event types per user" is the
    classic engagement-breadth curve. State per partition is the set of
    distinct values (bounded here by the 5 event types; for unbounded
    domains the bitmap/HLL rollups in queries/approx.py are the scale
    path — this query is the window-frame-exact form). One user shard
    (user_id ≡ 7 mod 100) keeps the result set driver-comparable.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 100 == 7)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.size(F.collect_set("event_type").over(w)).cast("long").alias("n_types_seen"),
    )
