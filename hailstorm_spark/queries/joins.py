"""Join-type coverage: inner/left/right/full/semi/anti/cross.

The reference has no joins at all (SURVEY §2.3) — its only multi-input
pattern is unordered stream merge. These queries define the engine's
join surface, each shaped so the optimizer's preferred physical plan is
the right one at 100 TB (broadcast for dim⋈fact, shuffled hash for
fact⋈fact, BNLJ only for the deliberately tiny cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.functions.text import tokens_sql
from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register

_TOKS_SQL = tokens_sql("text")


@register(
    "join_inner_orders_per_nation",
    oracle="""
    SELECT n.n_name, COUNT(*) AS order_cnt
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("join",),
)
def join_inner_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
    )


@register(
    "join_left_customer_order_counts",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join",),
)
def join_left_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (count = 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@register(
    "join_right_orders_keep_all_customers",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey
    FROM orders o
    RIGHT JOIN (SELECT * FROM customer WHERE c_acctbal < 0.0) c
      ON o.o_custkey = c.c_custkey
    """,
    tags=("join",),
)
def join_right_orders_keep_all_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every negative-balance customer survives,
    order-less ones with NULL o_orderkey."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0.0)
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_mktsegment", "o_orderkey"
    )


@register(
    "join_full_nation_presence",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS customers
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS suppliers
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(cn.customers, 0) AS customers,
           COALESCE(sn.suppliers, 0) AS suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    tags=("join",),
)
def join_full_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (agg-before-join:
    shuffling two small aggregates beats joining raw tables)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(F.count(F.lit(1)).alias("customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count(F.lit(1)).alias("suppliers"))
    )
    return c.join(s, c.cnk == s.snk, "full").select(
        F.coalesce("cnk", "snk").alias("nationkey"),
        F.coalesce("customers", F.lit(0)).alias("customers"),
        F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
    )


@register(
    "join_semi_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    tags=("join", "subquery"),
)
def join_semi_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS subquery — no duplication of the left."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    tags=("join", "subquery"),
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS (customers with no URGENT order —
    the unrestricted form is vacuously empty at every test SF, and a
    parity check over an empty result proves nothing)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross_region_pairs",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_name <> b.r_name
    """,
    tags=("join",),
)
def join_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join, deliberately bounded to a fixed-size dimension."""
    a = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("from_region"))
    b = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("to_region"))
    return a.crossJoin(b).filter(F.col("from_region") != F.col("to_region"))


@register(
    "join_range_parts_in_quantity_band",
    oracle="""
    SELECT p.p_partkey, p.p_size, l.l_orderkey, l.l_quantity
    FROM part p
    JOIN lineitem l
      ON l.l_partkey = p.p_partkey
     AND l.l_quantity BETWEEN p.p_size - 1.0 AND p.p_size + 1.0
    WHERE p.p_size >= 49
    """,
    tags=("join", "range"),
)
def join_range_parts_in_quantity_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range hybrid join: the equi key carries the shuffle, the
    band predicate evaluates post-match — so it costs the same as a
    plain equi-join at scale (never a cartesian)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 49)
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(
            F.broadcast(p),
            (l.l_partkey == p.p_partkey)
            & (l.l_quantity >= p.p_size - 1.0)
            & (l.l_quantity <= p.p_size + 1.0),
        )
        .select("p_partkey", "p_size", "l_orderkey", "l_quantity")
    )


@register(
    "join_salted_word_frequencies",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
    ),
    freq AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY word)
    SELECT t.word, f.df, COUNT(*) AS occurrences
    FROM toks t JOIN freq f ON t.word = f.word
    WHERE f.df >= 100
    GROUP BY t.word, f.df
    """,
    tags=("join", "skew"),
)
def join_salted_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's skewdata scenario as a salted join: exploded
    document tokens (stopwords are extreme hot keys, exactly like
    skewdata.txt's 12k 'hello' rows — reference data/skewdata.txt) joined
    to per-word document frequencies via operators.skew.salted_join.

    Salting changes placement, never results: the oracle is the PLAIN
    join. The build side replicates ×8 (flatMap, no shuffle); each hot
    word's probe rows divide across 8 tasks instead of one.
    """
    from hailstorm_spark.functions.text import tokens
    from hailstorm_spark.operators.skew import salted_join

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("word"))
    freq = toks.groupBy("word").agg(F.count_distinct("doc_id").alias("df")).filter(
        F.col("df") >= 100
    )
    joined = salted_join(toks, freq, "word", salt=8)
    return joined.groupBy("word", "df").agg(F.count(F.lit(1)).alias("occurrences"))


@register(
    "join_not_in_null_aware",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM orders
       WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                               WHERE c_mktsegment = 'AUTOMOBILE'))
        AS cnt_nonnull_list,
      (SELECT COUNT(*) FROM orders
       WHERE o_custkey NOT IN (SELECT CASE WHEN c_custkey % 97 = 3 THEN NULL
                                           ELSE c_custkey END
                               FROM customer WHERE c_mktsegment = 'AUTOMOBILE'))
        AS cnt_with_null_in_list
    """,
    tags=("join", "subquery", "null"),
)
def join_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN's null-aware anti-join semantics, pinned: against a
    null-free list it is a plain anti join; with ANY null in the list,
    SQL three-valued logic makes `x NOT IN (...)` never-true, so the
    count collapses to 0. Spark plans the second form as a null-aware
    anti join (NAAJ) — the rewrite engines get wrong most often.
    """
    from hailstorm_spark.io import load_tables

    load_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM orders
           WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                   WHERE c_mktsegment = 'AUTOMOBILE'))
            AS cnt_nonnull_list,
          (SELECT COUNT(*) FROM orders
           WHERE o_custkey NOT IN (SELECT CASE WHEN c_custkey % 97 = 3 THEN NULL
                                               ELSE c_custkey END
                                   FROM customer WHERE c_mktsegment = 'AUTOMOBILE'))
            AS cnt_with_null_in_list
        """
    )


@register(
    "join_range_busy_window_purchases",
    oracle="""
    WITH hourly AS (
      SELECT epoch_us(ts) // 3600000000 AS hr,
             COUNT(*) AS n,
             MIN(epoch_us(ts)) AS min_ts_us,
             MAX(epoch_us(ts)) AS max_ts_us
      FROM events GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n_hours, SUM(n) AS total_n FROM hourly),
    busy AS (
      SELECT h.* FROM hourly h CROSS JOIN tot
      WHERE h.n * tot.n_hours > tot.total_n
    ),
    flagged AS (
      SELECT *, CASE WHEN hr - LAG(hr) OVER (ORDER BY hr) = 1
                     THEN 0 ELSE 1 END AS new_island
      FROM busy
    ),
    islands AS (
      SELECT *, SUM(new_island) OVER (ORDER BY hr
                                      ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    intervals AS (
      SELECT MIN(min_ts_us) AS start_us, MAX(max_ts_us) AS end_us
      FROM islands GROUP BY island
    ),
    p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT i.start_us, i.end_us,
           CAST(COUNT(p.event_id) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users
    FROM intervals i
    JOIN p ON p.ts_us >= i.start_us AND p.ts_us <= i.end_us
    GROUP BY i.start_us, i.end_us
    """,
    tags=("join", "range", "temporal", "north-star"),
)
def join_range_busy_window_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join at scale: purchases falling inside
    "busy windows" (maximal runs of above-average-traffic hours, with
    interval edges at the actual first/last event of the run — NOT
    hour-aligned, so the bucket pre-join alone is insufficient and the
    exact BETWEEN filter is load-bearing).

    A naive inequality join with no equi-key is a
    BroadcastNestedLoopJoin — O(points × intervals). The
    operators.rangejoin bucketization turns it into an equi-join on the
    hour bucket: each interval explodes to its covered hours, each
    point hashes to one hour, and the exact predicate filters the
    candidates. Plan: the exploded interval side is tiny here and
    BROADCASTS — the purchase scan never shuffles; with massive
    interval sets both sides would hash-partition by bucket instead,
    still never a nested loop.

    The busy-hour/island machinery runs over the per-hour aggregate —
    bounded by the time span (8760 rows/year at ANY data scale), so its
    single-partition window is principled, like the exact-NTILE twin.
    Thresholding is pure integer arithmetic (n·n_hours > Σn avoids the
    avg division); islands via the standard gaps-and-islands chain.
    """
    from hailstorm_spark.operators.rangejoin import point_in_interval_join

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    hourly = e.groupBy(F.expr("unix_micros(ts) div 3600000000").alias("hr")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts_us").alias("min_ts_us"),
        F.max("ts_us").alias("max_ts_us"),
    )
    tot = hourly.agg(
        F.count(F.lit(1)).alias("n_hours"), F.sum("n").alias("total_n")
    )
    busy = hourly.join(F.broadcast(tot)).filter(
        F.col("n") * F.col("n_hours") > F.col("total_n")
    )
    from pyspark.sql import Window

    w = Window.orderBy("hr")
    flagged = busy.withColumn(
        "new_island",
        F.when(F.col("hr") - F.lag("hr").over(w) == 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = islands.groupBy("island").agg(
        F.min("min_ts_us").alias("start_us"), F.max("max_ts_us").alias("end_us")
    ).drop("island")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    joined = point_in_interval_join(
        purchases,
        "ts_us",
        F.broadcast(intervals),
        "start_us",
        "end_us",
        bucket_width=3_600_000_000,
    )
    return joined.groupBy("start_us", "end_us").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count_distinct("user_id").alias("n_users"),
    )


def _register_interval_overlap() -> None:
    from hailstorm_spark.operators.rangejoin import interval_overlap_join

    GAP_US = 1_800_000_000  # 30-minute session gap (the sessionize gap)
    HOUR_US = 3_600_000_000

    @register(
        "join_interval_overlap_busy_hours_sessions",
        oracle=f"""
        WITH se AS (
          SELECT user_id, epoch_us(ts) AS us,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {GAP_US}
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        ),
        si AS (
          SELECT user_id, us,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM se
        ),
        s AS (
          SELECT user_id, MIN(us) AS s_start_us, MAX(us) AS s_end_us
          FROM si GROUP BY user_id, sid
        ),
        hr AS (
          SELECT epoch_us(ts) // {HOUR_US} AS h, COUNT(*) AS n
          FROM events GROUP BY 1
        ),
        tot AS (
          SELECT CAST(SUM(n) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS nh
          FROM hr
        ),
        busy AS (
          SELECT h, CAST(n AS BIGINT) AS n FROM hr, tot
          WHERE n * tot.nh >= 2 * tot.total
        )
        SELECT CAST(b.h * 3600 AS BIGINT) AS hour_epoch,
               b.n AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_sessions
        FROM busy b JOIN s
          ON s.s_start_us <= (b.h + 1) * {HOUR_US} - 1
         AND b.h * {HOUR_US} <= s.s_end_us
        GROUP BY b.h, b.n
        """,
        tags=("join", "range", "interval", "events"),
    )
    def join_interval_overlap_busy_hours_sessions(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """INTERVAL × INTERVAL overlap join, completing the temporal
        join family (as-of = nearest point, point-in-interval =
        containment, this = overlap): which user sessions were active
        during each high-traffic hour (hours ≥ 2× the mean hourly
        event count — an integer inequality, no float threshold). Both
        sides are derived intervals: sessions from the 30-minute-gap
        islands, busy hours as [h, h+1h) windows.

        A raw overlap predicate has no equi-key → nested loop; the
        operator (operators/rangejoin.py::interval_overlap_join)
        bucket-quantizes BOTH sides and keeps each pair only in its
        first shared bucket — exactly-once by construction, no
        dedup shuffle. The oracle runs the naive inequality join, so a
        pair lost (or duplicated) by the bucketing/first-bucket logic
        is an immediate count mismatch.
        """
        from hailstorm_spark.io import load_table
        from pyspark.sql import Window

        # load_table already normalizes events.ts
        e = load_table(spark, sf_dir, "events").select(
            "user_id", F.unix_micros("ts").alias("us")
        )
        w = Window.partitionBy("user_id").orderBy("us")
        sessions = (
            e.withColumn(
                "brk",
                F.when(
                    F.col("us") - F.lag("us").over(w) > GAP_US, 1
                ).otherwise(0),
            )
            .withColumn(
                "sid",
                F.sum("brk").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .groupBy("user_id", "sid")
            .agg(
                F.min("us").alias("s_start_us"),
                F.max("us").alias("s_end_us"),
            )
        )
        hr = e.groupBy(F.expr(f"us div {HOUR_US}").alias("h")).agg(
            F.count(F.lit(1)).alias("n")
        )
        tot = hr.agg(
            F.sum("n").alias("total"), F.count(F.lit(1)).alias("nh")
        )
        busy = (
            hr.crossJoin(F.broadcast(tot))
            .filter(F.col("n") * F.col("nh") >= 2 * F.col("total"))
            .select(
                "h",
                F.expr(f"h * {HOUR_US}").alias("b_start_us"),
                F.expr(f"(h + 1) * {HOUR_US} - 1").alias("b_end_us"),
                F.col("n").cast("long").alias("n_events"),
            )
        )
        joined = interval_overlap_join(
            busy, "b_start_us", "b_end_us",
            sessions, "s_start_us", "s_end_us",
            bucket_width=HOUR_US,
        )
        return joined.groupBy("h", "n_events").agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions")
        ).select(
            F.expr("cast(h * 3600 as bigint)").alias("hour_epoch"),
            "n_events",
            "n_sessions",
        )


_register_interval_overlap()


@register(
    "join_bucketed_colocated_revenue",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                    * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join", "storage", "bucketed"),
)
def join_bucketed_colocated_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located fact⋈fact join: both sides PERSISTED bucketed on
    the join key (equal bucket counts), so the join itself needs NO
    exchange on either side — the single most important storage
    discipline for a 100 TB star schema, where the orders⋈lineitem
    shuffle would otherwise move both tables across the cluster on
    every query. Here the whole plan carries exactly one Exchange: the
    final ~5-group priority rollup (pinned in tests/test_storage.py).

    The write cost is the amortized part — a production pipeline
    bucket-writes once at ingest and every downstream join rides it.
    Layout must never change the answer: the oracle is the plain join
    on the raw parquet.

    Reference parity: the reference's grouped processing pins a
    partition key per pipeline stage (reference
    src/Hailstorm/Processor/Pool.hs grouping); bucketing is the
    at-rest analogue, carried by the table instead of the topology.
    """
    import tempfile

    from hailstorm_spark.operators.storage import write_bucketed

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    base = tempfile.mkdtemp(prefix="hs_bucketed_join_")
    write_bucketed(
        orders, "orders_bkt_rev", f"{base}/orders", by="o_orderkey", buckets=8
    )
    write_bucketed(
        li, "lineitem_bkt_rev", f"{base}/lineitem", by="l_orderkey", buckets=8
    )
    o = spark.table("orders_bkt_rev")
    l = spark.table("lineitem_bkt_rev")
    from pyspark.sql.types import DecimalType

    rev = F.col("l_extendedprice").cast(DecimalType(14, 2)) * (
        F.lit(1.0) - F.col("l_discount")
    ).cast(DecimalType(4, 2))
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )
