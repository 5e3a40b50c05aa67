"""The last five TPC-H shapes: q2, q11, q12, q16, q20.

Together with relational.py (q1/q3/q5/q6/q10, q4/q14/q17/q18/q19) and
relational_deep.py (q7/q8/q9/q13/q15/q21/q22) this completes the full
22-query decision-support surface. The reference engine has no
relational layer at all (SURVEY §2.6) — this module is additive
capability mandated by the north-star brief.

The driver's star schema has no ``partsupp`` table, so the four
partsupp-shaped queries derive it from lineitem — ``ps`` =
``GROUP BY (l_partkey, l_suppkey)`` with

- ``ps_supplycost`` := MIN(l_extendedprice) as exact DECIMAL(14,2)
  (min of exact decimals — associative, shuffle-order-independent;
  avoids a double division whose rounding could diverge between
  engines), and
- ``ps_availqty``   := SUM(l_quantity) — quantities are integral
  doubles ≤ 50, so the sum is exact in either engine in any order.

This preserves every canonical JOIN/SUBQUERY SHAPE — correlated MIN
(q2), HAVING against a scalar subquery (q11), conditional counting over
a fact⋈fact join (q12), NOT-IN anti join + COUNT DISTINCT (q16), nested
correlated-aggregate semi-join (q20) — which is what exercises the
optimizer. Predicates are adapted to the columns that exist (no
l_shipmode/l_commitdate/l_receiptdate ⇒ q12 classifies by ship delay;
no s_comment ⇒ q16's "complaint" suppliers are those with negative
account balance).

Scale notes (100 TB): the ``ps`` derivation is one map-side-combinable
shuffle on (partkey, suppkey) — the same key the downstream joins use.
All dimension joins broadcast explicitly; q16's NOT IN is written as a
plain left-anti join (s_suppkey is a non-null key column) so Spark never
plans the null-aware BroadcastNestedLoopJoin — the null-aware form is
covered separately by join_not_in_null_aware. q2's min-per-part join
reuses one eligible-suppliers subtree for both the per-row and the
grouped-min sides (ReusedExchange, pinned in tests/test_plans_deep.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register

#: DuckDB mirror of the derived partsupp relation (see module doc).
_PS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(14,2))) AS ps_supplycost,
         CAST(SUM(l_quantity) AS DECIMAL(18,0)) AS ps_availqty
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp: one aggregation shuffle on (partkey, suppkey)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice").cast(DecimalType(14, 2))).alias(
            "ps_supplycost"
        ),
        F.sum("l_quantity").cast(DecimalType(18, 0)).alias("ps_availqty"),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    eligible AS (
      SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
             s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
           e.ps_suppkey AS s_suppkey,
           CAST(e.ps_supplycost AS DOUBLE) AS ps_supplycost
    FROM part p
    JOIN eligible e ON e.ps_partkey = p.p_partkey
    JOIN (
      SELECT ps_partkey, MIN(ps_supplycost) AS min_cost
      FROM eligible GROUP BY ps_partkey
    ) m ON m.ps_partkey = p.p_partkey AND e.ps_supplycost = m.min_cost
    WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey, e.ps_suppkey
    LIMIT 100
    """,
    tags=("join", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part within a region.

    The correlated ``ps_supplycost = (SELECT MIN(...) ...)`` subquery is
    decorrelated one step further than the oracle's join-against-
    grouped-min: a MIN window over ``ps_partkey`` computes the per-part
    minimum in the same shuffle that would feed the join, so the
    region-filtered eligible-suppliers subtree is scanned ONCE (the
    join form evaluates it twice — pinned in tests/test_plans_deep.py:
    no SortMergeJoin at all, exactly one exchange past the ps
    aggregation). The window is partitioned, never global. The ORDER BY
    carries a unique (p_partkey, s_suppkey) suffix so LIMIT 100
    truncates identically in any engine; TakeOrderedAndProject keeps
    top-100 per partition — no global sort at 100 TB.
    """
    from pyspark.sql import Window
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    eligible = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eligible.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_suppkey").alias("s_suppkey"),
            F.col("ps_supplycost").cast("double").alias("ps_supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    natps AS (
      SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS val
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_7', 'NATION_12')
    )
    SELECT ps_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
    FROM natps
    GROUP BY ps_partkey
    HAVING CAST(SUM(val) AS DOUBLE)
           > (SELECT CAST(SUM(val) AS DOUBLE)
                     / (2.0 * COUNT(DISTINCT ps_partkey)) FROM natps)
    """,
    tags=("aggregate", "subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose held value exceeds a global fraction.

    HAVING against a scalar subquery over the SAME relation: the
    nation-filtered partsupp subtree is computed once and consumed by
    both the per-part aggregation and the grand total (ReusedExchange).
    The grand total is a single row — joined by broadcast, so the only
    shuffles are the two aggregations. The threshold is HALF THE MEAN
    part value (total / 2·#parts) rather than TPC-H's fixed fraction:
    the official 0.0001/SF scaling exists precisely because a fixed
    fraction empties the answer as data grows — a scale-free fraction
    keeps the check non-vacuous at every SF. Value math is exact decimal
    throughout; the threshold comparison converts BOTH sides to double
    in BOTH engines (decimal total → double → ×0.001, and the per-part
    sum also cast to double before comparing) so a part sitting within
    one ulp of the threshold cannot diverge between Spark and the
    oracle.
    """
    ps = _partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_12")
    )
    natps = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"),
        )
    )
    per_part = natps.groupBy("ps_partkey").agg(F.sum("val").alias("total_val"))
    threshold = natps.agg(
        (
            F.sum("val").cast("double")
            / (F.lit(2.0) * F.count_distinct("ps_partkey"))
        ).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("total_val").cast("double") > F.col("threshold"))
        .select(
            "ps_partkey", F.col("total_val").cast("double").alias("part_value")
        )
    )


@register(
    "q12_ship_delay_priority",
    oracle="""
    SELECT
      CASE WHEN datediff('day', CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE)) <= 60
           THEN 'FAST' ELSE 'SLOW' END AS delay_bucket,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
    tags=("join", "aggregate"),
)
def q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix by shipping class.

    The schema has no l_shipmode/l_commitdate/l_receiptdate, so the
    shipping class is the order→ship delay bucketed at 60 days — the
    same fact⋈fact join + dual conditional-count aggregation. The
    shipdate filter pushes to the parquet scan; the single shuffle is
    lineitem⋈orders on orderkey, then a 2-group aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.when(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
                <= 60,
                "FAST",
            )
            .otherwise("SLOW")
            .alias("delay_bucket"),
            F.when(high, 1).otherwise(0).alias("is_high"),
            F.when(high, 0).otherwise(1).alias("is_low"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum("is_low").alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "aggregate", "subquery"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size).

    The "complaint" suppliers (no s_comment column) are those with
    negative account balance. s_suppkey is a non-null key, so the NOT IN
    is written as a plain left-anti join — Spark's null-aware NOT IN
    would otherwise plan a BroadcastNestedLoopJoin (that semantic is
    covered by join_not_in_null_aware). The part filter joins under the
    broadcast threshold (broadcast at every fixture SF; part scales
    with SF, so no forced hint — r15); the COUNT DISTINCT is a
    two-phase aggregate on the group keys.
    """
    l = load_table(spark, sf_dir, "lineitem")
    ps = l.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    complained = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(
            complained,
            ps.ps_suppkey == complained.s_suppkey,
            "left_anti",
        )
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_stock_suppliers",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             SUM(l_quantity) AS ps_availqty
      FROM lineitem GROUP BY 1, 2
    ),
    y AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty_1997
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_8')
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM ps
        JOIN y ON y.l_partkey = ps.ps_partkey AND y.l_suppkey = ps.ps_suppkey
        WHERE ps.ps_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps.ps_availqty > 4.0 * y.qty_1997
      )
    """,
    tags=("join", "subquery"),
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding excess stock of chosen parts.

    Nested IN subqueries with a correlated aggregate: suppliers of
    red-named parts whose all-time shipped quantity exceeds 4× their
    1997 shipments. The oracle's two CTEs (all-time totals ⋈ 1997
    totals on their shared key) fuse into ONE single-pass aggregation —
    a conditional SUM computes qty_1997 in the same groupBy, halving
    the lineitem scans and removing the self-join shuffle entirely.
    ``SUM(CASE ...)`` yields NULL for groups with no 1997 shipments,
    and NULL fails the ``>`` comparison — exactly the inner-join
    semantics of the decorrelated form. Part names filter by broadcast
    semi-join BEFORE the aggregation so the shuffle carries only
    red-part rows; the final supplier membership is a left-semi join.
    Quantities are integral doubles, so every sum and the 4×
    comparison are exact. The red-part semi-join rides the broadcast
    threshold (fits at every fixture SF); at the 100 TB design point
    red_parts outgrows any broadcast and the threshold degrades it to a
    shuffled semi-join — the manual step beyond that is a Bloom filter
    over the keys (guide §3.2), not a forced hint that OOMs the driver.
    """
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem")
    in_1997 = (
        F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'")
    ) & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
    excess = (
        l.join(
            red_parts,
            l.l_partkey == red_parts.p_partkey,
            "left_semi",
        )
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum("l_quantity").alias("ps_availqty"),
            F.sum(F.when(in_1997, F.col("l_quantity"))).alias("qty_1997"),
        )
        .filter(F.col("ps_availqty") > F.lit(4.0) * F.col("qty_1997"))
        .select("ps_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )
