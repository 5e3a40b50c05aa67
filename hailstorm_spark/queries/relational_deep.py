"""Deep relational queries: the harder half of the TPC-H shapes.

Completes the classic decision-support surface started in relational.py
(the reference engine has no relational layer — SURVEY §2.6 — so this
whole module is additive capability). The driver's star schema omits
``partsupp`` and several canonical columns (l_shipmode, l_commitdate,
l_receiptdate, c_phone), so each query keeps the canonical JOIN /
SUBQUERY SHAPE — that is what exercises the optimizer — with predicates
adapted to the columns that exist:

- q7  volume shipping: two-nation revenue flow, dims broadcast.
- q8  market share: 8-way join, CASE-conditional aggregate ratio.
- q9  product profit: supply cost adapted to 0.60 × p_retailprice.
- q13 customer distribution: LEFT OUTER join with an ON-clause filter,
      double aggregation (per-customer count, then histogram).
- q15 top supplier: aggregate view joined against its own MAX.
- q21 waiting suppliers: EXISTS + NOT EXISTS decorrelated into one
      shared flagged subtree with semi- and anti-joins.
- q22 sales opportunity: scalar AVG subquery + anti-join.

Scale notes (100 TB): every dimension join is an explicit broadcast;
the only shuffles are fact⋈fact on orderkey and aggregations on their
grouping keys. q21's three self-references share ONE flagged subtree so
the lineitem⋈orders join is computed once (ReusedExchange — pinned in
tests/test_plans_deep.py). All money math is exact decimal
(functions/decimal.py) so results are shuffle-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from hailstorm_spark.functions.decimal import (
    davg_sql,
    dsum,
    dsum_sql,
    money,
    money_sql,
    one_minus,
    one_minus_sql,
)
from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register

_REVENUE_SQL = f"({money_sql('l_extendedprice')} * {one_minus_sql('l_discount')})"


def _revenue() -> F.Column:
    return money("l_extendedprice") * one_minus("l_discount")


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT
      n1.n_name AS supp_nation,
      n2.n_name AS cust_nation,
      CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
      {dsum_sql(_REVENUE_SQL, 'revenue')}
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_11')
        OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_19'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER)
    """,
    tags=("join", "aggregate"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing between two nations by year.

    The nation-pair disjunction filters both broadcast dims down to two
    rows each before the join, so the predicate prunes on the build
    side; the single shuffle is lineitem⋈orders on orderkey.
    """
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_11"))
            | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_19"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(_revenue(), "revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT
      o_year,
      CAST(COALESCE(SUM(CASE WHEN nation = 'NATION_7' THEN volume END), 0) AS DOUBLE)
        / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT
        CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
        {_REVENUE_SQL} AS volume,
        n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("join", "aggregate", "conditional"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional promo revenue.

    Eight-way join where everything but lineitem⋈orders broadcasts;
    the share is a conditional-sum / sum ratio computed in one
    aggregation pass (no second scan, no self-join). Decimal sums cast
    to double before the division so both engines divide identical
    doubles.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    volume = _revenue()
    nation_volume = F.when(F.col("nation") == "NATION_7", volume)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.coalesce(F.sum(nation_volume).cast("double"), F.lit(0.0))
                / F.sum(volume).cast("double")
            ).alias("mkt_share")
        )
    )


# Adapted supply cost: the schema has no partsupp, so cost is modeled as
# a fixed 60% margin on the part's retail price. Exact decimal both sides.
_COST_SQL = (
    f"({money_sql('p.p_retailprice')} * CAST(0.60 AS DECIMAL(3,2))"
    f" * {money_sql('l.l_quantity')})"
)


def _cost() -> F.Column:
    return (
        money("p_retailprice")
        * F.lit(0.60).cast(DecimalType(3, 2))
        * money("l_quantity")
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT
      n.n_name AS nation,
      CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
      {dsum_sql(f"({_REVENUE_SQL} - {_COST_SQL})", 'sum_profit')}
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER)
    """,
    tags=("join", "aggregate"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for parts
    matching a name pattern.

    Canonically profit = revenue − ps_supplycost·qty; with no partsupp
    table the cost side is 0.60 × p_retailprice · qty (documented
    adaptation, same expression shape). The LIKE filter lands on the
    broadcast part dim, pruning lineitem via the join.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(_revenue() - _cost(), "sum_profit"))
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("join", "outer", "aggregate"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of orders-per-customer, keeping
    zero-order customers via LEFT OUTER with the priority filter in the
    ON clause (a WHERE would silently turn it into an inner join —
    the classic outer-join trap this query exists to test).

    Both tables are fact-sized at 100 TB: shuffle join on custkey, the
    per-customer count reuses that partitioning (no second exchange —
    AQE), and the histogram re-agg moves only |distinct counts| rows.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {dsum_sql(_REVENUE_SQL, 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("aggregate", "subquery", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue.

    The revenue aggregate is computed once and joined against its own
    MAX (1-row broadcast) — equality on the double is exact because
    both values come from the same decimal sum. No window, no second
    scan of lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-04-01 00:00:00'"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_revenue(), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH flagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM flagged l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE l1.late
      AND n.n_regionkey = 0
      AND EXISTS (
        SELECT 1 FROM flagged l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM flagged l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.late
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 10
    """,
    tags=("join", "semi", "anti", "aggregate", "topk"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier finished order.

    The schema has no commit/receipt dates, so "late" is adapted to
    shipdate > orderdate + 90 days, precomputed ONCE in a shared
    flagged subtree; the EXISTS becomes a left-semi join and the NOT
    EXISTS a left-anti join, both equi-keyed on orderkey with the
    supplier inequality as a residual — Spark never sees a correlated
    subquery, and the flagged exchange is reused three times.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    flagged = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias(
                "late"
            ),
        )
    )
    l1 = flagged.filter(F.col("late"))
    l2 = flagged.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = flagged.filter(F.col("late")).select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    return (
        l1.join(
            l2,
            (l1.l_orderkey == l2.ok2) & (l1.l_suppkey != l2.sk2),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.ok3) & (F.col("l_suppkey") != l3.sk3),
            "left_anti",
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "q22_sales_opportunity",
    oracle=f"""
    SELECT
      cntrycode,
      COUNT(*) AS numcust,
      {dsum_sql(money_sql('c_acctbal'), 'totacctbal')}
    FROM (
      SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode, c_acctbal
      FROM customer c
      WHERE (c_nationkey % 10) IN (1, 3, 5, 7)
        AND c_acctbal > (
          SELECT {davg_sql(money_sql('c_acctbal'), 'thr')}
          FROM customer
          WHERE c_acctbal > 0.0 AND (c_nationkey % 10) IN (1, 3, 5, 7)
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-07-01 00:00:00'
        )
    ) custsale
    GROUP BY cntrycode
    """,
    tags=("anti", "subquery", "aggregate"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers with no RECENT orders, bucketed
    by country code (adapted: nationkey mod 10 stands in for the
    missing phone prefix, and "never ordered" becomes "no order since
    mid-2000" so the result is non-vacuous at every scale factor).

    The scalar AVG is a 1-row broadcast (decimal sum / count so both
    engines compare identical doubles); customers-without-recent-orders
    is a left-anti join on custkey — at 100 TB that's one shuffle, with
    the orders side reduced by the date filter and column pruning.
    """
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 10).cast("int")
    )
    pool = c.filter(F.col("cntrycode").isin(1, 3, 5, 7))
    thr = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("thr")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.expr("TIMESTAMP '2000-07-01 00:00:00'")
    )
    return (
        pool.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(money("c_acctbal"), "totacctbal"),
        )
    )
