"""Set operations: UNION ALL / UNION / INTERSECT / EXCEPT.

The reference's only set-like behavior is implicit UNION ALL of
multiple upstream streams into one bolt layer (SURVEY §2.6). The rest
are additive. INTERSECT/EXCEPT compile to aggregate-or-join plans in
Spark; all distinct-style ops are one hash shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "setop_union_all_counts",
    oracle="""
    SELECT nationkey, COUNT(*) AS n
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) t
    GROUP BY nationkey
    """,
    tags=("setop",),
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — the reference's stream-merge, batch form: zero
    shuffle for the union itself."""
    u = _cust_nations(spark, sf_dir).unionAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "setop_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "setop_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 0
    """,
    tags=("setop",),
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer nations EXCEPT region-0 supplier nations (EXCEPT =
    distinct semantics, which is DataFrame.subtract). The supplier side
    is region-restricted so the difference is STRUCTURALLY non-empty at
    every scale factor — the unrestricted form happens to be empty at
    sf >= 0.01, making its parity check vacuous."""
    from hailstorm_spark.io import load_table

    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    region0 = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return _cust_nations(spark, sf_dir).subtract(region0)


@register(
    "setop_intersect_all_priorities",
    oracle="""
    SELECT o_orderpriority AS priority FROM orders WHERE o_custkey % 2 = 0
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_custkey % 2 = 1
    """,
    tags=("setop", "multiset"),
)
def setop_intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics: each priority appears
    min(count_left, count_right) times (the bag intersection DISTINCT
    would collapse). Spark's intersectAll plans this as a counted
    aggregate + generate, no row-by-row matching."""
    o = load_table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_custkey") % 2 == 0).select(
        F.col("o_orderpriority").alias("priority")
    )
    right = o.filter(F.col("o_custkey") % 2 == 1).select(
        F.col("o_orderpriority").alias("priority")
    )
    return left.intersectAll(right)


@register(
    "setop_except_all_priorities",
    oracle="""
    SELECT o_orderpriority AS priority FROM orders WHERE o_custkey % 2 = 0
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_custkey % 2 = 1
    """,
    tags=("setop", "multiset"),
)
def setop_except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: each priority keeps
    max(0, count_left − count_right) occurrences."""
    o = load_table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_custkey") % 2 == 0).select(
        F.col("o_orderpriority").alias("priority")
    )
    right = o.filter(F.col("o_custkey") % 2 == 1).select(
        F.col("o_orderpriority").alias("priority")
    )
    return left.exceptAll(right)
