"""SQL-text API surface: the same engine driven by ``spark.sql``.

Everything else in the library declares plans through the DataFrame
API; real users also arrive with SQL strings. These queries register
the star-schema tables as temp views and execute ANSI SQL text through
Catalyst — same optimizer, same plans, and (deliberately) the Spark SQL
string is near-identical to its DuckDB oracle, which is the whole
point: the engine speaks the standard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hailstorm_spark.io import load_tables
from hailstorm_spark.registry import register


@register(
    "sql_text_revenue_by_nation",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
    tags=("sql-text", "join", "aggregate"),
)
def sql_text_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation, written as SQL TEXT and executed via
    spark.sql — the identical string (modulo nothing) runs on DuckDB as
    the oracle. Catalyst still broadcasts nation/customer and shuffles
    the facts once; SQL text and DataFrame code meet in the same
    optimizer."""
    load_tables(spark, sf_dir, ("lineitem", "orders", "customer", "nation"))
    return spark.sql(
        """
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                    AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
        """
    )


@register(
    "sql_text_cte_top_customers",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, total,
             ROW_NUMBER() OVER (ORDER BY total DESC, o_custkey ASC) AS rnk
      FROM spend
    )
    SELECT r.rnk, r.o_custkey, c.c_name, r.total
    FROM ranked r JOIN customer c ON c.c_custkey = r.o_custkey
    WHERE r.rnk <= 25
    """,
    tags=("sql-text", "cte", "window", "topk"),
)
def sql_text_cte_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + window + join as SQL text: top-25 customers by lifetime
    spend. The identical string runs on both engines."""
    load_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        WITH spend AS (
          SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
          FROM orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT o_custkey, total,
                 ROW_NUMBER() OVER (ORDER BY total DESC, o_custkey ASC) AS rnk
          FROM spend
        )
        SELECT r.rnk, r.o_custkey, c.c_name, r.total
        FROM ranked r JOIN customer c ON c.c_custkey = r.o_custkey
        WHERE r.rnk <= 25
        """
    )
