"""Aggregate coverage beyond plain groupBy: distinct, rollup, cube,
grouping sets, pivot, and multi-measure statistics.

The reference's aggregation is exactly one shape — per-key commutative
monoid merge (SURVEY §2.4) — which in Spark is any groupBy.agg. The
variants here (distinct aggregates, multi-level grouping) are the
additive surface; each compiles to partial aggregation + one or two
shuffles, never a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from hailstorm_spark.functions.decimal import dsum, dsum_sql, money, money_sql
from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "distinct"),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct: Spark expands to two-phase aggregation
    automatically (expand + partial dedup before the shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_suppkey").alias("distinct_suppliers"),
        F.count_distinct("l_partkey").alias("distinct_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_rollup_order_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate", "rollup"),
)
def agg_rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: per (status, priority), per status, and grand total in
    one pass (Spark Expand operator → single shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice"), "total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "agg_cube_returnflag_linestatus",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_items,
           {dsum_sql(money_sql('l_quantity'), 'total_qty')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "cube"),
)
def agg_cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "lineitem")
    return (
        o.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(money("l_quantity"), "total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "total_qty",
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
           COALESCE(CAST(c_nationkey AS VARCHAR), 'ALL') AS nation,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
    tags=("aggregate", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (the DataFrame API has no direct
    grouping-sets builder; spark.sql is the idiomatic path)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
               COALESCE(CAST(c_nationkey AS STRING), 'ALL') AS nation,
               COUNT(*) AS n_customers
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@register(
    "agg_pivot_event_values",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           COUNT(*) FILTER (event_type = 'click')    AS click_cnt,
           COUNT(*) FILTER (event_type = 'view')     AS view_cnt,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase_cnt,
           COUNT(*) FILTER (event_type = 'signup')   AS signup_cnt,
           COUNT(*) FILTER (event_type = 'error')    AS error_cnt
    FROM events
    GROUP BY user_id % 10
    """,
    tags=("aggregate", "pivot"),
)
def agg_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never the implicit-distinct
    form — that adds a blocking pass to discover columns at scale)."""
    e = load_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = (
        e.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves null for empty cells; normalize to 0 like FILTER does
    return out.select(
        "user_bucket",
        *[F.coalesce(F.col(k), F.lit(0)).alias(f"{k}_cnt") for k in kinds],
    )


@register(
    "agg_stats_per_segment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_bal,
           (CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)) AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("aggregate",),
)
def agg_stats_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/sum/avg in one pass; min/max of doubles are
    order-independent, sums go through exact decimals."""
    c = load_table(spark, sf_dir, "customer")
    sum_dec = F.sum(money("c_acctbal"))
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_acctbal").cast("double").alias("min_bal"),
        F.max("c_acctbal").cast("double").alias("max_bal"),
        sum_dec.cast("double").alias("sum_bal"),
        (sum_dec.cast("double") / F.count(F.lit(1))).alias("avg_bal"),
    )


@register(
    "agg_collect_sorted_arrays",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list(CAST(l_quantity AS BIGINT) ORDER BY l_quantity ASC), ',')
               AS quantities,
           CAST(len(list(l_quantity)) AS INT) AS n_items,
           CAST(list_max(list(l_quantity)) AS DOUBLE) AS max_qty
    FROM lineitem
    WHERE l_orderkey < 200
    GROUP BY l_orderkey
    """,
    tags=("aggregate", "array"),
)
def agg_collect_sorted_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-order sorted quantity vector + array
    stats. collect_list order is partition-dependent, so the vector is
    canonicalized with array_sort; it is then emitted as a comma-joined
    STRING (quantities are integral 1..50, cast BIGINT on both sides)
    because the correctness harness canonicalizes results with a
    pandas sort/factorize pass that only supports hashable scalar
    columns — a top-level list column crashes it (r05 driver red).
    The local sweep enforces this repo-wide: see the scalar-output
    lint in tests/conftest.py."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.col("l_quantity").cast("bigint"))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("quantities"),
        F.count(F.lit(1)).cast("int").alias("n_items"),
        F.max("l_quantity").cast("double").alias("max_qty"),
    )


@register(
    "agg_min_max_by",
    oracle="""
    WITH k AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
      FROM orders WHERE o_custkey < 300
    )
    SELECT o_custkey,
           arg_max(o_orderkey, cents * 10000000000 + o_orderkey) AS priciest_order,
           arg_min(o_orderkey, cents * 10000000000 - o_orderkey) AS cheapest_order,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
    FROM k
    GROUP BY o_custkey
    """,
    tags=("aggregate", "argmax"),
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-extremum aggregates (max_by/min_by): the order id carrying
    each customer's max/min price. Ties broken deterministically by a
    composite EXACT-INTEGER key (price-cents·10^10 ± orderkey, both
    engines) — bare arg_max over a non-unique value is
    engine-dependent, and doubles can't carry the composite."""
    from hailstorm_spark.functions.decimal import money

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    cents = (money("o_totalprice") * 100).cast("long")
    o = o.withColumn("cents", cents)
    return o.groupBy("o_custkey").agg(
        F.max_by(
            "o_orderkey", F.col("cents") * F.lit(10_000_000_000) + F.col("o_orderkey")
        ).alias("priciest_order"),
        F.min_by(
            "o_orderkey", F.col("cents") * F.lit(10_000_000_000) - F.col("o_orderkey")
        ).alias("cheapest_order"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        F.min("o_totalprice").cast("double").alias("min_price"),
    )


@register(
    "agg_pandas_udaf_median",
    oracle="""
    SELECT o_orderpriority,
           CAST(median(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))
                AS DOUBLE) AS median_cents,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("aggregate", "pandas-udaf"),
)
def agg_pandas_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate through a pandas GROUPED_AGG UDF —
    the batch form of the reference's bolt UDAF contract (SURVEY §2.9):
    exact median of price-cents per priority.

    Median needs the whole group (not a monoid), which is exactly what
    GROUPED_AGG provides: Arrow-shipped group slices into a Python
    kernel. Inputs are exact integer cents; numpy's and DuckDB's
    even-count midpoint average is a dyadic-rational double — identical
    in both engines. Built-ins stay the fast path; this is the escape
    hatch for non-decomposable aggregates.
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType (not type hints): postponed annotation
    # evaluation in this module makes hint-based inference unresolvable
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def median_udaf(cents):
        return float(cents.median())

    # group-agg pandas UDFs can't mix with JVM aggregates in one agg()
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def count_udaf(cents):
        return len(cents)

    from hailstorm_spark.functions.decimal import money

    o = load_table(spark, sf_dir, "orders").withColumn(
        "cents", (money("o_totalprice") * 100).cast("long")
    )
    return o.groupBy("o_orderpriority").agg(
        median_udaf("cents").alias("median_cents"),
        count_udaf("cents").alias("n"),
    )


@register(
    "agg_exact_second_moments",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy
      FROM r
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / n)
              / 10000.0) AS covar_pop_qty_price,
           ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                    * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)))
             AS corr_qty_price,
           ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n))
             AS regr_slope_price_on_qty
    FROM s
    """,
    tags=("aggregate", "statistics"),
)
def agg_exact_second_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance / correlation / regression slope with deterministic
    results — the second-moment extension of the decimal-sum
    discipline. Built-in corr/covar accumulate doubles in shuffle
    order (unverifiable against an oracle AND irreproducible
    run-to-run at 100 TB). Exact decimals fix the sums but not the
    EDGE: a decimal whose unscaled value exceeds 2^53 can round to
    double differently across engines unless the source integer is
    exact and the conversion correctly rounded. So the moments are
    integer CENTS end to end. Width discipline: first moments stay
    int64 (|sum(y)| ≈ 10^7·rows — int64-safe through ~sf10^4), but the
    SECOND moments overflow int64 near sf0.04 (sum(y²) ≈ 10^14·rows ≈
    2.2e20 at sf1 > 2^63), so sxx/syy/sxy accumulate as DECIMAL(38,0)
    in Spark and DuckDB's native int128 SUM cast to DECIMAL(38,0) in
    the oracle — exact integers in both, headroom to 10^38 (~sf10^17),
    and the integer→double conversion is correctly rounded in both
    engines so the closed forms evaluate the identical IEEE sequence.
    corr is scale-invariant and the slope\'s 100/100 cancels; only the
    covariance needs one final /10^4, applied as the identical last
    IEEE op in both engines. One map-side-combinable aggregation.
    """
    l = load_table(spark, sf_dir, "lineitem")
    r = l.select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    s = r.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    n = F.col("n")
    dsx, dsy = F.col("sx").cast("double"), F.col("sy").cast("double")
    dsxx, dsyy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    dsxy = F.col("sxy").cast("double")
    cov_num = dsxy - dsx * dsy / n
    var_x = dsxx - dsx * dsx / n
    var_y = dsyy - dsy * dsy / n
    return s.select(
        "l_returnflag",
        "n",
        (cov_num / n / F.lit(10000.0)).alias("covar_pop_qty_price"),
        # try_divide: a zero-variance group (every x or y identical —
        # real corpora have them) has corr/slope undefined; ANSI plain
        # division would fault the WHOLE aggregation on that one group,
        # while DuckDB's double division by zero is NULL natively. NULL
        # on both sides, job survives.
        F.try_divide(cov_num, F.sqrt(var_x * var_y)).alias("corr_qty_price"),
        F.try_divide(cov_num, var_x).alias("regr_slope_price_on_qty"),
    )
