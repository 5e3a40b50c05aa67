"""Scalar function surface: string / date / math / conditional.

Absent in the reference (its only scalar computation is bytes→string,
SURVEY §2.6). Everything here is a built-in ``pyspark.sql.functions``
expression — JVM-side, inside whole-stage codegen; no Python executes
per row. Transcendental functions (exp/ln/sin…) are deliberately kept
out of oracle-checked outputs: libm results aren't guaranteed
bit-identical across engines. sqrt/round/abs/floor/ceil are IEEE-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.functions.decimal import money, rate
from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           substr(p_name, 1, 5) AS name_prefix,
           replace(p_type, ' ', '_') AS type_snake,
           concat(p_brand, ':', p_type) AS brand_type,
           ltrim(rtrim(p_name)) AS name_trim,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           CASE WHEN p_name LIKE '%steel%' THEN 1 ELSE 0 END AS is_steel
    FROM part
    WHERE p_partkey <= 200
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        F.ltrim(F.rtrim("p_name")).alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.when(F.col("p_name").like("%steel%"), 1).otherwise(0).alias("is_steel"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           strftime(o_orderdate, '%Y-%m') AS year_month
    FROM orders
    WHERE o_orderkey <= 500
    """,
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.date_add(d, 30).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) AS disc_amount,
           abs(l_quantity - 25.0) AS qty_dev,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil_weeks,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_floor_weeks,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(l_quantity AS BIGINT) % 5 AS qty_mod,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           CAST(sign(l_quantity - 25.0) AS BIGINT) AS qty_sign
    FROM lineitem
    WHERE l_orderkey <= 300
    """,
    tags=("scalar", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # exact decimal multiply, not round(x*y, 2): double rounding at
        # .xx5 boundaries differs between engines
        (money("l_extendedprice") * rate("l_discount")).cast("double").alias("disc_amount"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil_weeks"),
        F.floor(F.col("l_quantity") / 7.0).alias("qty_floor_weeks"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity").cast("long") % 5).alias("qty_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_quantity") - 25.0).cast("long").alias("qty_sign"),
    )


@register(
    "scalar_conditional_funcs",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULTED') AS segment_or_default,
           CASE WHEN c_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS nation_parity
    FROM customer
    WHERE c_custkey <= 400
    """,
    tags=("scalar", "conditional"),
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("DEFAULTED")).alias(
            "segment_or_default"
        ),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias(
            "nation_parity"
        ),
    )


@register(
    "scalar_null_semantics",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(o.o_orderpriority, 'NO-ORDER') AS priority,
           NULLIF(c.c_mktsegment, 'MACHINERY') AS seg_or_null,
           (c.c_acctbal IS NOT DISTINCT FROM o.o_totalprice) AS null_safe_eq,
           CASE WHEN o.o_orderkey IS NULL THEN 0 ELSE 1 END AS has_order
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, MIN(o_orderkey) AS o_orderkey,
             MIN(o_orderpriority) AS o_orderpriority,
             MIN(o_totalprice) AS o_totalprice
      FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    """,
    tags=("scalar", "null"),
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: COALESCE / NULLIF / null-safe equality
    (<=>) / IS NULL branching across a LEFT join's null-extended side —
    the semantics every engine must pin down exactly."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min("o_orderkey").alias("o_orderkey"),
            F.min("o_orderpriority").alias("o_orderpriority"),
            F.min("o_totalprice").alias("o_totalprice"),
        )
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("o_orderpriority", F.lit("NO-ORDER")).alias("priority"),
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg_or_null"),
        F.col("c_acctbal").eqNullSafe(F.col("o_totalprice")).alias("null_safe_eq"),
        F.when(F.col("o_orderkey").isNull(), 0).otherwise(1).alias("has_order"),
    )


def _collection_oracle() -> str:
    from hailstorm_spark.functions.text import tokens_sql

    toks = tokens_sql("text")
    return f"""
    WITH tok AS (
      SELECT doc_id, {toks} AS toks FROM documents WHERE doc_id <= 300
    )
    SELECT doc_id,
           len(toks) AS n_toks,
           toks[1] AS first_tok,
           toks[len(toks)] AS last_tok,
           array_to_string(list_sort(toks)[1:3], '-') AS sorted_head,
           list_contains(toks, 'the') AS has_the,
           len(list_distinct(toks)) AS n_distinct,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
             AS total_chars,
           len(list_filter(toks, t -> length(t) > 5)) AS n_long
    FROM tok WHERE len(toks) > 0
    """


@register(
    "scalar_collection_funcs",
    oracle=_collection_oracle(),
    tags=("scalar", "collection"),
)
def scalar_collection_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/collection function surface over the token arrays: size,
    1-based element access (Spark and DuckDB agree on 1-based), sort +
    slice + join, membership, distinct, HOF fold/filter. All JVM
    higher-order functions — no shuffle, no Python; the non-empty guard
    keeps element access in-bounds so ANSI mode never throws.
    """
    from hailstorm_spark.functions.text import tokens

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") <= 300)
        .select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") > 0)
    )
    return d.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.element_at("toks", 1).alias("first_tok"),
        F.element_at("toks", F.size("toks")).alias("last_tok"),
        F.array_join(F.slice(F.array_sort("toks"), 1, 3), "-").alias("sorted_head"),
        F.array_contains("toks", "the").alias("has_the"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.aggregate(
            "toks", F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("total_chars"),
        F.size(F.filter("toks", lambda t: F.length(t) > 5)).alias("n_long"),
    )


@register(
    "scalar_map_funcs",
    oracle="""
    WITH entries AS (
      SELECT 'brand' AS key, upper(p_brand) AS value FROM part
      UNION ALL
      SELECT 'type', upper(p_type) FROM part
    )
    SELECT key, value, COUNT(*) AS n
    FROM entries
    WHERE length(value) > 5
    GROUP BY key, value
    """,
    tags=("scalar", "map", "collection"),
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a map from attribute columns
    (create_map), normalize it with the map higher-order functions
    (transform_keys lowercases keys, transform_values uppercases
    values), prune entries with map_filter, and explode the survivors
    to (key, value) rows — all JVM-side HOFs inside one projection, no
    shuffle until the final count.

    The ORACLE deliberately uses no map type at all: because the map is
    built from columns, the same result falls out of a relational
    unpivot (UNION ALL) — two formulations that can only agree if the
    map construction, HOF chain, and explosion preserve exactly the
    column semantics.
    """
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("BRAND"), F.col("p_brand"),
        F.lit("TYPE"), F.col("p_type"),
    )
    m = F.transform_keys(m, lambda k, v: F.lower(k))
    m = F.transform_values(m, lambda k, v: F.upper(v))
    m = F.map_filter(m, lambda k, v: F.length(v) > 5)
    return (
        p.select(F.explode(m).alias("key", "value"))
        .groupBy("key", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "scalar_try_arithmetic",
    oracle="""
    SELECT l_linenumber,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l_linenumber = 1 THEN NULL
                    ELSE CAST(floor(l_extendedprice * 100) AS BIGINT)
                         // (l_linenumber - 1) END) AS BIGINT)
             AS sum_price_per_prior_line,
           TRUE AS overflow_probe_null
    FROM lineitem
    GROUP BY l_linenumber
    """,
    tags=("scalar", "ansi", "null-semantics"),
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe arithmetic via the try_* family: ``try_divide``
    yields NULL on division by zero (here: line 1 divides by
    linenumber−1 = 0) and ``try_multiply`` yields NULL on int64
    overflow, where plain operators either throw (ANSI on) or corrupt
    silently (ANSI off — the wrapped value looks plausible). The
    fail-soft semantics are what a quarantine-don't-crash ingest
    pipeline wants: bad rows become NULLs that the DQ expectations
    operator then counts, instead of one row killing a 100 TB job.

    The oracle expresses the same semantics with explicit CASE guards
    (DuckDB's `/0` and overflow RAISE, so the guards are how an
    ANSI-strict engine spells try_*). `any_overflow` pins that the
    deliberately-huge try_multiply probe really does overflow to NULL
    on every row — FALSE would mean the probe stopped probing.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.expr("cast(floor(l_extendedprice * 100) as bigint)")
    # the ACTUAL try_divide drives the plan: NULL on l_linenumber−1 = 0,
    # which then propagates through floor/sum so the oracle's CASE-gated
    # integer // produces identical values. floor(double quotient)
    # equals the integer floor here because the divisor is tiny (≤ 6):
    # a non-integral true quotient sits ≥ 1/6 from any integer — ulp
    # drift can never cross the boundary — and an integral quotient
    # ≤ 2^53 divides exactly in IEEE.
    per_prior_int = F.floor(
        F.try_divide(cents, F.col("l_linenumber") - 1)
    ).cast("long")
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(per_prior_int).cast("long").alias("sum_price_per_prior_line"),
        )
        # the overflow probe runs on the 7 AGGREGATED rows, not the
        # source: TryEval catches the overflow via a JVM exception per
        # evaluation, and a probe that overflows on every source row
        # measured 8 s at sf0.1 (exception-driven control flow ×600k) —
        # the try_* functions are fail-soft guards for RARE bad rows,
        # not bulk arithmetic, and this query's shape now says so
        .withColumn(
            "overflow_probe_null",
            F.try_multiply(
                F.lit(2**62).cast("long"), (F.col("l_linenumber") + 1).cast("long")
            ).isNull(),
        )
    )
