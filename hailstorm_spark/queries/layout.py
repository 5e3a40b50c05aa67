"""Data-layout queries: multi-dimensional clustering and zone-map skipping.

At 100 TB, layout is the cheapest query accelerator there is: parquet
files carry per-column min/max (zone maps), and a scan skips any file
whose range can't satisfy the predicate. Skipping quality is decided
entirely by how rows were CLUSTERED at write time. Sorting on one
column gives perfect skipping on that column and none on any other;
interleaving the bits of two columns (Morton / Z-order) gives good
skipping on BOTH — the standard layout trick for fact tables queried by
more than one dimension (the same idea behind Delta's OPTIMIZE ZORDER
and the space-filling-curve literature).

The reference has no storage layer at all (its only persistence is the
snapshot store, reference
src/Hailstorm/SnapshotStore/DirSnapshotStore.hs:21-44), so this module
is pure scale surface: the arithmetic is engine-portable integer bit
interleaving, and the oracle replays it exactly — the measured skipping
ratio is a VALUE the two engines must agree on, not a benchmark
anecdote.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register

#: 16-bit quantization per dimension → 32-bit z-values.
QBITS = 16
QMAX = (1 << QBITS) - 1
#: top-8-bits bucketing → ≤256 zone-mapped "files" per layout.
Z_BUCKET_SHIFT = 24
X_BUCKET_SHIFT = 8
#: the box predicate, in quantized units: the middle 1/8 of each axis.
LOX, HIX = 16384, 24575
LOY, HIY = 16384, 24575


def z_interleave_expr(qx: str, qy: str, dialect: str) -> str:
    """Unrolled 16-bit Morton interleave, identical in both dialects.

    z = Σ_b ((qx>>b)&1)<<2b + ((qy>>b)&1)<<(2b+1): plain integer
    shifts/masks/adds — no aggregate, no lambda, no float — so Spark's
    whole-stage codegen keeps it JVM-side and DuckDB computes the same
    64 terms bit-for-bit.
    """
    terms = []
    for b in range(QBITS):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({qx}, {b}) & 1, {2 * b})")
            terms.append(f"shiftleft(shiftright({qy}, {b}) & 1, {2 * b + 1})")
        else:
            terms.append(f"((({qx} >> {b}) & 1) << {2 * b})")
            terms.append(f"((({qy} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def _zone_map_rollup(base: DataFrame, bucket: F.Column, layout: str) -> DataFrame:
    """Per-bucket zone maps → one summary row for a candidate layout."""
    inbox = (
        (F.col("qx") >= LOX)
        & (F.col("qx") <= HIX)
        & (F.col("qy") >= LOY)
        & (F.col("qy") <= HIY)
    )
    zones = (
        base.groupBy(bucket.alias("bucket"))
        .agg(
            F.min("qx").alias("minqx"),
            F.max("qx").alias("maxqx"),
            F.min("qy").alias("minqy"),
            F.max("qy").alias("maxqy"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(inbox, 1).otherwise(0)).alias("nm"),
        )
    )
    overlap = ~(
        (F.col("maxqx") < LOX)
        | (F.col("minqx") > HIX)
        | (F.col("maxqy") < LOY)
        | (F.col("minqy") > HIY)
    )
    return zones.agg(
        F.lit(layout).alias("layout"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.when(overlap, 1).otherwise(0)).cast("long").alias("n_buckets_scanned"),
        F.sum(F.when(overlap, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_rows_scanned"),
        F.sum("nm").cast("long").alias("n_rows_matching"),
    )


def _oracle() -> str:
    z_sql = z_interleave_expr("qx", "qy", "duckdb")
    rollup = """
      SELECT '{layout}' AS layout,
             CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(SUM(CASE WHEN NOT (maxqx < {lox} OR minqx > {hix}
                             OR maxqy < {loy} OR minqy > {hiy})
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets_scanned,
             CAST(SUM(CASE WHEN NOT (maxqx < {lox} OR minqx > {hix}
                             OR maxqy < {loy} OR minqy > {hiy})
                      THEN n ELSE 0 END) AS BIGINT) AS n_rows_scanned,
             CAST(SUM(nm) AS BIGINT) AS n_rows_matching
      FROM (
        SELECT {bucket} AS bucket,
               MIN(qx) AS minqx, MAX(qx) AS maxqx,
               MIN(qy) AS minqy, MAX(qy) AS maxqy,
               COUNT(*) AS n,
               SUM(CASE WHEN qx BETWEEN {lox} AND {hix}
                         AND qy BETWEEN {loy} AND {hiy}
                    THEN 1 ELSE 0 END) AS nm
        FROM base GROUP BY 1
      )
    """
    common = dict(lox=LOX, hix=HIX, loy=LOY, hiy=HIY)
    return f"""
    WITH stats AS (
      SELECT MIN(o_custkey) AS xmin, MAX(o_custkey) AS xmax,
             MIN(CAST(floor(o_totalprice * 100) AS BIGINT)) AS ymin,
             MAX(CAST(floor(o_totalprice * 100) AS BIGINT)) AS ymax
      FROM orders
    ),
    base AS (
      SELECT ((o_custkey - xmin) * {QMAX}) // GREATEST(xmax - xmin, 1) AS qx,
             ((CAST(floor(o_totalprice * 100) AS BIGINT) - ymin) * {QMAX})
               // GREATEST(ymax - ymin, 1) AS qy
      FROM orders, stats
    )
    {rollup.format(layout="zorder", bucket=f"({z_sql} >> {Z_BUCKET_SHIFT})", **common)}
    UNION ALL
    {rollup.format(layout="linear", bucket=f"(qx >> {X_BUCKET_SHIFT})", **common)}
    """


@register(
    "layout_zorder_zonemap_skipping",
    oracle=_oracle(),
    tags=("layout", "storage", "zorder", "north-star"),
)
def layout_zorder_zonemap_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs linear clustering, judged by zone-map skipping.

    Simulates the write-time layout decision for a fact table queried
    on two independent dimensions (customer, order value): quantize
    both to 16 bits, cluster once by the Morton interleave and once by
    a plain sort on the first dimension, build per-bucket min/max zone
    maps (exactly what parquet footers store per file — the bucket
    groupBy IS the clustering write's range shuffle), and count how
    many buckets/rows a box predicate on BOTH dimensions must scan
    under each layout. Z-order scans a small fraction; the linear
    layout prunes only on its sort key and drags the full y-range of
    every surviving x-bucket. `n_rows_matching` is identical across
    layouts by construction — layout changes IO, never answers.

    At 100 TB the bucket id maps to `repartitionByRange(z)` + per-file
    sort at write time; the box query then reads the surviving files
    only. All arithmetic is integer (quantize → interleave → shift), so
    the oracle replays the layout decision value-for-value.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("cast(floor(o_totalprice * 100) as bigint)").alias("cents"),
    )
    stats = o.agg(
        F.min("o_custkey").alias("xmin"),
        F.max("o_custkey").alias("xmax"),
        F.min("cents").alias("ymin"),
        F.max("cents").alias("ymax"),
    )
    base = (
        o.crossJoin(F.broadcast(stats))
        .select(
            F.expr(
                f"((o_custkey - xmin) * {QMAX}) div greatest(xmax - xmin, 1L)"
            ).alias("qx"),
            F.expr(
                f"((cents - ymin) * {QMAX}) div greatest(ymax - ymin, 1L)"
            ).alias("qy"),
        )
        .withColumn("z", F.expr(z_interleave_expr("qx", "qy", "spark")))
    )
    zorder = _zone_map_rollup(
        base, F.expr(f"shiftright(z, {Z_BUCKET_SHIFT})"), "zorder"
    )
    linear = _zone_map_rollup(
        base, F.expr(f"shiftright(qx, {X_BUCKET_SHIFT})"), "linear"
    )
    return zorder.unionAll(linear)


@register(
    "scan_dynamic_partition_pruning",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE (day(CAST(ts AS DATE)) % 7) = 3
    GROUP BY event_type
    """,
    tags=("layout", "storage", "dpp"),
)
def scan_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is PERSISTED
    hive-partitioned by day, the day-dimension filter lives on the
    broadcast side of the join, and Spark pushes the dim's surviving
    keys into the fact scan AT RUNTIME — the fact reads only the
    matching day directories even though the pruning predicate is not
    known until the dim side executes. At 100 TB this is the difference
    between scanning ~1/7 of the table and scanning all of it whenever
    the filter arrives through a join (the star-schema norm) instead of
    as a literal. tests/test_storage.py pins `dynamicpruning` inside
    the fact scan's partition filters.

    The oracle expresses the identical semantics as a plain predicate
    on raw parquet (dim filter: day-of-month ≡ 3 mod 7 — pure integer,
    no engine dow-numbering drift); layout + join routing must never
    change the answer. The write is the amortized-at-ingest part, as
    with the bucketed-join query.
    """
    import tempfile

    from hailstorm_spark.operators.storage import write_partitioned

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = tempfile.mkdtemp(prefix="hs_dpp_events_")
    write_partitioned(ev, path, by="day")
    fact = spark.read.parquet(path)
    dim = (
        ev.select("day")
        .distinct()
        .filter(F.dayofmonth(F.to_date("day")) % 7 == 3)
    )
    return (
        fact.join(F.broadcast(dim), "day")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
