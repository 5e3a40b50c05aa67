"""Source/sink format coverage as REGISTERED queries: CSV and JSON-lines
round trips driven through the same ingestion helpers production loads
use (hailstorm_spark/io.py: explicit schema, PERMISSIVE mode, corrupt-
record quarantine — never schema inference).

The reference reads exactly one external format — newline-delimited
text (reference src/Hailstorm/InputSource/FileSource.hs) — which this
engine covers as the registered Python DataSource (queries/pysource.py).
These queries extend the source surface to the two tabular interchange
formats every pipeline meets, and PIN the fidelity: each query writes a
real table out, reads it back through the helper, aggregates, and must
hash-match an oracle that never left parquet. A writer/reader that
mangles a value (timestamp format drift, CSV quoting, JSON escaping,
float round-trip) fails the compare.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.functions.hashing import md5_hash60_sql
from hailstorm_spark.io import load_csv, load_json_lines, load_table
from hailstorm_spark.registry import register


@register(
    "io_csv_roundtrip_orders",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_total,
           CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN rejected THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt
    FROM (SELECT *, FALSE AS rejected FROM orders)
    GROUP BY o_orderpriority
    """,
    tags=("io", "csv", "roundtrip"),
)
def io_csv_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV as a first-class source: orders written to headered CSV
    (dates as ISO strings — the timestamp column is cast to DATE at
    export, the portable interchange convention) and re-ingested via
    io.load_csv with an EXPLICIT schema and PERMISSIVE corrupt-record
    quarantine. The rollup must match an oracle computed on the parquet
    that never round-tripped — pinning quoting, header handling, date
    formatting, and double round-trip fidelity (Spark prints doubles as
    the shortest re-parsing representation). The corrupt-record count
    rides along and must be zero: a writer/reader mismatch shows up as
    quarantined rows, not silent nulls.

    Scale: CSV splits by line, so the read parallelizes like any text
    scan; the explicit schema avoids inference's extra full pass. The
    export is per-call plumbing (the amortized part, as with the
    bucketed-layout queries).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )
    path = tempfile.mkdtemp(prefix="hs_csv_orders_")
    # escape='"' on the WRITER too: load_csv reads RFC 4180 (doubled
    # quotes), while Spark's writer default escapes inner quotes with
    # a backslash — the mismatch round-trips 'say "hi"' into
    # '\"say \"hi\"\"' (caught by the hostile-string replay,
    # tests/test_io_replay.py; the benign fixtures never noticed).
    # Raw line breaks inside values are NOT covered by this query by
    # design: single-line CSV cannot carry them without multiLine
    # (which kills split parallelism) — the replay pins that they
    # quarantine loudly instead of mangling silently; JSONL is the
    # interchange format for newline-bearing text.
    o.write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(path)
    back = load_csv(
        spark,
        path,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("sum_total"),
        F.count_distinct("o_orderdate").cast("long").alias("n_days"),
        F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
    )


@register(
    "io_json_roundtrip_documents",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
           CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
           CAST(SUM(CAST((('0x' || substr(md5((CAST(doc_id AS VARCHAR) || ':' || text)), 1, 15))::BIGINT)
                    AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT)
             AS text_digest,
           CAST(0 AS BIGINT) AS n_corrupt
    FROM documents
    GROUP BY lang
    """,
    tags=("io", "json", "roundtrip"),
)
def io_json_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines as a first-class source: the documents table written
    to JSONL and re-ingested via io.load_json_lines (explicit schema,
    PERMISSIVE quarantine). The per-lang digest — the integrity
    module's order-insensitive Merkle formula, sum of per-row
    md5-derived 60-bit hashes mod 2^60 accumulated in decimal(38,0) —
    pins every CHARACTER of every document through JSON string escaping
    and back with O(1) aggregation state per group; the oracle digests
    the parquet originals, so one mangled escape or dropped row breaks
    the hash. Corrupt count must be zero.

    Scale: JSONL splits by line like CSV; schema-on-read with an
    explicit schema keeps the scan single-pass. This closes the tabular
    source matrix: parquet (everywhere), CSV, JSONL, plus the
    line-text Python DataSource — each with a registered, oracle-
    checked query.
    """
    d = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="hs_json_docs_")
    d.write.mode("overwrite").json(path)
    back = load_json_lines(
        spark,
        path,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_n_chars"),
        F.sum(F.length("text")).cast("long").alias("sum_text_len"),
        # order-insensitive digest (sum of per-row 60-bit hashes mod 2^60,
        # decimal-accumulated — the integrity module's Merkle formula):
        # pins every character of every document through JSON escaping
        # with O(1) aggregation state per group; a collect_list-based
        # concat digest would buffer a lang's whole corpus in one
        # aggregation buffer
        (
            F.sum(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("doc_id"), F.col("text"))), 1, 15
                    ),
                    16,
                    10,
                )
                .cast("long")
                .cast("decimal(38,0)")
            )
            % (1 << 60)
        )
        .cast("long")
        .alias("text_digest"),
        F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
    )


#: schema-evolution split day-of-month: files written before the split
#: lack the event_type column (the "v1 era"); files at/after carry it.
EVOLVE_SPLIT_DOM = 16


@register(
    "io_parquet_schema_evolution",
    oracle=f"""
    WITH era AS (
      SELECT CASE WHEN day(CAST(ts AS DATE)) >= {EVOLVE_SPLIT_DOM}
                  THEN event_type END AS event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS x
      FROM events
    )
    SELECT COALESCE(event_type, '__pre_schema__') AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(x) AS BIGINT) AS sum_cents
    FROM era GROUP BY 1
    """,
    tags=("io", "parquet", "schema-evolution"),
)
def io_parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-schema parquet ingestion as a registered query: the events
    table is written out as two ERAS — v1 files (before day
    {EVOLVE_SPLIT_DOM}) lack the event_type column entirely, v2 files
    carry it — then read back through io.load_evolving_parquet
    (per-read mergeSchema + projection to the declared contract), so
    v1 rows surface event_type as typed NULLs. This is the normal
    state of a years-old 100 TB ingest directory, and the invariant
    pinned here is that era-mixing changes NOTHING except the
    honestly-NULL column: counts and cent sums per (coalesced) type
    must match an oracle that simulates the eras on the pristine
    table.

    mergeSchema costs one footer read per file at plan time — the
    reason it is per-read here and never a global default (the
    helper's documented contract).
    """
    import tempfile

    from hailstorm_spark.io import load_evolving_parquet

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    path = tempfile.mkdtemp(prefix="hs_evolve_events_")
    v1 = ev.filter(F.dayofmonth(F.col("ts").cast("date")) < EVOLVE_SPLIT_DOM).drop(
        "event_type"
    )
    v2 = ev.filter(F.dayofmonth(F.col("ts").cast("date")) >= EVOLVE_SPLIT_DOM)
    v1.write.mode("overwrite").parquet(f"{path}/era=v1")
    v2.write.mode("overwrite").parquet(f"{path}/era=v2")
    merged = load_evolving_parquet(
        spark,
        path,
        "event_id bigint, user_id bigint, event_type string,"
        " ts timestamp, x bigint",
    )
    return merged.groupBy(
        F.coalesce("event_type", F.lit("__pre_schema__")).alias("event_type")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("x").cast("long").alias("sum_cents"),
    )


@register(
    "io_orc_roundtrip_lineitem",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_cents,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT) AS n_ship_days
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("io", "orc", "roundtrip"),
)
def io_orc_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as a first-class columnar format beside parquet: lineitem
    (projected to the rollup's columns, prices pre-scaled to integer
    cents so fidelity is binary, not tolerance) written to ORC with an
    explicit schema and read back; the rollup must hash-match an oracle
    that never left parquet. A writer/reader mismatch (timestamp unit
    drift, decimal/double coercion) breaks the integer sums.

    Scale: ORC stripes split like parquet row groups, so the read-back
    parallelizes identically; predicate pushdown and column pruning
    work through the same DataSource V1 scan node. The export is
    per-call plumbing, as with the CSV/JSONL twins — what the query
    PINS is the read path's fidelity.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )
    path = tempfile.mkdtemp(prefix="hs_orc_lineitem_")
    li.write.mode("overwrite").orc(path)
    back = spark.read.schema(
        "l_orderkey bigint, l_returnflag string, price_cents bigint,"
        " qty bigint, ship_day date"
    ).orc(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("price_cents").cast("long").alias("sum_price_cents"),
        F.sum("qty").cast("long").alias("sum_qty"),
        F.count_distinct("ship_day").cast("long").alias("n_ship_days"),
    )


#: compaction target: the rewritten events table must land in at most
#: this many files (the fixture writes 64 shards first — the
#: small-file state a streaming ingest leaves behind)
COMPACT_SMALL_SHARDS = 64
COMPACT_MAX_FILES = 8


@register(
    "io_compaction_small_files",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct_ids,
           TRUE AS files_ok
    FROM events
    """,
    tags=("io", "storage", "roundtrip"),
)
def io_compaction_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance job every streaming
    ingest needs: a directory of {COMPACT_SMALL_SHARDS} tiny shards
    (what per-trigger micro-batch sinks leave behind) is rewritten into
    ≤{COMPACT_MAX_FILES} right-sized files with one repartition, and
    the compacted copy must carry EXACTLY the same rows — count,
    integer cent-sum, and distinct-key cardinality all pinned against
    an oracle on the pristine table, plus a files_ok flag asserting the
    file-count contract actually held on disk.

    Scale: compaction is a pure shuffle-write job — repartition(N)
    where N = ceil(bytes / target_file_size); no aggregation state, so
    it streams at disk bandwidth. Round-robin repartition (no column
    argument) keeps output files size-balanced regardless of key skew —
    the right choice for layout-only rewrites (z-order lives in the
    layout queries when ordering matters).
    """
    import os

    ev = load_table(spark, sf_dir, "events")
    small = tempfile.mkdtemp(prefix="hs_compact_small_")
    compact = tempfile.mkdtemp(prefix="hs_compact_out_")
    ev.repartition(COMPACT_SMALL_SHARDS).write.mode("overwrite").parquet(small)
    spark.read.parquet(small).repartition(COMPACT_MAX_FILES).write.mode(
        "overwrite"
    ).parquet(compact)
    n_files = sum(
        1 for p in os.listdir(compact) if p.endswith(".parquet")
    )
    back = spark.read.parquet(compact)
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.count_distinct("event_id").cast("long").alias("n_distinct_ids"),
        F.lit(n_files <= COMPACT_MAX_FILES).alias("files_ok"),
    )
