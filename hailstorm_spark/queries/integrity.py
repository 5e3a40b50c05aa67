"""Data-integrity operators: statistics for the optimizer, digests for
the replicas.

Two concerns every 100 TB deployment hits that never show up in query
benchmarks:

1. **Optimizer statistics.** Join ordering and broadcast decisions ride
   on cardinality estimates; the standard estimator for an equi-join is
   |A ⋈ B| ≈ |A|·|B| / max(ndv_A(k), ndv_B(k)) (uniformity + inclusion
   assumptions — the System-R lineage Spark's CBO implements). Keeping
   the estimator HONEST means continuously scoring it against actuals;
   `stats_join_cardinality_estimate` is that scorecard as a query.

2. **Replica reconciliation.** Two copies of a dataset (DR site,
   migration target, a vendor's re-delivery) must be compared without
   moving either: aggregate each partition to a tiny commutative
   digest, compare digests, and re-sync ONLY diverging partitions — the
   Merkle/anti-entropy pattern (Dynamo-style) expressed relationally.
   Order-insensitivity of the digest is what makes it shuffle-free:
   SUM of per-row hashes is a commutative monoid, so no sort, no
   canonical row order, map-side combine all the way.

The reference has neither concern (single process, no replicas, no
optimizer); both queries are additive surface with exact integer
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.functions.hashing import md5_hash60, md5_hash60_sql
from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register

#: digest modulus: keeps per-partition sums inside int64 at any row
#: count up to ~2^63/2^60 per-term margin; primality is irrelevant —
#: only commutativity + overflow-freedom matter.
DIGEST_MOD = 1 << 60


@register(
    "stats_join_cardinality_estimate",
    oracle="""
    WITH s AS (
      SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
             (SELECT COUNT(*) FROM customer) AS n_customer,
             (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS ndv_o,
             (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS ndv_c,
             (SELECT COUNT(*) FROM orders JOIN customer
               ON o_custkey = c_custkey) AS actual
    )
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(n_customer AS BIGINT) AS n_customer,
           CAST(GREATEST(ndv_o, ndv_c) AS BIGINT) AS ndv_max,
           CAST((n_orders * n_customer) // GREATEST(ndv_o, ndv_c) AS BIGINT)
             AS est_rows,
           CAST(actual AS BIGINT) AS actual_rows,
           CAST((100 * (n_orders * n_customer) // GREATEST(ndv_o, ndv_c))
                 // actual AS BIGINT) AS est_over_actual_pct
    FROM s
    """,
    tags=("stats", "observability", "join"),
)
def stats_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The System-R equi-join cardinality estimator, scored against the
    actual join — the continuous audit that tells you whether CBO-style
    decisions (broadcast thresholds, join order) can be trusted on THIS
    data. est = |O|·|C| / max(ndv), evaluated in exact integer
    arithmetic (exact NDV here; at 100 TB the HLL sketch replaces it
    and this query doubles as the sketch's scorecard). On a key-FK pair
    the estimate should land within rounding of actual
    (est_over_actual_pct ≈ 100); skew or orphaned keys push it off —
    the number to alarm on.

    Shape: two single-pass aggregates + the probe join (one orderkey
    shuffle at scale; counts are map-side combined). Output is one row
    of integers, engine-exact.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    so = o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct("o_custkey").alias("ndv_o"),
    )
    sc = c.agg(
        F.count(F.lit(1)).alias("n_customer"),
        F.count_distinct("c_custkey").alias("ndv_c"),
    )
    actual = (
        o.join(c, o.o_custkey == c.c_custkey)
        .agg(F.count(F.lit(1)).alias("actual"))
    )
    return (
        so.crossJoin(F.broadcast(sc))
        .crossJoin(F.broadcast(actual))
        .select(
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("n_customer").cast("long").alias("n_customer"),
            F.greatest("ndv_o", "ndv_c").cast("long").alias("ndv_max"),
            F.expr(
                "cast((n_orders * n_customer) div greatest(ndv_o, ndv_c) as bigint)"
            ).alias("est_rows"),
            F.col("actual").cast("long").alias("actual_rows"),
            F.expr(
                "cast((100 * ((n_orders * n_customer) div greatest(ndv_o, ndv_c)))"
                " div actual as bigint)"
            ).alias("est_over_actual_pct"),
        )
    )


def _row_digest_spark() -> F.Column:
    """Per-row 60-bit hash over the canonical (event_id, user_id,
    event_type, value-micros) tuple."""
    canon = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
        F.expr("cast(floor(value * 1000000) as bigint)").cast("string"),
    )
    return md5_hash60(canon)


_ROW_DIGEST_SQL = md5_hash60_sql(
    "(CAST(event_id AS VARCHAR) || '|' || CAST(user_id AS VARCHAR) || '|' ||"
    " event_type || '|' || CAST(CAST(floor(value * 1000000) AS BIGINT) AS VARCHAR))"
)


@register(
    "integrity_partition_digest_diff",
    oracle=f"""
    WITH a AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM({_ROW_DIGEST_SQL}) % {DIGEST_MOD} AS BIGINT) AS digest,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    b AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_id % 1000 = 7
                           THEN ({_ROW_DIGEST_SQL} + 1) % {DIGEST_MOD}
                           ELSE {_ROW_DIGEST_SQL} END)
                  % {DIGEST_MOD} AS BIGINT) AS digest,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    )
    SELECT a.day,
           a.n AS n_rows,
           a.digest = b.digest AS replicas_agree
    FROM a JOIN b ON a.day = b.day
    """,
    tags=("integrity", "storage", "observability"),
)
def integrity_partition_digest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style replica reconciliation: reduce each day-partition of
    two replicas to an order-insensitive digest (sum of per-row hashes
    mod 2^60 — a commutative monoid, so map-side combinable with no
    canonical ordering) and diff the digest tables. Diverging days —
    here replica B simulates silent corruption by perturbing the hash
    of every event_id ≡ 7 (mod 1000) — flag FALSE; only those
    partitions would be re-synced. Cross-replica traffic is |days| rows
    of (date, int64, int64) regardless of data size: the anti-entropy
    pattern that makes 100 TB reconciliation a metadata exchange.

    The oracle rebuilds both digest tables from the same md5-portable
    hash family, so the digest VALUES (not just the flags) are pinned
    cross-engine; corruption detection is deterministic because the
    perturbation (+1 on the row hash) can never cancel within a mod-sum
    over distinct positive terms... except with probability ≈ 2^-60 —
    the standard Merkle trade, stated rather than hidden.
    """
    ensure = load_table(spark, sf_dir, "events")
    base = ensure.select(
        F.to_date("ts").alias("day"),
        _row_digest_spark().alias("h"),
        F.col("event_id"),
    )
    # accumulate in decimal(38,0): n rows x 2^60-bit terms overflow an
    # int64 sum (Spark wraps silently, DuckDB widens — they'd disagree)
    a = base.groupBy("day").agg(
        (F.sum(F.col("h").cast("decimal(38,0)")) % DIGEST_MOD)
        .cast("long")
        .alias("digest"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    b = (
        base.withColumn(
            "h2",
            F.when(F.col("event_id") % 1000 == 7, (F.col("h") + 1) % DIGEST_MOD)
            .otherwise(F.col("h")),
        )
        .groupBy("day")
        .agg(
            (F.sum(F.col("h2").cast("decimal(38,0)")) % DIGEST_MOD)
            .cast("long")
            .alias("digest")
        )
    )
    return (
        a.join(b.withColumnRenamed("digest", "digest_b"), "day")
        .select(
            "day",
            F.col("n").alias("n_rows"),
            (F.col("digest") == F.col("digest_b")).alias("replicas_agree"),
        )
    )


@register(
    "stats_equidepth_price_histogram",
    oracle="""
    WITH v AS (
      SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ),
    ranked AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn,
             COUNT(*) OVER () AS n
      FROM v
    )
    SELECT CAST(b AS BIGINT) AS bucket,
           MAX(CASE WHEN rn = (b * n) // 8 THEN cents END) AS upper_cents,
           CAST(COUNT(*) FILTER (WHERE rn > ((b - 1) * n) // 8
                                   AND rn <= (b * n) // 8) AS BIGINT)
             AS n_rows
    FROM ranked, range(1, 9) t(b)
    WHERE rn > ((b - 1) * n) // 8 AND rn <= (b * n) // 8
    GROUP BY b
    """,
    tags=("stats", "observability", "profile"),
)
def stats_equidepth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order value — the optimizer-statistics
    companion to the NDV scorecard above: equi-WIDTH histograms
    (events_value_histogram) misestimate skewed data badly, so real
    CBOs keep equi-depth boundaries (each bucket holds the same row
    count; boundary = the (b·n/8)-th order statistic). Boundaries are
    exact integer order statistics on cents, computed by rank
    arithmetic — rn ∈ ((b−1)·n//8, b·n//8] — so bucket populations and
    upper fences are engine-exact with no interpolation formula to
    disagree on.

    At 100 TB each boundary is one call to the two-phase selection
    operator (operators/selection.py — histogram pass + single-bucket
    rank, no global sort); the one-shot window formulation here is the
    oracle-shaped small-data twin, same trade as the exact-NTILE pair.
    The per-bucket row counts differing by at most 1 is the equi-depth
    invariant — visible directly in the output.
    """
    from pyspark.sql import Window

    v = load_table(spark, sf_dir, "orders").select(
        F.expr("cast(floor(o_totalprice * 100) as bigint)").alias("cents")
    )
    n = v.count()
    w = Window.orderBy("cents")
    ranked = v.withColumn("rn", F.row_number().over(w))
    his = [(b * n) // 8 for b in range(1, 9)]
    bucket_case = "case " + " ".join(
        f"when rn <= {hi} then {b}" for b, hi in enumerate(his, start=1)
    ) + " end"
    fence_case = "case " + " ".join(
        f"when rn = {hi} then cents" for hi in his
    ) + " end"
    # ONE pass over the ranked frame: bucket + fence fall out of rank
    # arithmetic (boundaries are constants once n is known)
    return (
        ranked.groupBy(F.expr(bucket_case).cast("long").alias("bucket"))
        .agg(
            F.max(F.expr(fence_case)).alias("upper_cents"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


@register(
    "integrity_docs_embeddings_referential",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0),
    v AS (SELECT vec_id FROM embeddings WHERE vec_id % 11 <> 0),
    checks AS (
      -- NOT EXISTS, not NOT IN: the Spark side is a left_anti join
      -- (anti-join semantics — a NULL probe key is KEPT, a NULL in the
      -- inner set changes nothing), and NOT IN is null-aware (one NULL
      -- inner row collapses the whole result to zero). The fixture ids
      -- are non-null today, but the oracle must pin the INTENT so a
      -- nullable-id fixture can't silently diverge the engines.
      SELECT 'doc_missing_embedding' AS check_name,
             (SELECT COUNT(*) FROM d
              WHERE NOT EXISTS (SELECT 1 FROM v WHERE v.vec_id = d.doc_id))
               AS n_bad,
             (SELECT COUNT(*) FROM d) AS n_total
      UNION ALL
      SELECT 'embedding_missing_doc',
             (SELECT COUNT(*) FROM v
              WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.doc_id = v.vec_id)),
             (SELECT COUNT(*) FROM v)
      UNION ALL
      SELECT 'duplicate_doc_id',
             (SELECT COALESCE(SUM(c - 1), 0) FROM
               (SELECT COUNT(*) AS c FROM d GROUP BY doc_id) t),
             (SELECT COUNT(*) FROM d)
      UNION ALL
      SELECT 'duplicate_vec_id',
             (SELECT COALESCE(SUM(c - 1), 0) FROM
               (SELECT COUNT(*) AS c FROM v GROUP BY vec_id) t),
             (SELECT COUNT(*) FROM v)
    )
    SELECT check_name, CAST(n_bad AS BIGINT) AS n_bad,
           CAST(n_total AS BIGINT) AS n_total
    FROM checks
    """,
    tags=("integrity", "dq", "referential"),
)
def integrity_docs_embeddings_referential(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Referential-integrity gate between the corpus and its embedding
    table — the check every multi-stage pipeline needs after any stage
    drops rows: documents the embedding job never covered ("train-blind"
    docs), embeddings whose document was quality-filtered away
    (orphans that would poison ANN serving), and duplicate keys on
    either side (a re-run shard appended instead of overwritten).
    Breakage is PLANTED (docs lose doc_id%7==0 — a simulated quality
    filter; vectors lose vec_id%11==0 — simulated embedding-job
    failures) because the fixture tables are perfectly 1:1 and a
    vacuously-zero gate pins nothing.

    Output: one row per check, (n_bad, n_total) — the shape a CI gate
    thresholds on.

    Scale: each check is one anti-join or self-aggregation on the key
    ONLY (embeddings' vectors and documents' text never move); the
    anti-joins shuffle 8-byte ids, the dup checks are map-side-combined
    counts. The four 1-row aggregates union into a 4-row frame — no
    collect of anything data-sized.
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 != 0)
        .select("doc_id")
    )
    v = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 11 != 0)
        .select("vec_id")
    )

    def one(name: str, bad: DataFrame, total: DataFrame) -> DataFrame:
        return bad.agg(F.count(F.lit(1)).cast("long").alias("n_bad")).crossJoin(
            total.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        ).select(F.lit(name).alias("check_name"), "n_bad", "n_total")

    doc_missing = d.join(v, d.doc_id == v.vec_id, "left_anti")
    vec_orphan = v.join(d, v.vec_id == d.doc_id, "left_anti")
    dup_docs = (
        d.groupBy("doc_id").count().select((F.col("count") - 1).alias("x"))
        .filter(F.col("x") > 0)
    )
    dup_vecs = (
        v.groupBy("vec_id").count().select((F.col("count") - 1).alias("x"))
        .filter(F.col("x") > 0)
    )
    # dup checks SUM the excess copies, not count distinct keys
    def dups(name: str, excess: DataFrame, total: DataFrame) -> DataFrame:
        return excess.agg(
            F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("n_bad")
        ).crossJoin(
            total.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        ).select(F.lit(name).alias("check_name"), "n_bad", "n_total")

    return (
        one("doc_missing_embedding", doc_missing, d)
        .unionByName(one("embedding_missing_doc", vec_orphan, v))
        .unionByName(dups("duplicate_doc_id", dup_docs, d))
        .unionByName(dups("duplicate_vec_id", dup_vecs, v))
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "profile_numeric_columns_lineitem",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT({c}) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           MIN({c}) AS min_v,
           MAX({c}) AS max_v,
           CAST(SUM(CAST({c} AS DECIMAL(14,2))) AS DOUBLE) AS sum_v
    FROM lineitem
    """
        for c in _PROFILE_COLS
    ),
    tags=("integrity", "dq", "profiling"),
)
def profile_numeric_columns_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the Deequ/describe-style stats table every
    ingestion pipeline publishes next to its data: per column, non-null
    count, null count, exact distinct count, min/max, and the exact
    decimal sum (surfaced as double). One row per profiled column — the
    shape monitoring dashboards and schema-drift alerts consume.

    Shape: MELT the profiled columns to (column_name, v) with stack()
    at the scan, then ONE small groupBy — a single table scan, a
    4×-row Generate consumed immediately by the map-side partial
    aggregate, and one shuffle of the distinct (column_name, v) pairs.
    The alternative — a 24-function mixed-distinct aggregate over the
    wide row — also expands (factor #cols+1 = 5 > the melt's 4 for its
    distinct rewrite) AND costs the planner seconds of analysis/codegen
    per call (measured 3.5 s vs 1.5–2 s end-to-end at sf0.1; the
    round-8 k-means lesson again: driver-side plan construction is a
    hot path). Exact NDV is the expensive metric at 100 TB by nature;
    the monitoring dial is approx_count_distinct in the same melted
    pass. Melting requires a shared value type — these four columns
    are all DOUBLE; mixed-type profiles go per-type or cast to a
    canonical string for the min/max leg.
    """
    from hailstorm_spark.functions.decimal import money

    li = load_table(spark, sf_dir, "lineitem")
    stack_args = ", ".join(f"'{c}', {c}" for c in _PROFILE_COLS)
    melted = li.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (column_name, v)"
    )
    return melted.groupBy("column_name").agg(
        F.count("v").alias("n"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_null"),
        F.count_distinct(F.col("v")).alias("n_distinct"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.sum(money(F.col("v"))).cast("double").alias("sum_v"),
    )


_KANON_K = 5
_KANON_BAND = 500  # quasi-identifier value band width, in cents


#: shared by the batch gate and its streaming monitor twin
#: (queries/streaming_queries.py::streaming_k_anonymity_monitor):
#: QI group sizes are pure counts, so the drained state must equal
#: this one-shot computation.
_KANON_ORACLE = f"""
    WITH g AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             TRY_CAST(floor(TRY_CAST(round(value * 100) AS BIGINT)
                            / {_KANON_BAND}.0) AS BIGINT) AS band,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_k,
           CAST(SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(n) AS BIGINT) AS min_group_size
    FROM g GROUP BY day
    """


@register(
    "privacy_k_anonymity_gate",
    oracle=_KANON_ORACLE,
    tags=("integrity", "dq", "privacy"),
)
def privacy_k_anonymity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk accounting — the privacy gate a dataset
    release runs BESIDE PII detection (which the corpus family covers):
    PII scrubbing removes direct identifiers, but a row remains
    re-identifiable when its QUASI-identifier combination — here
    (day, event_type, value band) — is shared by fewer than k rows.
    Per day: how many QI groups exist, how many fall below k={_KANON_K},
    how many rows sit in them (the release-blocking number), and the
    smallest group (the headline risk). A real release pipeline
    thresholds on rows_at_risk == 0 or generalizes the QI bands until
    it is.

    Value banding uses floor(cents / {_KANON_BAND}) via a DOUBLE floor —
    portable on negatives where integer division truncates toward zero
    differently per engine — and try_cast so a non-finite value
    becomes the NULL band (its own QI group in BOTH engines' GROUP BY)
    instead of faulting the scan under ANSI.

    Scale: one scan, two stacked aggregations with map-side combine;
    the exchange carries (day, type, band) triplets — no identifiers,
    no text; output is |days| rows. The QI group-size histogram is the
    same shape a generalization loop would iterate on.
    """
    g = (
        load_table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            "event_type",
            F.expr(
                f"try_cast(floor(try_cast(round(value * 100) as bigint)"
                f" / {_KANON_BAND}.0) as bigint)"
            ).alias("band"),
        )
        .groupBy("day", "event_type", "band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    below = F.col("n") < _KANON_K
    return g.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(below.cast("long")).alias("n_below_k"),
        F.sum(F.when(below, F.col("n")).otherwise(F.lit(0))).cast("long").alias(
            "rows_at_risk"
        ),
        F.min("n").cast("long").alias("min_group_size"),
    )


_KANON_LADDER = (500, 1000, 2000, 4000, 8000)  # candidate band widths, cents


@register(
    "privacy_generalization_ladder",
    oracle=f"""
    WITH base AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             TRY_CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    lad AS (
      SELECT base.*, t.w FROM base,
        (VALUES {", ".join(f"({w})" for w in _KANON_LADDER)}) AS t(w)
    ),
    g AS (
      SELECT w, day, event_type,
             TRY_CAST(floor(cents / CAST(w AS DOUBLE)) AS BIGINT) AS band,
             COUNT(*) AS n
      FROM lad GROUP BY 1, 2, 3, 4
    )
    SELECT CAST(w AS BIGINT) AS band_width,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) = 0 AS sufficient
    FROM g GROUP BY w
    """,
    tags=("integrity", "dq", "privacy"),
)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generalization LOOP behind the k-anonymity gate, evaluated
    in one pass: instead of iterating scan-per-width until
    rows_at_risk reaches 0, every candidate band width of the ladder
    is scored simultaneously — the release pipeline then picks the
    narrowest `sufficient` width (maximum utility at zero risk), or
    learns that even the coarsest band leaks and a different QI must
    generalize. The QI and k match privacy_k_anonymity_gate; this is
    its planning companion.

    Scale: the ladder rides one Expand (explode of a {len(_KANON_LADDER)}-literal
    array) — scan rows multiply by |ladder| BEFORE the map-side
    combine, the standard grouping-sets trade, and the exchange still
    carries only (width, day, type, band) quadruplets. Two stacked
    aggregations, |ladder| output rows. An iterative implementation
    would re-scan per width; this is |ladder|× cheaper in IO at
    100 TB where the scan dominates.
    """
    base = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.expr("try_cast(round(value * 100) as bigint)").alias("cents"),
    )
    lad = base.select(
        "*",
        F.explode(F.array(*[F.lit(w) for w in _KANON_LADDER])).alias("w"),
    )
    g = (
        lad.withColumn(
            "band",
            F.expr("try_cast(floor(cents / cast(w as double)) as bigint)"),
        )
        .groupBy("w", "day", "event_type", "band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    risk = F.sum(F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(F.lit(0)))
    return g.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        risk.cast("long").alias("rows_at_risk"),
        F.min("n").cast("long").alias("min_group_size"),
        (risk == 0).alias("sufficient"),
    ).select(
        F.col("w").cast("long").alias("band_width"),
        "n_groups",
        "rows_at_risk",
        "min_group_size",
        "sufficient",
    )


#: the generalization LATTICE: every combination of the three QI
#: coarsening dimensions a release pipeline actually trades off.
#: Fineness ranks (0 = finest) drive the Pareto test.
#: width 0 = the value QI fully SUPPRESSED (the top of a real value-
#: generalization hierarchy — without it no lattice point is
#: sufficient on a long-tailed value column and the frontier is empty)
_LAT_W = ((500, 0), (2000, 1), (8000, 2), (0, 3))  # cents; 0 = suppressed
_LAT_T = (("day", 0), ("week", 1), ("month", 2))  # time granularity
_LAT_E = (("type", 0), ("class", 1), ("any", 2))  # event-type coarsening

_LAT_CLASS_SQL = (
    "CASE WHEN event_type IN ('click','view') THEN 'passive' "
    "WHEN event_type IN ('purchase','signup') THEN 'active' "
    "ELSE 'system' END"
)

_LAT_COMBOS = [
    (w, wr, tg, tr, eg, er)
    for (w, wr) in _LAT_W
    for (tg, tr) in _LAT_T
    for (eg, er) in _LAT_E
]


@register(
    "privacy_generalization_lattice",
    oracle=f"""
    WITH base AS (
      SELECT ts, event_type,
             TRY_CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    combos(w, wr, tg, tr, eg, er) AS (VALUES
      {", ".join(f"({w},{wr},'{tg}',{tr},'{eg}',{er})" for (w, wr, tg, tr, eg, er) in _LAT_COMBOS)}
    ),
    g AS (
      SELECT c.w, c.wr, c.tg, c.tr, c.eg, c.er,
             CASE c.tg
               WHEN 'day' THEN CAST(CAST(b.ts AS DATE) AS VARCHAR)
               WHEN 'week' THEN
                 CAST(CAST(date_trunc('week', b.ts) AS DATE) AS VARCHAR)
               ELSE CAST(CAST(date_trunc('month', b.ts) AS DATE) AS VARCHAR)
             END AS tkey,
             CASE c.eg
               WHEN 'type' THEN b.event_type
               WHEN 'class' THEN {_LAT_CLASS_SQL}
               ELSE 'any' END AS ekey,
             CASE WHEN c.w = 0 THEN 0
                  ELSE TRY_CAST(floor(b.cents / CAST(c.w AS DOUBLE)) AS BIGINT)
             END AS band,
             COUNT(*) AS n
      FROM base b, combos c
      GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9
    ),
    s AS (
      SELECT w, wr, tg, tr, eg, er,
             COUNT(*) AS n_groups,
             SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) AS rows_at_risk,
             MIN(n) AS min_group_size,
             SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) = 0 AS sufficient
      FROM g GROUP BY 1, 2, 3, 4, 5, 6
    )
    SELECT CAST(s.w AS BIGINT) AS band_width,
           s.tg AS time_gran,
           s.eg AS type_gran,
           CAST(s.n_groups AS BIGINT) AS n_groups,
           CAST(s.rows_at_risk AS BIGINT) AS rows_at_risk,
           CAST(s.min_group_size AS BIGINT) AS min_group_size,
           s.sufficient,
           s.sufficient AND NOT EXISTS (
             SELECT 1 FROM s q
             WHERE q.sufficient
               AND q.wr <= s.wr AND q.tr <= s.tr AND q.er <= s.er
               AND (q.wr < s.wr OR q.tr < s.tr OR q.er < s.er)
           ) AS pareto_minimal
    FROM s
    """,
    tags=("integrity", "dq", "privacy"),
)
def privacy_generalization_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-QI generalization LATTICE: privacy_generalization_
    ladder coarsens ONE quasi-identifier (value band width); a real
    release trades off a small lattice of (value band × time
    granularity × event-type coarsening) combinations — here
    4×3×3 = 36 points, where the top value level (band_width 0)
    SUPPRESSES the value QI entirely — and wants the Pareto-MINIMAL sufficient ones:
    the releases that reach zero rows-at-risk (k = {_KANON_K}) while
    no strictly finer sufficient point exists (maximum utility at zero
    risk, per dominance order). All 36 points are emitted with their
    risk accounting plus `sufficient` and `pareto_minimal` flags; the
    planner reads the minimal frontier, auditors read the rest.

    Scale — the key design decision: the lattice does NOT Expand the
    raw scan ×27. Every lattice cell is an exact COARSENING of the
    finest cell (day × event_type × 500-cent band): wider bands are
    multiples of the base width (floor(floor(c/500)/m) ≡
    floor(c/500m)), week/month truncate the day, class/'any' merge
    types, and NULL bands propagate. So the plan aggregates ONCE at
    the finest granularity (the same exchange the k-anonymity gate
    already pays: (day, type, band) triplets, no identifiers, no
    text) and runs the 36-way Expand over the finest CELLS — at
    100 TB that is |cells| ≪ |rows| expanded rows instead of 36 full
    scans or a 36× scan-row Expand (the ladder's trade, improved).
    The oracle recomputes every point directly from raw rows, so the
    rollup-composition identity is driver-checked, not assumed. The
    Pareto pass is a 36×36 self-join on an aggregate — bounded,
    broadcast, plan-allowlisted.
    """
    base = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        F.date_trunc("month", F.col("ts")).cast("date").alias("mo"),
        "event_type",
        F.expr(
            "try_cast(floor(try_cast(round(value * 100) as bigint) / 500.0)"
            " as bigint)"
        ).alias("b0"),
    )
    cells = base.groupBy("day", "wk", "mo", "event_type", "b0").agg(
        F.count(F.lit(1)).alias("n")
    )
    return _lattice_from_cells(cells)


def _lattice_from_cells(cells: DataFrame) -> DataFrame:
    """The lattice scoring given the finest (day, wk, mo, event_type,
    b0, n) cells — shared by the batch query (cells from one scan) and
    the streaming monitor (cells from standing fold state)."""
    combo_sql = "explode(array(" + ", ".join(
        f"named_struct('w', {w}L, 'wr', {wr}, 'tg', '{tg}', 'tr', {tr},"
        f" 'eg', '{eg}', 'er', {er})"
        for (w, wr, tg, tr, eg, er) in _LAT_COMBOS
    ) + "))"
    lat = cells.select("*", F.expr(combo_sql).alias("c")).select(
        F.col("c.w").alias("w"),
        F.col("c.wr").alias("wr"),
        F.col("c.tg").alias("tg"),
        F.col("c.tr").alias("tr"),
        F.col("c.eg").alias("eg"),
        F.col("c.er").alias("er"),
        F.expr(
            "CASE c.tg WHEN 'day' THEN cast(day as string)"
            " WHEN 'week' THEN cast(wk as string)"
            " ELSE cast(mo as string) END"
        ).alias("tkey"),
        F.expr(
            f"CASE c.eg WHEN 'type' THEN event_type"
            f" WHEN 'class' THEN {_LAT_CLASS_SQL}"
            f" ELSE 'any' END"
        ).alias("ekey"),
        # widths are multiples of the 500-cent base: coarsen the finest
        # band by integer-ratio floor division (exact; NULL propagates)
        F.expr(
            "CASE WHEN c.w = 0 THEN 0L ELSE"
            " try_cast(floor(b0 / cast(c.w div 500 as double)) as bigint) END"
        ).alias("band"),
        "n",
    )
    g = lat.groupBy("w", "wr", "tg", "tr", "eg", "er", "tkey", "ekey", "band").agg(
        F.sum("n").alias("n")
    )
    risk = F.sum(F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(F.lit(0)))
    s = g.groupBy("w", "wr", "tg", "tr", "eg", "er").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        risk.cast("long").alias("rows_at_risk"),
        F.min("n").cast("long").alias("min_group_size"),
        (risk == 0).alias("sufficient"),
    )
    finer = (
        s.filter("sufficient")
        .select(
            F.col("wr").alias("qwr"),
            F.col("tr").alias("qtr"),
            F.col("er").alias("qer"),
        )
    )
    dom = s.join(
        F.broadcast(finer),
        F.expr(
            "qwr <= wr AND qtr <= tr AND qer <= er"
            " AND (qwr < wr OR qtr < tr OR qer < er)"
        ),
        "left",
    )
    return dom.groupBy(
        "w", "tg", "eg", "n_groups", "rows_at_risk", "min_group_size", "sufficient"
    ).agg(
        (F.col("sufficient") & (F.count("qwr") == 0)).alias("pareto_minimal")
    ).select(
        F.col("w").cast("long").alias("band_width"),
        F.col("tg").alias("time_gran"),
        F.col("eg").alias("type_gran"),
        "n_groups",
        "rows_at_risk",
        "min_group_size",
        "sufficient",
        "pareto_minimal",
    )


# --- l-diversity / t-closeness: beyond group SIZE ---------------------

#: QI for the diversity/closeness gates: (day, value band) — the
#: sensitive attribute is event_type, so it must NOT be part of the QI
#: (k-anonymity's QI triplet includes it; these gates ask a different
#: question about the same release).
_LDIV_L = 3
_TCLOSE_NUM = 1  # t = 1/5 — kept rational so the gate compare is
_TCLOSE_DEN = 5  # integer cross-multiplication, never a float epsilon

_QI_BAND_SQL = (
    f"TRY_CAST(floor(TRY_CAST(round(value * 100) AS BIGINT)"
    f" / {_KANON_BAND}.0) AS BIGINT)"
)


@register(
    "privacy_l_diversity_gate",
    oracle=f"""
    WITH g AS (
      SELECT CAST(ts AS DATE) AS day,
             {_QI_BAND_SQL} AS band,
             COUNT(DISTINCT event_type) AS l_div,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN l_div < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_l,
           CAST(SUM(CASE WHEN l_div < {_LDIV_L} THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(l_div) AS BIGINT) AS min_diversity
    FROM g GROUP BY day
    """,
    tags=("integrity", "dq", "privacy"),
)
def privacy_l_diversity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity — the gate k-anonymity cannot express: a
    QI group can be large (k-safe) yet reveal everyone's sensitive
    value because the group is UNIFORM in it (the classic homogeneity
    attack: all k rows share one diagnosis). Here the QI is (day,
    value band) and the sensitive attribute is event_type: a group is
    l-diverse when it contains >= l = {_LDIV_L} distinct sensitive
    values, and the per-day report counts groups below l, the rows in
    them (the release-blocking number), and the worst group's
    diversity. Machado-et-al-style sensitive-attribute gates run
    EXACTLY this beside the k gate; a release passes when both are
    clean — size alone is k's job, spread within the size is this one's.

    Banding/NULL semantics are shared with the k gate (double floor,
    try_cast → NULL band is its own QI group in both engines).

    Scale: one scan into a (day, band, event_type)-keyed map-side-
    combined aggregation, then two cheap rollups; the exchange carries
    QI pairs + a small distinct-count state (|sensitive| is 5 here;
    for high-cardinality sensitive attributes swap count_distinct for
    the portable-HLL registers and gate on the sketch's lower bound).
    Output |days| rows.
    """
    cells = (
        load_table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            F.expr(_QI_BAND_SQL).alias("band"),
            "event_type",
        )
        .groupBy("day", "band", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _l_diversity_from_cells(cells)


def _l_diversity_from_cells(cells: DataFrame) -> DataFrame:
    """The l-diversity readout given (day, band, event_type, n)
    sensitive cells — shared by the batch gate (cells from one
    map-side-combined scan) and the streaming monitor (cells from
    standing fold state): l_div per QI group is simply the COUNT of
    its cells."""
    g = cells.groupBy("day", "band").agg(
        F.count(F.lit(1)).alias("l_div"),
        F.sum("n").alias("n"),
    )
    below = F.col("l_div") < _LDIV_L
    return g.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(below.cast("long")).alias("n_below_l"),
        F.sum(F.when(below, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("l_div").cast("long").alias("min_diversity"),
    )


@register(
    "privacy_t_closeness_gate",
    oracle=f"""
    WITH base AS (
      SELECT CAST(ts AS DATE) AS day,
             {_QI_BAND_SQL} AS band,
             event_type
      FROM events
    ),
    gl AS (SELECT event_type, COUNT(*) AS gcnt FROM base GROUP BY 1),
    -- tot_n, not "N": identifier resolution is case-insensitive in
    -- BOTH engines, so "N" would silently collapse onto the per-group
    -- "n" (caught live: the first draft divided by 2n^2)
    tot AS (SELECT SUM(gcnt) AS tot_n FROM gl),
    grp AS (SELECT day, band, COUNT(*) AS n FROM base GROUP BY 1, 2),
    gt AS (
      SELECT day, band, event_type, COUNT(*) AS cnt FROM base GROUP BY 1, 2, 3
    ),
    grid AS (
      SELECT grp.day, grp.band, grp.n, gl.event_type, gl.gcnt, tot.tot_n
      FROM grp CROSS JOIN gl CROSS JOIN tot
    ),
    pg AS (
      SELECT grid.day, grid.band, grid.n, grid.tot_n,
             SUM(abs(COALESCE(gt.cnt, 0) * grid.tot_n - grid.gcnt * grid.n))
               AS num
      FROM grid LEFT JOIN gt
        ON grid.day = gt.day
       AND grid.band IS NOT DISTINCT FROM gt.band
       AND grid.event_type = gt.event_type
      GROUP BY 1, 2, 3, 4
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN {_TCLOSE_DEN} * num
                              > {2 * _TCLOSE_NUM} * n * tot_n
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_exceeding_t,
           CAST(SUM(CASE WHEN {_TCLOSE_DEN} * num
                              > {2 * _TCLOSE_NUM} * n * tot_n
                         THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
           MAX(CAST(num AS DOUBLE) / (2.0 * n * tot_n)) AS max_tvd
    FROM pg GROUP BY day
    """,
    tags=("integrity", "dq", "privacy"),
)
def privacy_t_closeness_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness — the gate l-diversity cannot express: a QI group
    can contain many distinct sensitive values (l-safe) yet still leak
    because its DISTRIBUTION over them is far from the corpus-wide one
    (the skewness attack: 3 distinct values, but 98% of the group is
    'error' while the population is 2%). Per QI group — (day, value
    band), sensitive = event_type, matching the l gate — the distance
    between the group's sensitive distribution and the GLOBAL one is
    total-variation distance TVD = ½·Σ_v |p_v − q_v|; groups with
    TVD > t = {_TCLOSE_NUM}/{_TCLOSE_DEN} fail. (Li et al.'s
    t-closeness prescribes EMD; for an unordered categorical sensitive
    attribute EMD under the discrete metric IS total variation, so
    this is the exact published gate for this attribute class, not an
    approximation.)

    Exactness discipline: TVD compares two RATIOS per value —
    cnt/n vs gcnt/N. Everything is kept integer until the very end:
    per group, num = Σ_v |cnt_v·N − gcnt_v·n| (an int64: bounded by
    2·n·N ≤ 2·N² — fine to N ~ 2·10^9 rows; past that the decimal(38,0)
    widening rides exactly as in embedding_dispersion_wide), the gate
    compare is the integer cross-multiplication {_TCLOSE_DEN}·num >
    2·{_TCLOSE_NUM}·n·N (no float epsilon can flip a verdict), and the
    published max_tvd is ONE double division of exact integers per
    group (bit-identical across engines — no float summation anywhere).
    Values absent from a group contribute |0·N − gcnt·n| via the
    grid's left join, so the distance is over the full support, not
    just observed values.

    Scale: the sensitive support is a broadcast (|types| rows; a
    high-cardinality sensitive attribute would bound the support to
    top-M + OTHER first); the grid is |groups|·|types| rows — group-
    bounded, never row-bounded; one scan feeds all three aggregations.
    NULL band rides IS NOT DISTINCT FROM / null-safe equality so the
    NULL QI group gets its distance too.
    """
    cells = (
        load_table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            F.expr(_QI_BAND_SQL).alias("band"),
            "event_type",
        )
        .groupBy("day", "band", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return _t_closeness_from_cells(cells)


def _t_closeness_from_cells(gt: DataFrame) -> DataFrame:
    """The categorical t-closeness readout given (day, band,
    event_type, cnt) sensitive cells — shared by the batch gate and
    the streaming monitor. Every distribution in the gate (global
    per-type, per-group totals) is a rollup of these cells."""
    glob = gt.groupBy("event_type").agg(F.sum("cnt").alias("gcnt"))
    # "tot_n", not "N": Spark resolution is case-insensitive by
    # default, so "N" would be AMBIGUOUS against the per-group "n"
    tot = glob.agg(F.sum("gcnt").alias("tot_n"))
    grp = gt.groupBy("day", "band").agg(F.sum("cnt").alias("n"))
    grid = grp.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(tot))
    pg = (
        grid.join(
            gt.withColumnsRenamed(
                {"day": "g_day", "band": "g_band", "event_type": "g_type"}
            ),
            (F.col("day") == F.col("g_day"))
            & F.col("band").eqNullSafe(F.col("g_band"))
            & (F.col("event_type") == F.col("g_type")),
            "left",
        )
        .groupBy("day", "band", "n", "tot_n")
        .agg(
            F.sum(
                F.abs(
                    F.coalesce(F.col("cnt"), F.lit(0)) * F.col("tot_n")
                    - F.col("gcnt") * F.col("n")
                )
            ).alias("num")
        )
    )
    exceeds = (
        F.lit(_TCLOSE_DEN) * F.col("num")
        > F.lit(2 * _TCLOSE_NUM) * F.col("n") * F.col("tot_n")
    )
    return pg.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(exceeds.cast("long")).alias("n_exceeding_t"),
        F.sum(F.when(exceeds, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_at_risk"),
        F.max(
            F.col("num").cast("double")
            / (F.lit(2.0) * F.col("n") * F.col("tot_n"))
        ).alias("max_tvd"),
    )


# --- differentially-private release: the mechanism after the gates ----

#: ε = 1/2 for the whole release (parallel composition: the (day, type)
#: cells PARTITION the events — each row contributes to exactly one
#: cell — so releasing every cell costs max over cells, not the sum).
_DP_EPS_NUM = 1
_DP_EPS_DEN = 2
_DP_K = 48  # noise truncation: residual mass < 1e-10, folded into +K
_DP_SCALE = 1 << 60


def _dp_thresholds() -> list[tuple[int, int]]:
    """Inverse-CDF thresholds of the two-sided geometric (discrete
    Laplace) distribution P(k) ∝ α^|k|, α = e^−ε, truncated to
    [−K, K] and scaled to the 60-bit uniform's domain. Computed ONCE
    in the driver and embedded as identical integer literals in both
    engines' expressions — the sampling is pure integer comparison at
    execution time, no log/exp in any engine, so no libm divergence
    can break parity."""
    import math

    eps = _DP_EPS_NUM / _DP_EPS_DEN
    alpha = math.exp(-eps)
    p0 = (1 - alpha) / (1 + alpha)
    out: list[tuple[int, int]] = []
    cum = 0.0
    for k in range(-_DP_K, _DP_K + 1):
        cum += p0 * alpha ** abs(k)
        out.append((k, min(int(cum * _DP_SCALE), _DP_SCALE)))
    out[-1] = (_DP_K, _DP_SCALE)  # fold the truncated tail into +K
    return out


_DP_T = _dp_thresholds()


def _dp_noise_case(u_expr: str) -> str:
    """Engine-portable CASE ladder mapping a uniform 60-bit integer to
    a discrete-Laplace noise draw via the precomputed thresholds."""
    arms = " ".join(f"WHEN {u_expr} < {t} THEN ({k})" for k, t in _DP_T[:-1])
    return f"(CASE {arms} ELSE {_DP_T[-1][0]} END)"


_DP_U_SQL = md5_hash60_sql(
    "('dp|' || CAST(day AS VARCHAR) || '|' || event_type)"
)


@register(
    "privacy_dp_noised_release",
    oracle=f"""
    WITH c AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT day, event_type, n, {_DP_U_SQL} AS useed FROM c
    )
    SELECT day, event_type,
           CAST(n + {_dp_noise_case('useed')} AS BIGINT) AS noised_count,
           CAST({_DP_EPS_NUM} AS DOUBLE) / {_DP_EPS_DEN} AS epsilon
    FROM u
    """,
    tags=("integrity", "dq", "privacy"),
)
def privacy_dp_noised_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release MECHANISM after the gates: k-anonymity/l-diversity/
    t-closeness decide whether a cut is safe to publish; differential
    privacy publishes a noised version with a provable bound
    regardless. Per (day, event_type) cell the count is released with
    two-sided-geometric noise (the discrete Laplace mechanism —
    Ghosh/Roughgarden/Sundararajan's universally optimal mechanism for
    counts) at ε = {_DP_EPS_NUM}/{_DP_EPS_DEN}, sensitivity 1
    (add/remove one event moves one cell by one). The ε ledger is
    parallel composition: the cells partition the table, so the WHOLE
    release costs ε, not |cells|·ε — the composition fact a release
    pipeline's budget accountant relies on; sequential re-releases
    would add.

    Determinism discipline (the testable-mechanism trade, stated
    plainly): the noise draw is seeded from the repo's portable 60-bit
    md5 hash of the cell key, so both engines draw the IDENTICAL noise
    and the driver can pin the release end-to-end. A production
    release swaps the seed for fresh randomness — everything else
    (thresholds, truncation, ledger) is the shipped mechanism. A
    keyed-hash seed is NOT private randomness: an adversary knowing
    the key recovers the noise exactly; this registration is the
    mechanism's plumbing under test, not a privacy proof. Sampling is
    inverse-CDF over driver-precomputed integer thresholds
    (truncation [-{_DP_K}, {_DP_K}], residual mass < 1e-10 folded into
    +{_DP_K}) — pure integer comparisons at execution time in BOTH
    engines, no log/exp, so libm differences cannot break parity.

    Scale: one map-side-combined aggregation (the exchange carries
    (day, type) pairs), then row-local hashing + a literal CASE ladder
    — whole-stage-codegen'd, no UDF, |cells| output rows.
    """
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    u = c.withColumn(
        "useed",
        md5_hash60(
            F.concat(
                F.lit("dp|"),
                F.col("day").cast("string"),
                F.lit("|"),
                F.col("event_type"),
            )
        ),
    )
    return u.select(
        "day",
        "event_type",
        (F.col("n") + F.expr(_dp_noise_case("useed"))).cast("long").alias(
            "noised_count"
        ),
        (F.lit(_DP_EPS_NUM).cast("double") / F.lit(_DP_EPS_DEN)).alias(
            "epsilon"
        ),
    )


@register(
    "privacy_t_closeness_ordered",
    oracle=f"""
    WITH base AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             {_QI_BAND_SQL} AS band
      FROM events
    ),
    ok AS (SELECT * FROM base WHERE band IS NOT NULL),
    gl AS (SELECT band, COUNT(*) AS gcnt FROM ok GROUP BY 1),
    tot AS (SELECT SUM(gcnt) AS tot_n, COUNT(*) AS m FROM gl),
    grp AS (SELECT day, event_type, COUNT(*) AS n FROM ok GROUP BY 1, 2),
    gt AS (
      SELECT day, event_type, band, COUNT(*) AS cnt FROM ok GROUP BY 1, 2, 3
    ),
    grid AS (
      SELECT grp.day, grp.event_type, grp.n, gl.band, gl.gcnt,
             tot.tot_n, tot.m
      FROM grp CROSS JOIN gl CROSS JOIN tot
    ),
    r AS (
      SELECT grid.day, grid.event_type, grid.n, grid.tot_n, grid.m,
             SUM(COALESCE(gt.cnt, 0) * grid.tot_n - grid.gcnt * grid.n)
               OVER (PARTITION BY grid.day, grid.event_type
                     ORDER BY grid.band
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM grid LEFT JOIN gt
        ON grid.day = gt.day AND grid.event_type = gt.event_type
       AND grid.band = gt.band
    ),
    pg AS (
      SELECT day, event_type, n, tot_n, m, SUM(abs(cum)) AS emd_num
      FROM r GROUP BY 1, 2, 3, 4, 5
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN {_TCLOSE_DEN} * emd_num
                              > {_TCLOSE_NUM} * (m - 1) * n * tot_n
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_exceeding_t,
           CAST(SUM(CASE WHEN {_TCLOSE_DEN} * emd_num
                              > {_TCLOSE_NUM} * (m - 1) * n * tot_n
                         THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
           MAX(CAST(emd_num AS DOUBLE)
               / NULLIF(CAST(m - 1 AS DOUBLE) * n * tot_n, 0.0))
             AS max_emd
    FROM pg GROUP BY day
    """,
    tags=("integrity", "dq", "privacy"),
)
def privacy_t_closeness_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness for an ORDERED sensitive attribute — the other half
    of Li et al.'s definition: for ordered values (here the value band
    itself is sensitive; QI = (day, event_type)), distance must be
    earth-mover's under the ordered metric, because total variation
    calls "all mass one band off" and "all mass at the far end"
    equally distant when the second is catastrophically more
    revealing. For ordered categories EMD has the closed form
    (1/(m−1))·Σ_i |Σ_{j≤i}(p_j − q_j)| — a cumulative sum over the
    band order, which is ONE window per group over the bounded
    group×band grid, not an optimization problem.

    Exactness: same common-denominator discipline as the categorical
    gate — cum_i = Σ_{j≤i}(cnt_j·N − gcnt_j·n) is an integer (int64 to
    m·n·N ~ 10^18; the decimal widening rides past it), emd_num =
    Σ|cum_i| is an integer, the verdict is the integer
    cross-multiplication {_TCLOSE_DEN}·emd_num >
    {_TCLOSE_NUM}·(m−1)·n·N, and max_emd is one double division of
    exact integers. Non-finite values (NULL band) have no position in
    the order and are EXCLUDED here — the categorical gate
    (privacy_t_closeness_gate) covers them as their own class; a
    release runs both.

    Scale: the grid is |groups|·|bands| rows (bands bounded by the
    banding width choice — the generalization ladder controls it);
    the cumulative window partitions by group (bounded partitions,
    never a global sort); the band support broadcasts.
    """
    base = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.expr(_QI_BAND_SQL).alias("band"),
    )
    ok = base.filter(F.col("band").isNotNull())
    gl = ok.groupBy("band").agg(F.count(F.lit(1)).alias("gcnt"))
    tot = gl.agg(
        F.sum("gcnt").alias("tot_n"), F.count(F.lit(1)).alias("m")
    )
    grp = ok.groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("n"))
    gt = ok.groupBy("day", "event_type", "band").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    grid = grp.crossJoin(F.broadcast(gl)).crossJoin(F.broadcast(tot))
    from pyspark.sql.window import Window

    joined = grid.join(
        gt.withColumnsRenamed(
            {"day": "g_day", "event_type": "g_type", "band": "g_band"}
        ),
        (F.col("day") == F.col("g_day"))
        & (F.col("event_type") == F.col("g_type"))
        & (F.col("band") == F.col("g_band")),
        "left",
    )
    w = (
        Window.partitionBy("day", "event_type")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = joined.select(
        "day",
        "event_type",
        "n",
        "tot_n",
        "m",
        F.sum(
            F.coalesce(F.col("cnt"), F.lit(0)) * F.col("tot_n")
            - F.col("gcnt") * F.col("n")
        )
        .over(w)
        .alias("cum"),
    )
    pg = r.groupBy("day", "event_type", "n", "tot_n", "m").agg(
        F.sum(F.abs(F.col("cum"))).alias("emd_num")
    )
    exceeds = (
        F.lit(_TCLOSE_DEN) * F.col("emd_num")
        > F.lit(_TCLOSE_NUM) * (F.col("m") - 1) * F.col("n") * F.col("tot_n")
    )
    return pg.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(exceeds.cast("long")).alias("n_exceeding_t"),
        F.sum(F.when(exceeds, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_at_risk"),
        # ADVICE r11 (low): with a single non-NULL band (m = 1) the
        # normalizer (m-1)·n·tot_n is 0 and the division is 0/0 —
        # Spark (non-ANSI) returns NULL while DuckDB's IEEE doubles
        # return NaN, a latent cross-engine parity break on a
        # degenerate input the fixture never produces. Guard the
        # division so BOTH engines emit NULL (oracle: NULLIF) — a
        # one-band corpus has no ordered-EMD distance to report.
        F.max(
            F.when(
                F.col("m") > 1,
                F.col("emd_num").cast("double")
                / ((F.col("m") - 1).cast("double") * F.col("n") * F.col("tot_n")),
            )
        ).alias("max_emd"),
    )
