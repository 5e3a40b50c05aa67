"""Approximate/sketch aggregates with oracle-checkable error bounds.

Sketches are the 100 TB workhorses: HyperLogLog for distinct counts,
t-digest-style quantiles, mergeable partial sketches for rollups. Their
estimates can't be reproduced by a different engine, so each query here
returns only (a) exactly-reproducible columns and (b) BOOLEAN flags
asserting the estimate landed inside its published error bound — the
DuckDB oracle recomputes the exact side and expects TRUE. The sketch
math is still fully exercised (the flag is computed FROM the estimate);
a regression that breaks the sketch flips the boolean and fails the
hash compare.

Spark's estimators are deterministic for a fixed dataset (HLL++ and
percentile_approx carry no RNG), so the flags are stable run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register

HLL_RSD = 0.05


@register(
    "approx_distinct_users_by_type",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS hll_within_bound
    FROM events
    GROUP BY event_type
    """,
    tags=("approx", "aggregate"),
)
def approx_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count vs exact, per event type.

    At 100 TB the exact COUNT(DISTINCT) needs a full shuffle of the
    distinct keys; the HLL sketch is a fixed-size map-side aggregate.
    This query runs both and asserts the estimate sits within 3×rsd of
    truth — the bound the oracle can check without reproducing HLL.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("est"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("est") - F.col("n_exact"))
                <= F.lit(3 * HLL_RSD) * F.col("n_exact")
            ).alias("hll_within_bound"),
        )
    )


@register(
    "approx_median_price_rank_bound",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           TRUE AS median_within_rank_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("approx", "aggregate"),
)
def approx_median_price_rank_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx median vs the exact p40/p60 envelope.

    The Greenwald-Khanna sketch guarantees a RANK error, so the right
    cross-engine check is positional: the approximate median must lie
    between the exact 40th and 60th percentiles. Exact float percentile
    values themselves are interpolation-formula-sensitive and are NOT
    part of the output — only the count and the bound flag.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("med_est"),
            F.expr("percentile(l_extendedprice, 0.4)").alias("p40"),
            F.expr("percentile(l_extendedprice, 0.6)").alias("p60"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            ((F.col("med_est") >= F.col("p40")) & (F.col("med_est") <= F.col("p60"))).alias(
                "median_within_rank_bound"
            ),
        )
    )


@register(
    "sketch_rollup_distinct_users",
    oracle="""
    SELECT COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS merged_close_to_direct,
           TRUE AS merged_within_bound
    FROM events
    """,
    tags=("approx", "aggregate", "rollup"),
)
def sketch_rollup_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day Datasketches HLL sketches,
    unioned into a global estimate — the pattern that lets a 100 TB
    pipeline keep tiny daily aggregates and answer "distinct over any
    date range" without rescanning raw data.

    Two assertions: (1) the merged-daily estimate is within 1% of the
    direct whole-column estimate, and (2) within 5% of the exact count.
    (1) is deliberately NOT exact equality: below the sparse→HLL
    transition (~1.5k distinct) both paths store exact hash coupons and
    agree bit-for-bit, but past it the union's HLL_8 register merge can
    differ from the single sketch's own promotion path by a few counts
    (observed at sf0.1: direct 1494, merged 1488, exact 1500) — the
    mergeability guarantee is on the ERROR BOUND, not the estimate
    identity.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.count_distinct("user_id").alias("n_exact"),
    )
    return direct.join(F.broadcast(merged)).select(
        "n_exact",
        (
            F.abs(F.col("est_merged") - F.col("est_direct"))
            <= F.lit(0.01) * F.col("n_exact")
        ).alias("merged_close_to_direct"),
        (
            F.abs(F.col("est_merged") - F.col("n_exact"))
            <= F.lit(0.05) * F.col("n_exact")
        ).alias("merged_within_bound"),
    )


def _register_countmin() -> None:
    from hailstorm_spark.functions.text import tokens, tokens_sql
    from hailstorm_spark.functions.hashing import md5_hash60

    CM_DEPTH = 3
    CM_WIDTH = 512

    # DuckDB twin of md5_hash60(word, salt=f"cm{j}") % CM_WIDTH with j
    # as a SQL column
    _cell_sql = (
        f"(('0x' || substr(md5('cm' || j || ':' || word), 1, 15))::BIGINT)"
        f" % {CM_WIDTH}"
    )

    @register(
        "sketch_countmin_heavy_hitters",
        oracle=f"""
        WITH words AS (
          SELECT unnest({tokens_sql('text')}) AS word FROM documents
        ),
        wc AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word),
        cells AS (
          SELECT j, {_cell_sql} AS col, CAST(SUM(cnt) AS BIGINT) AS cell
          FROM wc, range({CM_DEPTH}) t(j)
          GROUP BY 1, 2
        ),
        top AS (
          SELECT word, cnt FROM wc
          ORDER BY cnt DESC, word ASC LIMIT 20
        )
        SELECT t.word, CAST(t.cnt AS BIGINT) AS exact_cnt,
               MIN(c.cell) AS est_cnt
        FROM top t, range({CM_DEPTH}) r(rj)
        JOIN cells c ON c.j = r.rj
          AND c.col = {_cell_sql.replace("word", "t.word").replace(" j ", " r.rj ")}
        GROUP BY t.word, t.cnt
        """,
        tags=("approx", "sketch", "topk", "north-star"),
    )
    def sketch_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Count-min sketch heavy hitters, value-checked cell-for-cell:
        the 3×512 counter matrix is built map-side (each word's count
        lands in one cell per row via an independent salted hash), and
        each top-20 word's estimate is the MIN over its three cells —
        the classic CMS point query. Because the hash family is the
        engine-portable md5-derived one, the ORACLE REBUILDS THE ENTIRE
        SKETCH in SQL and the estimates compare exactly — a sketch
        whose internals are pinned, not just its error bound (contrast
        the HLL queries above, where only the bound is checkable).

        Scale: the sketch is a fixed 3·512-cell aggregate regardless of
        corpus size — the state that answers "approximate count of ANY
        word" in O(1) without the full word-count table; mergeable
        across shards by cell-wise addition (same monoid argument as
        the HLL rollup). The exact word-count side exists here only to
        ground the comparison.
        """
        docs = load_table(spark, sf_dir, "documents")
        words = docs.select(F.explode(tokens("text")).alias("word"))
        wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))

        def col_of(word_col):
            return F.array(
                *[
                    md5_hash60(word_col, salt=f"cm{j}") % CM_WIDTH
                    for j in range(CM_DEPTH)
                ]
            )

        cells = (
            wc.select(
                F.posexplode(col_of(F.col("word"))).alias("j", "col"), "cnt"
            )
            .groupBy("j", "col")
            .agg(F.sum("cnt").cast("long").alias("cell"))
        )
        top = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(20)
        probes = top.select(
            "word",
            F.col("cnt").cast("long").alias("exact_cnt"),
            F.posexplode(col_of(F.col("word"))).alias("j", "col"),
        )
        return (
            probes.join(F.broadcast(cells), ["j", "col"])
            .groupBy("word", "exact_cnt")
            .agg(F.min("cell").alias("est_cnt"))
        )


_register_countmin()


def _register_bloom() -> None:
    from hailstorm_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )
    from hailstorm_spark.functions.hashing import md5_hash60_sql

    M_BITS = 256
    K = 2
    BLOCK_MOD = 97  # synthetic blocklist: ~1% of doc_ids

    def _pos_sql(j: int) -> str:
        return f"({md5_hash60_sql('key', salt=f'bf{j}')} % {M_BITS})"

    @register(
        "sketch_bloom_blocklist_prune",
        oracle=f"""
        WITH banned AS (
          SELECT DISTINCT md5(text) AS key FROM documents
          WHERE doc_id % {BLOCK_MOD} = 0
        ),
        bits AS (
          SELECT DISTINCT unnest([{_pos_sql(0)}, {_pos_sql(1)}]) AS pos
          FROM banned
        ),
        probe AS (
          SELECT d.doc_id, md5(d.text) AS key,
                 b.key IS NOT NULL AS member
          FROM documents d
          LEFT JOIN banned b ON md5(d.text) = b.key
        ),
        flags AS (
          SELECT member,
                 {_pos_sql(0)} IN (SELECT pos FROM bits)
                 AND {_pos_sql(1)} IN (SELECT pos FROM bits) AS bloom_pos
          FROM probe
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_pass_bloom,
               CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_true_member,
               CAST(SUM(CASE WHEN bloom_pos AND NOT member THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_false_pos,
               BOOL_AND(bloom_pos OR NOT member) AS no_false_negatives
        FROM flags
        """,
        tags=("approx", "sketch", "bloom", "dedup"),
    )
    def sketch_bloom_blocklist_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Blocklist pruning via an explicit portable Bloom filter, with
        exact false-positive accounting.

        The 100 TB problem: remove every document whose content digest
        is on a banned list (opt-outs, eval-contamination) WITHOUT
        shuffling the corpus. The filter is built from the banned side
        only (a bounded m/32-word collect — the filter's value IS the
        product), then applied as a pure map-side predicate on the
        corpus scan; the exact join that confirms membership afterwards
        touches only the Bloom-positive sliver. The filter is
        deliberately undersized here (256 bits for ~a hundred keys) so
        false positives actually occur and the accounting path is
        exercised — the oracle REBUILDS the same filter bit-for-bit
        from the same md5 hash family, so n_false_pos compares exactly,
        and no_false_negatives pins the structural guarantee.

        Replaces the reference's only membership structure, the
        per-bolt in-memory Map (reference
        src/Hailstorm/Processor/Downstream.hs:61-88), with state that
        ships to every executor instead of partitioning the stream.
        """
        docs = load_table(spark, sf_dir, "documents")
        banned = (
            docs.filter(F.col("doc_id") % BLOCK_MOD == 0)
            .select(F.md5("text").alias("key"))
            .distinct()
        )
        packed = bloom_build(banned, F.col("key"), M_BITS, K)
        probe = docs.select(F.md5("text").alias("key"))
        flagged = probe.join(
            F.broadcast(banned.withColumn("__member", F.lit(True))), "key", "left"
        ).select(
            F.coalesce(F.col("__member"), F.lit(False)).alias("member"),
            bloom_might_contain(F.col("key"), packed, M_BITS, K).alias("bloom_pos"),
        )
        return flagged.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("bloom_pos"), 1).otherwise(0))
            .cast("long")
            .alias("n_pass_bloom"),
            F.sum(F.when(F.col("member"), 1).otherwise(0))
            .cast("long")
            .alias("n_true_member"),
            F.sum(F.when(F.col("bloom_pos") & ~F.col("member"), 1).otherwise(0))
            .cast("long")
            .alias("n_false_pos"),
            F.bool_and(F.col("bloom_pos") | ~F.col("member")).alias(
                "no_false_negatives"
            ),
        )


_register_bloom()


@register(
    "sketch_bitmap_cumulative_users",
    oracle="""
    WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT day,
           CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                 WHERE CAST(e.ts AS DATE) = d.day) AS BIGINT) AS n_users_day,
           CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                 WHERE CAST(e.ts AS DATE) <= d.day) AS BIGINT)
             AS n_users_cumulative
    FROM d
    """,
    tags=("approx", "sketch", "bitmap", "rollup"),
)
def sketch_bitmap_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user rollup via mergeable bitmaps — the
    exact-count sibling of sketch_rollup_distinct_users (HLL). Daily
    per-word bitmaps (word = user_id div 32, one bit per user packed 32
    per signed-64 word) are a commutative monoid under bit-OR: distinct
    users over ANY date range is an OR-merge of the daily partials plus
    a popcount, never a rescan of raw events. Here the merge is a
    running window OR per word ordered by day — cumulative "users seen
    to date", the growth curve every corpus/product dashboard wants —
    followed by a per-day popcount sum. The whole computation is exact,
    so the oracle is plain COUNT(DISTINCT); no error-bound escape
    hatch.

    Scale: partial state is ≤ max_user_id/8 bytes per day (roaring-style
    compression shrinks sparse words in production; ids wider than the
    bit domain first pass through a dictionary rank). The events table
    is scanned ONCE; everything after the first groupBy is arithmetic on
    bitmap words, and the day×word grid that gap-fills missing words for
    the window merge is |days|·|observed words| — microscopic next to
    the input. Replaces the reference's per-key Map state
    (src/Hailstorm/Processor/Downstream.hs:61-88) with fixed-width
    mergeable state.
    """
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.expr("user_id div 32").alias("word"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.expr("cast(user_id % 32 as int)")
        ).alias("bit"),
    )
    partial = e.groupBy("day", "word").agg(F.bit_or("bit").alias("bits"))
    grid = (
        partial.select("day")
        .distinct()
        .crossJoin(partial.select("word").distinct())
    )
    w = (
        Window.partitionBy("word")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.join(partial, ["day", "word"], "left").select(
        "day",
        F.coalesce(F.bit_count("bits"), F.lit(0)).alias("daybits"),
        F.coalesce(F.bit_count(F.bit_or("bits").over(w)), F.lit(0)).alias("cumbits"),
    )
    return cum.groupBy("day").agg(
        F.sum("daybits").cast("long").alias("n_users_day"),
        F.sum("cumbits").cast("long").alias("n_users_cumulative"),
    )


@register(
    "events_exact_median_selection",
    oracle="""
    WITH v AS (
      SELECT CAST(floor(value * 1000000) AS BIGINT) AS vi
      FROM events WHERE value IS NOT NULL
    ),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    s AS (SELECT vi, ROW_NUMBER() OVER (ORDER BY vi) AS rn FROM v)
    SELECT c.n AS n_values,
           CAST((c.n + 1) // 2 AS BIGINT) AS k,
           s.vi AS median_micros
    FROM s, c WHERE s.rn = (c.n + 1) // 2
    """,
    tags=("selection", "aggregate", "exact"),
)
def events_exact_median_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median by two-phase distributed selection — the antidote
    to the one primitive everyone reaches for and nobody can afford at
    100 TB: a global sort. Histogram pass (≤4096 map-side-combined
    counters) → driver walks the counter table to the bucket holding
    rank k → second pass ranks only that ~n/4096-row slice
    (operators/selection.py). Two scans, bounded collects, engine-exact
    integer answer on the micro-scaled value. Complements the
    percentile family: events_value_percentiles is the one-pass
    approximate path; this is the exact path whose cost stays flat as
    quantile count grows.

    The oracle IS the naive total sort (ROW_NUMBER over everything) —
    fine at oracle scale, precisely what this operator exists to avoid
    at target scale.
    """
    from hailstorm_spark.operators.selection import exact_kth_smallest

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = e.select(F.expr("cast(floor(value * 1000000) as bigint)").alias("vi"))
    n = v.count()
    k = (n + 1) // 2
    med = exact_kth_smallest(v, "vi", k)
    return spark.createDataFrame(
        [(n, k, med)], "n_values long, k long, median_micros long"
    )


@register(
    "sketch_bitmap_type_overlap",
    oracle="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    i AS (SELECT COUNT(*) AS ni FROM c JOIN p USING (user_id)),
    nc AS (SELECT COUNT(*) AS n FROM c),
    np AS (SELECT COUNT(*) AS n FROM p)
    SELECT CAST(nc.n AS BIGINT) AS n_click_users,
           CAST(np.n AS BIGINT) AS n_purchase_users,
           CAST(i.ni AS BIGINT) AS n_both,
           CAST((100 * i.ni) // (nc.n + np.n - i.ni) AS BIGINT)
             AS jaccard_pct
    FROM i, nc, np
    """,
    tags=("approx", "sketch", "bitmap", "setops"),
)
def sketch_bitmap_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via bitmap set algebra: distinct users who both
    clicked AND purchased, computed as a bitwise AND of two user
    bitmaps — the operation HLL sketches fundamentally CANNOT do
    (sketch intersection has unbounded relative error; bitmap
    intersection is exact), which is why exact bitmaps earn their
    larger state at 100 TB whenever set OPERATIONS (funnel overlap,
    audience AND/NOT) matter, not just cardinalities.

    Shape: one scan builds both per-word bitmaps simultaneously
    (conditional bit_or — the two "sets" share the groupBy), the AND +
    popcount is arithmetic on ≤ max_user/32 words, and the Jaccard is
    integer percent. Exact, so the oracle is plain relational set
    algebra.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    words = (
        e.select(
            F.expr("user_id div 32").alias("word"),
            F.expr("cast(user_id % 32 as int)").alias("bit"),
            "event_type",
        )
        .groupBy("word")
        .agg(
            F.bit_or(
                F.when(
                    F.col("event_type") == "click",
                    F.call_function("shiftleft", F.lit(1).cast("long"), F.col("bit")),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("cb"),
            F.bit_or(
                F.when(
                    F.col("event_type") == "purchase",
                    F.call_function("shiftleft", F.lit(1).cast("long"), F.col("bit")),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("pb"),
        )
    )
    return (
        words.select(
            F.bit_count("cb").alias("nc"),
            F.bit_count("pb").alias("np"),
            F.bit_count(F.col("cb").bitwiseAND(F.col("pb"))).alias("ni"),
        )
        .agg(
            F.sum("nc").cast("long").alias("n_click_users"),
            F.sum("np").cast("long").alias("n_purchase_users"),
            F.sum("ni").cast("long").alias("n_both"),
        )
        .select(
            "n_click_users",
            "n_purchase_users",
            "n_both",
            F.expr(
                "cast((100 * n_both) div"
                " (n_click_users + n_purchase_users - n_both) as bigint)"
            ).alias("jaccard_pct"),
        )
    )


#: Portable HLL geometry: 64 registers (6 index bits) over the 60-bit
#: md5 hash → a 54-bit rho window, so register values live in [1, 55].
HLL_M = 64
HLL_RHO_MAX = 55


from hailstorm_spark.functions.hashing import md5_hash60_sql as _h60_sql

_HLL_HASH_SQL = _h60_sql("CAST(user_id AS VARCHAR)", salt="hll")


@register(
    "sketch_hll_portable_registers",
    oracle=f"""
    WITH h AS (
      SELECT event_type, {_HLL_HASH_SQL} AS h60
      FROM events
    ),
    reg AS (
      SELECT event_type,
             h60 % {HLL_M} AS j,
             CASE WHEN h60 // {HLL_M} = 0 THEN {HLL_RHO_MAX}
                  ELSE {HLL_RHO_MAX} - length(bin(h60 // {HLL_M})) END AS rho
      FROM h
    )
    SELECT event_type,
           CAST(j AS BIGINT) AS register_idx,
           CAST(MAX(rho) AS INT) AS register_val
    FROM reg GROUP BY event_type, j
    """,
    tags=("sketch", "hll", "distinct"),
)
def sketch_hll_portable_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register construction, pinned value-for-value — the
    engine-portable complement to sketch_rollup_distinct_users (which
    uses Spark's Datasketches HLL and can only be bound-checked): here
    the sketch INTERNALS are the result. Flajolet's register update
    r_j = max(rho(w)) runs identically in both engines: j is the low 6
    bits of the md5-derived 60-bit hash, w the remaining 54, and
    rho(w) = leading-zeros+1 computed WITHOUT clz/log via the minimal
    binary string — rho = 55 − length(bin(w)) (both engines print
    minimal-width bin; w = 0 ⇒ 55). Same oracle discipline as the
    count-min sketch: DuckDB REBUILDS every register, so the compare
    pins the sketch bit-for-bit, not an error bound.

    Scale: one scan, one (type, register) aggregation — at most
    |types|·64 groups survive, the whole point of HLL: any day/source/
    type slice keeps 64 small ints, mergeable by MAX, and answers
    distinct-over-any-range without touching raw data again. The MAX
    monoid is idempotent, so replayed batches are free (the same
    property the streaming bitmap-distinct query exploits).
    """
    ev = load_table(spark, sf_dir, "events")
    from hailstorm_spark.functions.hashing import md5_hash60

    h = ev.select(
        "event_type",
        md5_hash60(F.col("user_id").cast("string"), salt="hll").alias("h60"),
    )
    reg = h.select(
        "event_type",
        (F.col("h60") % HLL_M).alias("j"),
        F.when(F.expr(f"h60 div {HLL_M}") == 0, F.lit(HLL_RHO_MAX))
        .otherwise(F.lit(HLL_RHO_MAX) - F.length(F.bin(F.expr(f"h60 div {HLL_M}"))))
        .alias("rho"),
    )
    return reg.groupBy("event_type", "j").agg(
        F.max("rho").cast("int").alias("register_val")
    ).select(
        "event_type",
        F.col("j").cast("long").alias("register_idx"),
        "register_val",
    )


@register(
    "sketch_bitmap_rolling_wau",
    oracle="""
    WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    m AS (
      SELECT day,
             CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                   WHERE CAST(e.ts AS DATE) = d.day) AS BIGINT) AS n_dau,
             CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                   WHERE CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day)
                  AS BIGINT) AS n_wau
      FROM d
    )
    SELECT day, n_dau, n_wau,
           CAST((n_dau * 10000) // n_wau AS BIGINT) AS stickiness_x10000
    FROM m
    """,
    tags=("approx", "sketch", "bitmap", "rollup"),
)
def sketch_bitmap_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU), daily actives (DAU), and the
    DAU/WAU stickiness ratio — the engagement dashboard staple — via
    the same mergeable user-bitmap partials as
    sketch_bitmap_cumulative_users, merged with an EVENT-TIME RANGE
    window (6 preceding days .. current) instead of the running OR: the
    range frame keys on the integer epoch-day, so calendar gaps can
    never silently widen the window the way a rows frame would. The
    stickiness ratio is integer-scaled ((dau·10^4) div wau) — no float
    near the hash.

    One events scan → daily (day, word) bitmap partials; after that
    everything is arithmetic on words: distinct-over-any-7-days is an
    OR of 7 daily partials + popcount, never a rescan. The day×word
    gap-fill grid (bounded, |days|·|words|) exists so a word observed
    only on day d still contributes to days d+1..d+6. Exact counts —
    the oracle is plain COUNT(DISTINCT) per window.
    """
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.expr("user_id div 32").alias("word"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.expr("cast(user_id % 32 as int)")
        ).alias("bit"),
    )
    partial = e.groupBy("day", "word").agg(F.bit_or("bit").alias("bits"))
    grid = (
        partial.select("day")
        .distinct()
        .crossJoin(partial.select("word").distinct())
    )
    w = (
        Window.partitionBy("word")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, 0)
    )
    cum = grid.join(partial, ["day", "word"], "left").select(
        "day",
        F.coalesce(F.bit_count("bits"), F.lit(0)).alias("daybits"),
        F.coalesce(F.bit_count(F.bit_or("bits").over(w)), F.lit(0)).alias(
            "waubits"
        ),
    )
    m = cum.groupBy("day").agg(
        F.sum("daybits").cast("long").alias("n_dau"),
        F.sum("waubits").cast("long").alias("n_wau"),
    )
    return m.select(
        "day",
        "n_dau",
        "n_wau",
        F.expr("cast((n_dau * 10000) div n_wau as bigint)").alias(
            "stickiness_x10000"
        ),
    )
