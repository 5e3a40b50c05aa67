"""Corpus-pipeline extras: global-rank sharding, per-source quality
percentile gating, and leakage-free train/val splitting.

These are the operations that sit between "deduplicated corpus" and
"training shards on disk" in a large-scale data pipeline; none exist in
the reference (its pipeline ends at the merge bolt, reference
src/Hailstorm/Processor/Downstream.hs:61-84) — additive surface, each
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.functions.hashing import md5_hash60, md5_hash60_sql
from hailstorm_spark.functions.text import tokens, tokens_sql
from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register

N_SHARDS = 8

_TOKS = tokens_sql("text")


@register(
    "corpus_shard_assignment",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1 AS r0
      FROM documents
    ),
    assigned AS (
      SELECT doc_id, n_chars,
             CASE WHEN (r0 // {N_SHARDS}) % 2 = 0
                  THEN r0 % {N_SHARDS}
                  ELSE {N_SHARDS - 1} - (r0 % {N_SHARDS}) END AS shard
      FROM ranked
    )
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY shard
    """,
    tags=("corpus", "sharding", "ranking", "north-star"),
)
def corpus_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced training-shard assignment: rank documents by size
    (desc, doc_id tiebreak) and deal them to N_SHARDS shards in
    serpentine (boustrophedon) order — pass 0 deals shards 0..7, pass 1
    deals 7..0 — so each shard gets one doc from every size stratum and
    per-shard total size stays within one document of balanced. This is
    how fixed-count training shards get written without a skewed
    straggler shard.

    The global rank comes from operators.ranking.global_row_number —
    the two-phase range-bucket formulation that keeps the sort fully
    parallel (an unpartitioned row_number() window would single-thread
    the corpus; the plan for THIS query contains no
    Exchange SinglePartition, pinned by tests/test_plans.py). The
    oracle uses the naive global window, which DuckDB can afford
    single-node — two independent formulations, one answer.
    """
    from hailstorm_spark.operators.ranking import global_row_number

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_row_number(
        docs, key="n_chars", tiebreak="doc_id", out_col="rn", descending=True
    ).withColumn("r0", F.col("rn") - 1)
    shard = F.when(
        (F.col("r0") / N_SHARDS).cast("long") % 2 == 0,
        F.col("r0") % N_SHARDS,
    ).otherwise(F.lit(N_SHARDS - 1) - F.col("r0") % N_SHARDS)
    return (
        ranked.withColumn("shard", shard.cast("long"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "corpus_quality_percentile_filter",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(list_distinct({_TOKS})) AS BIGINT) AS lex_score
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, lex_score,
             RANK() OVER (PARTITION BY source ORDER BY lex_score ASC) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n_src
      FROM scored
    )
    SELECT doc_id, source, lex_score
    FROM ranked
    WHERE 4 * (rk - 1) >= n_src - 1
    """,
    tags=("corpus", "quality", "north-star"),
)
def corpus_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality gate at a PERCENTILE, not a fixed threshold:
    drop each source's bottom quartile by lexical diversity (distinct
    token count). Fixed thresholds rot as the source mix shifts;
    per-source percentiles keep the gate calibrated — the standard
    quality-filter shape in corpus pipelines. The keep rule is the pure
    integer inequality 4·(rank−1) ≥ n−1 (percent_rank ≥ 0.25 without
    the division), so the engines cannot disagree on a boundary doc.

    Scale shape: the corpus NEVER shuffles. Scores reduce to per-
    (source, score) counts — a map-side-combinable aggregate orders of
    magnitude smaller than the corpus — the per-source threshold falls
    out of a window over those counts, and the corpus is filtered by a
    broadcast join on source + a scan-level comparison. The oracle uses
    the direct per-row window-rank formulation; two independent
    formulations, one answer.
    """
    from hailstorm_spark.operators.quality import percentile_floor_thresholds

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.array_distinct(tokens("text"))).cast("long").alias("lex_score"),
    )
    thresholds = percentile_floor_thresholds(
        scored, "source", "lex_score", num=1, den=4
    )
    return scored.join(F.broadcast(thresholds), "source").filter(
        F.col("lex_score") >= F.col("min_keep_score")
    ).select("doc_id", "source", "lex_score")


def _register_split() -> None:
    """Thunk registration: reuses the dedup module's corpus/edge CTEs so
    the split can never drift from the cluster definition."""
    from hailstorm_spark.queries.dedup import (
        _band_keys_sql,
        _CORPUS_SQL,
        _minhash_sig_sql,
        augmented_corpus,
    )
    from hailstorm_spark.operators.dedup import LSH_BANDS

    split_hash = md5_hash60_sql("CAST(cluster_id AS VARCHAR)")

    @register(
        "corpus_split_leakage_free",
        oracle=f"""
        WITH RECURSIVE {_CORPUS_SQL},
        sigs AS (SELECT doc_id, {_minhash_sig_sql()} AS sig FROM sh
                 WHERE len(shingles) > 0),
        bands AS (SELECT doc_id, {_band_keys_sql()} AS bkeys FROM sigs),
        bl AS (SELECT doc_id AS doc, i AS band_idx, bkeys[i+1] AS band_key
               FROM bands, range({LSH_BANDS}) t(i)),
        mh_edges AS (
          SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
          FROM bl a JOIN bl b
            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
               AND a.doc < b.doc
        ),
        ex AS (SELECT doc_id, md5(text) AS h FROM corpus),
        exm AS (SELECT h, MIN(doc_id) AS m FROM ex GROUP BY h),
        exact_edges AS (
          SELECT exm.m AS doc_a, ex.doc_id AS doc_b
          FROM ex JOIN exm ON ex.h = exm.h WHERE ex.doc_id <> exm.m
        ),
        edges AS (SELECT doc_a, doc_b FROM mh_edges
                  UNION SELECT doc_a, doc_b FROM exact_edges),
        sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
                UNION SELECT doc_b AS src, doc_a AS dst FROM edges),
        reach(src, node) AS (
          SELECT src, src FROM (SELECT DISTINCT src FROM sym)
          UNION
          SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.node
        ),
        labels AS (SELECT src AS doc_id, MIN(node) AS cluster_id
                   FROM reach GROUP BY src),
        assigned AS (
          SELECT c.doc_id,
                 COALESCE(l.cluster_id, c.doc_id) AS cluster_id
          FROM corpus c LEFT JOIN labels l ON l.doc_id = c.doc_id
        )
        SELECT doc_id, cluster_id,
               CASE WHEN {split_hash} % 10 = 0 THEN 'val' ELSE 'train' END
                 AS split
        FROM assigned
        """,
        tags=("corpus", "split", "dedup", "north-star"),
    )
    def corpus_split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Leakage-free train/validation split: hash the near-dup
        CLUSTER id, not the document id, so every member of a duplicate
        cluster lands in the same split — the guard against the classic
        eval-contamination failure where a near-copy of a validation
        document trains the model. Singleton documents are their own
        cluster. ~10% of clusters go to 'val' (md5 of the cluster id
        mod 10), the deterministic salt-free form of a hash split.

        Scale shape: cluster labels come from the candidate-edge
        connected components (edges only — the corpus itself never
        pairs); the split is then one hash expression plus a left join
        of corpus ids against the (much smaller) labeled set.
        """
        from hailstorm_spark.operators.dedup import (
            connected_components,
            exact_dup_star_edges,
            minhash_lsh_candidates,
        )

        corpus = augmented_corpus(spark, sf_dir)
        edges = (
            minhash_lsh_candidates(corpus, "doc_id", "text")
            .union(exact_dup_star_edges(corpus, "doc_id", "text"))
            .distinct()
        )
        labels = connected_components(edges)
        assigned = (
            corpus.select("doc_id")
            .join(labels, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                    "cluster_id"
                ),
            )
        )
        split = F.when(
            md5_hash60(F.col("cluster_id").cast("string")) % 10 == 0, F.lit("val")
        ).otherwise(F.lit("train"))
        return assigned.select("doc_id", "cluster_id", split.alias("split"))


_register_split()


def _register_sampling_extras() -> None:
    K_NEG = 4
    K_PER_SOURCE = 5

    # DuckDB twin of md5_hash60(doc_id, salt=f"neg{j}") % n with j as a
    # SQL column (same inline-salt trick as the count-min cells)
    _neg_rn_sql = (
        "(('0x' || substr(md5('neg' || j || ':' || CAST(d.doc_id AS VARCHAR)),"
        " 1, 15))::BIGINT)"
    )

    @register(
        "corpus_negative_sampling_pairs",
        oracle=f"""
        WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        idx AS (
          SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn
          FROM documents
        ),
        probes AS (
          SELECT d.doc_id, CAST(j AS BIGINT) AS j,
                 ({_neg_rn_sql} % nn.n) + 1 AS trn
          FROM documents d, nn, range({K_NEG}) t(j)
        ),
        pairs AS (
          SELECT p.doc_id, p.j, i.doc_id AS neg_doc_id
          FROM probes p JOIN idx i ON i.rn = p.trn
          WHERE i.doc_id <> p.doc_id
        )
        SELECT j,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(doc_id * 100003 + neg_doc_id) AS BIGINT)
                 AS pair_fingerprint
        FROM pairs GROUP BY j
        """,
        tags=("corpus", "sampling", "training"),
    )
    def corpus_negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Deterministic negative-pair generation for contrastive
        training — k pseudo-random partners per document WITHOUT a
        crossJoin and without RNG state.

        The scalable shape: a global dense rank (range-bucketed
        operators/ranking.py — no SinglePartition) turns "pick a random
        document" into "pick a random rank", and each doc derives its k
        target ranks from the portable salted hash — so negatives are
        reproducible run-to-run (a property training pipelines need for
        restarts) and the whole thing is one equi-join on rank, shuffle
        ∝ k·N rows of two integers. Self-pairs are dropped (the hash
        may land on the doc's own rank). The oracle replays rank
        assignment and hash targeting exactly; the order-insensitive
        fingerprint pins every pair, not just the counts.
        """
        from hailstorm_spark.operators.ranking import global_row_number

        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        n = docs.count()
        idx = global_row_number(docs, key="doc_id", tiebreak="doc_id", out_col="rn")
        probes = (
            docs.select(
                "doc_id",
                F.posexplode(
                    F.array(
                        *[
                            (
                                md5_hash60(
                                    F.col("doc_id").cast("string"), salt=f"neg{j}"
                                )
                                % n
                            )
                            + 1
                            for j in range(K_NEG)
                        ]
                    )
                ).alias("j", "trn"),
            )
            .select("doc_id", F.col("j").cast("long").alias("j"), "trn")
        )
        pairs = (
            probes.join(idx.select(F.col("doc_id").alias("neg_doc_id"), "rn"),
                        probes.trn == F.col("rn"))
            .filter(F.col("neg_doc_id") != F.col("doc_id"))
        )
        return pairs.groupBy("j").agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("doc_id") * 100003 + F.col("neg_doc_id"))
            .cast("long")
            .alias("pair_fingerprint"),
        )

    @register(
        "sample_weighted_priority_per_source",
        oracle=f"""
        WITH pri AS (
          SELECT source, doc_id,
                 {md5_hash60_sql("CAST(doc_id AS VARCHAR)", salt="wps")}
                   // (n_chars + 1) AS priority
          FROM documents
        ),
        ranked AS (
          SELECT source, doc_id, priority,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY priority, doc_id) AS k_rank
          FROM pri
        )
        SELECT source, CAST(k_rank AS BIGINT) AS k_rank, doc_id, priority
        FROM ranked WHERE k_rank <= {K_PER_SOURCE}
        """,
        tags=("corpus", "sampling", "training"),
    )
    def sample_weighted_priority_per_source(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Length-weighted reservoir-style sample, deterministic and
        engine-exact: per-document priority = hash div (n_chars+1), so
        longer documents draw systematically smaller priorities and the
        per-source bottom-k is a size-biased sample — the integer
        cousin of the A-ES exponential-key weighted reservoir
        (Efraimidis & Spirtes 2006), chosen over the float formulation
        because u^(1/w) has engine-dependent libm rounding while
        integer division has none.

        Scale: one hash + divide per row (map-side), one per-source
        window for the bottom-k; restart-safe because the sample is a
        pure function of the data. The companion stratified/mixture
        samplers (queries/corpus_pipeline.py) weight by SOURCE; this
        one weights by a per-ROW covariate.
        """
        docs = load_table(spark, sf_dir, "documents")
        from pyspark.sql import Window

        pri = docs.select(
            "source",
            "doc_id",
            md5_hash60(F.col("doc_id").cast("string"), salt="wps").alias("__h"),
            "n_chars",
        ).select(
            "source",
            "doc_id",
            # integer floor-div — a double divide would lose bits past
            # the 53-bit mantissa on the 60-bit hash
            F.expr("__h div (n_chars + 1)").alias("priority"),
        )
        w = Window.partitionBy("source").orderBy("priority", "doc_id")
        return (
            pri.withColumn("k_rank", F.row_number().over(w).cast("long"))
            .filter(F.col("k_rank") <= K_PER_SOURCE)
            .select("source", "k_rank", "doc_id", "priority")
        )


_register_sampling_extras()


def _register_prep_v2() -> None:
    from hailstorm_spark.operators.bloom import bloom_build, bloom_might_contain
    from hailstorm_spark.operators.quality import percentile_floor_thresholds
    from hailstorm_spark.operators.ranking import global_row_number

    BLOCK_MOD = 97  # same synthetic blocklist as sketch_bloom_blocklist_prune
    M_BITS, K = 256, 2

    @register(
        "corpus_prep_v2_end_to_end",
        oracle=f"""
        WITH banned AS (
          SELECT DISTINCT md5(text) AS key FROM documents
          WHERE doc_id % {BLOCK_MOD} = 0
        ),
        kept0 AS (
          SELECT d.doc_id, d.source, d.text, d.n_chars
          FROM documents d LEFT JOIN banned b ON md5(d.text) = b.key
          WHERE b.key IS NULL
        ),
        keepers AS (
          SELECT MIN(doc_id) AS doc_id FROM kept0 GROUP BY md5(text)
        ),
        kept1 AS (
          SELECT k0.* FROM kept0 k0 JOIN keepers k ON k.doc_id = k0.doc_id
        ),
        scored AS (
          SELECT doc_id, source, n_chars,
                 CAST(len(list_distinct({_TOKS})) AS BIGINT) AS lex_score
          FROM kept1
        ),
        gated AS (
          SELECT doc_id, source, n_chars FROM (
            SELECT doc_id, source, n_chars,
                   RANK() OVER (PARTITION BY source ORDER BY lex_score ASC) AS rk,
                   COUNT(*) OVER (PARTITION BY source) AS n_src
            FROM scored
          ) WHERE 4 * (rk - 1) >= n_src - 1
        ),
        sharded AS (
          SELECT doc_id, n_chars,
                 CASE WHEN (r0 // {N_SHARDS}) % 2 = 0
                      THEN r0 % {N_SHARDS}
                      ELSE {N_SHARDS - 1} - (r0 % {N_SHARDS}) END AS shard
          FROM (
            SELECT doc_id, n_chars,
                   ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1 AS r0
            FROM gated
          )
        )
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM sharded GROUP BY shard
        """,
        tags=("corpus", "pipeline", "north-star", "end-to-end"),
    )
    def corpus_prep_v2_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The second-generation end-to-end corpus pipeline, composing
        this round's operators into one flow: Bloom BLOCKLIST prune
        (scan-level bitmap predicate; only the Bloom-positive sliver is
        verified against the banned set — the 100 TB side never
        shuffles for the blocklist) → exact dedup keep-one (16-byte
        digest shuffle) → per-source PERCENTILE quality gate (histogram
        + broadcast floors, corpus unshuffled) → serpentine
        size-balanced SHARD assignment (distributed global rank, no
        SinglePartition). Reported per shard: document count and total
        chars — the balance the serpentine deal exists to produce.

        Each stage's operator is oracle-checked standalone elsewhere;
        this query pins the COMPOSITION (stage order, survivor
        plumbing, column contracts) against one flat SQL derivation of
        the same pipeline. Complements corpus_prep_clean (near-dup
        pipeline) as the exact-dedup + governance variant.
        """
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text", "n_chars"
        )
        banned = (
            docs.filter(F.col("doc_id") % BLOCK_MOD == 0)
            .select(F.md5("text").alias("key"))
            .distinct()
        )
        packed = bloom_build(banned, F.col("key"), M_BITS, K)
        keyed = docs.withColumn("__key", F.md5("text"))
        bloom_pos = bloom_might_contain(F.col("__key"), packed, M_BITS, K)
        fast_keep = keyed.filter(~bloom_pos)
        candidates = keyed.filter(bloom_pos)
        verified_keep = candidates.join(
            F.broadcast(banned.withColumnRenamed("key", "__bkey")),
            candidates["__key"] == F.col("__bkey"),
            "left_anti",
        )
        kept0 = fast_keep.unionByName(verified_keep)
        keepers = kept0.groupBy("__key").agg(F.min("doc_id").alias("doc_id"))
        kept1 = kept0.join(keepers.select("doc_id"), "doc_id", "left_semi")
        scored = kept1.select(
            "doc_id",
            "source",
            "n_chars",
            F.size(F.array_distinct(tokens("text"))).cast("long").alias("lex_score"),
        )
        floors = percentile_floor_thresholds(
            scored, "source", "lex_score", num=1, den=4
        )
        gated = (
            scored.join(F.broadcast(floors), "source")
            .filter(F.col("lex_score") >= F.col("min_keep_score"))
            .select("doc_id", "n_chars")
        )
        ranked = global_row_number(
            gated, key="n_chars", tiebreak="doc_id", out_col="rn", descending=True
        ).withColumn("r0", F.col("rn") - 1)
        sharded = ranked.withColumn(
            "shard",
            F.expr(
                f"cast(case when (r0 div {N_SHARDS}) % 2 = 0"
                f" then r0 % {N_SHARDS}"
                f" else {N_SHARDS - 1} - (r0 % {N_SHARDS}) end as bigint)"
            ),
        )
        return sharded.groupBy("shard").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )


_register_prep_v2()


#: shared by the batch datasheet and its streaming-maintenance twins
#: (queries/streaming_queries.py::streaming_corpus_datasheet and the
#: sketch-bounded variant): every statistic is maintainable exactly, so
#: after the drain the streamed answer must EQUAL this one-shot
#: computation. ``docs_src`` lets a twin swap in a modified corpus
#: (e.g. the streaming datasheet's planted NULL-source rows) while the
#: statistics definition stays single-sourced; ``select_cols`` lets the
#: sketch-bounded twin drop the column its sketch approximates.
def datasheet_oracle(
    docs_src: str = "documents", drop_cols: tuple[str, ...] = ()
) -> str:
    cols = [
        ("n_docs", "CAST(COUNT(*) AS BIGINT) AS n_docs"),
        ("n_tokens", "CAST(SUM(n_toks) AS BIGINT) AS n_tokens"),
        ("sum_chars", "CAST(SUM(n_chars) AS BIGINT) AS sum_chars"),
        (
            "n_empty",
            "CAST(SUM(CASE WHEN n_toks = 0 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_empty",
        ),
        (
            "n_exact_dups",
            "CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_exact_dups",
        ),
        ("n_langs", "CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs"),
        ("max_tokens", "CAST(MAX(n_toks) AS BIGINT) AS max_tokens"),
        (
            "mean_tokens",
            "CAST(SUM(n_toks) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
            " AS mean_tokens",
        ),
    ]
    picked = ",\n           ".join(
        sql for name, sql in cols if name not in drop_cols
    )
    return f"""
    WITH d AS (
      SELECT source, lang, n_chars,
             len({tokens_sql("COALESCE(text, '')")}) AS n_toks,
             {md5_hash60_sql("COALESCE(text, '')")} AS h
      FROM {docs_src}
    )
    SELECT source,
           {picked}
    FROM d GROUP BY source
    """


_DATASHEET_ORACLE = datasheet_oracle()


@register(
    "corpus_datasheet_by_source",
    oracle=_DATASHEET_ORACLE,
    tags=("corpus", "dq", "reporting"),
)
def corpus_datasheet_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source dataset DATASHEET — the summary table every
    training-data pipeline publishes next to a corpus drop (datasheets
    for datasets / dataset cards): per source, document and token
    volume, emptiness, exact-duplicate count, language spread, and
    length profile. This is the one-stop row a data-mixture planner
    reads before assigning sampling weights, and the regression anchor
    a re-crawl is diffed against.

    Exactness: counts and sums are integers end-to-end;
    exact-duplicate counting rides the 60-bit md5 digest (the repo's
    portable hash — text itself never shuffles for the distinct), and
    the only double, mean_tokens, is one deterministic division of two
    exact integers.

    Scale: one scan of documents; tokenize/digest are row-local; the
    groupBy moves one small row per (source, digest) for the distinct
    plus map-side-combined partials for everything else — at 100 TB
    the exchange carries ~8-byte keys, never text. Output is
    |sources| rows.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "n_chars",
        F.size(tokens(F.coalesce("text", F.lit("")))).alias("n_toks"),
        md5_hash60(F.coalesce("text", F.lit(""))).alias("h"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum((F.col("n_toks") == 0).cast("long")).alias("n_empty"),
        (F.count(F.lit(1)) - F.count_distinct("h")).cast("long").alias(
            "n_exact_dups"
        ),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.max("n_toks").cast("long").alias("max_tokens"),
        (
            F.sum("n_toks").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("mean_tokens"),
    )
