"""Registered queries for the corpus-preparation operators
(operators/corpus.py): PII redaction, repetition quality, benchmark
contamination, deterministic stratified sampling, sequence packing.

Each oracle is generated from the SAME pattern constants / SQL mirrors
as the Spark expression, so the two sides cannot drift. The benchmark
split for contamination is sources src0/src1 (a stand-in for held-out
eval sets); everything else is "the corpus".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hailstorm_spark.functions.hashing import md5_hash60_sql
from hailstorm_spark.functions.text import tokens, tokens_sql
from hailstorm_spark.io import load_table
from hailstorm_spark.operators.corpus import (
    PII_PATTERNS,
    contamination,
    distinct_fraction,
    hex_threshold,
    pack_sequences,
    redact_pii,
    redaction_count,
    sample_key,
    sample_key_sql,
    top_fraction,
    top_fraction_sql,
)
from hailstorm_spark.operators.text import ngrams_sql, token_count, with_word_ngrams
from hailstorm_spark.registry import register


def _redact_sql(expr: str) -> str:
    """DuckDB mirror of redact_pii: the same patterns, same order,
    global replacement."""
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


_COUNTS_SQL = ", ".join(
    f"CAST(SUM(len(regexp_extract_all(c_name, '{pat}'))) AS BIGINT) AS {name}"
    for name, pat, _ in PII_PATTERNS
)

_STACK_SQL = " UNION ALL ".join(
    f"SELECT '{name}' AS pattern, {name} AS n_matches FROM agg"
    for name, _, _ in PII_PATTERNS
)


@register(
    "pii_redaction_profile",
    oracle=f"""
    WITH agg AS (SELECT {_COUNTS_SQL} FROM customer)
    {_STACK_SQL}
    """,
    tags=("pipeline", "pii"),
)
def pii_redaction_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How often each PII pattern fires across a column — the audit
    report a redaction job emits before rewriting a corpus.

    One scan computes every per-pattern count as an aggregate, then the
    single result row unpivots to (pattern, n_matches) — no per-pattern
    rescans at 100 TB.
    """
    c = load_table(spark, sf_dir, "customer")
    agg = c.agg(
        *[
            F.sum(redaction_count("c_name", pat)).alias(name)
            for name, pat, _ in PII_PATTERNS
        ]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("pattern"), F.col(name).alias("n_matches"))
            for name, _, _ in PII_PATTERNS
        ]
    )
    return agg.select(F.explode(pairs).alias("p")).select("p.pattern", "p.n_matches")


@register(
    "pii_redacted_forms",
    oracle=f"""
    SELECT {_redact_sql('c_name')} AS redacted_form, COUNT(*) AS n
    FROM customer
    GROUP BY {_redact_sql('c_name')}
    """,
    tags=("pipeline", "pii"),
)
def pii_redacted_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end redaction: distinct post-redaction forms with counts.
    The full pattern chain (email → ipv4 → phone → digit-run) runs
    inside one projected expression; grouping on the redacted value
    shuffles only the collapsed forms."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(redact_pii("c_name").alias("redacted_form"))
        .groupBy("redacted_form")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_TOKS = tokens_sql("text")


@register(
    "quality_repetition_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
         g AS (SELECT doc_id, toks, {ngrams_sql('toks', 2)} AS bigrams FROM t)
    SELECT
      doc_id,
      CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1)
        AS distinct_frac,
      {top_fraction_sql('toks')} AS top_token_frac,
      {top_fraction_sql('bigrams')} AS top_bigram_frac
    FROM g
    """,
    tags=("pipeline", "quality"),
)
def quality_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token
    fraction and the share of the most frequent unigram/bigram.

    Entirely row-local HOFs over the token array — zero shuffle, scan
    speed at any corpus size; the downstream filter (e.g. drop docs with
    top_bigram_frac > 0.18) composes as a plain predicate.
    """
    d = load_table(spark, sf_dir, "documents")
    t = with_word_ngrams(
        d.select("doc_id", tokens("text").alias("toks")), "toks", 2, "bigrams"
    )
    return t.select(
        "doc_id",
        token_count(F.col("toks")).alias("n_tokens"),
        distinct_fraction(F.col("toks")).alias("distinct_frac"),
        top_fraction(F.col("toks")).alias("top_token_frac"),
        top_fraction(F.col("bigrams")).alias("top_bigram_frac"),
    )


BENCHMARK_SOURCES = ("src0", "src1")
CONTAM_N = 3

_BENCH_IN = ", ".join(f"'{s}'" for s in BENCHMARK_SOURCES)


@register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
         g AS (SELECT doc_id, source, {ngrams_sql('toks', CONTAM_N)} AS grams FROM t),
         d AS (SELECT doc_id, source,
                      list_distinct(list_transform(grams, x -> md5(x))) AS hs
               FROM g),
         bench AS (SELECT DISTINCT unnest(hs) AS h FROM d
                   WHERE source IN ({_BENCH_IN})),
         corpus AS (SELECT doc_id, unnest(hs) AS h FROM d
                    WHERE source NOT IN ({_BENCH_IN})),
         tot AS (SELECT doc_id, COUNT(*) AS n_distinct_ngrams
                 FROM corpus GROUP BY doc_id),
         mat AS (SELECT c.doc_id, COUNT(*) AS n_contaminated
                 FROM corpus c
                 WHERE EXISTS (SELECT 1 FROM bench b WHERE b.h = c.h)
                 GROUP BY c.doc_id)
    SELECT
      tot.doc_id,
      tot.n_distinct_ngrams,
      COALESCE(mat.n_contaminated, 0) AS n_contaminated,
      CAST(COALESCE(mat.n_contaminated, 0) AS DOUBLE)
        / greatest(tot.n_distinct_ngrams, 1) AS contamination_frac
    FROM tot LEFT JOIN mat ON tot.doc_id = mat.doc_id
    """,
    tags=("pipeline", "contamination"),
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: for every corpus document, the fraction
    of its distinct word 3-grams that appear anywhere in the
    held-out benchmark split (sources src0/src1).

    The benchmark digest set broadcasts (eval sets are tiny); the corpus
    side is exploded digests → broadcast semi-join → per-doc counts.
    No corpus self-join exists, so this scales linearly in corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    with_grams = with_word_ngrams(
        d.select("doc_id", "source", tokens("text").alias("toks")),
        "toks",
        CONTAM_N,
        "grams",
    )
    bench = with_grams.filter(F.col("source").isin(*BENCHMARK_SOURCES))
    corpus = with_grams.filter(~F.col("source").isin(*BENCHMARK_SOURCES))
    return contamination(corpus, bench, "doc_id", "grams")


SAMPLE_FRAC_EVEN = 0.25
SAMPLE_FRAC_ODD = 0.50

# TRY_CAST: a source name without a numeric suffix must not crash the
# scan (ANSI cast faults in BOTH engines — adversarial sweep find);
# NULL % 2 = NULL is not 0, so non-numeric sources deterministically
# take the ELSE (odd) fraction on both sides.
_THR_SQL = (
    f"CASE WHEN TRY_CAST(substr(source, 4) AS INTEGER) % 2 = 0 "
    f"THEN '{hex_threshold(SAMPLE_FRAC_EVEN)}' ELSE '{hex_threshold(SAMPLE_FRAC_ODD)}' END"
)


@register(
    "sample_stratified_sources",
    oracle=f"""
    SELECT
      source,
      COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN {sample_key_sql('doc_id')} < {_THR_SQL}
               THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents
    GROUP BY source
    """,
    tags=("pipeline", "sampling"),
)
def sample_stratified_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling audit: per source, how many
    documents the hash-prefix rule keeps (25% for even-numbered
    sources, 50% for odd).

    The sampling key is md5(doc_id)[0:2] — reproducible across engines,
    runs, and cluster sizes, with no RNG state to coordinate; the
    keep/drop decision is a row-local predicate, so the sample itself
    never shuffles. This query reports the per-stratum realized counts
    (one small aggregation) rather than the sample, which would be a
    pass-through filter.
    """
    d = load_table(spark, sf_dir, "documents")
    # try_cast: non-"srcN" source names fall to the odd fraction instead
    # of faulting the scan (matches the oracle's TRY_CAST)
    sidx = F.substring("source", 4, 8).try_cast("int")
    thr = F.when(sidx % 2 == 0, hex_threshold(SAMPLE_FRAC_EVEN)).otherwise(
        hex_threshold(SAMPLE_FRAC_ODD)
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((sample_key("doc_id") < thr).cast("int")).cast("long").alias("n_sampled"),
    )


PACK_BUDGET = 256


@register(
    "pack_training_sequences",
    oracle=f"""
    WITH t AS (SELECT source, doc_id,
                      CAST(len({_TOKS}) AS BIGINT) AS n_tokens
               FROM documents),
         p AS (SELECT source, doc_id, n_tokens,
                      CAST(floor(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ), 0) / {PACK_BUDGET}) AS BIGINT) AS seq_id
               FROM t)
    SELECT source, seq_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
    FROM p
    GROUP BY source, seq_id
    """,
    tags=("pipeline", "packing"),
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: documents are laid into
    256-token training sequences in doc_id order within each
    source; a document starts in the bin its running token total lands
    in. Output is per-sequence occupancy (docs, tokens).

    The cumulative sum is one window per stratum — strata pack
    independently, so at 100 TB (source×date shards) no global sort
    exists and the window never sees more than a shard.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("source", "doc_id", token_count(tokens("text")).alias("n_tokens"))
    packed = pack_sequences(t, "source", "doc_id", "n_tokens", PACK_BUDGET)
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
    )


#: Per-source document cap (C4-style domain cap): keep at most this
#: many docs per source, preferring longer documents.
SOURCE_CAP = 10


@register(
    "corpus_source_cap",
    oracle=f"""
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM documents
    ) WHERE rk <= {SOURCE_CAP}
    """,
    tags=("corpus", "pipeline", "north-star"),
)
def corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the C4-style domain cap that stops one
    crawl domain from dominating the training mix: keep at most
    SOURCE_CAP docs per source, preferring longer documents
    ((n_chars DESC, doc_id ASC) is a total order, so the kept SET is
    deterministic in any engine).

    Skew design (100 TB): a per-source window sorts every source's
    rows, but the cap only BINDS on over-cap sources. The tiny
    per-source histogram is computed first; under-cap sources bypass
    the window entirely (kept whole, no sort), and only over-cap
    sources' rows — on a web crawl, the few giant domains — go through
    the ranked window. The histogram is broadcast to both branches, so
    the corpus is scanned twice but shuffled only for the over-cap
    slice. The oracle needs no such split: the window over everything
    selects the same set.
    """
    from hailstorm_spark.operators.corpus import cap_per_key

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return cap_per_key(
        d, "source", [F.desc("n_chars"), F.asc("doc_id")], SOURCE_CAP
    ).select("doc_id", "source", "n_chars")


#: Deterministic augmentation: drop a token iff its keyed hash falls
#: under this fraction of the 60-bit hash space (≈15%).
DROPOUT_NUM = 173
DROPOUT_DEN = 1152
_DROPOUT_THRESHOLD = (2**60 * DROPOUT_NUM) // DROPOUT_DEN


@register(
    "corpus_augment_token_dropout",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents
                 WHERE doc_id < 200),
    kept AS (
      SELECT doc_id,
             list_filter(list_transform(range(1, len(toks) + 1),
                                        i -> CASE WHEN
               ({md5_hash60_sql("doc_id::VARCHAR || ':' || i::VARCHAR")})
                 >= {_DROPOUT_THRESHOLD}
               THEN toks[i] ELSE NULL END),
                         t -> t IS NOT NULL) AS toks_aug,
             len(toks) AS n_before
      FROM tok
    )
    SELECT doc_id, n_before,
           CAST(len(toks_aug) AS BIGINT) AS n_after,
           array_to_string(toks_aug, ' ') AS text_aug
    FROM kept
    """,
    tags=("corpus", "augmentation", "north-star"),
)
def corpus_augment_token_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-dropout augmentation: token i of doc d is
    dropped iff hash(d:i) falls under a fixed fraction (~15%) of the
    hash space. Every property a training pipeline needs from
    augmentation and that RNG-based dropout lacks: reproducible across
    runs, engines, cluster sizes and retries (no RNG state to seed or
    coordinate), per-position independent, and auditable (the oracle
    recomputes the identical choice). Pure scan-level HOFs — no
    shuffle, no Python. Same recipe family as the stratified
    sample_key (operators/corpus.py): keyed md5 as the decision
    variable.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    from hailstorm_spark.functions.hashing import md5_hash60

    tok = docs.select("doc_id", tokens("text").alias("toks"))
    drop_hash = lambda i: md5_hash60(
        F.concat_ws(":", F.col("doc_id").cast("string"), i.cast("string"))
    )
    kept = tok.select(
        "doc_id",
        F.size("toks").alias("n_before"),
        F.filter(
            F.transform(
                F.col("toks"),
                lambda t, idx: F.when(
                    drop_hash(idx + 1) >= F.lit(_DROPOUT_THRESHOLD), t
                ),
            ),
            lambda t: t.isNotNull(),
        ).alias("toks_aug"),
    )
    return kept.select(
        "doc_id",
        "n_before",
        F.size("toks_aug").cast("long").alias("n_after"),
        F.array_join("toks_aug", " ").alias("text_aug"),
    )


#: Mixture-smoothing constant: per-source keep rate = min(1, C/sqrt(n)).
MIXTURE_C = 4.0
#: Hash-space granularity for the deterministic keep decision.
MIXTURE_DENOM = 1_000_000


@register(
    "sample_mixture_inv_sqrt",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source, n_src,
             CAST(floor(least(1.0, {MIXTURE_C} / sqrt(CAST(n_src AS DOUBLE)))
                        * {MIXTURE_DENOM}.0) AS BIGINT) AS threshold
      FROM counts
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {md5_hash60_sql("CAST(d.doc_id AS VARCHAR)", salt="mix")} % {MIXTURE_DENOM}
          < r.threshold
    """,
    tags=("corpus", "sampling", "mixture"),
)
def sample_mixture_inv_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture rebalancing by inverse-sqrt source smoothing:
    heavily-represented sources are downsampled at rate C/sqrt(n_source)
    while small sources pass whole — flattening the source distribution
    the way multilingual/multi-domain training mixes temper dominant
    domains, without any per-row randomness.

    The keep decision is a pure hash threshold (same md5-derived 60-bit
    hash family as MinHash, reduced mod 1e6 against a per-source integer
    threshold), so membership is deterministic, reproducible across
    runs/engines, and embarrassingly parallel. Plan shape at 100 TB: one
    tiny per-source count aggregate, broadcast back, then a map-side
    filter — the corpus itself never shuffles. The threshold arithmetic
    is IEEE sqrt/divide (correctly rounded in every engine) feeding an
    integer floor, so the Spark and DuckDB memberships agree bit-exactly.
    """
    from hailstorm_spark.functions.hashing import md5_hash60

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    rates = counts.select(
        "source",
        F.floor(
            F.least(F.lit(1.0), F.lit(MIXTURE_C) / F.sqrt(F.col("n_src").cast("double")))
            * F.lit(float(MIXTURE_DENOM))
        )
        .cast("long")
        .alias("threshold"),
    )
    keyed = docs.join(F.broadcast(rates), "source")
    kept = keyed.filter(
        F.pmod(md5_hash60(F.col("doc_id").cast("string"), salt="mix"), F.lit(MIXTURE_DENOM))
        < F.col("threshold")
    )
    return kept.select("doc_id", "source")


#: Snapshot-diff fixture: today's crawl drops every 10th doc, edits
#: doc_id < 50, and adds 30 brand-new docs at +700000.
DIFF_EDIT_BELOW = 50
DIFF_ADD_BELOW = 30
DIFF_ADD_SHIFT = 700_000

_TODAY_SQL = f"""
    today AS (
      SELECT doc_id,
             CASE WHEN doc_id < {DIFF_EDIT_BELOW} THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 10 <> 0
      UNION ALL
      SELECT doc_id + {DIFF_ADD_SHIFT} AS doc_id, 'new ' || text AS text
      FROM documents WHERE doc_id < {DIFF_ADD_BELOW}
    )
"""


@register(
    "corpus_snapshot_diff",
    oracle=f"""
    WITH {_TODAY_SQL.strip()},
    y AS (SELECT doc_id, md5(text) AS h FROM documents),
    t AS (SELECT doc_id, md5(text) AS h FROM today)
    SELECT COALESCE(y.doc_id, t.doc_id) AS doc_id,
           CASE WHEN y.doc_id IS NULL THEN 'added'
                WHEN t.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status
    FROM y FULL OUTER JOIN t ON y.doc_id = t.doc_id
    WHERE y.doc_id IS NULL OR t.doc_id IS NULL OR y.h <> t.h
    """,
    tags=("corpus", "diff", "incremental"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day corpus change detection: which documents were
    added, removed, or edited between two snapshots — the audit step
    before any incremental pipeline run (it bounds what downstream
    stages must reprocess).

    Content comparison is on the md5 digest, never the text: the full
    outer join moves (id, 16-byte digest) pairs only, one shuffle on
    doc_id, so at 100 TB the diff costs the same as an id-keyed join of
    two digest columns. Unchanged rows are filtered out — the result is
    exactly the reprocessing worklist.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    today = (
        docs.filter(F.col("doc_id") % 10 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") < DIFF_EDIT_BELOW, F.concat("text", F.lit(" v2"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionAll(
            docs.filter(F.col("doc_id") < DIFF_ADD_BELOW).select(
                (F.col("doc_id") + DIFF_ADD_SHIFT).alias("doc_id"),
                F.concat(F.lit("new "), F.col("text")).alias("text"),
            )
        )
    )
    y = docs.select("doc_id", F.md5("text").alias("h_y"))
    t = today.select("doc_id", F.md5("text").alias("h_t"))
    joined = y.join(t, "doc_id", "full_outer")
    return joined.filter(
        F.col("h_y").isNull() | F.col("h_t").isNull() | (F.col("h_y") != F.col("h_t"))
    ).select(
        "doc_id",
        F.when(F.col("h_y").isNull(), "added")
        .when(F.col("h_t").isNull(), "removed")
        .otherwise("changed")
        .alias("status"),
    )
