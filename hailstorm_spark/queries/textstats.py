"""Text-analysis queries over the documents table (SURVEY §7 step 5 /
BASELINE.json north star), each with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hailstorm_spark.functions.text import STOPWORDS, tokens, tokens_sql
from hailstorm_spark.io import load_table
from hailstorm_spark.operators.text import (
    BPE_ISH_PATTERN,
    LANG_MARKERS,
    char_total,
    fingerprint,
    ngrams,
    ngrams_sql,
    predicted_lang,
    quality_score,
    stopword_count,
    token_count,
)
from hailstorm_spark.registry import register

_STOP_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
_TOKS = tokens_sql("text")


@register(
    "text_stats",
    oracle=f"""
    WITH tok AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
    -- COALESCE: DuckDB's list_sum([]) is NULL, Spark's fold is 0 — the
    -- sum over an empty token set is 0 (empty-doc parity, adversarial
    -- sweep find)
    SELECT doc_id, lang,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
             AS BIGINT) AS n_token_chars,
           (CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS DOUBLE)
             / greatest(len(toks), 1)) AS mean_token_len,
           CAST(len(list_filter(toks, t -> list_contains({_STOP_LIST_SQL}, t))) AS BIGINT)
             AS n_stopwords,
           (CAST(len(list_filter(toks, t -> list_contains({_STOP_LIST_SQL}, t))) AS DOUBLE)
             / greatest(len(toks), 1)) AS stopword_ratio
    FROM tok
    """,
    tags=("text", "north-star"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics — columnar HOFs, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    d = docs.select("doc_id", "lang", toks.alias("toks"))
    n = token_count(F.col("toks"))
    chars = char_total(F.col("toks"))
    stops = stopword_count(F.col("toks"))
    return d.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        chars.alias("n_token_chars"),
        (chars.cast("double") / F.greatest(n, F.lit(1))).alias("mean_token_len"),
        stops.alias("n_stopwords"),
        (stops.cast("double") / F.greatest(n, F.lit(1))).alias("stopword_ratio"),
    )


@register(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{BPE_ISH_PATTERN}')) AS BIGINT)
             AS bpeish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_tokens_len4
    FROM documents
    """,
    tags=("text", "north-star"),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three token-count estimators: whitespace, BPE-ish regex, len/4."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(tokens("text")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_ISH_PATTERN), F.lit(0)))
        .cast("long")
        .alias("bpeish_tokens"),
        F.ceil(F.length("text") / 4.0).alias("approx_tokens_len4"),
    )


def _langid_oracle() -> str:
    score_cols = ",\n           ".join(
        f"CAST(len(list_filter(toks, t -> list_contains("
        f"[{', '.join(repr(w) for w in LANG_MARKERS[code])}], t))) AS BIGINT) AS score_{code}"
        for code in sorted(LANG_MARKERS)
    )
    # argmax with ties to alphabetically-first code, 'und' if all zero
    case_order = sorted(LANG_MARKERS)
    whens = []
    for i, code in enumerate(case_order):
        others = [f"score_{c}" for c in case_order if c != code]
        strictly_before = [f"score_{c}" for c in case_order[:i]]
        cond = f"score_{code} > 0"
        for o in strictly_before:
            cond += f" AND score_{code} > {o}"
        for o in [f"score_{c}" for c in case_order[i + 1 :]]:
            cond += f" AND score_{code} >= {o}"
        whens.append(f"WHEN {cond} THEN '{code}'")
    case_sql = "CASE " + " ".join(whens) + " ELSE 'und' END"
    return f"""
    WITH tok AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    scored AS (
      SELECT doc_id, lang,
           {score_cols}
      FROM tok
    )
    SELECT doc_id, lang AS labeled_lang, {case_sql} AS predicted_lang
    FROM scored
    """


@register("text_langid", oracle=_langid_oracle(), tags=("text", "north-star"))
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word language ID (argmax over marker-set hit counts).

    On the synthetic corpus every language shares one vocabulary, so
    the prediction mostly lands 'en'/'und' — the operator's value here
    is its deterministic, oracle-checkable scoring pipeline; swap in
    real marker profiles (or char n-gram profiles) for real corpora.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.col("lang").alias("labeled_lang"), tokens("text").alias("toks"))
    return d.select("doc_id", "labeled_lang", predicted_lang(F.col("toks")).alias("predicted_lang"))


@register(
    "text_fingerprint_groups",
    oracle=f"""
    WITH fp AS (
      -- COALESCE: DuckDB's array_to_string([], ' ') is NULL where
      -- Spark's concat_ws is '' — an empty doc must fingerprint as
      -- md5(''), not NULL (empty-doc parity, adversarial sweep find)
      SELECT doc_id,
             md5(COALESCE(array_to_string(list_sort(list_distinct({_TOKS})), ' '), ''))
               AS fingerprint
      FROM documents
    )
    SELECT fingerprint, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_docs
    FROM fp
    GROUP BY fingerprint
    """,
    tags=("text", "dedup", "north-star"),
)
def text_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint (md5 of sorted distinct
    token set) → dedup groups keeping the smallest doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", fingerprint(tokens("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_quality_scores",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n,
             CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS chars,
             CAST(len(list_filter(toks, t -> list_contains({_STOP_LIST_SQL}, t))) AS BIGINT) AS stops
      FROM tok
    )
    SELECT doc_id,
           ((CASE WHEN n >= 20 AND n <= 1000 THEN 1.0 ELSE 0.0 END
             + CASE WHEN CAST(chars AS DOUBLE)/greatest(n,1) >= 2.0
                     AND CAST(chars AS DOUBLE)/greatest(n,1) <= 12.0 THEN 1.0 ELSE 0.0 END
             + CASE WHEN CAST(stops AS DOUBLE)/greatest(n,1) >= 0.01 THEN 1.0 ELSE 0.0 END)
            / 3.0) AS quality
    FROM m
    """,
    tags=("text", "north-star"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic in [0,1] (length band, mean token
    length band, stopword presence)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality"))


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tf AS (
      SELECT doc_id, unnest(toks) AS term FROM tok
    ),
    tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term),
    dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, tf, df,
             CAST(tf AS DOUBLE)
               * ((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
               AS tfidf
      FROM tfc JOIN dfc USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf, top_rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS top_rank
      FROM scored
    ) WHERE top_rank <= 5
    """,
    tags=("text", "north-star"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document.

    IDF is the log-free rational form tf * (N - df + 0.5)/(df + 0.5)
    (BM25's idf argument without the ln): monotone in the classic idf,
    so rankings are identical, and every arithmetic step is a single
    correctly-rounded IEEE op — bit-identical across engines, which a
    libm `ln` would not guarantee. Swap in log_idf for interop with
    other scorers.

    Plan shape: explode → (doc,term) partial+final count → term-keyed
    df agg → shuffle join tf⋈df on term → per-doc window top-5. Two
    aggregation shuffles + one join shuffle + one window shuffle, all
    equi-keyed; nothing driver-side (the corpus count crosses as a
    1-row broadcast).
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.join(df, "term").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "term",
        "tf",
        "df",
        (
            F.col("tf").cast("double")
            * (
                ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            )
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn("top_rank", F.row_number().over(w)).filter(
        F.col("top_rank") <= 5
    )


@register(
    "text_ngram_stats",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g2 AS (SELECT doc_id, unnest({ngrams_sql('toks', 2)}) AS ngram FROM tok),
    a2 AS (SELECT 2 AS n, ngram, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS n_docs
           FROM g2 GROUP BY ngram),
    g3 AS (SELECT doc_id, unnest({ngrams_sql('toks', 3)}) AS ngram FROM tok),
    a3 AS (SELECT 3 AS n, ngram, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS n_docs
           FROM g3 GROUP BY ngram),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY n
                                   ORDER BY cnt DESC, ngram ASC) AS top_rank
      FROM (SELECT * FROM a2 UNION ALL SELECT * FROM a3)
    )
    SELECT CAST(n AS INT) AS n, ngram, cnt, n_docs, top_rank
    FROM ranked WHERE top_rank <= 20
    """,
    tags=("text", "north-star"),
)
def text_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 bigrams and trigrams by occurrence count
    (with document frequency).

    Per n: explode n-grams (multiplicity preserved, unlike dedup's
    distinct shingles) → one hash agg on ngram → top-20 via
    TakeOrderedAndProject (per-partition heaps + O(k) merge — no
    global sort of the ngram table); the rank window then runs on the
    20 surviving rows only.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("toks"))

    def top_for(n: int) -> DataFrame:
        grams = toks.select("doc_id", F.explode(ngrams(F.col("toks"), n)).alias("ngram"))
        agg = grams.groupBy("ngram").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        top = agg.orderBy(F.desc("cnt"), F.asc("ngram")).limit(20)
        w = Window.partitionBy().orderBy(F.desc("cnt"), F.asc("ngram"))
        return top.select(
            F.lit(n).alias("n"), "ngram", "cnt", "n_docs",
            F.row_number().over(w).alias("top_rank"),
        )

    return top_for(2).unionByName(top_for(3))


def _profile_oracle() -> str:
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    parts = [
        f"""SELECT '{c}' AS "column", COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               MIN(CAST({c} AS VARCHAR)) AS min_str,
               MAX(CAST({c} AS VARCHAR)) AS max_str
        FROM documents"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


@register(
    "profile_documents_columns",
    oracle=_profile_oracle(),
    tags=("profile", "north-star"),
)
def profile_documents_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling of the documents table — the dataset health
    check every ingestion run starts with (rows/nulls/distincts/
    min/max per column), as ONE multi-aggregate pass + stack unpivot
    (never a per-column job)."""
    from hailstorm_spark.operators.text import profile_columns

    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(docs, ["doc_id", "text", "lang", "source", "n_chars"])


def _rolling_oracle() -> str:
    from hailstorm_spark.functions.hashing import md5_hash60_sql
    from hailstorm_spark.operators.text import RK_MASK30, RK_MOD, RK_POWS, RK_WINDOW

    x = f"({md5_hash60_sql('t')} & {RK_MASK30})"
    pow_list = "[" + ", ".join(str(int(p)) for p in RK_POWS) + "]"
    terms = f"""list_sum(list_transform(generate_series(0, {RK_WINDOW - 1}),
                 j -> (xs[i + j] * ({pow_list})[j + 1]) % {RK_MOD}))"""
    return f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    hashed AS (
      SELECT doc_id, list_transform(toks, t -> {x}) AS xs, len(toks) AS n
      FROM tok
    ),
    wh AS (
      SELECT doc_id,
             CASE WHEN n >= {RK_WINDOW}
                  THEN list_transform(generate_series(1, n - {RK_WINDOW - 1}),
                                      i -> CAST(({terms}) % {RK_MOD} AS BIGINT))
                  ELSE []::BIGINT[] END AS hashes
      FROM hashed
    )
    SELECT doc_id,
           CAST(len(hashes) AS BIGINT) AS n_windows,
           list_min(hashes) AS rk_fingerprint
    FROM wh
    """


@register(
    "text_rolling_fingerprint",
    oracle=_rolling_oracle(),
    tags=("text", "dedup", "north-star"),
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp rolling-hash document fingerprint: min window hash
    over 4-token windows (the winnowing-style signature; near-identical
    prefixes/suffixes share window hashes, so shared fingerprints flag
    overlapping content even when md5-of-document differs). Exact
    integer arithmetic, value-checked against the oracle."""
    from hailstorm_spark.operators.text import rolling_window_hashes

    docs = load_table(spark, sf_dir, "documents")
    hashes = rolling_window_hashes(tokens("text"))
    return docs.select("doc_id", hashes.alias("hashes")).select(
        "doc_id",
        F.size("hashes").cast("long").alias("n_windows"),
        F.array_min("hashes").alias("rk_fingerprint"),
    )


@register(
    "text_unigram_lm_score",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
      GROUP BY doc_id, term
    ),
    counts AS (SELECT term, SUM(tf) AS cnt FROM tf GROUP BY term),
    total AS (SELECT SUM(cnt) AS n_total FROM counts),
    doc AS (
      SELECT tf.doc_id,
             CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
             CAST(SUM(tf.tf * c.cnt) AS BIGINT) AS freq_sum
      FROM tf JOIN counts c USING (term)
      GROUP BY tf.doc_id
    )
    SELECT doc_id, n_tokens, freq_sum,
           CAST(freq_sum AS DOUBLE)
             / (CAST(n_tokens AS DOUBLE) * CAST(n_total AS DOUBLE)) AS score
    FROM doc CROSS JOIN total
    """,
    tags=("text", "north-star"),
)
def text_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency language-model score per document — the exact
    rational core of a unigram-LM perplexity filter: score =
    mean over the doc's tokens of P(token) = cnt(token)/N. Gibberish
    and OCR noise score near 1/N; boilerplate scores high; both tails
    are what a training-data pipeline drops or reweights. The ln-free
    form keeps every step an integer sum or a single correctly-rounded
    IEEE op (bit-identical across engines); a true log-perplexity is a
    monotone transform of this per-token-mean only at fixed doc length,
    so thresholds are calibrated per length band downstream.

    Plan shape (100 TB): explode → (doc,term) partial+final count →
    term-keyed corpus counts → tf⋈counts shuffle join on term → per-doc
    sum. Joining the AGGREGATED tf (one row per doc-term) instead of
    raw postings shrinks the Zipf-skewed term join by the mean
    per-doc term multiplicity; the corpus total crosses as a 1-row
    broadcast. Counts-side broadcast is the further option when the
    vocabulary fits (vocab rows ≪ corpus tokens); AQE skew-join splits
    the hot-term partitions otherwise.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    counts = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("n_total"))
    doc = (
        tf.join(counts, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("cnt")).alias("freq_sum"),
        )
    )
    return doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        "freq_sum",
        (
            F.col("freq_sum").cast("double")
            / (F.col("n_tokens").cast("double") * F.col("n_total").cast("double"))
        ).alias("score"),
    )


@register(
    "text_langid_agreement",
    oracle=f"""
    WITH pred AS ({_langid_oracle()})
    SELECT labeled_lang, predicted_lang, COUNT(*) AS n
    FROM pred
    GROUP BY labeled_lang, predicted_lang
    """,
    tags=("text", "ml-eval", "north-star"),
)
def text_langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts of predicted vs labeled language — the
    label-agreement audit run before trusting either column for corpus
    filtering or mixture weighting (rows off the diagonal are docs
    where the declared lang and the content disagree). One scan, one
    small aggregation; the prediction is the same deterministic
    function-word argmax as text_langid.
    """
    from hailstorm_spark.operators.text import predicted_lang

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            predicted_lang(tokens("text")).alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_token_freq_histogram",
    oracle=f"""
    WITH tok AS (SELECT {_TOKS} AS toks FROM documents),
    terms AS (SELECT unnest(toks) AS term FROM tok),
    counts AS (SELECT term, COUNT(*) AS cnt FROM terms GROUP BY term)
    SELECT length(CAST(cnt AS VARCHAR)) AS freq_magnitude,
           COUNT(*) AS n_terms,
           CAST(SUM(cnt) AS BIGINT) AS n_occurrences
    FROM counts
    GROUP BY 1
    """,
    tags=("text", "corpus-health"),
)
def text_token_freq_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-frequency histogram by order of magnitude — the corpus
    Zipf-tail health check (a fat singleton bucket means OCR noise or
    tokenizer breakage; a missing tail means template text). The
    magnitude bucket is the DIGIT COUNT of the frequency — an exact
    integer stand-in for floor(log10)+1, avoiding libm log() whose
    last-ulp behavior differs across engines. Two aggregation shuffles
    (term counts, then ~10 magnitude groups), nothing else.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.groupBy(
            F.length(F.col("cnt").cast("string")).alias("freq_magnitude")
        )
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("cnt").alias("n_occurrences"),
        )
    )



def _word_adjacency_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-filtered adjacent word pairs (a, b) — the ONE graph
    build shared by the centrality (PageRank) and topology (triangle)
    halves of the word-graph pair, so a tokenizer or stopword change
    can never put them on different graphs."""
    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    tk = docs.select(
        F.filter(tokens("text"), lambda t: ~F.array_contains(stop_arr, t)).alias("tk")
    ).filter(F.size("tk") >= 2)
    return tk.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> struct(element_at(tk, i) AS a, element_at(tk, i + 1) AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")


def _register_pagerank() -> None:
    from hailstorm_spark.operators.graph import (
        SCALE,
        pagerank_integer,
        pagerank_iteration_sql,
    )

    ITERS = 4
    TOPK = 30
    it_sql = pagerank_iteration_sql(SCALE)
    chain = [f"it0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS pr FROM deg)"]
    for t in range(1, ITERS + 1):
        chain.append(f"it{t} AS ({it_sql.format(prev=f'it{t-1}')})")

    @register(
        "text_pagerank_keywords",
        oracle=f"""
        WITH toks AS (
          SELECT list_filter({_TOKS}, t -> NOT list_contains({_STOP_LIST_SQL}, t))
            AS tk
          FROM documents
        ),
        pairs AS (
          SELECT tk[i] AS a, tk[i + 1] AS b
          FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                FROM toks WHERE len(tk) >= 2)
        ),
        edges AS (
          SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
            SELECT a AS src, b AS dst FROM pairs
            UNION ALL
            SELECT b AS src, a AS dst FROM pairs
          ) GROUP BY src, dst
        ),
        deg AS (
          SELECT src AS node, CAST(SUM(w) AS BIGINT) AS wdeg
          FROM edges GROUP BY src
        ),
        {", ".join(chain)}
        SELECT node AS word, pr FROM it{ITERS}
        ORDER BY pr DESC, word LIMIT {TOPK}
        """,
        tags=("text", "graph", "pagerank", "north-star"),
    )
    def text_pagerank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
        """TextRank keyword extraction: weighted PageRank over the
        word-adjacency graph (Mihalcea & Tarau 2004 applied at corpus
        scale) — the classic unsupervised "what is this corpus about"
        signal for training-data curation.

        Graph build: stopword-filtered token streams → adjacent-pair
        edges, symmetrized and count-weighted — two aggregation
        shuffles, both on compact word keys. Then 4 PageRank iterations
        as join+agg rounds (operators/graph.py) with ALL-INTEGER
        scaled arithmetic, so the oracle replays the identical
        iterations and the top-30 ranks compare exactly — an iterative
        distributed algorithm held to value-level parity, not a float
        tolerance. Top-k is TakeOrderedAndProject (no global sort), ties
        broken by word.

        At 100 TB the edge list, degree table, and rank vector all
        partition by word; each iteration is one co-partitioned shuffle
        — the relational Pregel pattern, same scale shape as the
        connected-components operator this complements.
        """
        pairs = _word_adjacency_pairs(spark, sf_dir)
        edges = (
            pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("long").alias("w"))
        )
        ranks = pagerank_integer(edges, iters=ITERS, scale=SCALE)
        return (
            ranks.select(F.col("node").alias("word"), "pr")
            .orderBy(F.desc("pr"), F.asc("word"))
            .limit(TOPK)
        )


_register_pagerank()


@register(
    "text_inverted_index_conjunctive",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    wc AS (SELECT term, COUNT(*) AS cnt FROM words GROUP BY term),
    ranked AS (
      SELECT term, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS r FROM wc
    ),
    q AS (
      SELECT (SELECT term FROM ranked WHERE r = 5) AS term_a,
             (SELECT term FROM ranked WHERE r = 10) AS term_b
    ),
    dt AS (
      SELECT DISTINCT w.doc_id, w.term
      FROM words w, q
      WHERE w.term = q.term_a OR w.term = q.term_b
    ),
    hits AS (
      SELECT doc_id FROM dt GROUP BY doc_id HAVING COUNT(DISTINCT term) = 2
    )
    SELECT q.term_a, q.term_b,
           CAST(COUNT(b.doc_id) AS BIGINT) AS n_docs_both,
           MIN(b.doc_id) AS min_doc,
           MAX(b.doc_id) AS max_doc
    FROM q LEFT JOIN hits b ON TRUE
    GROUP BY q.term_a, q.term_b
    """,
    tags=("text", "retrieval", "index"),
)
def text_inverted_index_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive boolean retrieval through an inverted index: which
    documents contain BOTH of two query terms (here the corpus's 5th-
    and 10th-ranked terms, picked deterministically so the query is
    self-contained).

    The scale shape this models: posting lists (term → doc ids) are the
    standing index, bucketed/partitioned BY TERM at build time, so a
    conjunctive query fetches exactly two index buckets and intersects
    them — the corpus text is never rescanned at query time. In this
    self-contained form the posting fetch is the `term IN (a, b)`
    filter pushed into the postings build (Catalyst pushes it below the
    explode-aggregate, so only matching terms' rows survive the
    shuffle), and the intersection is a 2-term groupBy — join traffic
    ∝ |postings(a)| + |postings(b)|, never ∝ corpus. The two query
    terms come from a bounded top-10 collect (TakeOrderedAndProject).

    Complements text_tfidf_top_terms (scoring) with the retrieval half
    of the IR pair; the reference has neither (its text surface stops
    at word counting, reference src/Hailstorm/Sample/WordCountSample.hs).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    top = (
        words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(10)
        .collect()
    )
    term_a, term_b = top[4]["term"], top[9]["term"]
    dt = words.filter(F.col("term").isin(term_a, term_b)).distinct()
    both = (
        dt.groupBy("doc_id")
        .agg(F.count_distinct("term").alias("nt"))
        .filter(F.col("nt") == 2)
    )
    return both.agg(
        F.lit(term_a).alias("term_a"),
        F.lit(term_b).alias("term_b"),
        F.count(F.lit(1)).cast("long").alias("n_docs_both"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "graph_triangle_count_word_adjacency",
    oracle=f"""
    WITH toks AS (
      SELECT list_filter({_TOKS}, t -> NOT list_contains({_STOP_LIST_SQL}, t))
        AS tk
      FROM documents
    ),
    pairs AS (
      SELECT tk[i] AS a, tk[i + 1] AS b
      FROM (SELECT tk, unnest(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2)
    ),
    edges AS (
      SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v
      FROM pairs WHERE a <> b
      GROUP BY 1, 2
    ),
    tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles
    """,
    tags=("text", "graph", "motif"),
)
def graph_triangle_count_word_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the word-adjacency graph — the standard
    graph-motif statistic (clustering-coefficient numerator) via the
    ordered-edge join method: orient every undirected edge low→high,
    then count paths u→v→w closed by edge (u, w). Orientation makes
    each triangle count EXACTLY once and bounds the middle join's
    fan-out by out-degree under the total order — the classic trick
    that tames hub vertices (a hub's edges split between in/out under
    the ordering). Two equi-joins on word keys; no motif enumeration
    explodes beyond the path count.

    Shares the graph-build with text_pagerank_keywords (same
    stopword-filtered bigram edges, deduplicated and oriented); the
    two queries are the centrality + topology halves of the
    word-graph-analysis pair.
    """
    pairs = _word_adjacency_pairs(spark, sf_dir)
    edges = (
        pairs.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"),
            F.greatest("a", "b").alias("v"),
        )
        .distinct()
    )
    e1 = edges
    e2 = edges.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = edges.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = (
        e1.join(e2, "v")
        .join(e3, (F.col("u") == F.col("u3")) & (F.col("w") == F.col("w3")))
    )
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    return n_edges.crossJoin(F.broadcast(n_tri))


def _register_bpe() -> None:
    """Distributed BPE-style vocabulary induction, 2 merge rounds."""

    def _merge_sql(tk: str, a: str, b: str) -> str:
        # leftmost merge of adjacent pair (a,b); disjoint because the
        # query asserts a <> b (merges_disjoint flag)
        return f"""list_filter(
          list_transform(range(1, len({tk}) + 1), i ->
            CASE WHEN i < len({tk}) AND {tk}[i] = {a} AND {tk}[i+1] = {b}
                 THEN {tk}[i] || '+' || {tk}[i+1]
                 WHEN i > 1 AND {tk}[i-1] = {a} AND {tk}[i] = {b}
                 THEN NULL
                 ELSE {tk}[i] END),
          x -> x IS NOT NULL)"""

    @register(
        "text_bpe_merge_rounds",
        oracle=f"""
        WITH tok0 AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
        p1 AS (
          SELECT tk[i] AS a, tk[i+1] AS b, COUNT(*) AS c
          FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                FROM tok0 WHERE len(tk) >= 2)
          GROUP BY 1, 2
        ),
        b1 AS (SELECT a, b FROM p1 ORDER BY c DESC, a, b LIMIT 1),
        tok1 AS (
          SELECT doc_id, {_merge_sql('t.tk', 'b1.a', 'b1.b')} AS tk
          FROM tok0 t, b1
        ),
        p2 AS (
          SELECT tk[i] AS a, tk[i+1] AS b, COUNT(*) AS c
          FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                FROM tok1 WHERE len(tk) >= 2)
          GROUP BY 1, 2
        ),
        b2 AS (SELECT a, b FROM p2 ORDER BY c DESC, a, b LIMIT 1),
        tok2 AS (
          SELECT doc_id, {_merge_sql('t.tk', 'b2.a', 'b2.b')} AS tk
          FROM tok1 t, b2
        ),
        stats_n AS (
          SELECT CAST(SUM(len(tk)) AS BIGINT) AS n_tokens_after FROM tok2
        ),
        stats_v AS (
          SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS n_vocab_after
          FROM (SELECT unnest(tk) AS t FROM tok2)
        ),
        before AS (
          SELECT CAST(SUM(len(tk)) AS BIGINT) AS n_tokens_before FROM tok0
        )
        SELECT b1.a AS merge1_a, b1.b AS merge1_b,
               b2.a AS merge2_a, b2.b AS merge2_b,
               before.n_tokens_before, stats_n.n_tokens_after,
               stats_v.n_vocab_after,
               (b1.a <> b1.b AND b2.a <> b2.b) AS merges_disjoint
        FROM b1, b2, before, stats_n, stats_v
        """,
        tags=("text", "bpe", "tokenizer", "north-star"),
    )
    def text_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
        """BPE-style vocabulary induction, distributed: two rounds of
        (count adjacent token pairs corpus-wide → pick the most
        frequent, ties lexicographic → merge it everywhere), the inner
        loop of every byte-pair/word-piece tokenizer trainer (Sennrich
        et al. 2016), run at word level over the corpus.

        Each round is ONE aggregation shuffle of (a, b) pair counts
        (map-side combined — the hot pairs compress before moving) and
        a scan-level array rewrite; the argmax pair is a 1-row bounded
        collect, exactly the broadcast-centroid contract of the k-means
        loop. The oracle replays both rounds verbatim, so the chosen
        merges, the post-merge corpus token count, and the vocabulary
        size all compare value-for-value.

        Scoping kept honest: the simple rewrite is only disjoint when
        the merged pair has a ≠ b (an a=b pair can overlap itself and
        needs greedy run-parity tie-breaking); `merges_disjoint` pins
        that both engines agree the condition held — if a future corpus
        ever elects a self-pair, the flag flips on BOTH sides and the
        scoping surfaces in the driver row rather than silently
        diverging.
        """
        docs = load_table(spark, sf_dir, "documents")
        tok = docs.select(tokens("text").alias("tk")).persist()

        def best_pair(tk_df: DataFrame) -> tuple[str, str]:
            r = (
                tk_df.filter(F.size("tk") >= 2)
                .select(
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(tk) - 1),"
                            " i -> struct(element_at(tk, i) AS a,"
                            " element_at(tk, i + 1) AS b))"
                        )
                    ).alias("p")
                )
                .groupBy("p.a", "p.b")
                .agg(F.count(F.lit(1)).alias("c"))
                .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()[0]
            )
            return r["a"], r["b"]

        def merged(tk_df: DataFrame, a: str, b: str) -> DataFrame:
            # size < 2 arrays can't contain a pair — return them
            # unchanged. The guard is also load-bearing for EMPTY
            # arrays: sequence(1, size(tk)) with size = 0 is the
            # DESCENDING [1, 0], whose element_at(tk, 1) faults on the
            # empty array (ANSI). DuckDB's range(1, len+1) is empty
            # there, so only the Spark side would crash — caught by the
            # randomized BPE replay test on corpora with empty docs.
            la, lb = a.replace("'", "''"), b.replace("'", "''")
            return tk_df.select(
                F.expr(
                    "case when size(tk) < 2 then tk else"
                    " filter(transform(sequence(1, size(tk)), i ->"
                    f" case when i < size(tk) and element_at(tk, i) = '{la}'"
                    f" and element_at(tk, i + 1) = '{lb}'"
                    " then concat(element_at(tk, i), '+', element_at(tk, i + 1))"
                    f" when i > 1 and element_at(tk, i - 1) = '{la}'"
                    f" and element_at(tk, i) = '{lb}' then null"
                    " else element_at(tk, i) end),"
                    " x -> x is not null) end"
                ).alias("tk")
            )

        n_before = tok.agg(F.sum(F.size("tk"))).collect()[0][0]
        a1, b1 = best_pair(tok)
        tok1 = merged(tok, a1, b1).persist()
        a2, b2 = best_pair(tok1)
        tok2 = merged(tok1, a2, b2)
        stats = tok2.agg(
            F.sum(F.size("tk")).cast("long").alias("n_tokens_after"),
        ).crossJoin(
            tok2.select(F.explode("tk").alias("t"))
            .agg(F.count_distinct("t").cast("long").alias("n_vocab_after"))
        ).collect()[0]
        tok.unpersist()
        tok1.unpersist()
        return spark.createDataFrame(
            [
                (
                    a1, b1, a2, b2,
                    int(n_before),
                    int(stats["n_tokens_after"]),
                    int(stats["n_vocab_after"]),
                    a1 != b1 and a2 != b2,
                )
            ],
            "merge1_a string, merge1_b string, merge2_a string,"
            " merge2_b string, n_tokens_before long, n_tokens_after long,"
            " n_vocab_after long, merges_disjoint boolean",
        )


_register_bpe()


def _register_bfs() -> None:
    """Multi-source k-hop BFS over the word-adjacency graph."""
    from hailstorm_spark.operators.graph import bfs_iteration_sql, bfs_multi_source

    HOPS = 3
    N_SEEDS = 5
    it = bfs_iteration_sql()
    chain = ["r0 AS (SELECT seed, seed AS node, CAST(0 AS INT) AS dist FROM seeds)"]
    for t in range(1, HOPS + 1):
        chain.append(f"r{t} AS ({it.format(prev=f'r{t-1}')})")

    @register(
        "graph_bfs_khop_reach",
        oracle=f"""
        WITH toks AS (
          SELECT list_filter({_TOKS}, t -> NOT list_contains({_STOP_LIST_SQL}, t))
            AS tk
          FROM documents
        ),
        pairs AS (
          SELECT tk[i] AS a, tk[i + 1] AS b
          FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                FROM toks WHERE len(tk) >= 2)
        ),
        edges AS (
          SELECT src, dst FROM (
            SELECT a AS src, b AS dst FROM pairs WHERE a <> b
            UNION ALL
            SELECT b AS src, a AS dst FROM pairs WHERE a <> b
          ) GROUP BY src, dst
        ),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
        seeds AS (SELECT src AS seed FROM deg ORDER BY d DESC, src LIMIT {N_SEEDS}),
        {", ".join(chain)}
        SELECT seed AS seed_word, CAST(dist AS INT) AS dist,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               MIN(node) AS alpha_min_word
        FROM r{HOPS} GROUP BY seed, dist
        """,
        tags=("text", "graph", "bfs"),
    )
    def graph_bfs_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
        """k-hop reach rings: exact BFS distance from the 5 highest-
        degree words of the word-adjacency graph, 3 hops out — the
        neighborhood-expansion primitive behind "related terms",
        influence radius, and graph-feature engineering (ring sizes ARE
        the features). Completes the graph family: connected components
        (dedup clusters), centrality (PageRank), motifs (triangles),
        and now traversal.

        Each hop is one co-partitioned join+min-aggregation on the node
        key (operators/graph.py::bfs_multi_source; eager checkpoint per
        round because the reached set appears twice in the next round's
        plan — without truncation lineage doubles per hop). The oracle
        replays the identical min-plus rounds as unrolled CTEs, and the
        per-ring MIN(node) witness makes the compare value-level, not
        just cardinality-level.

        Seeds are the top-{N_SEEDS} by degree with ties broken by word
        (TakeOrderedAndProject — no global sort); the frontier join
        broadcasts the small reached set while it is small and shuffles
        by node key once it is not — exactly the plan a 10^9-node graph
        needs.

        Reference parity: the reference has no graph surface at all
        (its pipeline ends at grouped aggregation, reference
        src/Hailstorm/TransformBolt.hs); this extends the engine along
        the public Pregel/GraphX pattern.
        """
        pairs = _word_adjacency_pairs(spark, sf_dir).filter(F.col("a") != F.col("b"))
        edges = (
            pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
            .distinct()
        )
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
        seeds = (
            deg.orderBy(F.col("d").desc(), F.col("src"))
            .limit(N_SEEDS)
            .select(F.col("src").alias("seed"), F.col("src").alias("node"))
        )
        reach = bfs_multi_source(edges, seeds, HOPS)
        return (
            reach.groupBy("seed", "dist")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_nodes"),
                F.min("node").alias("alpha_min_word"),
            )
            .select(
                F.col("seed").alias("seed_word"),
                F.col("dist").cast("int").alias("dist"),
                "n_nodes",
                "alpha_min_word",
            )
        )


_register_bfs()


def _register_feature_hashing() -> None:
    from hailstorm_spark.functions.hashing import md5_hash60, md5_hash60_sql

    B = 64
    tok_b = md5_hash60_sql("t", salt="fh")
    tok_s = md5_hash60_sql("t", salt="fs")

    @register(
        "text_feature_hashing_buckets",
        oracle=f"""
        WITH occ AS (
          SELECT source, UNNEST({_TOKS}) AS t FROM documents
        ),
        f AS (
          SELECT source,
                 {tok_b} % {B} AS bucket,
                 CASE WHEN {tok_s} % 2 = 0 THEN 1 ELSE -1 END AS sgn
          FROM occ
        )
        SELECT source, CAST(bucket AS BIGINT) AS bucket,
               CAST(SUM(sgn) AS BIGINT) AS weight,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM f GROUP BY source, bucket
        """,
        tags=("text", "feature", "hashing-trick"),
    )
    def text_feature_hashing_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The hashing trick (Weinberger et al. 2009): project an
        unbounded token vocabulary into a FIXED {B}-dim feature space
        with a signed hash — the no-vocabulary vectorizer behind
        large-scale linear models and the standard way to featurize
        text without a dictionary build (no second pass, no vocab
        shuffle, new tokens never resize anything). Signs make the
        estimator unbiased: colliding tokens cancel in expectation
        rather than accumulate.

        Per-source bucket weights pin every projected coordinate
        value-for-value (md5-derived bucket and sign, so DuckDB replays
        the projection exactly). Shape: scan-side explode + hash (no
        vocabulary state at all), one (source, bucket) aggregation with
        map-side partial combine — output is |sources|·{B} rows no
        matter how many tokens flow in. That fixed-size property IS the
        100 TB story.
        """
        docs = load_table(spark, sf_dir, "documents")
        occ = docs.select("source", F.explode(tokens("text")).alias("t"))
        f = occ.select(
            "source",
            (md5_hash60(F.col("t"), salt="fh") % B).alias("bucket"),
            F.when(md5_hash60(F.col("t"), salt="fs") % 2 == 0, 1)
            .otherwise(-1)
            .alias("sgn"),
        )
        return f.groupBy("source", "bucket").agg(
            F.sum("sgn").cast("long").alias("weight"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )


_register_feature_hashing()


def _register_lpa() -> None:
    """Weighted label-propagation communities on the word graph."""
    from hailstorm_spark.operators.graph import (
        label_propagation,
        label_propagation_iteration_sql,
    )

    LPA_ITERS = 2
    it = label_propagation_iteration_sql()
    chain = [
        "l0 AS (SELECT node, node AS label FROM"
        " (SELECT src AS node FROM edges UNION SELECT dst FROM edges))"
    ]
    for t in range(1, LPA_ITERS + 1):
        chain.append(f"l{t} AS ({it.format(prev=f'l{t-1}')})")

    @register(
        "graph_lpa_word_communities",
        oracle=f"""
        WITH toks AS (
          SELECT list_filter({_TOKS}, t -> NOT list_contains({_STOP_LIST_SQL}, t))
            AS tk
          FROM documents
        ),
        pairs AS (
          SELECT tk[i] AS a, tk[i + 1] AS b
          FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                FROM toks WHERE len(tk) >= 2)
        ),
        edges AS (
          SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
            SELECT a AS src, b AS dst FROM pairs WHERE a <> b
            UNION ALL
            SELECT b AS src, a AS dst FROM pairs WHERE a <> b
          ) GROUP BY src, dst
        ),
        {", ".join(chain)}
        SELECT label AS community,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               MIN(node) AS alpha_min_word,
               MAX(node) AS alpha_max_word
        FROM l{LPA_ITERS}
        GROUP BY label HAVING COUNT(*) >= 2
        """,
        tags=("text", "graph", "community"),
    )
    def graph_lpa_word_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Community detection on the word-adjacency graph by
        synchronous weighted label propagation, 2 rounds — topical word
        clusters by edge MASS, the complement to connected components
        (which only ask about reachability): a bridge word keeps CC to
        one blob while LPA still splits the mass concentrations.
        Deterministic: synchronous rounds, max-weight label with ties to
        the smallest label, fixed iteration count — so the oracle
        replays the identical rounds as unrolled CTEs and the community
        roster compares exactly (size + alphabetic witnesses per
        community).

        Shares the graph build with PageRank/triangles/BFS (one
        tokenizer, one stopword list — the four queries can never drift
        onto different graphs). Per round: one edge⋈label join, one
        (node, label) weight aggregation, one node-partitioned top-1
        window — every shuffle keys on node/label
        (operators/graph.py::label_propagation).
        """
        pairs = _word_adjacency_pairs(spark, sf_dir).filter(F.col("a") != F.col("b"))
        edges = (
            pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("long").alias("w"))
        )
        labels = label_propagation(edges, iters=LPA_ITERS)
        return (
            labels.groupBy(F.col("label").alias("community"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_members"),
                F.min("node").alias("alpha_min_word"),
                F.max("node").alias("alpha_max_word"),
            )
            .filter(F.col("n_members") >= 2)
        )


_register_lpa()


def _register_oov() -> None:
    VOCAB_K = 1000

    @register(
        "text_tokenizer_oov_rate",
        oracle=f"""
        WITH occ AS (SELECT source, UNNEST({_TOKS}) AS t FROM documents),
        freq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM occ GROUP BY t),
        vocab AS (
          SELECT t FROM (
            SELECT t, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rn FROM freq
          ) WHERE rn <= {VOCAB_K}
        )
        SELECT o.source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_oov,
               CAST((SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) * 10000)
                    // COUNT(*) AS BIGINT) AS oov_rate_x10000
        FROM occ o LEFT JOIN vocab v ON v.t = o.t
        GROUP BY o.source
        """,
        tags=("text", "tokenizer", "vocab"),
    )
    def text_tokenizer_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Tokenizer vocabulary coverage: build the top-{VOCAB_K}
        frequency vocabulary, then measure each source's out-of-
        vocabulary token rate — the health metric that decides whether
        a tokenizer (or its vocab size) fits a new data source before
        training on it, and the acceptance test after every vocab
        rebuild (the consumer of what text_bpe_merge_rounds trains).

        Shape: one term-frequency aggregation, a top-k over the
        aggregated term table (TakeOrderedAndProject — input is the
        |vocab| relation, not the corpus), then the vocabulary — k
        rows — BROADCASTS back against the token stream: the corpus
        never shuffles for the membership test. Rates integer-scaled.
        """
        docs = load_table(spark, sf_dir, "documents")
        occ = docs.select("source", F.explode(tokens("text")).alias("t"))
        freq = occ.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
        vocab = (
            freq.orderBy(F.col("c").desc(), F.col("t"))
            .limit(VOCAB_K)
            .select("t", F.lit(True).alias("in_vocab"))
        )
        return (
            occ.join(F.broadcast(vocab), "t", "left")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_tokens"),
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_oov"),
            )
            .select(
                "source",
                "n_tokens",
                "n_oov",
                F.expr("cast((n_oov * 10000) div n_tokens as bigint)").alias(
                    "oov_rate_x10000"
                ),
            )
        )


_register_oov()


def _register_kcore() -> None:
    """k-core peeling of the word-adjacency graph."""
    from hailstorm_spark.operators.graph import kcore_iteration_sql, kcore_peel

    KCORE_K = 4
    KCORE_ITERS = 3
    it = kcore_iteration_sql(KCORE_K)
    chain = ["e0 AS (SELECT src, dst FROM edges)"]
    for t in range(1, KCORE_ITERS + 1):
        chain.append(f"e{t} AS ({it.format(prev=f'e{t-1}')})")

    @register(
        "graph_kcore_dense_subgraph",
        oracle=f"""
        WITH toks AS (
          SELECT list_filter({_TOKS}, t -> NOT list_contains({_STOP_LIST_SQL}, t))
            AS tk
          FROM documents
        ),
        pairs AS (
          SELECT tk[i] AS a, tk[i + 1] AS b
          FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                FROM toks WHERE len(tk) >= 2)
        ),
        edges AS (
          SELECT src, dst FROM (
            SELECT a AS src, b AS dst FROM pairs WHERE a <> b
            UNION ALL
            SELECT b AS src, a AS dst FROM pairs WHERE a <> b
          ) GROUP BY src, dst
        ),
        {", ".join(chain)},
        nodes AS (SELECT DISTINCT src AS node FROM e{KCORE_ITERS})
        SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_core_nodes,
               CAST((SELECT COUNT(*) FROM e{KCORE_ITERS}) AS BIGINT)
                 AS n_core_edges,
               (SELECT MIN(node) FROM nodes) AS alpha_min_word,
               (SELECT MAX(node) FROM nodes) AS alpha_max_word
        """,
        tags=("text", "graph", "kcore"),
    )
    def graph_kcore_dense_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Dense-subgraph extraction by k-core peeling (k={KCORE_K},
        {KCORE_ITERS} synchronous rounds) on the word-adjacency graph —
        the curation primitive that isolates tightly-connected regions
        (on text graphs: template/boilerplate vocabularies; on link
        graphs: spam farms) by repeatedly shedding low-degree
        periphery. Sixth member of the graph family, sharing the one
        graph build with PageRank / triangles / BFS / LPA so all six
        analyses run on provably the same graph.

        Per round one degree aggregation + two survivor semi-joins, all
        keyed on node ids (operators/graph.py::kcore_peel); the edge
        list only shrinks. The oracle replays the identical peel rounds
        as unrolled CTEs; the result pins survivor counts plus
        alphabetic witnesses.
        """
        pairs = _word_adjacency_pairs(spark, sf_dir).filter(F.col("a") != F.col("b"))
        edges = (
            pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionAll(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
            .distinct()
        )
        core = kcore_peel(edges, k=KCORE_K, iters=KCORE_ITERS)
        nodes = core.select(F.col("src").alias("node")).distinct()
        n_nodes = nodes.agg(
            F.count(F.lit(1)).cast("long").alias("n_core_nodes"),
            F.min("node").alias("alpha_min_word"),
            F.max("node").alias("alpha_max_word"),
        )
        n_edges = core.agg(F.count(F.lit(1)).cast("long").alias("n_core_edges"))
        return n_nodes.crossJoin(F.broadcast(n_edges)).select(
            "n_core_nodes", "n_core_edges", "alpha_min_word", "alpha_max_word"
        )


_register_kcore()
