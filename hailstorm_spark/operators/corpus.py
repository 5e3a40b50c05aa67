"""Corpus-preparation operators a large-scale training-data pipeline
needs beyond dedup/similarity: PII redaction, repetition-based quality
signals, benchmark-contamination detection, deterministic stratified
sampling, and token-budget sequence packing.

Everything is a pure column expression or an equi-join — no Python in
the hot path, no driver-side materialization — so each operator runs at
scan speed over a 100 TB corpus:

- redaction is ``regexp_replace`` chains (JVM, codegen'd);
- repetition stats are HOFs over the per-document token array (row-local,
  zero shuffle);
- contamination joins the corpus's exploded n-gram digests against a
  BROADCAST benchmark digest set (eval sets are tiny; the corpus side
  streams);
- sampling keys on an md5 prefix of the document id — deterministic,
  uniform, reproducible across engines and runs, no RNG state;
- packing is one window cumulative sum per stratum (each stratum sorts
  independently — at 100 TB strata are date×source shards, so no global
  sort exists).

The reference engine has none of this surface (its only text processing
is word splitting, reference src/Hailstorm/Sample/WordCountSample.hs:77-78);
this module is part of the additive LLM-pipeline capability the brief
asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: PII patterns, ordered. A common RE2/Java-regex subset (no lookarounds,
#: no backrefs) so the Spark expression and any SQL oracle agree glyph
#: for glyph. Replacement tags are visible-by-design, never empty, so
#: downstream token counts shift predictably.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
    ("digits", r"[0-9]{4,}", "<NUM>"),
)


def redact_pii(col: Column | str, patterns=PII_PATTERNS) -> Column:
    """Apply every redaction pattern in order (email before phone so a
    phone-like digit run inside an address never double-fires)."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in patterns:
        c = F.regexp_replace(c, pat, repl)
    return c


def redaction_count(col: Column | str, pattern: str) -> Column:
    """How many times one pattern fires in the column (pre-redaction)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("long")


# --- repetition / quality ---------------------------------------------------

def distinct_fraction(tokens_col: Column) -> Column:
    """|distinct tokens| / |tokens| — low values mean word-salad loops."""
    return (
        F.size(F.array_distinct(tokens_col))
        / F.greatest(F.size(tokens_col), F.lit(1))
    ).cast("double")


def top_fraction(grams_col: Column) -> Column:
    """Fraction of the array taken by its single most frequent element
    (Gopher-style repetition signal; > ~0.2 on a unigram array flags a
    degenerate document).

    Row-local and JVM-side: sort the array once, then a single
    aggregate pass finds the longest equal-run — O(n log n) per
    document (the naive count-each-distinct form is O(u·n) and
    measured 5× slower at sf0.1). The SQL mirror keeps the O(u·n)
    form for clarity; both compute the max multiplicity exactly.
    """
    srt = F.array_sort(grams_col)
    best = F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc.prev), acc.run + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc.best,
                F.when(x.eqNullSafe(acc.prev), acc.run + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return (best / F.greatest(F.size(grams_col), F.lit(1))).cast("double")


def top_fraction_sql(grams: str) -> str:
    """DuckDB mirror of :func:`top_fraction` (``grams`` is a list expr)."""
    return (
        f"CAST(coalesce(list_max(list_transform(list_distinct({grams}), "
        f"g -> len(list_filter({grams}, x -> x = g)))), 0) AS DOUBLE)"
        f" / greatest(len({grams}), 1)"
    )


# --- contamination ----------------------------------------------------------

def ngram_digests(grams_col: Column) -> Column:
    """Distinct md5 digests of an n-gram array — the narrow join key for
    contamination checks (16-byte digests shuffle, raw text never does)."""
    return F.array_distinct(F.transform(grams_col, F.md5))


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    grams_col: str,
) -> DataFrame:
    """Per-document benchmark contamination: the fraction of a corpus
    document's distinct n-grams that also appear anywhere in the
    benchmark set.

    ``corpus``/``benchmark`` must carry ``grams_col`` (an n-gram array).
    The benchmark digest set is deduplicated then BROADCAST — eval sets
    are O(MB) against a 100 TB corpus — so the corpus side is one
    map-side broadcast join over the exploded digests plus ONE groupBy
    on the document id; no corpus self-join, no second corpus scan, no
    driver collect.
    """
    bench = (
        benchmark.select(F.explode(ngram_digests(F.col(grams_col))).alias("h"))
        .distinct()
        .withColumn("hit", F.lit(1).cast("long"))
    )
    exploded = corpus.select(
        F.col(id_col), F.explode(ngram_digests(F.col(grams_col))).alias("h")
    )
    # Single pass: left-outer against the broadcast digest set, then one
    # aggregation yields both the denominator (all exploded rows) and the
    # numerator (rows that found a benchmark hit) — no second scan of the
    # corpus, no aggregate-aggregate join.
    return (
        exploded.join(F.broadcast(bench), "h", "left_outer")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct_ngrams"),
            F.coalesce(F.sum("hit"), F.lit(0).cast("long")).alias("n_contaminated"),
        )
        .select(
            F.col(id_col),
            "n_distinct_ngrams",
            "n_contaminated",
            (F.col("n_contaminated") / F.greatest("n_distinct_ngrams", F.lit(1)))
            .cast("double")
            .alias("contamination_frac"),
        )
    )


# --- deterministic sampling -------------------------------------------------

def sample_key(id_col: Column | str) -> Column:
    """Uniform, engine-portable sampling key: the first two hex chars of
    md5(id) — 256 equiprobable buckets, compared as strings so no
    integer parsing differs between engines."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string")), 1, 2)


def sample_key_sql(id_expr: str) -> str:
    return f"substr(md5(CAST({id_expr} AS VARCHAR)), 1, 2)"


def hex_threshold(fraction: float) -> str:
    """Hex prefix below which a row is kept to sample ~``fraction``
    (resolution 1/256; exact for multiples of 1/256 like 0.25, 0.5).

    fraction >= 1 returns 'g' — lexicographically above every hex pair,
    so everything is kept ('100' would compare BELOW 'ff' as a string).
    """
    n = round(fraction * 256)
    return "g" if n >= 256 else format(n, "02x")


# --- sequence packing -------------------------------------------------------

def pack_sequences(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    tokens_len_col: str,
    budget: int,
) -> DataFrame:
    """Assign each document to a training-sequence bin: documents are
    taken in ``order_col`` order within a stratum, and a document starts
    in the bin where its cumulative token count (exclusive) lands —
    ``seq_id = floor(tokens_before / budget)``.

    One window sum per stratum; strata pack independently and in
    parallel (at 100 TB a stratum is a source×date shard, so the sort is
    shard-local, never global). Deterministic given a deterministic
    ``order_col``.
    """
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens_len_col).over(w), F.lit(0))
    return df.withColumn("seq_id", F.floor(before / F.lit(budget)).cast("long"))


def cap_per_key(
    df: DataFrame,
    key: str,
    order_cols: list,
    k: int,
) -> DataFrame:
    """Keep at most ``k`` rows per ``key``, preferring ``order_cols``
    (must be a total order within a key for a deterministic kept set).

    Skew-aware: a per-key window would sort every key's rows, but the
    cap only binds on over-cap keys. The per-key histogram (tiny —
    one row per key) is computed first and broadcast; under-cap keys
    bypass the window entirely, and only over-cap keys' rows — on a
    web crawl, the few giant domains — are shuffled and ranked.
    """
    from pyspark.sql import Window

    hist = df.groupBy(key).agg(F.count(F.lit(1)).alias("__n"))
    over = hist.filter(F.col("__n") > k).select(key)
    under_rows = df.join(F.broadcast(over), key, "left_anti")
    w = Window.partitionBy(key).orderBy(*order_cols)
    over_rows = (
        df.join(F.broadcast(over), key)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
    return under_rows.unionByName(over_rows.select(*under_rows.columns))
