"""Text-analysis operators: statistics, token counting, language ID,
fingerprinting.

All pure column expressions (JVM-side HOFs over token arrays); nothing
here shuffles, so these run at scan speed and compose with any
pipeline — the profile a 100 TB corpus-prep job needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hailstorm_spark.functions.text import STOPWORDS, tokens

#: tiny per-language function-word marker sets for the n-gram/stopword
#: language-ID heuristic. Deliberately small + embedded in the oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "que", "y", "una"),
    "de": ("der", "die", "und", "ein", "nicht"),
}

#: BPE-ish token pattern: letter runs, single digits, or single
#: non-alphanumeric glyphs — a cheap stand-in for subword counts.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def token_count(tokens_col: Column) -> Column:
    return F.size(tokens_col).cast("long")


def char_total(tokens_col: Column) -> Column:
    """Total characters across tokens (exact integer aggregate)."""
    return F.aggregate(
        F.transform(tokens_col, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def stopword_count(tokens_col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens_col, lambda t: t.isin(*stopwords))).cast("long")


def marker_score(tokens_col: Column, markers: tuple[str, ...]) -> Column:
    """Number of tokens that are in the marker set (with multiplicity)."""
    return F.size(F.filter(tokens_col, lambda t: t.isin(*markers))).cast("long")


def predicted_lang(tokens_col: Column) -> Column:
    """argmax over language marker scores; 'und' when all zero.

    Ties break by language code order (deterministic, oracle-mirrored).
    """
    expr: Column = F.lit("und")
    best: Column = F.lit(0).cast("long")
    # forward-alphabetical with strict `>`: an earlier code sets `best`
    # first, so a later code must beat (not tie) it — matching the
    # oracle's CASE chain where earlier codes win ties.
    for code in sorted(LANG_MARKERS):
        score = marker_score(tokens_col, LANG_MARKERS[code])
        better = score > best
        expr = F.when(better, F.lit(code)).otherwise(expr)
        best = F.when(better, score).otherwise(best)
    return expr


def ngrams(tokens_col: Column, n: int) -> Column:
    """All word n-grams of a token array, WITH multiplicity (unlike
    dedup's distinct ``shingles``) — the frequency-analysis form."""
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens_col, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def with_word_ngrams(df, tokens_col: str, n: int, out_col: str):
    """DataFrame-level word n-grams via Spark ML's ``NGram`` transformer.

    Same output as :func:`ngrams` (space-joined windows, empty array
    when ``len < n`` — equivalence pinned in tests), but the sliding
    window runs in compiled Scala instead of interpreted Catalyst
    lambdas: measured 3.5× faster at sf0.1. Use this form in hot
    pipelines; the Column form composes better inside expressions.
    """
    from pyspark.ml.feature import NGram

    return NGram(n=n, inputCol=tokens_col, outputCol=out_col).transform(df)


def ngrams_sql(toks_col: str, n: int) -> str:
    """DuckDB SQL equivalent of :func:`ngrams` (``toks_col`` must be a
    plain column name holding the token list; DuckDB lists are 1-based
    like Spark's ``element_at``)."""
    parts = " || ' ' || ".join(f"{toks_col}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks_col}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks_col}) - {n - 1}), i -> {parts}) "
        f"ELSE []::VARCHAR[] END"
    )


def fingerprint(tokens_col: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set — the classic 'fingerprint' clustering key for dedup."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_col))))


def quality_score(text_col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: penalize very short docs,
    very long mean token length, and stopword-free word salad.

    Integer/exact-ratio arithmetic only (deterministic); weights are
    simple rationals so the double math is reproducible.
    """
    toks = tokens(text_col)
    n = token_count(toks)
    chars = char_total(toks)
    mean_len = chars / F.greatest(n, F.lit(1))
    stop_ratio = stopword_count(toks) / F.greatest(n, F.lit(1))
    len_ok = F.when((n >= 20) & (n <= 1000), 1.0).otherwise(0.0)
    word_ok = F.when((mean_len >= 2.0) & (mean_len <= 12.0), 1.0).otherwise(0.0)
    stop_ok = F.when(stop_ratio >= 0.01, 1.0).otherwise(0.0)
    return (len_ok + word_ok + stop_ok) / 3.0


def profile_columns(df, columns: list[str]):
    """Data-profiling summary: one row per column with row/null/distinct
    counts and lexicographic min/max (as strings, so heterogeneous
    columns stack into one frame).

    One pass per column batch via a single multi-aggregate + unpivot
    (stack) — no per-column jobs, no collect; exact distincts (swap in
    approx_count_distinct at extreme cardinalities)."""
    from pyspark.sql import functions as F

    aggs = []
    for c in columns:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in columns
    )
    return wide.selectExpr(
        f"stack({len(columns)}, {stack_args}) as "
        "(column, n_rows, n_nulls, n_distinct, min_str, max_str)"
    )


#: Rabin-Karp rolling-hash constants: window of RK_WINDOW token hashes,
#: polynomial base RK_BASE mod the Mersenne prime RK_MOD (2^31−1).
#: Token hashes are truncated to 30 bits so every product
#: x·B^j mod M stays far inside signed-64 range in any engine.
RK_WINDOW = 4
RK_BASE = 131
RK_MOD = (1 << 31) - 1
RK_MASK30 = (1 << 30) - 1
RK_POWS = tuple(pow(RK_BASE, RK_WINDOW - 1 - j, RK_MOD) for j in range(RK_WINDOW))


def rolling_window_hashes(tokens_col: Column) -> Column:
    """Rabin-Karp hashes of every RK_WINDOW-token window:
    H_i = Σ_j (x_{i+j} · B^{k−1−j} mod M) mod M over 30-bit token
    hashes — the rolling-hash fingerprint primitive (winnowing,
    content-defined chunking, plagiarism detection all start here).
    Pure integer column expression, identical in the SQL oracle."""
    from hailstorm_spark.functions.hashing import md5_hash60

    pows = F.array(*[F.lit(int(p)) for p in RK_POWS])

    def build(toks: Column) -> Column:
        xs = F.transform(toks, lambda t: md5_hash60(t).bitwiseAND(F.lit(RK_MASK30)))

        def win_hash(i: Column) -> Column:
            return (
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(RK_WINDOW - 1)),
                    F.lit(0).cast("long"),
                    lambda acc, j: acc
                    + (
                        F.element_at(xs, (i + j).cast("int"))
                        * F.element_at(pows, (j + 1).cast("int"))
                    )
                    % F.lit(RK_MOD),
                )
                % F.lit(RK_MOD)
            )

        return F.when(
            F.size(toks) >= RK_WINDOW,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (RK_WINDOW - 1)), win_hash
            ),
        ).otherwise(F.array().cast("array<long>"))

    from hailstorm_spark.functions.expr import let_

    return let_(tokens_col, build)
