"""Third-engine replays for the corpus-hygiene pipeline family.

Hash-prefix stratified sampling, benchmark contamination, Gopher
repetition signals, the PII redaction chain, and the System-R join
cardinality estimator — each replayed in pure Python (hashlib / re /
dict arithmetic) on seeded random inputs with the boundary shapes the
fixtures never produce: non-numeric source suffixes, full-copy
contaminated documents, all-identical-token docs, overlapping PII
matches, and orphaned / skewed join keys."""

from __future__ import annotations

import hashlib
import random
import re

import pandas as pd
import pytest

import hailstorm_spark.queries.corpus_pipeline  # noqa: F401
import hailstorm_spark.queries.integrity  # noqa: F401
from hailstorm_spark.operators.corpus import PII_PATTERNS
from hailstorm_spark.queries.corpus_pipeline import (
    BENCHMARK_SOURCES,
    CONTAM_N,
    SAMPLE_FRAC_EVEN,
    SAMPLE_FRAC_ODD,
)
from hailstorm_spark.registry import QUERIES


def _py_tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip().split() if t]


def _stage_documents(tmp_path, rows) -> str:
    """rows: (doc_id, text, source)."""
    pdf = pd.DataFrame(
        [(d, t, "en", s, len(t)) for d, t, s in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)
    return str(tmp_path)


_WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi",
]


# ------------------------------------------------- stratified sampling


@pytest.mark.parametrize("seed", [97, 2468])
def test_stratified_sample_counts_match_python_replay(spark, tmp_path, seed):
    """sample_stratified_sources vs a hash-for-hash replay of the
    md5-prefix keep rule: 25% threshold ('40') for even-numbered
    sources, 50% ('80') for odd, and the documented fallback of
    non-'srcN' names to the odd fraction. Counts must match exactly —
    the sampling key is deterministic, not statistical."""
    rng = random.Random(seed)
    rows = []
    did = 0
    for s in ("src2", "src3", "src10", "weird", "src"):  # even, odd, even, fallback, fallback
        for _ in range(rng.randrange(40, 80)):
            rows.append((did, "x", s))
            did += 1
    sf_dir = _stage_documents(tmp_path, rows)

    got = {
        r.source: (r.n_docs, r.n_sampled)
        for r in QUERIES["sample_stratified_sources"].fn(spark, sf_dir).collect()
    }

    def thr(source: str) -> str:
        suffix = source[3:]
        try:
            even = int(suffix) % 2 == 0
        except ValueError:
            even = False  # TRY_CAST null % 2 is null, not 0 → odd branch
        frac = SAMPLE_FRAC_EVEN if even else SAMPLE_FRAC_ODD
        return format(round(frac * 256), "02x")

    expected: dict = {}
    for d, _, s in rows:
        key = hashlib.md5(str(d).encode()).hexdigest()[:2]
        n, k = expected.get(s, (0, 0))
        expected[s] = (n + 1, k + (1 if key < thr(s) else 0))
    assert got == expected
    # both fallback sources used the odd fraction; sanity: rates differ
    assert expected["src2"][1] > 0 and expected["src3"][1] > 0


# ----------------------------------------------------- contamination


@pytest.mark.parametrize("seed", [101, 5150])
def test_contamination_overlap_matches_python_replay(spark, tmp_path, seed):
    """contamination_ngram_overlap vs a Python replay of distinct
    word-3-gram set intersection against the src0/src1 benchmark
    union. Planted: a corpus doc that is a VERBATIM copy of a benchmark
    doc (fraction exactly 1.0), a clean doc sharing nothing, a
    half-and-half splice, and sub-3-token docs (no grams → absent from
    the output)."""
    rng = random.Random(seed)
    rows = []

    def mk_text(n):
        return " ".join(rng.choice(_WORDS[:8]) for _ in range(n))

    bench_texts = [mk_text(20) for _ in range(4)]
    did = 0
    for t in bench_texts:
        rows.append((did, t, rng.choice(list(BENCHMARK_SOURCES))))
        did += 1
    copy_id = did
    rows.append((did, bench_texts[0], "src7")); did += 1
    clean_id = did
    rows.append((did, " ".join(["qq", "rr", "ss", "tt", "uu", "vv"]), "src7")); did += 1
    splice_id = did
    rows.append((did, bench_texts[1] + " www xxx yyy zzz qqq rrr sss", "src7")); did += 1
    short_id = did
    rows.append((did, "two words", "src7")); did += 1
    for _ in range(10):
        rows.append((did, mk_text(rng.randrange(0, 15)), "src7")); did += 1
    sf_dir = _stage_documents(tmp_path, rows)

    got = {
        r.doc_id: (r.n_distinct_ngrams, r.n_contaminated, r.contamination_frac)
        for r in QUERIES["contamination_ngram_overlap"].fn(spark, sf_dir).collect()
    }

    def grams(text):
        toks = _py_tokens(text)
        return {
            " ".join(toks[i : i + CONTAM_N])
            for i in range(len(toks) - CONTAM_N + 1)
        }

    bench_set = set()
    for d, t, s in rows:
        if s in BENCHMARK_SOURCES:
            bench_set |= grams(t)
    expected = {}
    for d, t, s in rows:
        if s in BENCHMARK_SOURCES:
            continue
        g = grams(t)
        if not g:
            continue
        n_cont = len(g & bench_set)
        expected[d] = (len(g), n_cont, float(n_cont) / max(len(g), 1))
    assert got == expected
    assert got[copy_id][2] == 1.0
    assert got[clean_id][1] == 0
    assert 0.0 < got[splice_id][2] < 1.0
    assert short_id not in got


# ------------------------------------------------- repetition signals


@pytest.mark.parametrize("seed", [107, 6006])
def test_repetition_stats_match_python_replay(spark, tmp_path, seed):
    """quality_repetition_stats vs a Python replay of distinct-token
    fraction and top-unigram/bigram share. Planted: an all-same-token
    doc (top fraction 1.0, distinct 1/n), an empty doc (greatest(n,1)
    keeps the fractions 0 without dividing by zero), a single-token
    doc (no bigram → bigram array empty → top_bigram_frac 0), and a
    two-way tie for most-frequent token (fraction depends only on the
    max multiplicity, not the winner)."""
    rng = random.Random(seed)
    rows = [
        (0, " ".join(["loop"] * 12), "src0"),
        (1, "", "src0"),
        (2, "solo", "src0"),
        (3, "tie tie bar bar zap", "src0"),
    ]
    for did in range(4, 30):
        rows.append((did, " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(0, 25))), "src0"))
    sf_dir = _stage_documents(tmp_path, rows)

    got = {
        r.doc_id: (r.n_tokens, r.distinct_frac, r.top_token_frac, r.top_bigram_frac)
        for r in QUERIES["quality_repetition_stats"].fn(spark, sf_dir).collect()
    }

    expected = {}
    for did, t, _ in rows:
        toks = _py_tokens(t)
        n = len(toks)
        bigrams = [" ".join(toks[i : i + 2]) for i in range(n - 1)] if n >= 2 else []

        def top_frac(arr):
            if not arr:
                return 0.0
            best = max(arr.count(x) for x in set(arr))
            return float(best) / max(len(arr), 1)

        expected[did] = (
            n,
            float(len(set(toks))) / max(n, 1),
            top_frac(toks),
            top_frac(bigrams),
        )
    assert got == expected
    assert got[0][2] == 1.0 and got[1] == (0, 0.0, 0.0, 0.0)
    assert got[2][3] == 0.0 and got[3][2] == 0.4


# ------------------------------------------------------ PII redaction


@pytest.mark.parametrize("seed", [109, 9876])
def test_pii_redaction_matches_python_re_replay(spark, tmp_path, seed):
    """pii_redacted_forms vs a Python re.sub replay of the ordered
    pattern chain (email → ipv4 → phone → digit-run). Planted: an
    email whose local part contains a phone-shaped digit run (the
    ordering guarantee: one <EMAIL>, never <EMAIL>+<PHONE>), an IPv4
    that a later digit-run must not re-fire on, a bare long digit run
    (<NUM>), a parenthesized phone, and collision of two different
    raw names onto ONE redacted form (the groupBy must merge them)."""
    rng = random.Random(seed)
    names = [
        "call 5551234567 now",          # digit run ≥ 7 with no sep: phone fires first
        "a 12345678901 b",
        "mail 0701234999@example.com",  # phone-shaped local part → one <EMAIL>
        "ip 10.0.200.1 here",
        "tel (08) 123-45 67",
        "plain name",
        "ref 1234 ok",                  # 4-digit run → <NUM>
        "x 9999 ok",                    # different raw, same redacted as...
        "x 1234 ok",                    # ...this one after <NUM>
    ]
    for _ in range(30):
        names.append(
            rng.choice(
                [
                    f"user{rng.randrange(10**6)}@host{rng.randrange(9)}.org",
                    f"{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}",
                    f"+46 {rng.randrange(10**7, 10**8)}",
                    f"id {rng.randrange(10**4, 10**9)}",
                    "no pii at all",
                ]
            )
        )
    pdf = pd.DataFrame(
        [(i, n) for i, n in enumerate(names)], columns=["c_custkey", "c_name"]
    )
    pdf.to_parquet(str(tmp_path / "customer.parquet"), index=False)

    got = {
        r.redacted_form: r.n
        for r in QUERIES["pii_redacted_forms"].fn(spark, str(tmp_path)).collect()
    }

    expected: dict = {}
    for n in names:
        s = n
        for _, pat, repl in PII_PATTERNS:
            s = re.sub(pat, repl, s)
        expected[s] = expected.get(s, 0) + 1
    assert got == expected
    assert expected.get("mail <EMAIL>", 0) == 1       # ordering guarantee
    assert expected.get("x <NUM> ok", 0) >= 2          # collision merged


# ------------------------------------------- join cardinality estimate


@pytest.mark.parametrize("seed", [113, 3030])
def test_join_cardinality_estimate_matches_python_replay(spark, tmp_path, seed):
    """stats_join_cardinality_estimate vs integer Python arithmetic on
    a staged orders/customer pair with planted ORPHANS on both sides
    (customers with no orders, orders pointing at missing customers)
    and a skewed hot key — the exact shapes that push the System-R
    estimate away from actual and make est_over_actual_pct ≠ 100."""
    rng = random.Random(seed)
    customers = list(range(1, 40)) + [999, 1000]  # 999/1000: no orders
    cust_keys = []
    for _ in range(300):
        k = 7 if rng.random() < 0.4 else rng.choice(customers[:39])
        cust_keys.append(k)
    cust_keys += [5555] * 8  # orphaned orders
    pd.DataFrame(
        [(i, k) for i, k in enumerate(cust_keys)],
        columns=["o_orderkey", "o_custkey"],
    ).to_parquet(str(tmp_path / "orders.parquet"), index=False)
    pd.DataFrame(
        [(k, f"cust{k}") for k in customers], columns=["c_custkey", "c_name"]
    ).to_parquet(str(tmp_path / "customer.parquet"), index=False)

    r = QUERIES["stats_join_cardinality_estimate"].fn(spark, str(tmp_path)).collect()[0]

    n_o, n_c = len(cust_keys), len(customers)
    ndv_o, ndv_c = len(set(cust_keys)), len(set(customers))
    ndv_max = max(ndv_o, ndv_c)
    est = (n_o * n_c) // ndv_max
    actual = sum(1 for k in cust_keys if k in set(customers))
    assert (
        r.n_orders, r.n_customer, r.ndv_max, r.est_rows, r.actual_rows,
        r.est_over_actual_pct,
    ) == (n_o, n_c, ndv_max, est, actual, (100 * est) // actual)
    assert r.est_over_actual_pct != 100  # the planted skew/orphans bite
