"""Unit tests for the corpus-preparation operators on adversarial
inputs the synthetic corpus doesn't contain: real emails / phones /
IPs for redaction, planted contamination, packing invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.operators.corpus import (
    PII_PATTERNS,
    contamination,
    hex_threshold,
    pack_sequences,
    redact_pii,
    redaction_count,
)
from hailstorm_spark.operators.text import ngrams
from hailstorm_spark.functions.text import tokens


def test_redact_pii_on_real_pii_strings(spark):
    rows = [
        ("contact alice.smith+spam@example.co.uk today", "<EMAIL>"),
        ("server at 192.168.001.255 rebooted", "<IP>"),
        ("call +1 (555) 123-4567 now", "<PHONE>"),
        ("order 123456789 shipped", None),  # digit run: phone-pattern fires first
        ("pin 1234 set", "<NUM>"),  # too short for phone, caught by digits
        ("no pii here", None),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    out = [r[0] for r in df.select(redact_pii("text")).collect()]
    assert out[0] == "contact <EMAIL> today"
    assert out[1] == "server at <IP> rebooted"
    assert out[2] == "call <PHONE> now"
    assert out[3] == "order <PHONE> shipped"
    assert out[4] == "pin <NUM> set"
    assert out[5] == "no pii here"


def test_redaction_counts_per_pattern(spark):
    df = spark.createDataFrame(
        [("a@b.com and c@d.org via 10.0.0.1",)], ["text"]
    )
    email_pat = PII_PATTERNS[0][1]
    ip_pat = PII_PATTERNS[1][1]
    row = df.select(
        redaction_count("text", email_pat).alias("e"),
        redaction_count("text", ip_pat).alias("i"),
    ).first()
    assert (row.e, row.i) == (2, 1)


def test_contamination_planted_overlap(spark):
    # benchmark doc shares a 3-gram window with corpus doc 1, not doc 2
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"]
    ).select("doc_id", ngrams(tokens("text"), 3).alias("grams"))
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma epsilon"),  # shares 'alpha beta gamma'
            (2, "zeta eta theta iota"),  # shares nothing
        ],
        ["doc_id", "text"],
    ).select("doc_id", ngrams(tokens("text"), 3).alias("grams"))
    out = {
        r.doc_id: (r.n_distinct_ngrams, r.n_contaminated, r.contamination_frac)
        for r in contamination(corpus, bench, "doc_id", "grams").collect()
    }
    assert out[1] == (2, 1, 0.5)
    assert out[2] == (2, 0, 0.0)


def test_contamination_plan_broadcasts_benchmark(spark):
    from tests.test_plans import plan_of

    plan = plan_of(spark, "contamination_ngram_overlap", mode="simple")
    # single-pass shape: ONE broadcast outer join on the digest, ONE
    # aggregation — no semi+outer pair, no aggregate-aggregate join
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_invariants(spark):
    df = spark.createDataFrame(
        [("s", i, 100) for i in range(10)], ["src", "doc_id", "n_tokens"]
    )
    packed = pack_sequences(df, "src", "doc_id", "n_tokens", 256)
    rows = sorted((r.doc_id, r.seq_id) for r in packed.collect())
    # docs 0,1,2 start below 256/512 → bins 0,0,0? tokens_before: 0,100,200,
    # 300,...  floor(/256): 0,0,0,1,1,1(500?) ... deterministic check:
    expect = [(i, (i * 100) // 256) for i in range(10)]
    assert rows == expect
    # bins are contiguous, non-decreasing, and no doc is split
    seqs = [s for _, s in rows]
    assert seqs == sorted(seqs)


def test_hex_threshold_exact_fractions():
    assert hex_threshold(0.25) == "40"
    assert hex_threshold(0.5) == "80"
    # keep-all must sort ABOVE every hex pair ("100" < "ff" as strings)
    assert hex_threshold(1.0) > "ff"
    assert hex_threshold(0.0) == "00"


def test_ml_ngram_equivalent_to_hof_ngrams(spark):
    """with_word_ngrams (Scala NGram) must stay bit-identical to the
    Column-form ngrams(), including len<n -> empty array."""
    from hailstorm_spark.operators.text import with_word_ngrams

    df = spark.createDataFrame(
        [(1, ["a", "b", "c", "a", "b"]), (2, ["x", "y"]), (3, [])],
        "doc_id: long, toks: array<string>",
    )
    fast = {r.doc_id: r.g for r in with_word_ngrams(df, "toks", 3, "g").collect()}
    slow = {
        r.doc_id: r.g
        for r in df.select("doc_id", ngrams(F.col("toks"), 3).alias("g")).collect()
    }
    assert fast == slow


def test_cap_per_key_exercises_both_branches(spark):
    """cap_per_key: over-cap keys are ranked and truncated, under-cap
    keys bypass the window whole (the skew design's fast path)."""
    from pyspark.sql import functions as F

    from hailstorm_spark.operators.corpus import cap_per_key

    rows = [("big", i, 100 - i) for i in range(15)] + [
        ("small", i, 50 + i) for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    out = cap_per_key(df, "source", [F.desc("n_chars"), F.asc("doc_id")], 10)
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"big": 10, "small": 3}
    # over-cap keeps the TOP-k by the order: big kept docs are ids 0..9
    big_ids = sorted(
        r.doc_id for r in out.filter(F.col("source") == "big").collect()
    )
    assert big_ids == list(range(10))
