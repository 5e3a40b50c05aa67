#!/usr/bin/env python
"""Measure the string-vs-hashed shingle detection crossover (judge r11
item 5).

The hashed detector's docstring (operators/dedup.py::
hashed_shingle_spans) claims the string twin's sf0.1 advantage flips
"wherever span text dominates exchange bytes". This script builds a
synthetic LONG-TOKEN corpus where that premise holds by construction —
tokens are 24-32 chars, so an 8-token shingle string is ~230 bytes
against an 8-byte xxhash64 key (~29x) — with heavy cross-document
repetition (documents are concatenations of shared passages, the
boilerplate shape both detectors exist for), and times DETECTION ONLY
(the rewrite half is shared code) for both forms, min-of-2 warm runs
after a discarded warmup.

Protocol notes (bench_budget.json discipline): run on a quiet JVM (no
concurrent pytest sessions), one SparkSession, forms interleaved so
neither benefits from page-cache warmup alone. Results are recorded in
SCALE.md; this script is the reproduction path.

Usage: python scripts/measure_shingle_crossover.py [n_docs]
"""

from __future__ import annotations

import json
import random
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from hailstorm_spark.operators.dedup import hashed_shingle_spans  # noqa: E402
from hailstorm_spark.session import build_spark  # noqa: E402

W = 8
N_PASSAGES = 300
PASSAGE_TOKENS = 30
PASSAGES_PER_DOC = 8


def build_corpus(spark, n_docs: int):
    """(doc_id, tk): each doc = 8 pseudo-randomly chosen shared
    passages of 30 long tokens — cross-doc shingle repetition is dense
    inside passages, sparse across their boundaries."""
    rng = random.Random(12)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    vocab = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(24, 32)))
        for _ in range(4000)
    ]
    passages = [
        (p, [vocab[rng.randrange(len(vocab))] for _ in range(PASSAGE_TOKENS)])
        for p in range(N_PASSAGES)
    ]
    pdf = spark.createDataFrame(passages, "pid long, ptk array<string>")
    docs = (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(PASSAGES_PER_DOC - 1))).alias(
                "slot"
            ),
        )
        .withColumn(
            "pid",
            F.pmod(
                F.xxhash64(F.col("doc_id"), F.col("slot")), F.lit(N_PASSAGES)
            ),
        )
        .join(F.broadcast(pdf), "pid")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("slot", "ptk"))
                    ),
                    lambda r: r.ptk,
                )
            ).alias("tk")
        )
    )
    # materialize once so neither timed form pays corpus construction
    docs = docs.localCheckpoint(eager=True)
    return docs


def string_detection(tk):
    """The string-keyed detector's detection half (the exact shape in
    queries/dedup.py::dedup_unaligned_shingle_spans)."""
    starts = F.when(
        F.size("tk") >= W, F.sequence(F.lit(0), F.size("tk") - W)
    ).otherwise(F.expr("array()").cast("array<int>"))
    shing = tk.select("doc_id", F.explode(starts).alias("s"), F.col("tk")).select(
        "doc_id",
        "s",
        F.array_join(F.slice("tk", F.col("s") + 1, W), " ").alias("shingle"),
    )
    dup = (
        shing.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("df"), F.min("doc_id").alias("keeper"))
        .filter(F.col("df") >= 2)
        .select("shingle", "keeper")
    )
    return (
        shing.join(dup, "shingle")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id", "s")
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = build_spark(
        app_name="shingle-crossover", master="local[8]", shuffle_partitions=32
    )
    tk = build_corpus(spark, n_docs)
    n_tokens = tk.select(F.sum(F.size("tk"))).collect()[0][0]

    forms = {
        "string": lambda: string_detection(tk).count(),
        "hashed": lambda: hashed_shingle_spans(tk, w=W).count(),
    }
    rows = {}
    # warmup (discarded), then two timed rounds, forms interleaved
    for name, fn in forms.items():
        rows[name] = {"n_rem": fn(), "times": []}
    for _ in range(2):
        for name, fn in forms.items():
            t0 = time.monotonic()
            fn()
            rows[name]["times"].append(round(time.monotonic() - t0, 3))

    out = {
        "n_docs": n_docs,
        "n_tokens": int(n_tokens),
        "avg_token_chars": 28,
        "string_sec_min2": min(rows["string"]["times"]),
        "hashed_sec_min2": min(rows["hashed"]["times"]),
        "string_times": rows["string"]["times"],
        "hashed_times": rows["hashed"]["times"],
        "rem_rows_string": rows["string"]["n_rem"],
        "rem_rows_hashed": rows["hashed"]["n_rem"],
    }
    out["hashed_over_string"] = round(
        out["hashed_sec_min2"] / out["string_sec_min2"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
