"""Portable Bloom filter: structure, guarantees, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.io import load_table
from hailstorm_spark.operators.bloom import (
    WORD_BITS,
    bloom_bit_positions,
    bloom_build,
    bloom_might_contain,
)
from tests.conftest import SF_DIR


def test_no_false_negatives_and_some_false_positives(spark):
    """Every inserted key must test positive; the deliberately
    undersized filter must also produce at least one false positive so
    the accounting path is exercised, and fewer positives than rows so
    the filter actually prunes."""
    m, k = 128, 2
    keys = spark.range(50).select(F.md5(F.col("id").cast("string")).alias("key"))
    packed = bloom_build(keys, F.col("key"), m, k)
    assert len(packed) == m // WORD_BITS
    # members: all positive
    members = keys.withColumn("pos", bloom_might_contain(F.col("key"), packed, m, k))
    assert members.filter(~F.col("pos")).count() == 0
    # non-members: 128 bits for 50 keys*2 hashes is saturated enough to
    # collide, but not fully saturated
    probe = spark.range(50, 1050).select(
        F.md5(F.col("id").cast("string")).alias("key")
    )
    n_pos = probe.filter(bloom_might_contain(F.col("key"), packed, m, k)).count()
    assert 0 < n_pos < 1000


def test_probe_side_predicate_is_shuffle_free(spark):
    """The membership predicate must compile to a scan-level filter:
    zero Exchange in the pruned-probe plan (the whole point of the
    operator — the 100 TB side never moves)."""
    docs = load_table(spark, SF_DIR, "documents")
    banned = docs.limit(20).select(F.md5("text").alias("key"))
    packed = bloom_build(banned, F.col("key"), 256, 2)
    pruned = docs.select(F.md5("text").alias("key")).filter(
        bloom_might_contain(F.col("key"), packed, 256, 2)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_packed_words_stay_nonnegative(spark):
    """32-bit packing inside signed 64-bit words: no word may ever be
    negative (a sign-bit excursion would break the shiftright probe)."""
    keys = spark.range(5000).select(F.md5(F.col("id").cast("string")).alias("key"))
    packed = bloom_build(keys, F.col("key"), 256, 4)  # heavily saturated
    assert all(0 <= w < (1 << WORD_BITS) for w in packed)


def test_positions_match_sql_twin(spark, oracle):
    """bloom_bit_positions and its SQL twin agree value-for-value."""
    from hailstorm_spark.operators.bloom import bloom_bit_positions_sql

    rows = (
        spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], ["key"])
        .select(bloom_bit_positions(F.col("key"), 512, 3).alias("p"))
        .collect()
    )
    got_spark = [list(r["p"]) for r in rows]
    got_sql = [
        list(r[0])
        for r in oracle.execute(
            f"SELECT {bloom_bit_positions_sql('key', 512, 3)} "
            "FROM (VALUES ('alpha'), ('beta'), ('gamma')) t(key)"
        ).fetchall()
    ]
    assert got_spark == got_sql
