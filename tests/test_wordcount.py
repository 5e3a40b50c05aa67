"""Reference-parity checks for the word-count topology (SURVEY §2.4)."""

from __future__ import annotations

from hailstorm_spark.queries.wordcount import TOP_N, wordcount, wordcount_top20
from tests.conftest import SF_DIR


def test_top20_is_bounded_and_sorted(spark):
    rows = wordcount_top20(spark, SF_DIR).collect()
    assert 0 < len(rows) <= TOP_N
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True)
    # ties broken by word asc
    for a, b in zip(rows, rows[1:]):
        if a.cnt == b.cnt:
            assert a.word < b.word


def test_wordcount_total_matches_token_count(spark):
    from pyspark.sql import functions as F

    from hailstorm_spark.queries.wordcount import words_df

    total_tokens = words_df(spark, SF_DIR).count()
    total_counted = (
        wordcount(spark, SF_DIR).agg(F.sum("cnt").alias("s")).collect()[0].s
    )
    assert total_tokens == total_counted > 0
