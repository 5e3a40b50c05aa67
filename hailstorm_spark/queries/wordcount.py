"""Reference-parity word count topology, batch form.

The reference's only shipped topology (reference
src/Hailstorm/Sample/WordCountSample.hs:235-263) is:

    spout (word lines) -> count bolt (per-key running sum, x2)
        -> topn bolt (local top-20 heap, x2) -> merge_sort bolt (global
        top-20, x1) -> file sink

In Spark the whole DAG is one declarative plan. ``groupBy(word).count``
is exactly the count bolt (partial aggregation = the monoid merge,
reference src/Hailstorm/Processor.hs:47-49); ``orderBy(desc).limit(20)``
is exactly topn + merge_sort — Spark's TakeOrderedAndProject physical
operator performs per-partition top-k then a final merge, the same
algorithm the reference hand-codes with priority queues
(WordCountSample.hs:121-132,185-188).

Scale: the aggregation is a single hash shuffle with map-side partial
combine; top-k never materializes a global sort (TakeOrderedAndProject
keeps k rows per partition). Hot-key skew (the reference's
skewdata.txt case) is absorbed by the map-side combine: each input
partition pre-reduces the hot key to one row before the shuffle.

The word source is the ``documents`` table's text column split on
whitespace — the same word-per-line distribution shape as the
reference's data/test.txt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.functions.text import tokens, tokens_sql
from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register

TOP_N = 20  # reference amtToSelect/outputAmt (WordCountSample.hs:135-136,173-174)


def words_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exploded word stream: one row per token of documents.text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(tokens("text")).alias("word"))


_WORDS_SQL = f"(SELECT unnest({tokens_sql('text')}) AS word FROM documents)"


@register(
    "wordcount",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM {_WORDS_SQL} w
    GROUP BY word
    """,
    tags=("parity", "aggregate"),
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-word running count — the count bolt (A1 in SURVEY §2.4)."""
    return words_df(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))


@register(
    "wordcount_top20",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM {_WORDS_SQL} w
    GROUP BY word
    ORDER BY cnt DESC, word ASC
    LIMIT {TOP_N}
    """,
    tags=("parity", "topk"),
)
def wordcount_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 words — topn + merge_sort bolts (A2/A3 in SURVEY §2.4).

    Ties broken by word ascending so the result is total-ordered and
    oracle-comparable (the reference's PSQ ordering is likewise
    deterministic on (count, word)).
    """
    counts = words_df(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))
    return counts.orderBy(F.desc("cnt"), F.asc("word")).limit(TOP_N)
