"""Streaming queries runnable under the driver's batch-style harness.

Each entry runs a real Structured Streaming query (availableNow
trigger: process everything currently available, then stop — the
batch-equivalent drain) into an in-memory sink and returns the result
table. Because the inputs are bounded and the aggregation is
deterministic, the DuckDB oracle for the batch twin applies verbatim —
so the correctness gate covers the streaming execution path too.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.functions.text import tokens, tokens_sql
from hailstorm_spark.io import ensure_nanos_conf, table_path
from hailstorm_spark.registry import register
from hailstorm_spark.streaming.bolt import streaming_word_counts

_WORDS_SQL = f"(SELECT unnest({tokens_sql('text')}) AS word FROM documents)"


def _stream_dir(sf_dir: str, table: str) -> str:
    """File-stream sources take a directory; the test tables are single
    parquet files. Stage a temp dir containing a symlink to the file
    (zero-copy)."""
    import os

    d = tempfile.mkdtemp(prefix=f"hs_stream_{table}_")
    os.symlink(table_path(sf_dir, table), os.path.join(d, f"{table}.parquet"))
    return d


def _drain_to_memory(df: DataFrame, spark: SparkSession, output_mode: str) -> DataFrame:
    name = f"q_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="hs_ckpt_")
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


@register(
    "streaming_wordcount",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM {_WORDS_SQL} w
    GROUP BY word
    """,
    tags=("streaming", "parity"),
)
def streaming_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference topology executed BY the streaming engine: a
    parquet file stream → count bolt (update-mode state store) →
    memory sink, drained with availableNow. Counts must equal the
    batch oracle — the exactly-once argument in one query."""
    docs_schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    stream = spark.readStream.schema(docs_schema).parquet(_stream_dir(sf_dir, "documents"))
    words = stream.select(F.explode(tokens("text")).alias("word"))
    return _drain_to_memory(streaming_word_counts(words), spark, "complete")


@register(
    "streaming_events_minutely",
    oracle="""
    SELECT (epoch_us(ts) // 60000000) * 60 AS minute_epoch,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window-time"),
)
def streaming_events_minutely(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling windows with a watermark, on the streaming
    engine (additive surface — reference ST8 has no event time)."""

    ensure_nanos_conf(spark)
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(_stream_dir(sf_dir, "events"))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts", "10 minutes")
    )
    windowed = stream.groupBy(F.window("ts", "1 minute").alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = windowed.select(
        F.unix_timestamp(F.col("win.start")).alias("minute_epoch"),
        "event_type",
        "n",
    )
    return _drain_to_memory(out, spark, "complete")
