"""Queries exercising the custom Python DataSource (streaming/
linesource.py) — the reference's FileSource contract as a registered
Spark connector, batch and streaming, both oracle-checked.

The fixture file is the documents corpus staged as newline-delimited
text (driver-side, a fixture concern only — the connector itself reads
by distributed byte-range splits and never depends on how the file was
produced).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.functions.text import tokens, tokens_sql
from hailstorm_spark.io import table_path
from hailstorm_spark.registry import register

_WORDS_SQL = f"(SELECT unnest({tokens_sql('text')}) AS word FROM documents)"

_staged: dict[str, str] = {}


def stage_lines_file(sf_dir: str) -> str:
    """documents.text, one doc per line (doc_id order, newlines
    flattened to spaces so tokenization is unchanged)."""
    if sf_dir in _staged and os.path.exists(_staged[sf_dir]):
        return _staged[sf_dir]
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(table_path(sf_dir, "documents"), columns=["doc_id", "text"])
    tbl = tbl.sort_by("doc_id")
    texts = pc.replace_substring(tbl["text"], "\n", " ").to_pylist()
    path = os.path.join(tempfile.mkdtemp(prefix="hs_lines_"), "docs.txt")
    with open(path, "w", encoding="utf-8") as f:
        for t in texts:
            f.write((t or "") + "\n")
    _staged[sf_dir] = path
    return path


@register(
    "pysource_line_wordcount",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt FROM {_WORDS_SQL} w GROUP BY word
    """,
    tags=("source", "connector", "wordcount"),
)
def pysource_line_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word counts read through the CUSTOM BATCH CONNECTOR
    (``format("hailstorm_lines")``): the file splits into byte ranges
    aligned to newlines (TextInputFormat rule) so every partition reads
    independently — the distributed path a 100 TB line file needs. The
    counts must equal the parquet-derived oracle exactly, proving the
    split rule loses and duplicates nothing across partition
    boundaries.
    """
    from hailstorm_spark.streaming.linesource import register_line_sources

    register_line_sources(spark)
    path = stage_lines_file(sf_dir)
    lines = (
        spark.read.format("hailstorm_lines")
        .option("path", path)
        .option("numPartitions", 8)
        .load()
    )
    words = lines.select(F.explode(tokens("line")).alias("word"))
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "pysource_streaming_cyclic_wordcount",
    oracle=f"""
    SELECT word, CAST(2 * COUNT(*) AS BIGINT) AS cnt
    FROM {_WORDS_SQL} w GROUP BY word
    """,
    tags=("streaming", "source", "connector", "wordcount"),
)
def pysource_streaming_cyclic_wordcount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Word counts from the CUSTOM STREAMING CONNECTOR with CYCLIC
    REPLAY (``cycles=2`` — the reference FileSource's endless-stream
    simulation, reference src/Hailstorm/InputSource.hs:132-159): the
    drained counts must equal exactly 2× the batch oracle, which proves
    offset tracking advances through both cycles without losing or
    double-reading a single line.

    Python streaming sources don't support Trigger.AvailableNow (Spark
    falls back to one batch), so the drain runs a fast processing-time
    trigger and polls the sink until the known input size
    (cycles × lines) is fully committed — the offsets, not the clock,
    decide completion. ``readBetweenOffsets`` gives the deterministic
    range replay Structured Streaming requires for exactly-once
    recovery.
    """
    import time
    import uuid

    from hailstorm_spark.streaming.linesource import register_line_sources

    register_line_sources(spark)
    path = stage_lines_file(sf_dir)
    with open(path, "rb") as f:
        n_lines = sum(1 for _ in f)
    expected = 2 * n_lines

    # one batch per cycle: the offset wrap still crosses a batch
    # boundary (cycle 0 drains, then cycle 1 starts at pos 0), which is
    # the replay property under test — smaller batches only add
    # micro-batch overhead without testing anything more
    lines = (
        spark.readStream.format("hailstorm_lines_stream")
        .option("path", path)
        .option("maxLinesPerBatch", max(1, n_lines))
        .option("cycles", 2)
        .load()
    )
    words = lines.select(F.explode(tokens("line")).alias("word"))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))

    # completion target: exact token count across both cycles, computed
    # from the file with the SAME tokenization rule as functions/text.py
    # (lowercase, whitespace split, no empties) — offsets, not the
    # clock, decide when the drain is done
    n_words = 0
    with open(path, encoding="utf-8") as f:
        for line in f:
            n_words += len([t for t in line.lower().strip().split() if t])
    expected_total = 2 * n_words
    del expected, n_lines  # sized the batches above; not needed further

    name = f"q_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="hs_ckpt_")
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 300
    seen = 0
    while time.time() < deadline:
        row = spark.table(name).agg(F.sum("cnt").alias("total")).collect()
        seen = row[0]["total"] or 0
        if seen >= expected_total:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    if seen < expected_total:
        raise TimeoutError(
            f"pysource drain incomplete: {seen}/{expected_total} words committed"
        )
    return spark.table(name)
