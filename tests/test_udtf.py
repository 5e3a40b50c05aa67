"""Python UDTF chunking vs its JVM column-expression twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.functions.text import tokens
from hailstorm_spark.queries.udtf_api import CHUNK_TOKENS, ChunkText, chunk_md5s


def test_udtf_rows_match_jvm_chunking(spark):
    spark.udtf.register("chunk_text_t", ChunkText)
    df = spark.createDataFrame(
        [
            (1, "  The quick  brown FOX " * 40),  # several chunks, odd spacing
            (2, "one"),  # single short chunk
            (3, ""),  # no tokens -> no rows
        ],
        ["doc_id", "text"],
    )
    df.createOrReplaceTempView("__udtf_in")
    via_udtf = spark.sql(
        f"SELECT doc_id, c.chunk_idx, c.chunk_md5, c.n_tokens "
        f"FROM __udtf_in, LATERAL chunk_text_t(text, {CHUNK_TOKENS}) c"
    )
    jvm = (
        df.select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            F.posexplode(chunk_md5s(F.col("toks"))).alias("chunk_idx", "chunk_md5"),
            F.size("toks").alias("total"),
        )
        .withColumn(
            "n_tokens",
            F.least(
                F.lit(CHUNK_TOKENS).cast("long"),
                F.col("total") - F.col("chunk_idx").cast("long") * CHUNK_TOKENS,
            ),
        )
        .select("doc_id", "chunk_idx", "chunk_md5", "n_tokens")
    )
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, jvm.collect()))
    assert a == b
    assert len(a) > 3  # doc 1 yields several chunks
    assert all(r[0] != 3 for r in a)  # empty doc emits nothing
