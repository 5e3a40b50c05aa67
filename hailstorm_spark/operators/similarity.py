"""Vector similarity operators over embedding columns.

Baseline: brute-force cosine top-k via a broadcast join of the query
set against the corpus — O(|Q|·N) but embarrassingly parallel; the
right default when |Q| is small. Scale path: LSH / IVF bucketing (see
random_hyperplane_signature) so candidates shrink to a bucket.

Determinism: embeddings are quantized to integers (round(x·1000)) so
dot products and norms are exact integer arithmetic — results are
bit-identical across engines, partitionings, and runs. (Float dot
products are order-sensitive; an engine that can't reproduce its own
similarity join can't do incremental dedup.) At 1e-3 quantization the
cosine error is ~1e-3 absolute — far below any useful dedup threshold
gap; keep thresholds ≥ 2e-3 away from decision boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1000


def quantize(vec_col: Column | str, scale: int = QUANT_SCALE) -> Column:
    """array<float> → array<long> of round(x·scale)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_cosine(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine from integer dot and precomputed integer self-dots."""
    return int_dot(a, b) / F.sqrt((na * nb).cast("double"))


def with_quantized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Attach quantized vector + integer norm (computed once per row)."""
    q = quantize(vec_col)
    out = df.select(F.col(id_col).alias("vid"), q.alias("qvec"))
    return out.withColumn("qnorm", int_dot(F.col("qvec"), F.col("qvec")))


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str, query_ids, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    The query side is tiny → broadcast; the corpus streams through one
    map-side join, a per-partition top-k heap (row_number after a
    partitioned sort is optimized by Spark into TakeOrdered-per-key).
    """
    from pyspark.sql import Window

    base = with_quantized(df, id_col, vec_col)
    queries = base.filter(F.col("vid").isin(list(query_ids))).select(
        F.col("vid").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm").alias("q_qnorm"),
    )
    joined = base.join(F.broadcast(queries), F.col("vid") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        quantized_cosine(
            F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm"), F.col("qnorm")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_pairs_above(df: DataFrame, id_col: str, vec_col: str, threshold: float) -> DataFrame:
    """All pairs with cosine ≥ threshold (brute-force form).

    At scale, replace the raw self-join with LSH bucketing: join on a
    shared hyperplane-signature band first, then apply the exact
    cosine filter to the (linear-sized) candidate set.
    """
    base = with_quantized(df, id_col, vec_col)
    a = base.select(
        F.col("vid").alias("id_a"), F.col("qvec").alias("va"), F.col("qnorm").alias("na")
    )
    b = base.select(
        F.col("vid").alias("id_b"), F.col("qvec").alias("vb"), F.col("qnorm").alias("nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            quantized_cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )
