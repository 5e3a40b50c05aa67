"""Embedding-similarity queries over the embeddings table.

Quantized-integer cosine (see operators/similarity.py) keeps every
value bit-reproducible, so the oracle checks exact equality — no
tolerance windows hiding order-dependence bugs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hailstorm_spark.io import load_table
from hailstorm_spark.operators.similarity import (
    QUANT_SCALE,
    brute_force_topk,
    cosine_pairs_above,
    quantize,
    with_quantized,
)
from hailstorm_spark.registry import register

N_QUERIES = 10
TOP_K = 5
NEAR_DUP_THRESHOLD = 0.99
PERTURB_BELOW = 50
PERTURB_ID_SHIFT = 100_000

_QVEC_SQL = f"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT_SCALE}) AS BIGINT))"
_DOT = "list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"


def _dot_sql(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {_QVEC_SQL} AS qvec FROM embeddings
    ),
    normed AS (
      SELECT vec_id, qvec,
             CAST({_dot_sql('qvec', 'qvec')} AS BIGINT) AS qnorm
      FROM q
    ),
    scored AS (
      SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
             (CAST({_dot_sql('qs.qvec', 'c.qvec')} AS DOUBLE)
               / sqrt(CAST(qs.qnorm * c.qnorm AS DOUBLE))) AS cosine
      FROM normed qs JOIN normed c ON qs.vec_id <> c.vec_id
      WHERE qs.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "north-star", "topk"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k for 10 query vectors — the
    correctness baseline every ANN variant is measured against.
    The query side broadcasts; the corpus never shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb, "vec_id", "embedding", query_ids=range(N_QUERIES), k=TOP_K
    )


@register(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + {PERTURB_ID_SHIFT} AS vec_id,
             list_transform(range(1, len(embedding) + 1),
                            i -> CASE WHEN i = 1
                                      THEN CAST(embedding[1] AS DOUBLE) + 0.01
                                      ELSE CAST(embedding[i] AS DOUBLE) END) AS embedding
      FROM embeddings WHERE vec_id < {PERTURB_BELOW}
    ),
    q AS (
      SELECT vec_id,
             list_transform(corpus.embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * {QUANT_SCALE}) AS BIGINT)) AS qvec
      FROM corpus
    ),
    normed AS (
      SELECT vec_id, qvec, CAST({_dot_sql('qvec', 'qvec')} AS BIGINT) AS qnorm FROM q
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           (CAST({_dot_sql('a.qvec', 'b.qvec')} AS DOUBLE)
             / sqrt(CAST(a.qnorm * b.qnorm AS DOUBLE))) AS cosine
    FROM normed a JOIN normed b ON a.vec_id < b.vec_id
    WHERE (CAST({_dot_sql('a.qvec', 'b.qvec')} AS DOUBLE)
             / sqrt(CAST(a.qnorm * b.qnorm AS DOUBLE))) >= {NEAR_DUP_THRESHOLD}
    """,
    tags=("similarity", "dedup", "north-star"),
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ 0.99) over the corpus
    plus planted perturbed copies (+0.01 on one component).

    Brute-force form here; the scale path buckets by hyperplane-LSH
    signature before the exact filter (same output, linear candidates).
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    perturbed = emb.filter(F.col("vec_id") < PERTURB_BELOW).select(
        (F.col("vec_id") + PERTURB_ID_SHIFT).alias("vec_id"),
        F.transform(
            as_double,
            lambda x, i: F.when(i == 0, x + 0.01).otherwise(x),
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", as_double.alias("embedding")).unionAll(perturbed)
    return cosine_pairs_above(corpus, "vec_id", "embedding", NEAR_DUP_THRESHOLD)
