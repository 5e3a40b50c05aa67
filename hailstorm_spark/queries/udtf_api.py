"""Python UDTF surface (SURVEY §2.9): a lateral table function that
chunks documents into fixed token-budget windows — the long-document
splitting step of a training pipeline.

The UDTF is the API demonstration (arbitrary Python yielding N rows per
input row — the reference's bolt-emits-many contract, reference
src/Hailstorm/Processor/Bolt.hs run loop). It is NOT the scale path:
Python UDTFs serialize rows through the Python worker, so the same
chunking is also expressed as a pure-JVM column expression
(``chunk_md5s``), the two are pinned row-identical in tests, and the
registered query runs the UDTF only to keep the API surface honest.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from hailstorm_spark.functions.text import tokens, tokens_sql
from hailstorm_spark.io import load_table
from hailstorm_spark.registry import register

CHUNK_TOKENS = 64


@udtf(returnType="chunk_idx: int, chunk_md5: string, n_tokens: bigint")
class ChunkText:
    """Yield (index, md5-of-chunk, token count) per fixed-size token
    window. Tokenization mirrors functions/text.py::tokens (lowercase,
    whitespace split, no empties); md5 of the space-rejoined window
    value-checks content without hauling text into results."""

    def eval(self, text: str, size: int):
        toks = [t for t in (text or "").lower().strip().split() if t]
        for i in range(0, len(toks), size):
            chunk = toks[i : i + size]
            yield (
                i // size,
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                len(chunk),
            )


def chunk_md5s(tokens_col, size: int = CHUNK_TOKENS):
    """JVM mirror of ChunkText: array of md5 digests per token window —
    the production form (no Python worker in the path)."""
    n_chunks = F.ceil(F.size(tokens_col) / F.lit(size)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(tokens_col, i * size + 1, size))
        ),
    )


_TOKS = tokens_sql("text")


@register(
    "udtf_chunk_documents",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
         c AS (SELECT doc_id,
                      CAST(i AS INTEGER) AS chunk_idx,
                      toks[i * {CHUNK_TOKENS} + 1 :
                           least((i + 1) * {CHUNK_TOKENS}, len(toks))] AS chunk
               FROM t,
                    LATERAL (SELECT unnest(generate_series(
                      0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS INTEGER) - 1
                    )) AS i) s
               WHERE len(toks) > 0)
    SELECT doc_id, chunk_idx,
           md5(array_to_string(chunk, ' ')) AS chunk_md5,
           CAST(len(chunk) AS BIGINT) AS n_tokens
    FROM c
    """,
    tags=("udtf", "pipeline"),
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → fixed-budget token chunks via a LATERAL Python UDTF.

    One UDTF invocation per document, N output rows — the §2.9
    table-function contract end-to-end through SQL. The JVM twin
    (chunk_md5s) is the form a 100 TB job runs; equality is pinned in
    tests/test_udtf.py.
    """
    spark.udtf.register("chunk_text", ChunkText)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_for_chunk")
    return spark.sql(
        f"""
        SELECT doc_id, c.chunk_idx, c.chunk_md5, c.n_tokens
        FROM __docs_for_chunk, LATERAL chunk_text(text, {CHUNK_TOKENS}) c
        """
    )


@register(
    "cogroup_clicks_before_purchase",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, epoch_us(ts) AS cts
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts_us,
           CAST(COUNT(c.cts) AS BIGINT) AS n_recent_clicks
    FROM p LEFT JOIN c ON c.user_id = p.user_id
       AND c.cts >= p.ts_us - 1800000000 AND c.cts < p.ts_us
    GROUP BY p.event_id, p.user_id, p.ts_us
    """,
    tags=("pandas", "cogroup", "temporal"),
)
def cogroup_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` (FlatMapCoGroupsInPandas — the one
    pandas API shape the rest of the registry doesn't exercise): for
    every purchase, the count of the same user's clicks in the
    preceding 30 minutes, computed by cogrouping BOTH event streams on
    user_id and merging each pair of per-user frames with vectorized
    searchsorted over the sorted click timestamps.

    This is the attribution-feature shape (N events joined against M
    events per key with a per-row time predicate) where the pandas
    cogroup beats the SQL inequality join once the per-user frames are
    large: the join materializes every (purchase, click-in-window) pair
    before aggregating — O(matches) — while the cogroup is
    O(K log K) per user with nothing materialized. The oracle IS that
    inequality join, so the two formulations check each other.

    Plan: one shuffle of each side on the cogroup key into
    FlatMapCoGroupsInPandas (Arrow-vectorized, never row-at-a-time).
    The round-8 change APPLIES the fat-user mitigation this docstring
    previously only named, as the two-path skew split every production
    attribution job uses (operators/skewgroup.py::clicks_before_
    purchase_cogroup): users whose click volume exceeds a threshold
    are cogrouped on (user_id, time-slice) subkeys — their largest
    group is bounded by per-slice activity, not account lifetime —
    while the long tail keeps the plain user_id cogroup (slicing
    EVERYONE multiplies the group count by the slice span and drowns
    in per-group Arrow overhead; measured locally it timed out where
    the two-path form holds the original cost). Exactness and the
    <= 2x heavy-click replication bound are argued at the operator.
    """
    from hailstorm_spark.operators.skewgroup import (
        clicks_before_purchase_cogroup,
    )

    WINDOW_US = 1_800_000_000

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts_us")
    return clicks_before_purchase_cogroup(purchases, clicks, WINDOW_US)




def _register_polymorphic_udtf() -> None:
    """UDTF with analyze(): output schema computed FROM the input —
    Spark 4's polymorphic table function surface."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    @udtf
    class MeltRow:
        """Polymorphic melt: given any struct argument, emit one
        (column_name, value_string) row per non-null field. The output
        schema is FIXED but eligibility is decided in analyze() — the
        API point is that analyze() sees the INPUT's schema at plan
        time and can validate/derive from it (here: struct-typed arg
        required), which a static returnType cannot."""

        @staticmethod
        def analyze(arg: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(arg.dataType, StructType):
                raise ValueError("MeltRow expects a struct argument")
            return AnalyzeResult(
                StructType(
                    [
                        StructField("col_name", StringType()),
                        StructField("value_str", StringType()),
                        StructField("n_fields", LongType()),
                    ]
                )
            )

        def eval(self, row):
            d = row.asDict()
            for k in sorted(d):
                if d[k] is not None:
                    yield (k, str(d[k]), len(d))

    @register(
        "udtf_polymorphic_melt_nation",
        oracle="""
        WITH m AS (
          SELECT 'n_name' AS col_name, n_name AS value_str FROM nation
          UNION ALL
          SELECT 'n_nationkey', CAST(n_nationkey AS VARCHAR) FROM nation
          UNION ALL
          SELECT 'n_regionkey', CAST(n_regionkey AS VARCHAR) FROM nation
        )
        SELECT col_name,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               MIN(value_str) AS min_value
        FROM m WHERE value_str IS NOT NULL
        GROUP BY col_name
        """,
        tags=("udtf", "polymorphic"),
    )
    def udtf_polymorphic_melt_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Schema-at-plan-time UDTF: MeltRow.analyze() inspects the
        incoming struct and derives/validates the output contract
        before execution — the Spark 4 polymorphic-UDTF API the static
        ChunkText form can't exercise. The query melts the nation dim
        to (column, value) rows and profiles each column: generic
        unpivot-any-table machinery (the schema-specific stack()
        unpivot in profile_documents_columns is the JVM fast path;
        this is the generic form that works on ANY input schema
        unchanged).

        Python-worker row traffic bounds this to dim-sized inputs at
        scale — documented as the same API-vs-production trade as
        ChunkText above.
        """
        n = load_table(spark, sf_dir, "nation")
        spark.udtf.register("melt_row", MeltRow)
        n.createOrReplaceTempView("__melt_nation")
        cols = ", ".join(f"t.{c}" for c in n.columns)  # star is
        # disallowed inside TVF calls; the list is still derived from
        # the schema, not hard-coded
        out = spark.sql(
            "SELECT m.col_name, m.value_str "
            f"FROM __melt_nation t, LATERAL melt_row(struct({cols})) m"
        )
        return out.groupBy("col_name").agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.min("value_str").alias("min_value"),
        )


_register_polymorphic_udtf()
