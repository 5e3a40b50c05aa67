"""Query registry: the single source of truth for the engine's surface.

Every operator/query the engine claims to support registers itself here
with (a) a PySpark implementation ``fn(spark, sf_dir) -> DataFrame`` and
(b) where SQL-expressible, an equivalent ANSI-SQL oracle string that
DuckDB can run on the same parquet tables. The driver's correctness
harness consumes this via ``__spark_entry__.queries()`` /
``oracle_sql()``.

Column-name discipline: the harness sorts columns by name and
value-hashes, so the Spark result and the oracle must agree on every
output column name. Register oracles with the exact aliases used in the
DataFrame code.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation with optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


#: The driver's correctness harness checks queries in `queries()` order
#: and caps at ~50 entries per round. This list pins the front of the
#: ordering: queries that NEED a driver row this round (fixed since the
#: last round, never checked, or new) come first, then core staples fill
#: the window; everything else (green in a previous round + covered by
#: the identical local oracle sweep in pytest) follows in registration
#: order.
CHECK_FIRST = (
    # previously red (TIMESTAMP(NANOS) session bug, fixed):
    "agg_pivot_event_values",
    "events_json_props",
    "events_tumbling_daily",
    "events_tumbling_5min_buckets",
    "events_sessionize",
    "events_latest_per_user",
    "streaming_events_minutely",
    # registered but never driver-checked (past round-1's cap):
    "wordcount",
    "wordcount_top20",
    "window_rank_orders_per_customer",
    "window_running_customer_spend",
    "window_lag_order_gap_days",
    "window_moving_avg_quantity",
    "window_ntile_price_quartiles",
    "text_fingerprint_groups",
    "text_quality_scores",
    # new this round:
    "window_ntile_quartiles_distributed",
    "streaming_sessionize",
    "streaming_dedup_exact",
    "streaming_join_purchase_click",
    "join_asof_purchase_prior_click",
    "events_rollup_multires",
    "dedup_clusters_keep_one",
    "corpus_prep_clean",
    "ann_cosine_topk_lsh",
    "ann_cosine_topk_ivf",
    "embedding_lsh_near_dup_pairs",
    "text_tfidf_top_terms",
    "text_ngram_stats",
    "q4_priority_with_late_lineitem",
    "q14_promo_revenue_share",
    "q18_large_volume_customers",
    "q19_disjunctive_brand_bands",
    "join_salted_word_frequencies",
    "multimodal_embed_topk",
    "q17_small_quantity_revenue",
    "streaming_corpus_ingest",
    "streaming_monoid_wordcount",
    "streaming_union_event_counts",
    # round-2 flagships promoted into the window (displacing three
    # r01-green one-shuffle staples to just past the cap — they keep
    # their local parity sweep and re-enter the window as it rotates):
    "q2_min_cost_supplier",
    "semantic_dedup_keep_one",
    "streaming_left_join_purchase_click",
    # parity-critical staples — these MUST stay inside the window
    # (tests/test_oracle_parity.py pins them there):
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "q10_returned_item_customers",
    "streaming_wordcount",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "ann_cosine_topk",
    # just past the cap (driver rows resume here in later rounds):
    "q6_revenue_change",
    "scan_filter_project",
    "dedup_simhash_pairs",
    # new generic-SQL coverage — first checked by the identical local
    # oracle sweep (tests/test_oracle_parity.py); driver rows arrive as
    # window budget allows in later rounds:
    "events_sliding_15min_5min",
    "window_analytics_mix",
    "scalar_null_semantics",
    "sql_text_cte_top_customers",
    "agg_collect_sorted_arrays",
    "agg_min_max_by",
    "join_not_in_null_aware",
    "profile_documents_columns",
    "multimodal_resize_dims",
    "text_rolling_fingerprint",
    "events_gap_fill_hourly",
    "sql_text_revenue_by_nation",
    "agg_pandas_udaf_median",
    # staples re-verified when budget remains:
    "text_stats",
    "multimodal_decode_metadata",
    "multimodal_frame_sample",
    "multimodal_size_histogram",
)


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effects: each module registers its queries.
    import hailstorm_spark.queries  # noqa: F401

    front = [n for n in CHECK_FIRST if n in QUERIES]
    rest = [n for n in QUERIES if n not in CHECK_FIRST]
    return {n: QUERIES[n] for n in [*front, *rest]}
