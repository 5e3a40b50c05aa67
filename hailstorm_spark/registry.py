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
    # --- round-4 window (cap ~50) ---
    # r03 reds — the events.ts encoding changed under us (TIMESTAMP(NANOS)
    # → TIMESTAMP_NTZ micros); io.normalize_events_ts now adapts to both.
    # These MUST re-verify first:
    "agg_pivot_event_values",
    "events_json_props",
    "events_tumbling_daily",
    "events_tumbling_5min_buckets",
    "events_sessionize",
    "events_latest_per_user",
    "events_rollup_multires",
    "join_asof_purchase_prior_click",
    "streaming_events_minutely",
    "streaming_sessionize",
    "streaming_join_purchase_click",
    "streaming_left_join_purchase_click",
    # permanent canaries (multi-round green; one per engine path):
    "wordcount_top20",
    "streaming_wordcount",
    # never driver-checked: TPC-H deep/full —
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_ship_delay_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q20_excess_stock_suppliers",
    "q21_waiting_suppliers",
    "q22_sales_opportunity",
    # never driver-checked: corpus/training-data pipeline —
    "pii_redaction_profile",
    "quality_repetition_stats",
    "contamination_ngram_overlap",
    "sample_stratified_sources",
    "pack_training_sequences",
    "sample_mixture_inv_sqrt",
    # never driver-checked: dedup variants —
    "dedup_clusters_star",
    "dedup_incremental_new_docs",
    # new this round: persisted/bucketed + streaming incremental dedup,
    # keep-best-by-quality clusters, mixture resampling —
    "dedup_incremental_bucketed_index",
    "streaming_incremental_dedup_index",
    "dedup_clusters_keep_best",
    # new this round: streaming ANN serving —
    "streaming_ann_ivf_probe",
    # never driver-checked: sketch/approx family —
    "approx_distinct_users_by_type",
    "approx_median_price_rank_bound",
    "sketch_rollup_distinct_users",
    # never driver-checked: UDTF / pandas-UDAF surface —
    "udtf_chunk_documents",
    "agg_pandas_udaf_median",
    # never driver-checked: Spark-4 SQL surface —
    "events_variant_props",
    "sql_text_recursive_calendar",
    # new this round: hybrid retrieval + snapshot diff —
    "ann_filtered_topk_lsh",
    "corpus_snapshot_diff",
    # never driver-checked: events analytics —
    "events_funnel_3step",
    # never driver-checked: streaming extras —
    "streaming_two_level_windows",
    "streaming_enrich_static_join",
    # new this round: full-outer stream-stream join —
    "streaming_full_join_purchase_click",
    # --- just past the cap: remaining never-checked (next rotation) ---
    "pii_redacted_forms",
    "events_value_outliers",
    "events_dq_expectations",
    "events_dq_quarantine",
    "multimodal_audio_window_rms",
    "dedup_edit_distance_verify",
    "events_cohort_retention",
    "setop_intersect_all_priorities",
    "setop_except_all_priorities",
    "corpus_source_cap",
    "corpus_augment_token_dropout",
    "dedup_rate_by_source",
    "events_value_histogram",
    "events_gap_fill_hourly",
    "events_value_percentiles",
    "events_sliding_15min_5min",
    "window_analytics_mix",
    "window_time_range_sum",
    "window_null_ordering",
    "scalar_null_semantics",
    "scalar_collection_funcs",
    "sql_text_cte_top_customers",
    "sql_text_revenue_by_nation",
    "agg_collect_sorted_arrays",
    "agg_min_max_by",
    "agg_exact_second_moments",
    "join_not_in_null_aware",
    "profile_documents_columns",
    "multimodal_resize_dims",
    "text_rolling_fingerprint",
    "text_unigram_lm_score",
    "text_langid_agreement",
    "text_token_freq_histogram",
    "embedding_label_centroid_eval",
    "events_json_corrupt_accounting",
    # multi-round-green staples, re-verified as budget allows:
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "q10_returned_item_customers",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "ann_cosine_topk",
)


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effects: each module registers its queries.
    import hailstorm_spark.queries  # noqa: F401

    front = [n for n in CHECK_FIRST if n in QUERIES]
    rest = [n for n in QUERIES if n not in CHECK_FIRST]
    return {n: QUERIES[n] for n in [*front, *rest]}
