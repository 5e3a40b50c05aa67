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
    # --- round-6 window (cap ~50): consolidation round, registry FROZEN ---
    # r05's single red: the driver canon crashed on the list-typed
    # `quantities` column (pandas factorize, unhashable). Fixed: the
    # array is now emitted as a canonical comma-joined string on both
    # sides (+ conftest lint banning nested top-level output columns).
    # Re-verify first:
    "agg_collect_sorted_arrays",
    # the 49 oldest never-driver-checked queries, in the order they
    # were staged (r05 rotation backlog). Green here + r05's 167 union
    # rows = 217/235; the remaining 18 below are slots 51+ and rotate
    # in round 7. All 67 pass the identical local DuckDB-oracle sweep.
    "pysource_streaming_cyclic_wordcount",
    "scalar_map_funcs",
    "sql_text_lateral_topn_per_nation",
    "sql_parameterized_quantity_band",
    "sketch_bloom_blocklist_prune",
    "layout_zorder_zonemap_skipping",
    "text_pagerank_keywords",
    "sketch_bitmap_cumulative_users",
    "events_exact_median_selection",
    "events_matview_incremental_daily",
    "corpus_negative_sampling_pairs",
    "sample_weighted_priority_per_source",
    "text_inverted_index_conjunctive",
    "dedup_setsim_exact_jaccard_join",
    "sketch_bitmap_type_overlap",
    "streaming_join_then_window",
    "stats_join_cardinality_estimate",
    "integrity_partition_digest_diff",
    "streaming_bitmap_distinct_daily",
    "events_variant_typed_extraction",
    "streaming_static_dim_join",
    "udtf_polymorphic_melt_nation",
    "multimodal_arrow_byte_stats",
    "graph_triangle_count_word_adjacency",
    "corpus_prep_v2_end_to_end",
    "embedding_kmeans_integer",
    "ann_ivf_kmeans_recall",
    "stats_equidepth_price_histogram",
    "text_bpe_merge_rounds",
    "join_interval_overlap_busy_hours_sessions",
    "scalar_try_arithmetic",
    "window_running_distinct_types",
    "graph_bfs_khop_reach",
    "events_decayed_engagement",
    "events_type_cooccurrence_lift",
    "events_gap_fill_locf",
    "events_pattern_consecutive_funnel",
    "events_mad_robust_outliers",
    "join_bucketed_colocated_revenue",
    "sketch_hll_portable_registers",
    "scan_dynamic_partition_pruning",
    "stats_ks_drift_click_vs_purchase",
    "text_feature_hashing_buckets",
    "events_rfm_segments",
    "dedup_containment_doc_in_doc",
    "embedding_pq_codebook",
    "sketch_bitmap_rolling_wau",
    "multimodal_phash_dup_groups",
    "events_markov_transitions",
    # --- past the ~50 cap: the remaining 18 never-checked (round-7
    # first rotations, in order) ---
    "events_contingency_residuals",
    "io_csv_roundtrip_orders",
    "io_json_roundtrip_documents",
    "dedup_minhash_estimate_calibration",
    "graph_lpa_word_communities",
    "text_tokenizer_oov_rate",
    "streaming_markov_maintenance",
    "ann_pq_adc_topk",
    "multimodal_audio_activity_segments",
    "stats_bootstrap_replicates",
    "events_pchart_out_of_control",
    "stats_cusum_changepoint_daily",
    "stats_benford_first_digit",
    "events_interarrival_magnitude_histogram",
    "graph_kcore_dense_subgraph",
    "io_parquet_schema_evolution",
    "streaming_pchart_monitor",
    "events_lorenz_activity_deciles",
    # --- permanent canaries + multi-round-green staples (covered by
    # the local sweep; union-green from earlier rounds) ---
    "wordcount_top20",
    "streaming_wordcount",
    "q1_pricing_summary",
    "streaming_events_minutely",
    "events_tumbling_daily",
    "dedup_exact",
    "ann_cosine_topk",
    "corpus_prep_clean",
    "q2_min_cost_supplier",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "q10_returned_item_customers",
    "dedup_minhash_lsh_pairs",
    "streaming_sessionize",
    "streaming_incremental_dedup_index",
    "streaming_ann_ivf_probe",
)


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effects: each module registers its queries.
    import hailstorm_spark.queries  # noqa: F401

    front = [n for n in CHECK_FIRST if n in QUERIES]
    rest = [n for n in QUERIES if n not in CHECK_FIRST]
    return {n: QUERIES[n] for n in [*front, *rest]}
