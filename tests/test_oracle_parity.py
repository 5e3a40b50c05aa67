"""Every registered query with an oracle must match DuckDB at sf0.001.

This mirrors the driver's t2 correctness gate so regressions surface
locally before a round ends.
"""

from __future__ import annotations

import pytest

from hailstorm_spark.registry import all_queries
from tests.conftest import assert_matches_oracle

SPECS = [s for s in all_queries().values() if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, oracle, spec):
    assert_matches_oracle(spark, oracle, spec)


def test_events_load_on_foreign_session(spark):
    """The driver hands us a session built WITHOUT the nanosAsLong conf;
    load_table must set it at call time (it is a runtime SQL conf), or
    every events query dies with PARQUET_TYPE_ILLEGAL on the driver while
    passing here (round-1 failure mode: 7 red CORRECTNESS rows)."""
    from tests.conftest import SF_DIR

    from hailstorm_spark.io import load_table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, SF_DIR, "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp"
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_parity_critical_queries_register_inside_driver_cap():
    """The driver checks only the first ~50 registered queries; the
    reference-parity and north-star queries must be inside that window."""
    order = list(all_queries())
    # Round-6 window: consolidation round, registry frozen. Slot 0 is
    # r05's one red (array-canon crash, fixed by string-serializing the
    # array); slots 1-49 are the 49 oldest never-driver-checked queries
    # (union coverage 167/235 after r05; green here -> 217/235). The
    # remaining 18 never-checked sit at slots 50-67 for round 7.
    must_be_checked = [
        "agg_collect_sorted_arrays",
        "pysource_streaming_cyclic_wordcount",
        "scalar_map_funcs",
        "sql_text_lateral_topn_per_nation",
        "sql_parameterized_quantity_band",
        "sketch_bloom_blocklist_prune",
        "layout_zorder_zonemap_skipping",
        "text_pagerank_keywords",
        "events_exact_median_selection",
        "dedup_setsim_exact_jaccard_join",
        "corpus_prep_v2_end_to_end",
        "embedding_kmeans_integer",
        "ann_ivf_kmeans_recall",
        "graph_triangle_count_word_adjacency",
        "graph_bfs_khop_reach",
        "join_bucketed_colocated_revenue",
        "sketch_hll_portable_registers",
        "events_rfm_segments",
        "embedding_pq_codebook",
        "multimodal_phash_dup_groups",
        "events_markov_transitions",
    ]
    for name in must_be_checked:
        assert order.index(name) < 50, f"{name} registered at {order.index(name)} >= 50"
    # And the full window must consist of never-checked queries only
    # (no staples displacing backlog entries this round).
    assert order[0] == "agg_collect_sorted_arrays"
    assert order.index("events_markov_transitions") == 49
    assert order.index("events_contingency_residuals") == 50
    assert order.index("events_lorenz_activity_deciles") == 67
