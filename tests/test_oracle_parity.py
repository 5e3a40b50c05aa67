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
    # Round-7 window: slots 0-17 are the final 18 never-driver-checked
    # queries (green => union 235/235); slots 18-19 re-pin the two
    # queries whose cross-engine JSON contracts changed this round;
    # slots 20+ are the round-7 NEW registrations (R7_NEW) — every new
    # query must sit inside the driver's ~50-row cap the round it
    # ships, so nothing ever enters the backlog again.
    from hailstorm_spark.registry import R7_NEW

    rotations = [
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
    ]
    for slot, name in enumerate(rotations):
        assert order.index(name) == slot, f"{name} at {order.index(name)} != {slot}"
    assert order.index("events_json_props") == 18
    assert order.index("events_json_corrupt_accounting") == 19
    for i, name in enumerate(R7_NEW):
        assert order.index(name) == 20 + i, f"{name} displaced from window"
    assert len(R7_NEW) <= 30, "round-7 growth cap: window must hold all new queries"
    assert 20 + len(R7_NEW) <= 50, "window overflow: a new query would miss its driver row"
