"""Delimiter-contract + NULL-component pins for kind-encoded state keys
(ADVICE r11 + the r11 self-review's NULL-source finding).

Kind-encoded folds pack (kind, component, ...) into one string key; two
silent corruption modes exist and both are pinned here:

1. a component VALUE containing the delimiter re-splits at parse time
   (source ``a:b`` becomes two fields) — the guard must raise loudly;
2. a NULL component is SKIPPED by concat_ws, shortening the key and
   shifting every later field — the datasheet now rides a NUL sentinel
   and its fixture PLANTS NULL sources so the round-trip is
   driver-checked, with the plant's non-vacuity pinned here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hailstorm_spark.queries.streaming_queries import _KIND_NULL, _delim_guard
from tests.conftest import SF_DIR


def test_delim_guard_raises_on_delimiter_in_component(spark):
    df = spark.createDataFrame([("a:b",)], "source string")
    with pytest.raises(Exception, match="delimiter"):
        df.select(
            F.concat_ws(
                ":", F.lit("n"), _delim_guard("source", ":", "pin")
            ).alias("k")
        ).collect()


def test_delim_guard_passes_clean_and_null_components(spark):
    df = spark.createDataFrame([("web",), (None,)], "source string")
    got = {
        r["k"]
        for r in df.select(
            F.concat_ws(
                ":", F.lit("n"), _delim_guard("source", ":", "pin")
            ).alias("k")
        ).collect()
    }
    # NULL passes through as NULL (concat_ws-skip semantics preserved
    # for callers whose domain excludes NULL); clean values intact
    assert got == {"n:web", "n"}


def test_delim_guard_other_delimiter_not_flagged(spark):
    # a ':' guard must not reject a value containing '|' and vice versa
    df = spark.createDataFrame([("a|b",)], "source string")
    got = df.select(
        _delim_guard("source", ":", "pin").alias("v")
    ).collect()
    assert got[0]["v"] == "a|b"


def test_datasheet_null_source_plant_is_nonvacuous(oracle):
    """The streaming datasheet's oracle must emit a NULL-source row —
    otherwise the NULL round-trip contract is untested vacuously (the
    plant could silently rot if doc_id ranges changed)."""
    from hailstorm_spark.queries.streaming_queries import _DSHEET_NULLSRC_DOCS

    n_null, n_docs = oracle.execute(
        f"SELECT COUNT(*) FILTER (source IS NULL), COUNT(*) "
        f"FROM (SELECT source FROM {_DSHEET_NULLSRC_DOCS} GROUP BY source)"
    ).fetchone()
    assert n_null == 1, "planted NULL-source group missing from the fixture"
    assert n_docs > 1, "fixture degenerated to a single group"


def test_sentinel_contains_no_delimiter():
    assert ":" not in _KIND_NULL and "|" not in _KIND_NULL


def test_er_corpus_asserts_on_key_overlapping_variant_shift(spark, tmp_path):
    """ADVICE r11: a genuine c_custkey at/above the variant shift would
    alias a planted key identically in BOTH engines — parity-invisible.
    The corpus builder must therefore fail loudly on such a key."""
    from hailstorm_spark.queries.dedup import _ER_VARIANT_SHIFT, _er_corpus

    rows = [
        (1, "Customer#000000001", 3, "BUILDING", 100.0),
        (_ER_VARIANT_SHIFT + 7, "Customer#000000bad", 3, "BUILDING", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long,"
        " c_mktsegment string, c_acctbal double",
    )
    df.write.parquet(str(tmp_path / "customer.parquet"))
    with pytest.raises(Exception, match="variant shift"):
        _er_corpus(spark, str(tmp_path)).collect()


def test_er_corpus_clean_keys_pass(spark):
    """The embedded overlap assert must be free on clean data: the real
    fixture corpus builds and counts without error."""
    from hailstorm_spark.queries.dedup import _er_corpus

    assert _er_corpus(spark, SF_DIR).count() > 0


def test_bounded_datasheet_hll_estimate_within_bound(spark):
    """The bounded datasheet's distinct-docs estimate must honor HLL's
    stated error contract against the true per-source distinct digest
    count: every source within 3 sigma (sigma = 1.04/sqrt(64) = 13%),
    and the median within 1 sigma — a mis-built register (wrong rho,
    wrong Z accounting, a fold double-merge) blows these immediately,
    while honest sketch noise cannot."""
    import statistics

    from pyspark.sql import functions as F

    from hailstorm_spark.queries.streaming_queries import (
        _DS_HLL_M,
        _bounded_datasheet_drain,
        _dsheet_docs,
    )
    from tests.conftest import SF_DIR

    sigma = 1.04 / (_DS_HLL_M ** 0.5)
    _, est = _bounded_datasheet_drain(spark, SF_DIR)
    truth = {
        r["source"]: r["nd"]
        for r in _dsheet_docs(spark, SF_DIR)
        .groupBy("source")
        .agg(F.count_distinct("h").alias("nd"))
        .collect()
    }
    rels = []
    for r in est.collect():
        t = truth[r["source"]]
        rel = abs(r["n_distinct_docs_est"] - t) / t
        assert rel <= 3 * sigma, (
            f"source {r['source']}: est {r['n_distinct_docs_est']:.1f} vs "
            f"true {t} — {rel:.3f} > 3 sigma {3 * sigma:.3f}"
        )
        rels.append(rel)
    assert len(rels) == len(truth), "estimate missing a source"
    assert statistics.median(rels) <= sigma
