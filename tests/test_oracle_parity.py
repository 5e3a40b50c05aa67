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
    # Round-14 window: the semantic re-pins lead, then the round-14 NEW
    # registrations — every new query must sit inside the driver's
    # ~50-row cap the round it ships.
    from hailstorm_spark.registry import R14_NEW, R14_REPIN

    for slot, name in enumerate([*R14_REPIN, *R14_NEW]):
        assert order.index(name) == slot, f"{name} at {order.index(name)} != {slot}"
    assert len(R14_REPIN) + len(R14_NEW) <= 50, (
        "window overflow: a new query would miss its driver row"
    )


def test_every_new_registration_is_in_the_driver_window():
    """Derive 'new this round' from the registry itself rather than
    trusting the hand-maintained R11_NEW tuple (ADVICE r7: R7_NEW was
    left empty while two queries registered, and the tuple-driven
    loop passed vacuously). registry_snapshot_r13.json froze the 292
    names registered at the end of round 13; any name not in the
    snapshot MUST appear in R14_NEW so it gets a driver row this round
    — an empty R14_NEW with new registrations now fails loudly. At the
    next round boundary: refreeze the snapshot and rotate the tuple."""
    import json
    from pathlib import Path

    from hailstorm_spark.registry import R14_NEW

    snap = set(
        json.loads((Path(__file__).parent / "registry_snapshot_r13.json").read_text())
    )
    current = set(all_queries())
    new_names = current - snap
    assert new_names == set(R14_NEW), (
        f"registered-but-not-in-R14_NEW (would miss their driver row): "
        f"{sorted(new_names - set(R14_NEW))}; "
        f"in-R14_NEW-but-not-registered: {sorted(set(R14_NEW) - new_names)}"
    )
    assert snap <= current, f"queries deleted since snapshot: {sorted(snap - current)}"


def test_generalization_lattice_frontier_non_vacuous(spark):
    """The lattice must expose a NON-TRIVIAL Pareto frontier on the
    fixture: some points sufficient, some not, and at least one
    Pareto-minimal sufficient point; every pareto_minimal point is
    sufficient and undominated by any finer sufficient point (replayed
    here in pure Python from the query's own 36 rows)."""
    from tests.conftest import SF_DIR

    rows = [
        r.asDict()
        for r in all_queries()["privacy_generalization_lattice"]
        .fn(spark, SF_DIR)
        .collect()
    ]
    assert len(rows) == 36
    suf = [r for r in rows if r["sufficient"]]
    assert 0 < len(suf) < 36, "fixture degenerated: all or nothing sufficient"
    wr = {500: 0, 2000: 1, 8000: 2, 0: 3}
    tr = {"day": 0, "week": 1, "month": 2}
    er = {"type": 0, "class": 1, "any": 2}

    def rank(r):
        return (wr[r["band_width"]], tr[r["time_gran"]], er[r["type_gran"]])

    def dominated(r):
        return any(
            q is not r
            and all(a <= b for a, b in zip(rank(q), rank(r)))
            and rank(q) != rank(r)
            for q in suf
        )

    want_frontier = {rank(r) for r in suf if not dominated(r)}
    got_frontier = {rank(r) for r in rows if r["pareto_minimal"]}
    assert got_frontier == want_frontier
    assert got_frontier, "empty Pareto frontier"
