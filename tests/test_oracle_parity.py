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
