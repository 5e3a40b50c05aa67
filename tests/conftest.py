"""Shared pytest fixtures: one SparkSession and one DuckDB connection.

The DuckDB oracle mirrors the driver's correctness harness: every
registered query with an oracle is run in both engines at sf0.001/sf0.01
and compared order-insensitively on identical column names.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from hailstorm_spark.io import TABLES, table_path
from hailstorm_spark.session import build_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_spark(
        app_name="hailstorm-spark-tests",
        master=f"local[{min(8, os.cpu_count() or 4)}]",
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    yield con
    con.close()


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon_rows(cols, rows):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip(cols, cols))], out


def assert_matches_oracle(spark, oracle_con, spec, sf_dir=SF_DIR):
    """Run spec's Spark fn and oracle SQL, compare canonicalized results."""
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = oracle_con.execute(spec.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{spec.name}: column mismatch spark={sorted(spark_cols)} "
        f"oracle={sorted(duck_cols)}"
    )
    _, s_canon = canon_rows(spark_cols, spark_rows)
    _, d_canon = canon_rows(duck_cols, duck_rows)
    assert len(s_canon) == len(d_canon), (
        f"{spec.name}: row count spark={len(s_canon)} oracle={len(d_canon)}"
    )
    # Vacuity guard: an agreeing EMPTY result proves nothing — a bug
    # shared by both sides (observed: a factor-of-n in an inequality both
    # engines reproduced) sails through. Every registered query's fixture
    # must exercise at least one row.
    assert len(s_canon) > 0, (
        f"{spec.name}: both engines returned 0 rows — vacuous parity; "
        f"fix the fixture or the query so the check has teeth"
    )
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(f"{spec.name}: value mismatch, first diffs: {diffs}")
