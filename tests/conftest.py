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


def _type_family(type_name: str) -> str:
    """Collapse a Spark dtype or DuckDB type string to a comparable family.

    The driver's value-hash is TYPE-sensitive: a DuckDB HUGEINT (what an
    uncast integer SUM becomes) hashes differently from Spark's BIGINT
    even when the values agree (round-4 red: q12_ship_delay_priority).
    This lint makes that drift a local failure instead of a driver red.
    """
    t = type_name.strip().lower()
    if t.startswith("decimal") or t.startswith("numeric"):
        return "decimal"
    if t in ("tinyint", "smallint", "int", "integer", "bigint",
             "utinyint", "usmallint", "uinteger", "ubigint"):
        return "int"
    if t in ("float", "real", "double"):
        return "float"
    if t in ("string", "varchar", "text", "char"):
        return "str"
    if t in ("boolean", "bool"):
        return "bool"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date":
        return "date"
    if t in ("binary", "blob"):
        return "binary"
    if t.startswith(("array", "struct", "map", "list")) or "[]" in t:
        return "nested"
    return t


def assert_result_types_align(spec, spark_dtypes, duck_cols, duck_types):
    """Per-column type-family lint between the Spark result and the oracle.

    Three rules:
    1. The oracle may never produce HUGEINT (int128) — DuckDB's silent
       widening of integer SUM/spark-incompatible arithmetic. Cast to
       BIGINT in the oracle SQL.
    2. Each shared column's type family (int/float/decimal/str/...) must
       match between engines; the driver hashes values type-sensitively,
       so family drift reds the row even when values agree.
    3. No oracle-bearing query may emit a top-level array/map/struct
       column: the driver's canonicalizer sorts all columns with pandas
       (factorize), which crashes on unhashable list values (round-5
       red: agg_collect_sorted_arrays). Serialize nested values to a
       canonical string (array_join / array_to_string) on BOTH sides.
    """
    duck_by_col = dict(zip(duck_cols, [str(t) for t in duck_types]))
    for col, styp in spark_dtypes:
        dtyp = duck_by_col.get(col)
        assert dtyp is not None, f"{spec.name}: oracle missing column {col}"
        assert dtyp.strip().lower() != "hugeint", (
            f"{spec.name}.{col}: oracle yields HUGEINT — wrap the "
            f"aggregate in CAST(... AS BIGINT) (driver hash is "
            f"type-sensitive; see round-4 q12 red)"
        )
        assert _type_family(styp) != "nested", (
            f"{spec.name}.{col}: top-level nested column ({styp}) — the "
            f"driver canon crashes on unhashable list/struct values "
            f"(round-5 agg_collect_sorted_arrays red); emit a canonical "
            f"string via array_join/array_to_string on both sides"
        )
        sfam, dfam = _type_family(styp), _type_family(dtyp)
        assert sfam == dfam, (
            f"{spec.name}.{col}: type-family drift spark={styp}({sfam}) "
            f"oracle={dtyp}({dfam}) — align the casts on both sides"
        )


def assert_driver_canon_survives(spec, cols, rows):
    """Emulate the driver harness's canonicalization: a pandas
    ``sort_values`` over ALL output columns (factorize under the hood).
    The round-5 red was this exact call crashing on a list-typed column
    (``TypeError: unhashable type`` inside Categorical) — the dtype lint
    catches declared nested types, this catches anything else pandas
    can't order (mixed objects, unhashable cells) before a driver row
    ever reds on it."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=cols)
    try:
        pdf.sort_values(by=sorted(cols), kind="mergesort")
    except TypeError as ex:
        raise AssertionError(
            f"{spec.name}: driver-canon emulation failed — pandas cannot "
            f"sort the result columns ({ex}); serialize the offending "
            f"column to a scalar string on both sides"
        ) from ex


def assert_matches_oracle(spark, oracle_con, spec, sf_dir=SF_DIR):
    """Run spec's Spark fn and oracle SQL, compare canonicalized results."""
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    assert_driver_canon_survives(spec, spark_cols, spark_rows)

    duck_rel = oracle_con.sql(spec.oracle)
    duck_cols = list(duck_rel.columns)
    duck_types = list(duck_rel.types)
    duck_rows = duck_rel.fetchall()
    assert_result_types_align(spec, sdf.dtypes, duck_cols, duck_types)

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
