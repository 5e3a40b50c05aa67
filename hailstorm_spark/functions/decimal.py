"""Deterministic money arithmetic shared by queries and their oracles.

Summing IEEE doubles is order-dependent, and Spark's shuffle order is
nondeterministic — so any double-sum would be unverifiable against an
oracle AND irreproducible run-to-run at 100 TB. The fix: the synthetic
data's numeric columns are 2-decimal values stored as doubles; casting
each back to DECIMAL recovers the exact value, decimal arithmetic is
exact, and decimal SUM is associative/commutative — the same
commutative-monoid requirement the reference imposes on all bolt state
(reference paper/hailstorm.tex:266-281). Final results are cast to
DOUBLE so Spark/DuckDB schema quirks (decimal precision widening rules
differ) never leak into the output schema.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def money(col: Column | str) -> Column:
    """Exact decimal form of a 2-decimal-place double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DecimalType(14, 2))


def rate(col: Column | str, offset: float = 0.0) -> Column:
    """Exact decimal form of a small 2-decimal rate (discount/tax),
    optionally offset (e.g. ``1 - discount``)."""
    c = F.col(col) if isinstance(col, str) else col
    if offset:
        c = F.lit(offset) + c if offset > 0 else F.lit(-offset) - c
    return c.cast(DecimalType(4, 2))


def one_minus(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.lit(1.0) - c).cast(DecimalType(4, 2))


def one_plus(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.lit(1.0) + c).cast(DecimalType(4, 2))


def dsum(col: Column, alias: str) -> Column:
    """SUM of an exact decimal expression, surfaced as double."""
    return F.sum(col).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """AVG as exact-decimal SUM / COUNT in double division —
    bit-identical in any engine given identical inputs."""
    return (F.sum(col).cast("double") / F.count(F.lit(1))).alias(alias)


# --- SQL (DuckDB oracle) mirrors -------------------------------------------

def money_sql(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(14,2))"


def rate_sql(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(4,2))"


def one_minus_sql(expr: str) -> str:
    return f"CAST(1.0 - {expr} AS DECIMAL(4,2))"


def one_plus_sql(expr: str) -> str:
    return f"CAST(1.0 + {expr} AS DECIMAL(4,2))"


def dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def davg_sql(expr: str, alias: str) -> str:
    return f"(CAST(SUM({expr}) AS DOUBLE) / COUNT(*)) AS {alias}"
