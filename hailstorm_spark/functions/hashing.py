"""Portable deterministic hashing.

The engine needs hash functions that are (a) stable across releases,
(b) computable identically in Spark and in the ANSI-SQL oracle (DuckDB),
so that MinHash/SimHash/LSH operators can be verified value-for-value.
``xxhash64``/``hash`` differ between engines, so we derive a 60-bit
integer from the first 15 hex chars of md5 — md5 is bit-identical
everywhere. 60 bits keeps the value comfortably inside a signed 64-bit
integer in both engines (no overflow, always non-negative).

This replaces the reference's use of Haskell's ``hash`` for grouping
(reference src/Hailstorm/Sample/WordCountSample.hs:247-250); grouping
itself needs no explicit hash in Spark (groupBy shuffles by key), so
these helpers only serve the sketch operators (MinHash/SimHash/LSH).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash60(col: Column | str, salt: str | None = None) -> Column:
    """60-bit non-negative integer hash of a string column.

    ``salt`` derives an independent hash function family member — used
    for the k MinHash permutations.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(salt + ":"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_hash60_sql(expr: str, salt: str | None = None) -> str:
    """The same hash as :func:`md5_hash60`, as DuckDB SQL text."""
    if salt is not None:
        expr = f"('{salt}:' || {expr})"
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
