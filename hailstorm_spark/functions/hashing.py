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


# --- driver-side xxhash64 (r14 optimization round) -------------------
#
# The bucketed-state layer prunes standing reads with
# ``pmod(xxhash64(key), n_buckets)``. Computing a batch's touched
# buckets therefore normally costs one tiny Spark job (distinct +
# collect) PER FOLD PER TRIGGER — pure scheduling floor at ~0.2 s a
# pop on the hot per-micro-batch label paths. When the keys are
# ALREADY on the driver (the delta-bounded label change set collects
# its ≤ 2·|delta| endpoints anyway), the bucket ids can be computed
# locally instead — provided the local hash is BIT-IDENTICAL to
# Spark's ``xxhash64``. This is that hash: XXH64 (Yann Collet's
# public algorithm, the one Spark implements in
# ``org.apache.spark.sql.catalyst.expressions.XXH64``) over Spark SQL's
# input encoding — a LongType hashes as its 8 little-endian bytes, a
# StringType as its UTF-8 bytes — with Spark's default seed 42.
# Equality with the JVM implementation is property-pinned in
# tests/test_statefold.py (randomized longs + strings + boundary
# values); every use site falls back to the Spark-job path when the
# keyspace is not driver-local.

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def xxhash64_bytes(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` — bit-identical to Spark's ``xxhash64`` on a
    BinaryType/StringType (UTF-8) input. Returns the SIGNED 64-bit
    value Spark returns."""
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i <= length - 32:
            k = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl((v1 + k * _XXP2) & _M64, 31) * _XXP1) & _M64
            k = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl((v2 + k * _XXP2) & _M64, 31) * _XXP1) & _M64
            k = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl((v3 + k * _XXP2) & _M64, 31) * _XXP1) & _M64
            k = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl((v4 + k * _XXP2) & _M64, 31) * _XXP1) & _M64
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = ((h * _XXP1) + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + length) & _M64
    while i <= length - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _XXP2) & _M64, 31) * _XXP1) & _M64
        h = ((_rotl(h, 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i <= length - 4:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _XXP1) & _M64
        h = ((_rotl(h, 23) * _XXP2) + _XXP3) & _M64
        i += 4
    while i < length:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl(h, 11) * _XXP1) & _M64
        i += 1
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_long(value: int, seed: int = 42) -> int:
    """XXH64 of one 64-bit integer — bit-identical to Spark's
    ``xxhash64`` on a LongType/IntegerType column (Spark widens ints to
    long before hashing). Signed result, like Spark's."""
    k = value & _M64
    h = (seed + _XXP5 + 8) & _M64
    h ^= (_rotl((k * _XXP2) & _M64, 31) * _XXP1) & _M64
    h = ((_rotl(h, 27) * _XXP1) + _XXP4) & _M64
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_bucket(key, n_buckets: int) -> int:
    """``pmod(xxhash64(key), n_buckets)`` computed on the driver — the
    statefold layer's bucket id for a key that is already local. ``key``
    may be a Python int (LongType column) or str (StringType column)."""
    h = (
        xxhash64_long(key)
        if isinstance(key, int)
        else xxhash64_bytes(key.encode("utf-8"))
    )
    # Python's % with a positive modulus is already pmod
    return h % n_buckets
