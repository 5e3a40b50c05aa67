"""Portable Bloom-filter pruning: membership tests without a shuffle.

At 100 TB the canonical use is a *blocklist semi-join*: drop every
corpus document whose content digest appears in a banned set (opt-outs,
eval-set contamination, license takedowns) without shuffling the corpus
— the filter is built once from the (comparatively tiny) banned side,
shipped to every executor, and applied as a scan-level predicate. An
exact semi-join would shuffle 100 TB on the digest; the Bloom pass
shuffles nothing and an exact join afterwards touches only the
Bloom-positive sliver (guaranteed to contain every true member — Bloom
filters have no false negatives).

Spark's own runtime bloom-filter injection (pinned eligible by
tests/test_runtime_filter.py) covers the join-pruning case inside one
query; this operator is the *explicit, persistent* variant — the filter
is a value you can build once, store, and apply across many jobs, like
the reference's long-lived operator state
(reference src/Hailstorm/Processor/Downstream.hs:61-88 keeps bolt state
resident across tuples; here the resident state is the bit array).

The hash family is the engine-portable md5-derived one
(functions/hashing.py), so the DuckDB oracle can rebuild the EXACT same
filter and the false-positive accounting compares value-for-value — the
filter's internals are pinned, not just its error bound.

Sizing: bits are packed 32 per signed-64 word (no sign-bit edge cases).
At this module's defaults (k=2) a 10 % false-positive budget costs
~4.8 bits/key, so 10^9 banned keys ≈ 600 MB — a broadcast variable in
production; the tests' 256-bit filter is the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hailstorm_spark.functions.hashing import md5_hash60, md5_hash60_sql

#: bits per packed word; 32 keeps every word non-negative in a BIGINT.
WORD_BITS = 32


def bloom_bit_positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of the ``k`` bit positions a key sets, in [0, m_bits)."""
    return F.array(*[md5_hash60(key, salt=f"bf{j}") % m_bits for j in range(k)])


def bloom_bit_positions_sql(expr: str, m_bits: int, k: int) -> str:
    """DuckDB twin of :func:`bloom_bit_positions` as an UNNEST-able list."""
    cells = ", ".join(
        f"{md5_hash60_sql(expr, salt=f'bf{j}')} % {m_bits}" for j in range(k)
    )
    return f"[{cells}]"


def bloom_build(build: DataFrame, key: Column, m_bits: int, k: int) -> list[int]:
    """Build the packed bit array from the banned-key side.

    The aggregation is fully distributed (distinct positions → per-word
    bit-OR, a map-side-combining shuffle of at most ``m_bits`` rows);
    only the finished ``m_bits / 32`` packed words are collected — the
    filter VALUE is driver-side by design, because its whole point is to
    be shipped everywhere as a broadcast/literal. Bounded at m_bits/32
    longs (8 words for the test filter; ~19M words even for a 600 MB
    production filter, where a broadcast variable replaces the literal).
    """
    if m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    words = (
        build.select(F.explode(bloom_bit_positions(key, m_bits, k)).alias("pos"))
        .distinct()
        .groupBy((F.col("pos") / WORD_BITS).cast("long").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(1L, cast(pos % {WORD_BITS} as int))")
            ).alias("bits")
        )
        .collect()
    )
    packed = [0] * (m_bits // WORD_BITS)
    for r in words:
        packed[int(r["word_idx"])] = int(r["bits"])
    return packed


def bloom_might_contain(
    key: Column, packed: list[int], m_bits: int, k: int
) -> Column:
    """Scan-level membership predicate: TRUE iff all ``k`` bits are set.

    Pure map-side column expression (no join, no shuffle): the packed
    words ride along as an array literal and each of the k probes is an
    element_at + shift + mask. False ⇒ definitely not a member; the
    filter this predicate drives never loses a true member.
    """
    words_lit = F.array(*[F.lit(w).cast("long") for w in packed])
    out = None
    for j in range(k):
        pos = md5_hash60(key, salt=f"bf{j}") % m_bits
        word = F.element_at(words_lit, (pos / WORD_BITS).cast("int") + 1)
        shifted = F.call_function("shiftright", word, (pos % WORD_BITS).cast("int"))
        check = shifted.bitwiseAND(F.lit(1).cast("long")) == F.lit(1)
        out = check if out is None else (out & check)
    return out


def bloom_positions_long(key: Column, m_bits: int, k: int) -> Column:
    """Bit positions for a key that is ALREADY a well-mixed 64-bit hash
    (e.g. xxhash64 output): each probe is one more xxhash64 round over
    (key, probe index) — JVM-codegen'd, no string materialization, no
    md5. NOT oracle-portable (DuckDB has no matching xxhash64); use
    only where the filter is an engine-internal prefilter whose result
    never reaches a cross-engine comparison — the md5 family above
    stays the portable default."""
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(j)), F.lit(m_bits)) for j in range(k)]
    )


def bloom_build_long(build: DataFrame, key: Column, m_bits: int, k: int) -> list[int]:
    """:func:`bloom_build` with the fast long-key family."""
    if m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    words = (
        build.select(F.explode(bloom_positions_long(key, m_bits, k)).alias("pos"))
        .distinct()
        .groupBy((F.col("pos") / WORD_BITS).cast("long").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(1L, cast(pos % {WORD_BITS} as int))")
            ).alias("bits")
        )
        .collect()
    )
    packed = [0] * (m_bits // WORD_BITS)
    for r in words:
        packed[int(r["word_idx"])] = int(r["bits"])
    return packed


def bloom_might_contain_long(
    key: Column, packed: list[int], m_bits: int, k: int
) -> Column:
    """:func:`bloom_might_contain` with the fast long-key family."""
    words_lit = F.array(*[F.lit(w).cast("long") for w in packed])
    out = None
    for j in range(k):
        pos = F.pmod(F.xxhash64(key, F.lit(j)), F.lit(m_bits))
        word = F.element_at(words_lit, (pos / WORD_BITS).cast("int") + 1)
        shifted = F.call_function("shiftright", word, (pos % WORD_BITS).cast("int"))
        check = shifted.bitwiseAND(F.lit(1).cast("long")) == F.lit(1)
        out = check if out is None else (out & check)
    return out
