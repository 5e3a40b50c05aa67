"""Distributed selection: exact order statistics without a global sort.

``approx_percentile`` (used by the percentile queries) trades exactness
for a single pass; this operator is the EXACT counterpart at scale. A
naive exact k-th requires a total sort — a full-data range shuffle that
is the single most expensive primitive at 100 TB. The classic two-phase
selection algorithm avoids it:

  1. one aggregation pass builds an equi-width histogram (≤``buckets``
     counters, map-side combined — the shuffle moves only the counter
     table);
  2. the driver walks the ≤``buckets``-row histogram to find the bucket
     containing rank k (a bounded collect, like the dedup operators'
     convergence probes);
  3. a second pass filters to that ONE bucket (≈ n/buckets rows — at
     100 TB with 8192 buckets, ~12 GB of a 100 TB column) and takes the
     residual order statistic inside it with a window rank over the
     tiny slice.

Two scans + one bounded collect, versus a full-data sort. For inputs so
skewed one bucket still overflows memory, the same step recurses on the
bucket (not needed here; the recursion would add one pass per level).

All arithmetic is integer (callers pre-scale doubles, e.g. to micro
units), so results are engine-exact, never tolerance-compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_kth_smallest(
    vals: DataFrame, col: str, k: int, buckets: int = 4096
) -> int:
    """Exact k-th smallest (1-based) of an integer column."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    stats = vals.agg(
        F.min(col).alias("lo"), F.max(col).alias("hi"), F.count(col).alias("n")
    ).collect()[0]
    lo, hi, n = int(stats["lo"]), int(stats["hi"]), int(stats["n"])
    if k > n:
        raise ValueError(f"k={k} exceeds row count {n}")
    if lo == hi:
        return lo
    width = hi - lo + 1
    # integer bucketing — (v-lo)*buckets must fit int64, i.e. the value
    # RANGE (not the data size) is bounded by ~2^63/buckets: any
    # micro-scaled metric qualifies by ~6 decimal orders of margin
    bucket = F.expr(f"(({col} - {lo}L) * {buckets}L) div {width}L")
    hist = (
        vals.groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("b")
        .collect()
    )
    cum = 0
    target_b, k_resid = None, None
    for r in hist:
        if cum + r["c"] >= k:
            target_b, k_resid = int(r["b"]), k - cum
            break
        cum += r["c"]
    slice_df = vals.filter(bucket == F.lit(target_b))
    w = Window.orderBy(col)
    row = (
        slice_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == F.lit(k_resid))
        .select(col)
        .collect()
    )
    return int(row[0][0])
