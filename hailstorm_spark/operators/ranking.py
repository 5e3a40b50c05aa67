"""Distributed global ordering primitives.

Spark's ``row_number()`` over an UN-partitioned window is a scale
killer: every row funnels through ONE task (the plan shows a single
``Window`` after an ``Exchange SinglePartition``). But training-data
pipelines constantly need a global order — size-ranked shard
assignment, deterministic corpus shuffles, top-p truncation by global
rank — so this module provides the standard two-phase formulation that
stays fully parallel:

1. range-bucket rows by the ordering key (boundaries from
   ``approxQuantile`` — they only steer load balance, never the
   result);
2. count rows per bucket, prefix-sum the counts into per-bucket
   offsets (O(#buckets) driver rows — same budget class as a broadcast
   threshold);
3. ``row_number()`` over a window PARTITIONED by bucket, plus the
   bucket's offset.

Every row's final rank equals the rank the single-partition window
would produce, for ANY bucket boundaries, because buckets are ordered
ranges of the key and ties in the key never straddle a boundary
(bucketing depends on the key value alone; the tiebreak column only
orders rows WITHIN a bucket).

The reference has no ordering operators at all (its topology sorts
only inside the merge bolt, reference
src/Hailstorm/Processor/Downstream.hs:61-84); this is additive surface
for the corpus-pipeline workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("__bucket", "__bucket_rn", "__bucket_offset")


def global_row_number(
    df: DataFrame,
    key: str,
    tiebreak: str,
    out_col: str = "rn",
    descending: bool = False,
    num_buckets: int = 32,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Append ``out_col`` = the 1-based global row number of each row
    under ordering (``key``, ``tiebreak``), without ever collapsing the
    data to one partition.

    ``key`` must be numeric (bucketed by range); ``tiebreak`` must make
    the ordering total (a unique id), or equal (key, tiebreak) pairs get
    an arbitrary but deterministic-per-plan order. ``descending`` orders
    the key descending (tiebreak stays ascending).

    Scale: two passes over the data (bucket count, then the windowed
    rank), one shuffle each, driver traffic O(num_buckets). The
    single-partition alternative is one pass but zero parallelism —
    at 100 TB it simply does not finish.

    r14 optimization round: the input is materialized ONCE up front.
    The operator inherently reads its input three times
    (approxQuantile, per-bucket counts, the ranked output), so an
    un-materialized caller pipeline executed 3× — and chained calls
    (events_rfm_segments ranks three metrics in sequence) multiplied
    that again. Materializing trades one write of the input for two
    recomputes of the upstream lineage, the same doctrine as the
    iterative operators: ``checkpoint_dir=None`` is a
    ``localCheckpoint`` — fast, but lineage-truncated blocks do NOT
    survive executor loss, and they stay pinned in the block manager
    for the session (ADVICE r14) — while a directory opts into the
    reliable ``checkpoint`` for cluster runs where an executor loss
    mid-pass must recompute instead of failing the query
    (operators/checkpointing.py has the full trade-off).
    """
    from hailstorm_spark.operators.checkpointing import materialize

    df = materialize(df, checkpoint_dir)
    reserved = set(_RESERVED) & set(df.columns)
    if reserved:
        raise ValueError(f"columns reserved by global_row_number: {sorted(reserved)}")
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists")

    # Phase 0: boundaries. approxQuantile is one aggregate pass; the
    # boundaries only affect parallelism, so the coarse default error
    # is fine. Duplicate boundaries (heavy ties) collapse harmlessly.
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(set(df.approxQuantile(key, probs, 0.01)))

    if not bounds:
        bucket = F.lit(0)
    else:
        # bucket i  <=>  key in (bounds[i-1], bounds[i]]  (strict on the
        # left), so equal keys always share a bucket: bisect_left over
        # the sorted boundary list, expressed as a sum of comparisons —
        # a pure column expression, no UDF.
        bucket = sum(
            (F.col(key) > F.lit(b)).cast("int") for b in bounds
        )
    if descending:
        bucket = F.lit(len(bounds)) - bucket
    bucketed = df.withColumn("__bucket", bucket)

    # Phase 1: per-bucket counts -> exclusive prefix sums (offsets).
    counts = {
        r["__bucket"]: r["n"]
        for r in bucketed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    from hailstorm_spark.functions.localframe import local_df

    offset_df = local_df(
        bucketed.sparkSession,
        [(b, o) for b, o in offsets.items()],
        "__bucket INT, __bucket_offset BIGINT",
    )

    # Phase 2: rank within bucket + offset.
    key_order = F.desc(key) if descending else F.asc(key)
    w = Window.partitionBy("__bucket").orderBy(key_order, F.asc(tiebreak))
    return (
        bucketed.join(F.broadcast(offset_df), "__bucket")
        .withColumn("__bucket_rn", F.row_number().over(w))
        .withColumn(
            out_col,
            (F.col("__bucket_offset") + F.col("__bucket_rn")).cast("long"),
        )
        .drop("__bucket", "__bucket_rn", "__bucket_offset")
    )
