"""Single-partition DataFrames for small driver-local row sets.

Classic PySpark's ``spark.createDataFrame(rows, schema)`` parallelizes
the rows into ``defaultParallelism`` slices and plans a ``LogicalRDD``
— NOT a ``LocalRelation`` — even for an EMPTY list (measured: 32
partitions on local[32]). Consequences on a hot path: every consuming
job schedules ``defaultParallelism`` tasks just to re-materialize the
handful of rows, a ``.write`` of such a frame commits that many
near-empty files, and nothing constant-folds. The streaming fold
paths build many such frames PER TRIGGER (endpoint lists, contracted
label edges, change sets under the delta-closure cap), so the empty
task floor multiplies by trigger count × consumer count — the r14
profiler attributed whole seconds per drain to 32-task parallelize
stages carrying < 1 KB.

``local_df`` pins the row set to ONE slice: each consumer schedules a
single task, and writes commit a single file. The rows are bounded by
construction at every call site (delta-closure cap, ≤2·|delta|
contracted edges, bucket-count-sized lists), so one slice is the
right parallelism at any scale — these frames hold per-batch DELTAS,
not data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame`` pinned to a single partition (see module
    docstring). ``rows`` must be a driver-local, bounded collection."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
