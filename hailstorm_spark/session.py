"""SparkSession factory with scale-oriented defaults.

The reference engine has no tunables beyond static parallelism
(reference src/Hailstorm/Processor.hs:68-70). Here the equivalents are
shuffle partitions / AQE, set once at session build time so every
operator in the library inherits them.

Defaults are chosen for the 100 TB design point and scale down to
local[32] tests:

- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace any hand-tuning per query.
- shuffle.partitions: on a real cluster this should be ~2-3x total
  executor cores (or left to AQE's coalescing from a high initial
  number); locally we default to the core count.
- Arrow on: every pandas_udf / mapInPandas boundary is Arrow-batched.
- Session timezone UTC: deterministic date/timestamp semantics that
  match the DuckDB oracle used by the test harness.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


def build_spark(
    app_name: str = "hailstorm-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Any config already set on an existing session is left alone —
    getOrCreate semantics — so tests and the driver can share one JVM.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{_default_parallelism()}]"
    shuffle = shuffle_partitions or _default_parallelism()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # The synthetic events table stores TIMESTAMP(NANOS) parquet,
        # which Spark's vectorized reader rejects; read as long nanos
        # and convert explicitly in io.load_table (truncation to µs,
        # matching DuckDB's nanosecond handling).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Streaming state at 100 TB belongs in RocksDB, not the JVM heap.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        # Local runs: keep the UI off and the driver quiet.
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
