"""Lineage truncation with a resilience dial.

Every iterative operator in this package (connected components, star
contraction, BFS, label propagation, k-core peeling, PageRank) carries
a DataFrame across loop rounds and must truncate its lineage each
round — otherwise the plan doubles per iteration (carry-over unions)
or re-executes the whole prefix per layer. Two mechanisms exist:

- ``localCheckpoint(eager=True)`` — blocks live in executor block-
  manager storage (NON-replicated). Fastest by far: no filesystem
  round-trip, which is why it is the default for bench-scale runs and
  local mode. The cost is resilience: on a real cluster, losing an
  executor mid-query FAILS the job (the blocks are gone and the
  lineage was just truncated) instead of recomputing.

- reliable ``checkpoint(eager=True)`` — blocks are written to the
  SparkContext checkpoint directory (HDFS/S3/NFS on a cluster). An
  executor loss recomputes from the checkpoint files; only losing the
  checkpoint storage itself is fatal. The right choice for 100 TB
  iterative runs where an hours-long job must survive preemption —
  pass ``checkpoint_dir=`` on any iterative operator to opt in.

The opt-in is per-call, not session-global, because the break-even is
per-operator: a 5-round loop over a candidate edge list ≪ corpus saves
seconds with local checkpoints and risks little (cheap retry), while a
50-round contraction over billions of edges on preemptible nodes wants
the reliable path despite the write amplification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    ``checkpoint_dir=None`` → ``localCheckpoint(eager=True)`` (fast,
    executor-local, non-replicated). A directory → reliable
    ``checkpoint(eager=True)`` rooted there (survives executor loss;
    point it at shared storage on a cluster). Plans downstream are
    identical either way — both surface as a leaf scan of the
    materialized blocks, so the ``checkpoint_dir`` choice never changes
    results or join strategies, only where the blocks live.

    ``setCheckpointDir`` is re-applied per call (idempotent; Spark
    creates a unique per-RDD subdirectory under it), so interleaved
    operators with different directories stay correct.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)
