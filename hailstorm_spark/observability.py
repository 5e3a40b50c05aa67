"""Pipeline observability: observe() metrics on batch and streaming.

A 100 TB ingest pipeline needs row accounting — how many rows entered,
how many each filter dropped, what share survived — WITHOUT extra
passes. Spark's observe() attaches metric expressions to a plan node;
they are accumulated DURING the normal action (no second scan, no
count() jobs) and surfaced on the Observation (batch) or in
StreamingQueryProgress.observedMetrics (streaming). The reference has
nothing comparable (its only visibility is log lines); this is additive
operational surface.

Only use aggregates that are commutative monoids over the batch
(count/sum/min/max) — observe() merges per-partition partials exactly
like the bolt contract (reference Processor.hs:47-49 imposes the same
restriction on its state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_rows(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach row/byte accounting to a batch frame. Metrics materialize
    on the returned Observation after the FIRST action on the returned
    frame — one pass, no extra job."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    if "text" in df.columns:
        metrics.append(F.sum(F.length("text")).alias("chars"))
    return df.observe(obs, *metrics), obs


def keep_share(kept_obs: Observation, in_obs: Observation) -> float:
    """Survival fraction between two observed stages (call after an
    action has run over both observed nodes)."""
    kept = kept_obs.get["rows"]
    total = in_obs.get["rows"]
    return kept / total if total else 1.0


def observe_stream(df: DataFrame, name: str, *exprs: Column) -> DataFrame:
    """Attach named metrics to a STREAMING frame; read them per
    micro-batch from StreamingQueryProgress.observedMetrics[name] —
    the per-batch audit trail (rows ingested / dropped / late) without
    a second query."""
    if not exprs:
        exprs = (F.count(F.lit(1)).alias("rows"),)
    return df.observe(name, *exprs)
