"""observe() row accounting: one-pass metrics on batch and streaming."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from hailstorm_spark.io import load_table
from hailstorm_spark.observability import keep_share, observe_rows, observe_stream
from hailstorm_spark.operators.text import quality_score

SF_DIR = "/root/testdata/sf0.001"


def test_batch_observe_accounts_filter_drop_in_one_pass(spark):
    docs = load_table(spark, SF_DIR, "documents")
    observed_in, obs_in = observe_rows(docs, "ingest")
    kept = observed_in.withColumn("q", quality_score("text")).filter(
        F.col("q") > 0.5
    )
    observed_kept, obs_kept = observe_rows(kept, "kept")
    n_out = observed_kept.count()  # the ONLY job

    assert obs_in.get["rows"] == docs.count()
    assert obs_kept.get["rows"] == n_out
    share = keep_share(obs_kept, obs_in)
    assert 0.0 < share <= 1.0
    # chars metric rides the same pass
    assert obs_in.get["chars"] > 0


def test_streaming_observe_metrics_surface_in_progress(spark):
    docs_schema = load_table(spark, SF_DIR, "documents").schema
    d = tempfile.mkdtemp(prefix="hs_obs_")
    import os

    os.symlink(
        os.path.join(SF_DIR, "documents.parquet"),
        os.path.join(d, "documents.parquet"),
    )
    stream = spark.readStream.schema(docs_schema).parquet(d)
    observed = observe_stream(
        stream,
        "ingest",
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.length("text")).alias("chars"),
    )
    agg = observed.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    name = "obs_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batches = [
        p["observedMetrics"]["ingest"]
        for p in q.recentProgress
        if "ingest" in p.get("observedMetrics", {})
    ]
    assert batches, "no observed metrics in any progress event"
    total_rows = sum(b["rows"] for b in batches)
    assert total_rows == load_table(spark, SF_DIR, "documents").count()
    assert all(b["chars"] > 0 for b in batches)
