"""Runtime bloom-filter join pruning — the 100 TB feature that can't
fire at test scale without help.

Spark injects a bloom filter built from a selective join side into the
other side's scan (`might_contain` below the join) only when the
application side is big enough (default threshold 10 GB) and the
creation side has a selective filter — i.e. exactly the regime the
engine targets in production but never reaches on sf0.01 fixtures. This
test scales the thresholds down (and disables broadcast, since dims
that fit in memory take the broadcast path instead) to pin that OUR
query shapes — selective dim filter ⋈ big fact — are eligible for
injection: if a refactor breaks eligibility (e.g. wrapping the join key
in an expression), this fails even though answers stay right.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.io import load_table

SF_DIR = "/root/testdata/sf0.001"

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def test_selective_fact_join_gets_runtime_bloom_filter(spark):
    saved = {k: spark.conf.get(k) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        o = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = load_table(spark, SF_DIR, "lineitem")
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().treeString()
        assert "might_contain" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
