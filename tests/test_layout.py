"""Z-order layout: the skipping win must hold, and stay JVM-side."""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.queries.layout import (
    layout_zorder_zonemap_skipping,
    z_interleave_expr,
)
from tests.conftest import SF_DIR


def test_zorder_beats_linear_on_both_dim_box(spark):
    """The operator's reason to exist: for a predicate on BOTH
    dimensions, the z-ordered layout must scan fewer buckets AND fewer
    rows than the single-column sort, while both return identical
    matching-row counts."""
    rows = {r["layout"]: r for r in layout_zorder_zonemap_skipping(spark, SF_DIR).collect()}
    z, lin = rows["zorder"], rows["linear"]
    assert z["n_rows_matching"] == lin["n_rows_matching"] > 0
    assert z["n_buckets_scanned"] < lin["n_buckets_scanned"]
    assert z["n_rows_scanned"] < lin["n_rows_scanned"]
    # zone maps never lose rows: scanned superset of matching
    assert z["n_rows_scanned"] >= z["n_rows_matching"]


def test_interleave_roundtrips_bits(spark):
    """De-interleaving the Morton code recovers both coordinates for
    the full corner/boundary set — the layout must be a bijection or
    zone maps silently mix rows across buckets."""
    pts = [(x, y) for x in (0, 1, 2, 65534, 65535) for y in (0, 1, 2, 65534, 65535)]
    df = spark.createDataFrame(pts, ["qx", "qy"]).withColumn(
        "z", F.expr(z_interleave_expr("qx", "qy", "spark"))
    )
    back = df.select(
        "qx",
        "qy",
        F.expr(
            "("
            + " + ".join(
                f"shiftleft(shiftright(z, {2 * b}) & 1, {b})" for b in range(16)
            )
            + ")"
        ).alias("rx"),
        F.expr(
            "("
            + " + ".join(
                f"shiftleft(shiftright(z, {2 * b + 1}) & 1, {b})" for b in range(16)
            )
            + ")"
        ).alias("ry"),
    )
    assert back.filter((F.col("rx") != F.col("qx")) | (F.col("ry") != F.col("qy"))).count() == 0


def test_interleave_stays_in_codegen(spark):
    """The 64-term interleave must compile into whole-stage codegen —
    no Python boundary, no BatchEvalPython — or the layout write would
    crawl at 100 TB."""
    df = spark.range(1000).select(
        (F.col("id") % 256).alias("qx"), (F.col("id") % 199).alias("qy")
    )
    out = df.select(F.expr(z_interleave_expr("qx", "qy", "spark")).alias("z"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # codegen'd operators render with the `*(stageId)` prefix
    assert plan.lstrip().startswith("*(")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
