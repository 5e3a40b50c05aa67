"""Isolated per-query timing: min-of-N noop-sink runs in one session.

Usage: python scripts/qtime.py <query> [<query> ...] [--n N]

Same methodology as bench.py (fresh session per invocation, warmup
pipeline, noop sink, min-of-N) so numbers are comparable; run from the
tree you want to measure (the baseline worktree or the working tree).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hailstorm_spark.registry import all_queries
from hailstorm_spark.session import build_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 2
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=", 1)[1]) if "=" in a else int(a[3:] or 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark(app_name="hailstorm-qtime")
    specs = all_queries()

    from pyspark.sql import functions as F

    (
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        .filter(F.col("n_nationkey") >= 0)
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    out: dict[str, object] = {}
    for name in args:
        spec = specs.get(name)
        if spec is None:
            out[name] = "not registered"
            continue
        best = None
        runs = []
        try:
            for _ in range(n):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = time.perf_counter() - t0
                runs.append(round(el, 3))
                best = el if best is None else min(best, el)
            out[name] = {"min": round(best, 3), "runs": runs}
        except Exception as exc:  # noqa: BLE001
            out[name] = f"{type(exc).__name__}: {exc}"[:300]
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
