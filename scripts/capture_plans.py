"""Capture .explain('formatted') for named queries into plans/<dir>/.

Usage: python scripts/capture_plans.py <outdir> <suffix> <query> [...]

Writes plans/<outdir>/<query>_<suffix>.txt for each query. Streaming
drains execute fully (the plan of the returned frame is the post-drain
read path — the part a consumer pays per read; the per-trigger fold
plans are pinned by code/tests, not explain output).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hailstorm_spark.registry import all_queries
from hailstorm_spark.session import build_spark


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        outdir,
    )
    os.makedirs(dest, exist_ok=True)
    spark = build_spark(app_name="plancap")
    specs = all_queries()
    for name in names:
        try:
            df = specs[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(dest, f"{name}_{suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
            print("captured", name, flush=True)
        except Exception as exc:  # noqa: BLE001
            print("FAILED", name, type(exc).__name__, str(exc)[:200], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
