"""Deterministic per-query accounting from the Spark event log.

Runs each named query once with event logging on and reports metrics
host noise cannot fake: job count, task count, shuffle read/write
bytes, input bytes, executor CPU time. Used for before/after evidence
of structural changes (the r14 protocol).

Usage: python scripts/eventprof.py <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hailstorm_spark.registry import all_queries
from hailstorm_spark.session import build_spark


def _account(log_dir: str) -> dict:
    jobs = 0
    tasks = 0
    sh_read = sh_write = inp = cpu = 0
    by_desc: dict[str, int] = {}
    paths = []
    for root, _dirs, names in os.walk(log_dir):
        paths += [os.path.join(root, n) for n in names if "appstatus" not in n]
    for path in paths:
        with open(path, encoding="utf-8") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                k = ev.get("Event")
                if k == "SparkListenerJobStart":
                    jobs += 1
                    props = ev.get("Properties") or {}
                    desc = props.get("spark.job.description") or props.get(
                        "callSite.short", "?"
                    )
                    by_desc[desc] = by_desc.get(desc, 0) + 1
                elif k == "SparkListenerTaskEnd":
                    tasks += 1
                    m = ev.get("Task Metrics") or {}
                    sh_read += (m.get("Shuffle Read Metrics") or {}).get(
                        "Remote Bytes Read", 0
                    ) + (m.get("Shuffle Read Metrics") or {}).get(
                        "Local Bytes Read", 0
                    )
                    sh_write += (m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Bytes Written", 0
                    )
                    inp += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                    cpu += m.get("Executor CPU Time", 0)
    return {
        "jobs": jobs,
        "tasks": tasks,
        "shuffle_read_mb": round(sh_read / 1e6, 2),
        "shuffle_write_mb": round(sh_write / 1e6, 2),
        "input_mb": round(inp / 1e6, 2),
        "cpu_s": round(cpu / 1e9, 1),
        "by_call": dict(
            sorted(by_desc.items(), key=lambda kv: -kv[1])[:25]
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out: dict[str, object] = {}
    for name in sys.argv[1:]:
        log_dir = tempfile.mkdtemp(prefix=f"hs_evlog_{name}_")
        spark = build_spark(
            app_name=f"evprof-{name}",
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.compress": "false",
                "spark.eventLog.dir": f"file://{log_dir}",
            },
        )
        specs = all_queries()
        import time

        t0 = time.perf_counter()
        try:
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # noqa: BLE001
            out[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(json.dumps({name: out[name]}), flush=True)
            spark.stop()
            continue
        spark.stop()
        acct = _account(log_dir)
        acct["wall_s"] = wall
        out[name] = acct
        print(json.dumps({name: acct}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
