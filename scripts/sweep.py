"""Full oracle-parity sweep at an arbitrary scale factor.

The per-round driver gate runs at sf0.01; this script replays the same
comparison (every registered query vs its DuckDB oracle, order-
insensitive, repr-exact floats) at any SF directory — the round-6 sf0.1
run of exactly this loop caught a float32-vs-double quantization drift
in the k-means oracle CTEs that the sf0.01 gate could never see.

Usage (from the repo root; cwd must be importable):

    python scripts/sweep.py [sf_dir] [oracle_timeout_sec]

Defaults: /root/testdata/sf0.1 and 150 s. Oracles that exceed the
budget (the deliberately quadratic brute-force twins at 10x data) are
reported as ORACLE_TIMEOUT, not failures. Exit code 1 iff any MISMATCH
or ERROR.
"""

from __future__ import annotations

import sys
import threading

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from hailstorm_spark.session import build_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        return "NULL" if v is None else (repr(v) if isinstance(v, float) else str(v))

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 150.0

    spark = build_spark(master="local[16]", shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    def run_oracle(sql):
        timer = threading.Timer(budget, con.interrupt)
        timer.start()
        try:
            rel = con.execute(sql)
            return [d[0] for d in rel.description], rel.fetchall(), None
        except Exception as ex:  # noqa: BLE001 - classified by caller
            return None, None, ex
        finally:
            timer.cancel()

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in osql:
                print(name, "ROWS_ONLY", len(srows), flush=True)
                continue
            dcols, drows, err = run_oracle(osql[name])
            if err is not None:
                msg = repr(err)[:120]
                tag = "ORACLE_TIMEOUT" if "interrupt" in msg.lower() else "ORACLE_ERROR"
                if tag == "ORACLE_ERROR":
                    bad += 1
                print(name, tag, msg, flush=True)
                continue
            ok = sorted(sdf.columns) == sorted(dcols) and canon(
                sdf.columns, srows
            ) == canon(dcols, drows)
            if not ok:
                bad += 1
            print(name, "MATCH" if ok else "MISMATCH", flush=True)
        except Exception as ex:  # noqa: BLE001 - keep sweeping
            bad += 1
            print(name, "ERROR", repr(ex)[:200], flush=True)
    print(f"DONE bad={bad}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
