"""Integer k-means (Lloyd's algorithm) — the canonical distributed ML
loop, held to VALUE-exact cross-engine parity.

Shape per iteration (the standard broadcast-k-means contract, same
driver-data budget as operators/similarity.py::_centroid_literals):

  1. centroids ride the PLAN as literals (K·dim ints — broadcast);
     nearest-centroid assignment is a zero-shuffle map expression
     (argmin of exact integer squared distances, ties to the lowest
     centroid id);
  2. the update is ONE aggregation shuffle of (k, pos) component sums
     — K·dim groups regardless of corpus size — collected to the
     driver (bounded, K·dim rows) where the floor-divide produces the
     next centroid table.

Everything is integer: vectors are the similarity module's
round(x·1000) quantization, distances are exact int64 (|x|≤~10³,
dim·(2·10³)² ≈ 2.6·10⁸ ≪ 2⁶³), and centroid components floor-divide.
Pitfall pinned here: Python's // FLOORS while DuckDB's // and Spark's
`div` TRUNCATE toward zero — they differ on negative sums, so the
oracle must use an explicit floor-division formula
(x//d − [x%d≠0 ∧ x<0] for d>0, trunc semantics) to match the driver
loop's Python floor-divide.

Degenerate clusters: a centroid that attracts no members simply
disappears from later iterations (both engines derive centroids from
the same member sets, so the rule is consistent by construction).

Convergence is a fixed iteration count, like the PageRank operator —
a float-threshold stop would be engine-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_expr(centroids: dict[int, list[int]]):
    """argmin-by-distance over literal centroids: min of (dist, k)
    structs — lexicographic struct ordering gives the lowest-k
    tiebreak for free.

    The centroid table rides as ONE literal array-of-structs and the
    distance map is a transform over it (the ivf_assign shape), so the
    generated code is O(1) in K — an unrolled per-centroid expression
    measured ~2x slower end-to-end at K=16 from codegen width alone,
    and it would not survive K=256.

    Built as ONE SQL string parsed JVM-side, not nested Column
    objects: the Column form issued a py4j round-trip per literal —
    K·dim ≈ 1024 driver→JVM calls PER ITERATION at K=16/dim=64, which
    dominated training end-to-end on anything but huge inputs (the
    data pass itself is one zero-shuffle map). One expr() call costs
    the same regardless of K·dim; executor-side the two forms compile
    to the identical plan."""
    cents_sql = ", ".join(
        "named_struct('cid', {k}, 'cvec', array({comps}))".format(
            k=int(k), comps=", ".join(f"{int(c)}L" for c in comps)
        )
        for k, comps in sorted(centroids.items())
    )
    best = F.expr(
        f"array_min(transform(array({cents_sql}),"
        " c -> named_struct("
        "'dist', aggregate(zip_with(qv, c.cvec, (x, cc) -> (x - cc) * (x - cc)),"
        " 0L, (acc, d) -> acc + d),"
        " 'k', c.cid)))"
    )
    return best["k"].alias("k"), best["dist"].alias("dist")


def kmeans_integer(
    vecs: DataFrame, id_col: str, qv_col: str, k: int, iters: int
) -> tuple[DataFrame, dict[int, list[int]]]:
    """Run ``iters`` Lloyd iterations; returns (assignment, centroids):
    the final (id, k, dist) assignment DataFrame plus the final
    centroid table (already driver-resident — it is the broadcast
    value, K·dim ints).

    ``vecs``: (id, qv) with qv already integer-quantized array<long>.
    Init: the members with id < k seed centroid id = their own id.
    """
    base = vecs.select(F.col(id_col).alias("id"), F.col(qv_col).alias("qv"))
    init = base.filter(F.col("id") < k).select("id", "qv").collect()
    centroids = {int(r["id"]): [int(x) for x in r["qv"]] for r in init}
    dim = len(next(iter(centroids.values())))
    for _ in range(iters):
        k_col, _ = _assign_expr(centroids)
        assigned = base.select("id", "qv", k_col)
        # Centroid update as `dim` per-position SUM aggregates in ONE
        # groupBy(k): each task map-side-combines straight down to
        # K×(dim+1) cells, so the shuffle moves O(K·dim·tasks) values.
        # The previous posexplode form shuffled dim·N exploded ROWS per
        # iteration — the explode dominated the whole training loop
        # (measured ~2s/iter at sf0.1, 64 dims; the per-position-sum
        # form is ~4× faster end-to-end). Values are identical: same
        # sums, same counts, same Python floor-div below.
        sums = (
            assigned.groupBy("k")
            .agg(
                F.expr("count(1)").alias("n"),
                F.expr(
                    "array(" + ", ".join(f"sum(qv[{i}])" for i in range(dim)) + ")"
                ).alias("s"),
            )
            .collect()
        )
        centroids = {
            int(r["k"]): [int(s) // int(r["n"]) for s in r["s"]] for r in sums
        }  # Python floor-div
    k_col, dist_col = _assign_expr(centroids)
    return base.select("id", k_col, dist_col), centroids


def floordiv_sql(x: str, d: str) -> str:
    """Portable floor division for POSITIVE divisors in DuckDB SQL
    (whose // truncates toward zero, unlike Python's floor)."""
    return (
        f"(({x}) // ({d}) - CASE WHEN ({x}) % ({d}) <> 0 AND ({x}) < 0"
        f" THEN 1 ELSE 0 END)"
    )
