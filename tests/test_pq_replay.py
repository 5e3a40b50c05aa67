"""Third-engine replays for the PQ/k-means family at DEGENERATE
shapes (carried VERDICT r6/r7 task): the registered queries train at
dim 64 / K 4 on the fixture corpus, where subspace splits are benign.
The shapes that break quantizers live elsewhere — dim 2 (subspaces of
one component), N == K (every point its own centroid), N < K (missing
init seeds), duplicate points (argmin ties), all-zero vectors,
negative components (the floor-div vs trunc-div trap) — so this replay
recomputes Lloyd's algorithm and the ADC search ENTIRELY in pure
Python (no Spark expressions, no SQL) and demands value-exact
agreement with the operators.

The replay's independence is the point: kmeans_integer's oracle CTE
chain shares the floor-div formula and iteration structure with the
Spark side, so a systematic defect in the shared math (the LSH
degeneracy class from round 6) could green both engines. hashlib-free
integer arithmetic here answers to neither.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hailstorm_spark.operators.clustering import kmeans_integer


def _py_kmeans(vecs: dict[int, list[int]], k: int, iters: int):
    """Pure-Python Lloyd replay: same init (members with id < k seed
    centroid id = their own id), same assignment (argmin exact squared
    distance, ties to the lowest centroid id), same update (Python
    floor-div of component sums), same degenerate-cluster rule (an
    empty cluster disappears)."""
    cents = {i: list(v) for i, v in vecs.items() if i < k}

    def assign(c):
        out = {}
        for vid, v in vecs.items():
            best = min(
                (sum((x - cc) ** 2 for x, cc in zip(v, comps)), kk)
                for kk, comps in sorted(c.items())
            )
            out[vid] = (best[1], best[0])
        return out

    for _ in range(iters):
        a = assign(cents)
        nxt: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for vid, (kk, _) in a.items():
            acc = nxt.setdefault(kk, [0] * len(vecs[vid]))
            for i, x in enumerate(vecs[vid]):
                acc[i] += x
            counts[kk] = counts.get(kk, 0) + 1
        cents = {
            kk: [s // counts[kk] for s in sums] for kk, sums in nxt.items()
        }
    return assign(cents), cents


DEGENERATE_CASES = [
    # (name, vectors, k, iters)
    ("dim2_basic", {0: [0, 0], 1: [10, 10], 2: [1, 1], 3: [9, 11], 4: [2, -1]}, 2, 3),
    ("n_equals_k", {0: [5, -3], 1: [-2, 8], 2: [7, 7]}, 3, 2),
    ("n_less_than_k", {0: [4, 4], 1: [-6, 2]}, 4, 2),
    ("all_duplicates", {i: [3, 3] for i in range(6)}, 2, 3),
    ("all_zero_vectors", {i: [0, 0, 0] for i in range(5)}, 2, 2),
    # component sums -25 and -4 over count 3: floor gives -9 and -2,
    # truncation gives -8 and -1 — the case discriminates the div rule
    ("negative_sums_floor_div", {0: [-7, -1], 1: [-9, -2], 2: [-9, -1], 3: [50, 50]}, 2, 2),
    ("dim1_subspace", {0: [-5], 1: [5], 2: [-4], 3: [6], 4: [0]}, 2, 3),
    ("tie_on_distance", {0: [0, 0], 1: [2, 0], 2: [1, 0], 3: [1, 0]}, 2, 1),
]


@pytest.mark.parametrize(
    "name,vecs,k,iters", DEGENERATE_CASES, ids=[c[0] for c in DEGENERATE_CASES]
)
def test_kmeans_integer_matches_python_replay(spark, name, vecs, k, iters):
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "id long, qv array<long>"
    )
    assigned, cents = kmeans_integer(df, "id", "qv", k=k, iters=iters)
    got_assign = {
        int(r["id"]): (int(r["k"]), int(r["dist"])) for r in assigned.collect()
    }
    got_cents = {kk: [int(x) for x in comps] for kk, comps in cents.items()}
    want_assign, want_cents = _py_kmeans(vecs, k, iters)
    assert got_cents == want_cents, f"{name}: centroid drift"
    assert got_assign == want_assign, f"{name}: assignment drift"


def _py_pq_adc(vecs: dict[int, list[int]], k: int, iters: int, n_q: int, top_k: int):
    """Pure-Python PQ+ADC replay on a 2-subspace split of even-dim
    vectors: train one codebook per half, code every vector, build the
    per-query LUTs, rank by summed LUT distances with (dist, id) ties."""
    dim = len(next(iter(vecs.values())))
    half = dim // 2
    s1 = {i: v[:half] for i, v in vecs.items()}
    s2 = {i: v[half:] for i, v in vecs.items()}
    a1, c1 = _py_kmeans(s1, k, iters)
    a2, c2 = _py_kmeans(s2, k, iters)
    out = {}
    for q in range(n_q):
        if q not in vecs:
            continue
        lut1 = {kk: sum((x - c) ** 2 for x, c in zip(s1[q], comps))
                for kk, comps in c1.items()}
        lut2 = {kk: sum((x - c) ** 2 for x, c in zip(s2[q], comps))
                for kk, comps in c2.items()}
        scored = sorted(
            (lut1[a1[i][0]] + lut2[a2[i][0]], i)
            for i in vecs
            if i != q
        )
        out[q] = [(i, d) for d, i in scored[:top_k]]
    return out


@pytest.mark.parametrize("seed", [11, 313])
@pytest.mark.parametrize("dim,k", [(2, 2), (4, 3), (6, 2)])
def test_pq_adc_matches_python_replay_at_tiny_dims(spark, seed, dim, k):
    """The full PQ search pipeline — subspace split, per-half training,
    coding, LUT build, ADC ranking — composed from the operators the
    ann_pq_adc_topk query uses, at dims where a subspace is one or two
    components and codebooks collapse onto duplicate points."""
    import random

    rng = random.Random(seed)
    n, iters, n_q, top_k = 14, 2, 3, 4
    # small integer range forces duplicate subvectors and distance ties
    vecs = {
        i: [rng.randint(-3, 3) for _ in range(dim)] for i in range(n)
    }
    half = dim // 2
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "id long, qv array<long>"
    )
    s1 = df.select("id", F.expr(f"slice(qv, 1, {half})").alias("qv"))
    s2 = df.select("id", F.expr(f"slice(qv, {half + 1}, {half})").alias("qv"))
    a1, c1 = kmeans_integer(s1, "id", "qv", k=k, iters=iters)
    a2, c2 = kmeans_integer(s2, "id", "qv", k=k, iters=iters)
    codes = a1.select("id", F.col("k").alias("code1")).join(
        a2.select("id", F.col("k").alias("code2")), "id"
    )
    lut_rows = []
    for q in range(n_q):
        for kk, comps in c1.items():
            lut_rows.append((q, 1, kk, sum((x - c) ** 2 for x, c in zip(vecs[q][:half], comps))))
        for kk, comps in c2.items():
            lut_rows.append((q, 2, kk, sum((x - c) ** 2 for x, c in zip(vecs[q][half:], comps))))
    lut = spark.createDataFrame(lut_rows, "query_id long, sub int, k int, d long")
    l1 = lut.filter("sub = 1").select("query_id", F.col("k").alias("code1"), F.col("d").alias("d1"))
    l2 = lut.filter("sub = 2").select("query_id", F.col("k").alias("code2"), F.col("d").alias("d2"))
    from pyspark.sql import Window

    adc = (
        codes.join(F.broadcast(l1), "code1")
        .join(F.broadcast(l2), ["code2", "query_id"])
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"),
                (F.col("d1") + F.col("d2")).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    top = adc.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_k
    )
    got = {}
    for r in top.collect():
        got.setdefault(int(r["query_id"]), []).append(
            (int(r["neighbor_id"]), int(r["adc_dist"]))
        )
    for q in got:
        got[q].sort(key=lambda t: (t[1], t[0]))
    want = _py_pq_adc(vecs, k, iters, n_q, top_k)
    assert got == want
