"""Hyperplane-LSH similarity: scale-path output equals the brute-force
ground truth (near-dup), recall is high (ANN top-k), and the physical
plan has no nested-loop/cartesian stage — the three properties that make
the bucketed path a legitimate replacement for the O(n²) baseline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.io import load_table
from hailstorm_spark.operators.similarity import (
    brute_force_topk,
    cosine_pairs_above,
    cosine_pairs_above_lsh,
    lsh_topk,
)
from hailstorm_spark.queries.similarity import _perturbed_corpus
from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def test_lsh_near_dup_equals_brute_force(spark):
    corpus = _perturbed_corpus(spark, SF_DIR)
    bf = sorted(map(tuple, cosine_pairs_above(corpus, "vec_id", "embedding", 0.99).collect()))
    lsh = sorted(map(tuple, cosine_pairs_above_lsh(corpus, "vec_id", "embedding", 0.99).collect()))
    assert len(bf) > 0, "planted near-dups must produce pairs (non-vacuous)"
    assert bf == lsh


def test_lsh_topk_recall(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    bf = brute_force_topk(emb, "vec_id", "embedding", range(10), 5).collect()
    ann = lsh_topk(emb, "vec_id", "embedding", range(10), 5).collect()
    truth = {(r.query_id, r.neighbor_id) for r in bf}
    found = {(r.query_id, r.neighbor_id) for r in ann}
    recall = len(truth & found) / len(truth)
    # 4-bit bands over 64 planes: expected per-neighbor recall ~0.86+
    # even at the corpus's weakest top-5 cosine (~0.25); 0.7 leaves
    # slack for the finite-sample tail while still failing if the
    # banding regresses to the 8-bit shape (recall ~0.1).
    assert recall >= 0.7, f"recall@5 {recall}"


def test_lsh_plans_have_no_nested_loop(spark):
    for name in ("embedding_lsh_near_dup_pairs", "ann_cosine_topk_lsh"):
        plan = plan_of(spark, name, mode="simple")
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_brute_force_near_dup_is_the_only_nested_loop_user(spark):
    # the brute-force baseline is *allowed* to nested-loop (it is the
    # correctness oracle, scoped to test scale); pin that so a future
    # "optimization" doesn't silently change what it measures
    plan = plan_of(spark, "embedding_near_dup_pairs", mode="simple")
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan


def test_band_keys_are_deterministic_and_bounded(spark):
    from hailstorm_spark.operators.similarity import (
        ANN_BANDS,
        ANN_ROWS,
        hyperplane_band_keys,
        with_quantized,
    )

    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    base = with_quantized(emb, "vec_id", "embedding")
    keys = base.select(
        hyperplane_band_keys(F.col("qvec"), ANN_BANDS, ANN_ROWS).alias("bands")
    ).collect()
    again = base.select(
        hyperplane_band_keys(F.col("qvec"), ANN_BANDS, ANN_ROWS).alias("bands")
    ).collect()
    assert [r.bands for r in keys] == [r.bands for r in again]
    for r in keys:
        assert len(r.bands) == ANN_BANDS
        assert all(0 <= v < (1 << ANN_ROWS) for v in r.bands)


def test_ivf_topk_recall_and_plan(spark):
    from hailstorm_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    bf = brute_force_topk(emb, "vec_id", "embedding", range(10), 5).collect()
    ivf = ivf_topk(emb, "vec_id", "embedding", range(10), 5).collect()
    truth = {(r.query_id, r.neighbor_id) for r in bf}
    found = {(r.query_id, r.neighbor_id) for r in ivf}
    recall = len(truth & found) / len(truth)
    # nprobe=4 of 16 lists: a true neighbor is missed only when its
    # list isn't among the query's 4 closest centroids; on this corpus
    # that keeps recall well above 0.5 — and the floor still fails if
    # probing degrades to a single list
    assert recall >= 0.5, f"ivf recall@5 {recall}"

    plan = plan_of(spark, "ann_cosine_topk_ivf", mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # probes broadcast; corpus never shuffles for the join


def test_quantize_parity_on_float32_rounding_edge(spark):
    """Cross-engine quantization must multiply in DOUBLE on both sides.

    The bug class (found by an sf0.1 oracle sweep): float32 0.3195
    stores as 0.31949999928474426; multiplying in FLOAT32 rounds the
    product UP to exactly 319.5 (which round() takes to 320), while the
    DOUBLE product 319.4999993 rounds to 319. Any oracle that writes
    ``round(x * 1000)`` over a FLOAT column silently takes the float32
    path — one unit of drift that exact-sum checksums (k-means
    centroid parity) catch and cosine top-ks usually don't. Both
    engines must quantize as round(CAST(x AS DOUBLE) * scale).
    """
    import duckdb
    import pyarrow as pa
    from pyspark.sql import functions as F

    from hailstorm_spark.operators.similarity import quantize

    edge = [0.3195, -0.3195, 0.0625, 0.1235, -0.9995]
    sdf = spark.createDataFrame([(edge,)], "embedding array<float>")
    got_spark = sdf.select(quantize("embedding").alias("q")).collect()[0]["q"]

    con = duckdb.connect()
    tbl = pa.table({"embedding": pa.array([edge], pa.list_(pa.float32()))})
    con.register("emb_edge", tbl)
    got_duck = con.execute(
        "SELECT list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) FROM emb_edge"
    ).fetchone()[0]
    assert got_spark == got_duck
    # and the exact edge value resolves DOWN (the double semantics)
    assert got_spark[0] == 319

    # the float32-path formulation is WRONG on this input — pin that it
    # actually differs so this test keeps teeth if DuckDB changes
    float_path = con.execute(
        "SELECT list_transform(embedding,"
        " x -> CAST(round(x * 1000) AS BIGINT)) FROM emb_edge"
    ).fetchone()[0]
    assert float_path[0] == 320


def test_hyperplane_low_dim_diversity_floor():
    """The hyperplane sign family keeps plane diversity at the
    uniform-random baseline in LOW dimensions — the regression pin for
    the affine-parity degeneracy the semantic-dedup randomized replay
    caught (parity((A·i+B) mod P) collapses to parity(i) XOR
    parity(B) wherever A·i+B < P, leaving ~10 distinct planes of 64 at
    dim 6; duplicated planes repeat the same bit in several bands, so
    one flipped component could miss EVERY band at once). Uniform
    baselines (mean distinct of 64 draws, up to negation): dim 4 → 8
    (saturates), dim 6 → ~28, dim 8 → ~50."""
    from hailstorm_spark.operators.similarity import (
        HP_A,
        HP_B,
        HP_C,
        HP_PLANES,
        HP_PRIME,
    )

    def sign_bit(p: int, i: int) -> int:
        h = (HP_A[p] * i * i + HP_B[p] * i + p) % HP_PRIME
        return ((HP_C * h) % HP_PRIME >> 15) & 1

    floors = {4: 8, 6: 24, 8: 42}
    for dim, floor in floors.items():
        pats = set()
        for p in range(HP_PLANES):
            sig = tuple(sign_bit(p, i) for i in range(1, dim + 1))
            pats.add(min(sig, tuple(1 - b for b in sig)))
        assert len(pats) >= floor, (dim, len(pats))
