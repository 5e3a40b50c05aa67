"""Vector similarity operators over embedding columns.

Baseline: brute-force cosine top-k via a broadcast join of the query
set against the corpus — O(|Q|·N) but embarrassingly parallel; the
right default when |Q| is small. Scale path: hyperplane-LSH bucketing
(hyperplane_band_keys / lsh_candidate_pairs / cosine_pairs_above_lsh)
— candidates come from an equi-join on signature bands, so the plan
has no nested-loop/cartesian join and survives a 100× scale-up.

Determinism: embeddings are quantized to integers (round(x·1000)) so
dot products and norms are exact integer arithmetic — results are
bit-identical across engines, partitionings, and runs. (Float dot
products are order-sensitive; an engine that can't reproduce its own
similarity join can't do incremental dedup.) At 1e-3 quantization the
cosine error is ~1e-3 absolute — far below any useful dedup threshold
gap; keep thresholds ≥ 2e-3 away from decision boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hailstorm_spark.functions.expr import let_
from hailstorm_spark.operators.checkpointing import materialize

QUANT_SCALE = 1000

#: Hyperplane-LSH family (SimHash-for-vectors, Charikar 2002): HP_PLANES
#: random ±1 hyperplanes; signature bit p = sign(<v, r_p>). Banded into
#: HP_BANDS keys of HP_ROWS bits each: two vectors at cosine c collide on
#: a band with prob ((1 - acos(c)/π))^HP_ROWS — at c=0.99 a band matches
#: with p≈0.69, so ≥1 of 8 bands collides with prob 1-(0.31)^8 ≈ 0.9999,
#: while near-orthogonal pairs pass a band with prob 2^-8. Plane entries
#: are ±1 from a fixed linear-congruential parity — deterministic across
#: engines and runs (the DuckDB oracles interpolate the same constants).
HP_PLANES = 64
HP_BANDS = 8
HP_ROWS = HP_PLANES // HP_BANDS
#: Top-k probing re-bands the same 64 planes into shorter (4-bit) bands:
#: true nearest neighbors of a query often sit at moderate cosine
#: (0.25-0.5 on this corpus), where 8-bit bands almost never collide
#: (recall ~0.1) but 4-bit bands still do (recall ~0.9, measured in
#: tests/test_similarity_lsh.py). Shorter bands trade more candidates
#: for recall — the classic (bands, rows) dial.
ANN_ROWS = 4
ANN_BANDS = HP_PLANES // ANN_ROWS
HP_PRIME = 4294967291  # largest prime < 2^32
HP_A = tuple(((2 * p + 3) * 2246822519) % (1 << 31) | 1 for p in range(HP_PLANES))
HP_B = tuple((p * 2654435761 + 1013904223) % (1 << 31) for p in range(HP_PLANES))
HP_C = 1779033703  # odd mixer < 2^31 (sha-256 h0), second hash round
#: plane p's ±1 entry at 1-based component i is
#:   1 − 2·(((HP_C · ((A_p·i² + B_p·i + p) mod HP_PRIME)) mod HP_PRIME
#:           >> 15) & 1)
#: — exact 64-bit integer arithmetic throughout (A_p·i² < 2^55 for
#: dims to 4096; HP_C·h < 2^62.8), inlined in hyperplane_band_keys and
#: mirrored verbatim by queries/similarity._hp_sign_sql.
#:
#: Why the quadratic term and the second multiplicative round: the
#: original parity form (((A_p·i + B_p) mod P) mod 2) is DEGENERATE at
#: low dimension — A_p is odd, so wherever A_p·i + B_p < P (all small
#: i), the parity collapses to parity(i) XOR parity(B_p): the sign
#: pattern over the first components depends on ONE bit of B_p, leaving
#: only ~10 distinct planes of 64 at dim 6 (vs the 28 a uniform draw
#: gives). Duplicate planes repeat the same bit in several bands, so a
#: near-dup pair whose one flipped bit lands on a duplicated plane
#: misses EVERY band at once — measured 0.4-1.2% missed near-dup pairs
#: at dims 4-6 (caught by the semantic-dedup randomized replay; the
#: dim-64 fixture was ~unaffected at 63/64 distinct). The i² term
#: breaks the affinity in i, the second round makes the extracted bit
#: depend on the mod-P wraparound count, and bit 15 of the product
#: avoids low-bit LCG structure: distinct-plane counts and measured
#: miss rates match the ideal ±1-random baseline at every dim
#: (tests/test_similarity_lsh.py pins the dim-6 diversity floor).


def hyperplane_band_keys(
    qvec_col: Column,
    bands: int = HP_BANDS,
    rows: int = HP_ROWS,
) -> Column:
    """LSH band keys for a quantized vector: array<int> of ``bands``
    values, band b = Σ_r [ <v, r_{b·rows+r}> ≥ 0 ] · 2^r.

    Pure columnar JVM expression, computed map-side. Shape matters for
    codegen: ONE nested transform over a plane-index sequence (LCG sign
    derived per element) instead of bands·rows unrolled aggregate
    expressions — the generated code is O(1) in (bands, rows, dim),
    which keeps whole-stage-codegen compile time flat and measured ~3×
    faster end-to-end than the unrolled form (which compiled ~1 MiB of
    code per operator). Band values stay below 2^rows, so no 64-bit
    sign-bit hazards."""

    n_planes = bands * rows

    def build(v: Column) -> Column:
        a_arr = F.array(*[F.lit(a).cast("long") for a in HP_A[:n_planes]])
        b_arr = F.array(*[F.lit(b).cast("long") for b in HP_B[:n_planes]])
        dots = F.transform(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            lambda p: F.aggregate(
                F.transform(
                    v,
                    lambda x, j: x
                    * (
                        F.lit(1)
                        - F.lit(2)
                        * F.shiftright(
                            (
                                F.lit(HP_C)
                                * (
                                    (
                                        F.element_at(a_arr, p.cast("int") + 1)
                                        * (j + F.lit(1))
                                        * (j + F.lit(1))
                                        + F.element_at(b_arr, p.cast("int") + 1)
                                        * (j + F.lit(1))
                                        + p
                                    )
                                    % F.lit(HP_PRIME)
                                )
                            )
                            % F.lit(HP_PRIME),
                            15,
                        ).bitwiseAND(F.lit(1))
                    ),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        bits = F.transform(dots, lambda d: F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)))

        def from_bits(bts: Column) -> Column:
            return F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.aggregate(
                    F.reverse(F.slice(bts, b * rows + 1, rows)),
                    F.lit(0),
                    lambda acc, x: acc * 2 + x,
                ).cast("int"),
            )

        return let_(bits, from_bits)

    return let_(qvec_col, build)


#: A vector component beyond this magnitude invalidates the embedding:
#: real embeddings are unit-ish, and the bound keeps every integer
#: dot/norm exactly inside int64 (|x·scale| ≤ 10^7 → a 4096-dim norm
#: ≤ 4·10^17 ≪ 2^63) so ANSI arithmetic can never fault downstream.
MAX_ABS_COMPONENT = 10_000.0


def valid_embedding(vec_col: Column | str) -> Column:
    """True iff the vector participates in similarity geometry: non-null,
    non-empty, every component finite and within MAX_ABS_COMPONENT.

    The ingest contract for every quantized-vector operator: a single
    NaN/Infinity/huge component would otherwise fault the whole scan
    (ANSI CAST_OVERFLOW inside quantize — the one-bad-row-kills-the-job
    class), and a vector with a non-finite component has no usable
    direction anyway. Invalid vectors are FILTERED at with_quantized /
    each quantize() site, and the DuckDB oracles apply the identical
    predicate (queries/similarity._VALID_EMB_SQL)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return (
        c.isNotNull()
        & (F.size(c) > 0)
        & F.forall(
            c,
            lambda x: x.isNotNull()
            & ~F.isnan(x.cast("double"))
            & (F.abs(x.cast("double")) <= F.lit(MAX_ABS_COMPONENT)),
        )
    )


def quantize(vec_col: Column | str, scale: int = QUANT_SCALE) -> Column:
    """array<float> → array<long> of round(x·scale). Callers must
    restrict to :func:`valid_embedding` rows first (with_quantized
    does; direct callers filter at the query site) — on arbitrary
    input the ANSI round/cast faults on non-finite components."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("long"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_cosine(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine from integer dot and precomputed integer self-dots.

    try_divide: a zero-quantized vector (all-zero or sub-quantization
    embedding — real corpora contain them) has no direction, so its
    cosine is NULL rather than a scan-killing ANSI DIVIDE_BY_ZERO.
    This matches DuckDB, whose division by zero is NULL natively:
    threshold filters drop the NULL on both engines and top-k windows
    rank it last on both — adversarial-sweep parity without special-
    casing any call site.

    The norm PRODUCT is computed in double, not int64: two
    large-magnitude vectors can overflow the long product (na·nb up to
    2^126) even when every dot product is comfortably in range, and an
    ANSI overflow kills the scan. Doubles cannot overflow here, and for
    every norm below 2^53 (quantized components ≤ ~3·10^5, far beyond
    real unit-ish embeddings) the double product is exact, so results
    are bit-identical to the old form — the oracles compute the same
    CAST-then-multiply."""
    return F.try_divide(
        int_dot(a, b), F.sqrt(na.cast("double") * nb.cast("double"))
    )


def with_quantized(
    df: DataFrame, id_col: str, vec_col: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Attach quantized vector + integer norm (computed once per row).

    The scan is spread across cores first (gated — a no-op whenever the
    input already has enough partitions, i.e. any real cluster read):
    everything downstream of this frame is expensive per-row vector
    math, and a single-row-group parquet file would otherwise pin all
    signature/dot work on one task.

    The frame is MATERIALIZED (localCheckpoint) before returning: every
    similarity operator fans it out at least twice (bands + one vector
    fetch per pair side), and without the checkpoint each consumer
    re-plans from the raw scan — the quantize + norm expressions run
    once per reference AND the join-key nullability inference pushes
    the entire dot-product expression into the parquet scan as a
    DataFilter (measured 2.2x on the LSH pair query at sf0.1, all of
    it first-run codegen+recompute). Same guarantee-compute-once guard
    as minhash_lsh_candidates' signature checkpoint; the materialized
    projection is (id, dim longs, norm) — the frame a production
    vector store persists anyway. ``checkpoint_dir`` switches the
    materialization to a reliable checkpoint that survives executor
    loss (operators/checkpointing.py) — the opt-in for long multi-
    operator pipelines that reuse this frame on preemptible nodes."""
    from hailstorm_spark.operators.dedup import _spread

    q = quantize(vec_col)
    out = _spread(
        df.filter(valid_embedding(vec_col)).select(
            F.col(id_col).alias("vid"), q.alias("qvec")
        )
    )
    return materialize(
        out.withColumn("qnorm", int_dot(F.col("qvec"), F.col("qvec"))),
        checkpoint_dir,
    )


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str, query_ids, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    The query side is tiny → broadcast; the corpus streams through one
    map-side join, a per-partition top-k heap (row_number after a
    partitioned sort is optimized by Spark into TakeOrdered-per-key).
    """
    from pyspark.sql import Window

    base = with_quantized(df, id_col, vec_col)
    queries = base.filter(F.col("vid").isin(list(query_ids))).select(
        F.col("vid").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm").alias("q_qnorm"),
    )
    joined = base.join(F.broadcast(queries), F.col("vid") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        quantized_cosine(
            F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm"), F.col("qnorm")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_pairs_above(df: DataFrame, id_col: str, vec_col: str, threshold: float) -> DataFrame:
    """All pairs with cosine ≥ threshold (brute-force form).

    At scale, replace the raw self-join with LSH bucketing: join on a
    shared hyperplane-signature band first, then apply the exact
    cosine filter to the (linear-sized) candidate set.
    """
    base = with_quantized(df, id_col, vec_col)
    a = base.select(
        F.col("vid").alias("id_a"), F.col("qvec").alias("va"), F.col("qnorm").alias("na")
    )
    b = base.select(
        F.col("vid").alias("id_b"), F.col("qvec").alias("vb"), F.col("qnorm").alias("nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            quantized_cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def banded(
    base: DataFrame, bands: int = HP_BANDS, rows: int = HP_ROWS
) -> DataFrame:
    """(vid, band_idx, band_val) rows from a with_quantized frame."""
    return base.select(
        "vid",
        F.posexplode(hyperplane_band_keys(F.col("qvec"), bands, rows)).alias(
            "band_idx", "band_val"
        ),
    )


def lsh_candidate_pairs(base: DataFrame) -> DataFrame:
    """Candidate (id_a < id_b) pairs sharing ≥1 hyperplane band.

    Equi-join on (band_idx, band_val): Spark plans a hash join on the
    band key, never a nested loop — the shape that survives 100 TB.
    The banded frame is MATERIALIZED before the self-join: subtree
    reuse breaks whenever the planner broadcasts a side, silently
    re-running the hyperplane projection per side (same guard as
    operators.dedup.minhash_lsh_candidates); the band list is ints
    only, tiny relative to the vectors."""
    bd = banded(base).localCheckpoint(eager=True)
    a, b = bd.alias("a"), bd.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .distinct()
    )


def cosine_pairs_above_lsh(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All pairs with cosine ≥ threshold, via hyperplane-LSH bucketing.

    Same output as :func:`cosine_pairs_above` (verified pairwise in
    tests) but linear-ish candidates: band equi-join → join vectors
    back by id → exact integer-cosine filter. Three shuffles, all
    equi-keyed; no O(n²) stage anywhere."""
    base = with_quantized(df, id_col, vec_col)
    cands = lsh_candidate_pairs(base)
    va = base.select(
        F.col("vid").alias("id_a"), F.col("qvec").alias("va"), F.col("qnorm").alias("na")
    )
    vb = base.select(
        F.col("vid").alias("id_b"), F.col("qvec").alias("vb"), F.col("qnorm").alias("nb")
    )
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            quantized_cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_topk(
    df: DataFrame, id_col: str, vec_col: str, query_ids, k: int = 5
) -> DataFrame:
    """Approximate cosine top-k: exact ranking over LSH-bucketed
    candidates (ANN proper — the scale path next to brute_force_topk).

    The query side's banded rows broadcast (|Q|·HP_BANDS rows); the
    corpus is probed by one hash join on the band key, so corpus work
    is one scan + one equi-join however large N grows. Recall is the
    LSH collision probability, not 1 — the brute-force operator is the
    ground truth the recall tests measure against."""
    from pyspark.sql import Window

    base = with_quantized(df, id_col, vec_col)
    bd = banded(base, ANN_BANDS, ANN_ROWS)
    qb = bd.filter(F.col("vid").isin(list(query_ids))).select(
        F.col("vid").alias("query_id"),
        F.col("band_idx").alias("q_band_idx"),
        F.col("band_val").alias("q_band_val"),
    )
    cands = (
        bd.join(
            F.broadcast(qb),
            (F.col("band_idx") == F.col("q_band_idx"))
            & (F.col("band_val") == F.col("q_band_val"))
            & (F.col("vid") != F.col("query_id")),
        )
        .select("query_id", F.col("vid").alias("neighbor_id"))
        .distinct()
    )
    qv = base.select(
        F.col("vid").alias("query_id"),
        F.col("qvec").alias("q_qvec"),
        F.col("qnorm").alias("q_qnorm"),
    )
    scored = (
        cands.join(base, cands["neighbor_id"] == base["vid"])
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            quantized_cosine(
                F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm"), F.col("qnorm")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


#: IVF coarse-quantizer defaults, sandbox-sized. At production scale
#: n_centroids ≈ √N from an offline k-means; here the centroid set is
#: the first n ids — deterministic, oracle-mirrorable, and exercising
#: the identical plan shape (centroids are plan literals either way).
IVF_CENTROIDS = 16
IVF_NPROBE = 4


def _centroid_literals(base: DataFrame, n_centroids: int):
    """Collect the centroid rows (O(n_centroids) driver data — the same
    budget as broadcast k-means centroids) and build a literal
    array<struct<cid,cvec,cnorm>> column usable in pure map-side
    expressions."""
    rows = (
        base.filter(F.col("vid") < n_centroids)
        .select("vid", "qvec")
        .collect()
    )
    # delegate to the dict form — one copy of the struct contract
    # ivf_assign depends on (cnorm = Σx² equals the stored qnorm)
    return centroid_literals_from_dict(
        {int(r["vid"]): [int(x) for x in r["qvec"]] for r in rows}
    )


def _affinity(v: Column, c: Column) -> Column:
    """Centroid-affinity score: dot(v, cvec)/√cnorm — argmax-equivalent
    to cosine (the query-side norm is a common positive factor)."""
    # try_divide: an all-zero centroid (a cluster of zero vectors) must
    # score NULL, not fault the scan — same contract as quantized_cosine
    return F.try_divide(int_dot(v, c["cvec"]), F.sqrt(c["cnorm"].cast("double")))


def ivf_assign(base: DataFrame, cents: Column) -> DataFrame:
    """Nearest-centroid assignment as a ZERO-SHUFFLE map expression:
    scores against the literal centroid array, array_max over
    struct(score, -cid) (⇒ ties to the smallest cid). This is the
    shape IVF takes at 100 TB — centroids ride the plan, the corpus
    never moves."""
    scored = let_(
        F.col("qvec"),
        lambda v: F.array_max(
            F.transform(
                cents,
                lambda c: F.struct(
                    _affinity(v, c).alias("score"), (-c["cid"]).alias("neg_cid")
                ),
            )
        ),
    )
    return base.withColumn("cid", (-scored["neg_cid"]).cast("long"))


def centroid_literals_from_dict(centroids: dict[int, list[int]]):
    """Literal centroid array from an externally-trained table (e.g.
    operators/clustering.py::kmeans_integer) — same plan shape as
    :func:`_centroid_literals`, different provenance."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(int(x)) for x in comps])
                .cast("array<long>")
                .alias("cvec"),
                F.lit(int(sum(x * x for x in comps))).alias("cnorm"),
            )
            for cid, comps in sorted(centroids.items())
        ]
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids,
    k: int = 5,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    centroids: dict[int, list[int]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: inverted-list probing with exact re-rank.

    corpus → map-side centroid assignment (no shuffle) →
    query probes = top-`nprobe` centroids per query (map-side, |Q|
    rows) → ONE equi-join of the corpus against the broadcast probe
    list on cid (candidates ≈ N·nprobe/C) → exact integer-cosine
    re-rank of candidates only. The corpus is scanned once and never
    shuffled; only candidates move (window top-k on query_id).
    """
    from pyspark.sql import Window

    base = with_quantized(df, id_col, vec_col)
    cents = (
        centroid_literals_from_dict(centroids)
        if centroids is not None
        else _centroid_literals(base, n_centroids)
    )
    inverted = ivf_assign(base, cents)
    return ivf_serve(inverted, cents, query_ids, k=k, nprobe=nprobe)


def ivf_serve(
    inverted: DataFrame,
    cents,
    query_ids,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """The SERVE half of IVF, split out (round 8) so a persisted index
    can answer queries without rebuilding: ``inverted`` is the
    (vid, qvec, qnorm, cid) index frame — fresh from :func:`ivf_assign`
    or reloaded from storage — and ``cents`` the matching literal
    centroid column (:func:`centroid_literals_from_dict` reconstructs
    it from a persisted centroid table). Query vectors are read from
    the index itself (a production serving tier would broadcast an
    external query batch through the same probe expressions).

    Plan shape is the ivf_topk contract unchanged: probes are map-side
    top-``nprobe`` centroid affinities per query, ONE equi-join of the
    index against the broadcast probe list on cid moves only
    candidates (≈ N·nprobe/C), exact integer-cosine re-rank on those.
    An index PERSISTED partitioned by cid additionally lets the scan
    prune to the probed lists only — the disk layout IS the inverted
    list."""
    from pyspark.sql import Window

    probe_structs = let_(
        F.col("qvec"),
        lambda v: F.slice(
            F.reverse(
                F.array_sort(
                    F.transform(
                        cents,
                        lambda c: F.struct(
                            _affinity(v, c).alias("score"),
                            (-c["cid"]).alias("neg_cid"),
                        ),
                    )
                )
            ),
            1,
            nprobe,
        ),
    )
    probes = (
        inverted.filter(F.col("vid").isin(list(query_ids)))
        .select(
            F.col("vid").alias("query_id"),
            F.col("qvec").alias("q_qvec"),
            F.col("qnorm").alias("q_qnorm"),
            F.explode(
                F.transform(probe_structs, lambda s: (-s["neg_cid"]).cast("long"))
            ).alias("cid"),
        )
    )
    cands = inverted.join(F.broadcast(probes), "cid").filter(
        F.col("vid") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        quantized_cosine(
            F.col("q_qvec"), F.col("qvec"), F.col("q_qnorm"), F.col("qnorm")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _frequency_ordered_prefix(
    sets, id_col: str, set_col: str, tau_num: int, tau_den: int
):
    """Shared prefix-filter scaffold for the set-join pair below:
    tokens ordered by ascending corpus frequency (token as tie-break —
    rare tokens first minimizes candidate fan-out), plus the pruning
    prefix of length |s| − ceil(τ·|s|) + 1 under that global order.
    Returns (toks, ordered) where ``toks`` is the exploded (id, tok)
    relation and ``ordered`` carries (id, so, sz, pref).

    Deliberately NOT checkpointed/persisted: the prefix branch needs
    only the short ``pref`` arrays, and Catalyst prunes the full set
    column out of that branch's aggregation — a materialized common
    subtree would carry the full arrays everywhere and measured 40%
    slower than letting the branches specialize.
    """
    nonempty = sets.filter(F.size(set_col) > 0)
    toks = nonempty.select(F.col(id_col), F.explode(set_col).alias("tok"))
    cnts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    ordered = (
        toks.join(cnts, "tok")
        .groupBy(id_col)
        .agg(
            F.expr("transform(array_sort(collect_list(struct(c, tok))), x -> x.tok)")
            .alias("so")
        )
        .withColumn("sz", F.size("so"))
        .withColumn(
            "pref",
            F.expr(
                f"slice(so, 1, sz - (({tau_num} * sz + {tau_den} - 1)"
                f" div {tau_den}) + 1)"
            ),
        )
    )
    return toks, ordered


def set_similarity_join(
    sets: DataFrame,
    id_col: str = "doc_id",
    set_col: str = "s",
    tau_num: int = 6,
    tau_den: int = 10,
) -> DataFrame:
    """EXACT Jaccard similarity self-join via prefix filtering (the
    PPJoin family, Xiao et al. 2008 / Chaudhuri et al. 2006) — the
    deterministic complement to the MinHash-LSH path: LSH trades recall
    for speed; this operator guarantees EVERY pair with
    J(a,b) ≥ tau_num/tau_den is returned, while still never comparing
    all pairs.

    The pruning lemma: order every token set by one global total order
    (here ascending corpus frequency, token as tie-break — rare tokens
    first minimizes candidate fan-out); any pair with overlap ≥
    c = ceil(τ·|s|) must share a token within each set's first
    |s| − c + 1 tokens. So candidates = sets sharing a PREFIX token
    (an equi-join, shuffle ∝ Σ prefix lengths ≈ (1−τ)·corpus tokens),
    then exact verification on candidates only. J ≥ τ is evaluated as
    ``tau_den·|∩| ≥ tau_num·|∪|`` — pure integer arithmetic, no float
    threshold to disagree across engines.

    Scale: two aggregation shuffles (token frequencies, set rebuild) +
    one candidate equi-join; the frequency ordering means hot tokens
    (stopwords) land at prefix TAILS and rarely generate candidates —
    the same skew-defense the banded LSH operators get from content
    hashing. Returns (doc_a, doc_b, jaccard_pct) with
    jaccard_pct = (100·|∩|) div |∪|.
    """
    _, ordered = _frequency_ordered_prefix(sets, id_col, set_col, tau_num, tau_den)
    # Candidate generation stays NARROW: only (id, size, prefix-token)
    # rows enter the self-join — the (possibly large) set arrays would
    # otherwise be replicated once per prefix token through the
    # shuffle. Sets are joined back by id for verification, touching
    # candidates only.
    #
    # r15: two candidate-stage prunes from the PPJoin literature,
    # applied BEFORE the dedup exchange and the two verification joins:
    # - LENGTH filter: J(a,b) ≥ τ forces τ·max(|a|,|b|) ≤ min(|a|,|b|)
    #   (since |∩| ≤ min and |∪| ≥ max), so size-incompatible pairs are
    #   dropped at the join itself — the sizes ride the narrow prefix
    #   rows for free.
    # (A shuffle_hash hint on this self-join was measured and REJECTED
    # this round: at fixture scale the planner BROADCASTS the prefix
    # frame — the hint forced a shuffled-hash join, +2 exchanges,
    # 5.2 s → 9.9 s min-of-3; above the broadcast threshold the planner
    # already degrades to a shuffle join on its own, so the hint buys
    # nothing at scale either.)
    pref = ordered.select(
        F.col(id_col), F.col("sz"), F.explode("pref").alias("ptok")
    )
    a = pref.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sza"), "ptok")
    b = pref.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("szb"), "ptok")
    cand = (
        a.join(b, "ptok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.least("sza", "szb") * tau_den
            >= F.greatest("sza", "szb") * tau_num
        )
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sets_by_id = ordered.select(F.col(id_col), F.col("so"))
    verified = (
        cand.join(
            sets_by_id.select(F.col(id_col).alias("doc_a"), F.col("so").alias("sa")),
            "doc_a",
        )
        .join(
            sets_by_id.select(F.col(id_col).alias("doc_b"), F.col("so").alias("sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa", "sb")).alias("i"),
            (
                F.size("sa") + F.size("sb") - F.size(F.array_intersect("sa", "sb"))
            ).alias("u"),
        )
        .filter(F.col("i") * tau_den >= F.col("u") * tau_num)
    )
    return verified.select(
        "doc_a", "doc_b", F.expr("(100 * i) div u").alias("jaccard_pct")
    )


def set_containment_join(
    sets: DataFrame,
    id_col: str = "doc_id",
    set_col: str = "s",
    tau_num: int = 9,
    tau_den: int = 10,
) -> DataFrame:
    """EXACT set-containment self-join: every ORDERED pair (a, b) with
    C(a→b) = |a∩b| / |a| ≥ τ — the ASYMMETRIC dedup relation Jaccard
    misses: a short document quoted wholesale inside a long one has
    tiny Jaccard (the union is dominated by the long side) but
    containment 1.0. This is the detector for quote inclusion,
    boilerplate wrappers, and strict-subset documents.

    Pruning (the containment side of the prefix-filter literature,
    Chaudhuri et al. 2006): overlap must reach c = ceil(τ·|a|), so `a`
    must share a token within its first |a| − c + 1 tokens under the
    global frequency order — only the PROBE side prunes; the indexed
    side must expose all its tokens (the candidate's position in `b`
    is unconstrained). Candidate traffic is therefore
    Σ_a (1−τ)·|a| × the token posting lists — rare-first ordering
    keeps hot tokens out of probe prefixes, which is what bounds the
    posting-list fan-out in practice. Verification touches candidates
    only, by id-joining the sets back (narrow candidate shuffle).

    The threshold is the integer test tau_den·|∩| ≥ tau_num·|a|;
    returns (doc_small, doc_big, containment_pct) with
    containment_pct = (100·|∩|) div |a|.
    """
    toks, ordered = _frequency_ordered_prefix(sets, id_col, set_col, tau_num, tau_den)
    probe = ordered.select(
        F.col(id_col).alias("doc_small"),
        F.col("sz").alias("sza"),
        F.explode("pref").alias("tok"),
    )
    # r15: the index side carries |b| on its narrow rows (row-local,
    # no extra shuffle) so the containment LENGTH bound — C(a→b) ≥ τ
    # forces |b| ≥ τ·|a| since |∩| ≤ |b| — prunes size-incompatible
    # candidates at the join, before the dedup exchange and the two
    # verification joins.
    nonempty = sets.filter(F.size(set_col) > 0)
    index = nonempty.select(
        F.col(id_col).alias("doc_big"),
        F.size(set_col).alias("szb"),
        F.explode(set_col).alias("tok"),
    )
    cand = (
        probe.join(index, "tok")
        .filter(F.col("doc_small") != F.col("doc_big"))
        .filter(F.col("szb") * tau_den >= F.col("sza") * tau_num)
        .select("doc_small", "doc_big")
        .dropDuplicates(["doc_small", "doc_big"])
    )
    sets_by_id = ordered.select(F.col(id_col), F.col("so"))
    verified = (
        cand.join(
            sets_by_id.select(
                F.col(id_col).alias("doc_small"), F.col("so").alias("sa")
            ),
            "doc_small",
        )
        .join(
            sets_by_id.select(
                F.col(id_col).alias("doc_big"), F.col("so").alias("sb")
            ),
            "doc_big",
        )
        .select(
            "doc_small",
            "doc_big",
            F.size(F.array_intersect("sa", "sb")).alias("i"),
            F.size("sa").alias("na"),
        )
        .filter(F.col("i") * tau_den >= F.col("na") * tau_num)
    )
    return verified.select(
        "doc_small", "doc_big", F.expr("(100 * i) div na").alias("containment_pct")
    )
