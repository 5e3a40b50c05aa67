"""Randomized Python-replay parity for the sketch/fingerprint operators.

The oracle sweep (tests/test_oracle_parity.py) pins every sketch query
value-for-value against DuckDB — but only on the fixed testdata tables.
These tests re-derive the same sketches with an INDEPENDENT pure-Python
implementation (hashlib.md5, integer arithmetic) on seeded random
inputs, covering shapes the fixtures never produce: empty documents,
sub-shingle-length texts, tab/multi-space separators, single-token
vocabularies, and cardinalities chosen to stress the HLL small-range
correction. Same layer as tests/test_random_parity.py (SURVEY §5
step 4); the replay here is the hash math itself, so a drift in the
portable-hash contract (functions/hashing.py) reds these before it can
silently re-tune every downstream dedup/ANN operator.
"""

from __future__ import annotations

import hashlib
import math
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hailstorm_spark.functions.text import tokens
from hailstorm_spark.operators.dedup import (
    LSH_BANDS,
    LSH_ROWS,
    MASK32,
    MINHASH_A,
    MINHASH_B,
    MINHASH_K,
    MINHASH_PRIME,
    SHINGLE_N,
    SIMHASH_BITS,
    minhash_signature,
    shingles,
    simhash,
)

# ---------------------------------------------------------------- helpers


def _h60(s: str, salt: str | None = None) -> int:
    """Pure-python twin of functions/hashing.py::md5_hash60."""
    if salt is not None:
        s = f"{salt}:{s}"
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _py_tokens(text: str) -> list[str]:
    # ASCII-only inputs below, where Java \s+ and str.split() agree.
    return [t for t in text.lower().strip().split() if t]


def _py_shingles(toks: list[str], n: int = SHINGLE_N) -> list[str]:
    if len(toks) < n:
        return []
    out: list[str] = []
    seen: set[str] = set()
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


_VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "pack", "my", "box", "with", "five", "dozen", "liquor", "jugs",
    "Sphinx", "of", "black", "quartz", "judge", "vow", "zebra", "mix",
]


def _random_text(rng: random.Random) -> str:
    n = rng.choice([0, 1, 2, 3, 4, 5, 8, 12])
    seps = [" ", "  ", "\t", " \t "]
    return rng.choice(seps).join(
        rng.choice(_VOCAB) for _ in range(n)
    )


# ---------------------------------------------------------------- minhash


@pytest.mark.parametrize("seed", [11, 202])
def test_minhash_signature_matches_python_replay(spark, seed):
    """Operator signature == independent replay of tokens → distinct
    3-shingles → md5&MASK32 → min over the k universal-hash
    permutations; sub-shingle-length texts yield all-null signatures on
    both sides."""
    rng = random.Random(seed)
    rows = [(i, _random_text(rng)) for i in range(150)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.sig
        for r in df.select(
            "id", minhash_signature(shingles(tokens(F.col("text")))).alias("sig")
        ).collect()
    }
    for i, text in rows:
        sh = _py_shingles(_py_tokens(text))
        if not sh:
            expected = [None] * MINHASH_K
        else:
            hs = [_h60(s) & MASK32 for s in sh]
            expected = [
                min((MINHASH_A[j] * h + MINHASH_B[j]) % MINHASH_PRIME for h in hs)
                for j in range(MINHASH_K)
            ]
        assert got[i] == expected, (i, text)


@pytest.mark.parametrize("seed", [5])
def test_minhash_estimate_tracks_exact_jaccard(spark, seed):
    """Statistical sanity on pairs with planted overlap: the fraction of
    matching signature slots estimates Jaccard within the k=16 binomial
    3-sigma envelope (each slot matches independently w.p. J)."""
    rng = random.Random(seed)
    base = [rng.choice(_VOCAB) for _ in range(40)]
    pairs = []
    for pid, keep in enumerate((0.9, 0.6, 0.3)):
        a = list(base)
        b = [w if rng.random() < keep else rng.choice(_VOCAB) for w in base]
        pairs.append((pid, " ".join(a), " ".join(b)))
    df = spark.createDataFrame(pairs, "pid long, ta string, tb string")
    sigs = df.select(
        "pid",
        minhash_signature(shingles(tokens(F.col("ta")))).alias("sa"),
        minhash_signature(shingles(tokens(F.col("tb")))).alias("sb"),
    ).collect()
    for r in sigs:
        est = sum(x == y for x, y in zip(r.sa, r.sb)) / MINHASH_K
        row = next(p for p in pairs if p[0] == r.pid)
        a, b = set(_py_shingles(_py_tokens(row[1]))), set(
            _py_shingles(_py_tokens(row[2]))
        )
        j = len(a & b) / len(a | b)
        sigma = math.sqrt(j * (1 - j) / MINHASH_K)
        assert abs(est - j) <= 3 * sigma + 1e-9, (r.pid, est, j)


# ---------------------------------------------------------------- simhash


@pytest.mark.parametrize("seed", [13, 77])
def test_simhash_matches_python_replay(spark, seed):
    """Bit-majority vote with multiplicity (duplicate tokens vote
    twice); exact ties resolve to 0 ('> 0' vote), empty token arrays
    hash to 0."""
    rng = random.Random(seed)
    rows = [(i, _random_text(rng)) for i in range(150)]
    # force duplicates-with-multiplicity and the empty edge explicitly
    rows += [(1000, "dog dog dog cat"), (1001, ""), (1002, "   \t  ")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.sh
        for r in df.select("id", simhash(tokens(F.col("text"))).alias("sh")).collect()
    }
    for i, text in rows:
        hs = [_h60(t) for t in _py_tokens(text)]
        v = 0
        for j in range(SIMHASH_BITS):
            vote = sum(1 if (h >> j) & 1 else -1 for h in hs)
            if vote > 0:
                v |= 1 << j
        assert got[i] == v, (i, text)


# ------------------------------------------------------------------- hll


def _write_events(tmp_path, rows) -> str:
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(str(tmp_path / "events.parquet"), index=False)
    return str(tmp_path)


@pytest.mark.parametrize("seed,n_users", [(3, 40), (8, 900)])
def test_hll_registers_python_replay_and_estimate_bound(
    spark, tmp_path, seed, n_users
):
    """sketch_hll_portable_registers on a random events table: registers
    match a pure-python Flajolet replay exactly, AND the estimate those
    registers imply (alpha_m correction + small-range linear counting)
    lands within the published 3-sigma relative error of the true
    cardinality — the usability property the bit-for-bit oracle doesn't
    exercise. n_users=40 < 2.5·m stresses the linear-counting branch;
    900 the raw-estimate branch."""
    from hailstorm_spark.queries.approx import (
        HLL_M,
        HLL_RHO_MAX,
        sketch_hll_portable_registers,
    )

    rng = random.Random(seed)
    users = rng.sample(range(1, 10_000_000), n_users)
    rows = [
        (i, "2024-01-01", rng.choice(users), "click", 1.0, "{}")
        for i in range(n_users * 3)
    ]
    # ensure every sampled user appears at least once
    rows += [(10_000 + k, "2024-01-01", u, "click", 1.0, "{}") for k, u in enumerate(users)]
    sf_dir = _write_events(tmp_path, rows)

    got = {
        (r.event_type, r.register_idx): r.register_val
        for r in sketch_hll_portable_registers(spark, sf_dir).collect()
    }

    expected: dict[tuple[str, int], int] = {}
    for u in users:
        h = _h60(str(u), salt="hll")
        j, w = h % HLL_M, h // HLL_M
        rho = HLL_RHO_MAX if w == 0 else HLL_RHO_MAX - w.bit_length()
        key = ("click", j)
        expected[key] = max(expected.get(key, 0), rho)
    assert got == expected

    # estimate from the registers (missing register => value 0)
    regs = [got.get(("click", j), 0) for j in range(HLL_M)]
    alpha = 0.7213 / (1 + 1.079 / HLL_M)
    raw = alpha * HLL_M * HLL_M / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    est = HLL_M * math.log(HLL_M / zeros) if (raw <= 2.5 * HLL_M and zeros) else raw
    rel_sigma = 1.04 / math.sqrt(HLL_M)
    assert abs(est - n_users) / n_users <= 3 * rel_sigma, (est, n_users)


# ------------------------------------------------------------- count-min


@pytest.mark.parametrize("seed", [21, 63])
def test_countmin_matches_python_replay_and_never_undercounts(
    spark, tmp_path, seed
):
    """sketch_countmin_heavy_hitters on a random skewed corpus: the
    min-over-depth estimates match a pure-python rebuild of the 3x512
    counter matrix cell-for-cell, and every estimate >= the exact count
    (the one-sided CMS guarantee)."""
    import hailstorm_spark.queries.approx  # noqa: F401  (registers the query)
    from hailstorm_spark.registry import QUERIES

    sketch_countmin_heavy_hitters = QUERIES["sketch_countmin_heavy_hitters"].fn

    rng = random.Random(seed)
    # Zipf-ish: word w_i has weight ~ 1/(i+1)
    vocab = [f"w{i}" for i in range(120)]
    weights = [1.0 / (i + 1) for i in range(len(vocab))]
    docs = []
    for d in range(80):
        n = rng.randrange(3, 30)
        docs.append(
            (d, " ".join(rng.choices(vocab, weights=weights, k=n)), "en", "t", n)
        )
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)

    got = {
        r.word: (r.exact_cnt, r.est_cnt)
        for r in sketch_countmin_heavy_hitters(spark, str(tmp_path)).collect()
    }

    CM_DEPTH, CM_WIDTH = 3, 512
    wc: dict[str, int] = {}
    for _, text, *_ in docs:
        for t in _py_tokens(text):
            wc[t] = wc.get(t, 0) + 1
    cells: dict[tuple[int, int], int] = {}
    for w, c in wc.items():
        for j in range(CM_DEPTH):
            key = (j, _h60(w, salt=f"cm{j}") % CM_WIDTH)
            cells[key] = cells.get(key, 0) + c
    top20 = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expected = {
        w: (
            c,
            min(
                cells[(j, _h60(w, salt=f"cm{j}") % CM_WIDTH)]
                for j in range(CM_DEPTH)
            ),
        )
        for w, c in top20
    }
    assert got == expected
    for w, (exact, est) in got.items():
        assert est >= exact, w


# ------------------------------------------- incremental dedup (greedy)


def _py_band_keys(text: str) -> list[tuple[int, str]] | None:
    """Replay of queries/dedup.py::band_keys_of for one document:
    tokens → distinct 3-shingles → MinHash sig → banded key strings.
    None for sig-less (sub-shingle-length) docs, which band_keys_of
    filters out."""
    sh = _py_shingles(_py_tokens(text))
    if not sh:
        return None
    hs = [_h60(s) & MASK32 for s in sh]
    sig = [
        min((MINHASH_A[j] * h + MINHASH_B[j]) % MINHASH_PRIME for h in hs)
        for j in range(MINHASH_K)
    ]
    return [
        (b, ",".join(str(sig[b * LSH_ROWS + r]) for r in range(LSH_ROWS)))
        for b in range(LSH_BANDS)
    ]


@pytest.mark.parametrize("seed", [47, 348])
def test_incremental_band_probe_matches_greedy_python_replay(spark, seed):
    """The incremental-dedup probe pattern (streaming_incremental_dedup_
    index / dedup_incremental_new_docs) on random multi-batch input: a
    doc survives iff none of its band keys hit the index accumulated
    from PRIOR batches' survivors, with no within-batch suppression —
    exactly the batch_id < N fence. The Spark flow (band_keys_of +
    left_semi probe + survivors-only append) must equal a pure-Python
    greedy replay of the same rule, whatever the LSH collisions turn
    out to be: ~40% of later docs are planted one-token-appended
    near-dups of earlier docs, the rest fresh, plus sub-shingle-length
    docs that neither side may emit."""
    from hailstorm_spark.queries.dedup import band_keys_of

    rng = random.Random(seed)
    batches: list[list[tuple[int, str]]] = []
    prev_texts: list[str] = []
    nid = 0
    for _ in range(3):
        batch: list[tuple[int, str]] = []
        for _ in range(25):
            if prev_texts and rng.random() < 0.4:
                batch.append((nid, rng.choice(prev_texts) + " zz"))
            else:
                n = rng.choice([1, 2, 5, 6, 8, 10])  # incl. sig-less lengths
                batch.append(
                    (nid, " ".join(rng.choice(_VOCAB) for _ in range(n)))
                )
            nid += 1
        batches.append(batch)
        prev_texts += [t for _, t in batch if len(_py_tokens(t)) >= SHINGLE_N]

    index: set[tuple[int, str]] = set()
    py_survivors: list[int] = []
    for batch in batches:
        appended: list[tuple[int, str]] = []
        for i, t in batch:
            bands = _py_band_keys(t)
            if bands is None:
                continue
            if not any(bk in index for bk in bands):
                py_survivors.append(i)
                appended += bands
        index.update(appended)

    idx_df = None
    got: list[int] = []
    for batch in batches:
        df = spark.createDataFrame(batch, "doc_id long, text string")
        bands = band_keys_of(df)
        if idx_df is None:
            surv = bands.select("doc_id").distinct()
        else:
            collided = (
                bands.join(idx_df, ["band_idx", "band_key"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            surv = (
                bands.select("doc_id").distinct().join(collided, "doc_id", "left_anti")
            )
        got += [r.doc_id for r in surv.collect()]
        surv_bands = (
            bands.join(surv, "doc_id", "left_semi")
            .select("band_idx", "band_key")
            .distinct()
        )
        idx_df = (
            surv_bands if idx_df is None else idx_df.union(surv_bands).distinct()
        ).localCheckpoint(eager=True)

    assert sorted(got) == sorted(py_survivors)
    assert len(py_survivors) < nid  # some planted near-dups actually collided


# --------------------------------------------------------- BPE training


@pytest.mark.parametrize("seed", [67, 4242])
def test_bpe_merge_rounds_matches_python_replay(spark, tmp_path, seed):
    """text_bpe_merge_rounds on a random small-vocab corpus: both merge
    elections (count desc, then lexicographic a, b) and the exact
    non-greedy rewrite rule (mark (a,b) at i, drop b at i when the
    PREVIOUS token matched — replicated verbatim, including its
    behavior on overlapping self-pairs) replayed in pure Python, plus
    the post-merge token and vocab counts."""
    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee"]  # tiny => heavy pair repetition
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 14)))
        for _ in range(60)
    ]
    pdf = pd.DataFrame(
        [(i, t, "en", "t", len(t)) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)

    import hailstorm_spark.queries.textstats  # noqa: F401
    from hailstorm_spark.registry import QUERIES

    [r] = QUERIES["text_bpe_merge_rounds"].fn(spark, str(tmp_path)).collect()

    def best_pair(docs):
        counts: dict[tuple[str, str], int] = {}
        for tk in docs:
            for i in range(len(tk) - 1):
                counts[(tk[i], tk[i + 1])] = counts.get((tk[i], tk[i + 1]), 0) + 1
        return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]

    def merge(tk, a, b):
        out = []
        for i in range(len(tk)):
            if i + 1 < len(tk) and tk[i] == a and tk[i + 1] == b:
                out.append(tk[i] + "+" + tk[i + 1])
            elif i > 0 and tk[i - 1] == a and tk[i] == b:
                continue
            else:
                out.append(tk[i])
        return out

    docs = [_py_tokens(t) for t in texts]
    n_before = sum(len(tk) for tk in docs)
    a1, b1 = best_pair(docs)
    docs = [merge(tk, a1, b1) for tk in docs]
    a2, b2 = best_pair(docs)
    docs = [merge(tk, a2, b2) for tk in docs]
    expected = (
        a1, b1, a2, b2,
        n_before,
        sum(len(tk) for tk in docs),
        len({t for tk in docs for t in tk}),
        a1 != b1 and a2 != b2,
    )
    assert tuple(r) == expected


# ------------------------------------------------ hyperplane signatures


@pytest.mark.parametrize("seed", [71, 909])
@pytest.mark.parametrize("geometry", [("hp", 8, 8), ("ann", 16, 4)])
def test_hyperplane_band_keys_match_python_replay(spark, seed, geometry):
    """operators/similarity.py::hyperplane_band_keys vs a pure-Python
    replay of the hash-derived ±1 planes on random vectors, in BOTH
    geometries (8x8 near-dup bands and 16x4 ANN probe bands): sign_p(j)
    = 1 - 2*(((C*((A_p*(j+1)² + B_p*(j+1) + p) mod P)) mod P >> 15) & 1)
    — the quadratic two-round form that keeps plane diversity at the
    uniform-random baseline in LOW dimensions (the original affine
    parity collapsed to ~10 distinct planes of 64 at dim 6, missing
    near-dup pairs; see operators/similarity.py) — bit = dot >= 0 (the >=
    makes an exact-zero dot a set bit — pinned by an all-zero vector,
    whose band values must be all-ones, and by orthogonal-ish sparse
    vectors), band value = sum of bits << r."""
    from hailstorm_spark.operators.similarity import (
        HP_A,
        HP_B,
        HP_C,
        HP_PRIME,
        hyperplane_band_keys,
        quantize,
    )

    _, bands, rows = geometry
    rng = random.Random(seed)
    dim = 16
    # eighths are binary-exact and quantize to exact multiples of 125
    rows_in = [
        (i, [rng.randrange(-8000, 8001) / 8.0 for _ in range(dim)])
        for i in range(120)
    ]
    rows_in += [(1000, [0.0] * dim), (1001, [0.125] + [0.0] * (dim - 1))]
    df = spark.createDataFrame(rows_in, "id long, vec array<double>")
    got = {
        r.id: r.bk
        for r in df.select(
            "id",
            hyperplane_band_keys(quantize(F.col("vec")), bands, rows).alias("bk"),
        ).collect()
    }
    for i, vec in rows_in:
        qv = [round(x * 1000) for x in vec]  # exact: eighths * 1000 is integral
        bits = []
        for p in range(bands * rows):
            dot = sum(
                x
                * (
                    1
                    - 2
                    * (
                        (
                            HP_C
                            * (
                                (HP_A[p] * (j + 1) * (j + 1)
                                 + HP_B[p] * (j + 1) + p)
                                % HP_PRIME
                            )
                        )
                        % HP_PRIME
                        >> 15
                    & 1
                    )
                )
                for j, x in enumerate(qv)
            )
            bits.append(1 if dot >= 0 else 0)
        expected = [
            sum(bits[b * rows + r] << r for r in range(rows)) for b in range(bands)
        ]
        assert got[i] == expected, (i, vec)
    assert got[1000] == [(1 << rows) - 1] * bands  # zero vector: every dot == 0


# --------------------------------------------- Rabin-Karp rolling hash


@pytest.mark.parametrize("seed", [83, 1414])
def test_rolling_window_hashes_match_python_replay(spark, seed):
    """operators/text.py::rolling_window_hashes vs a pure-Python
    Rabin-Karp replay on random token streams: 30-bit md5-truncated
    token hashes, polynomial base powers mod the Mersenne prime, one
    hash per 4-token window, empty output below window length — and
    the shift property (identical windows at different positions hash
    identically) pinned via a planted repeated phrase."""
    from hailstorm_spark.operators.text import (
        RK_MASK30,
        RK_MOD,
        RK_POWS,
        RK_WINDOW,
        rolling_window_hashes,
    )

    rng = random.Random(seed)
    rows = []
    for i in range(100):
        n = rng.choice([0, 1, 3, 4, 5, 9, 15])
        rows.append((i, " ".join(rng.choice(_VOCAB) for _ in range(n))))
    rows.append((1000, "alpha beta gamma delta xx alpha beta gamma delta"))
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.h
        for r in df.select(
            "id", rolling_window_hashes(tokens(F.col("text"))).alias("h")
        ).collect()
    }
    for i, text in rows:
        toks = _py_tokens(text)
        xs = [_h60(t) & RK_MASK30 for t in toks]
        expected = [
            sum(xs[i0 + j] * RK_POWS[j] % RK_MOD for j in range(RK_WINDOW)) % RK_MOD
            for i0 in range(len(xs) - RK_WINDOW + 1)
        ]
        assert got[i] == expected, (i, text)
    # shift property: the repeated 4-gram produces the same hash twice
    h = got[1000]
    assert h[0] == h[5] and len(set(h)) < len(h)


# ---------------------------------------------------- PQ-ADC retrieval


def _py_kmeans(vecs: dict, k: int, iters: int):
    """Replay of operators/clustering.py::kmeans_integer (same rules as
    the test_random_parity replay): id<k seeding, argmin with lowest-id
    tiebreak, floor-divided centroid updates."""
    dim = len(next(iter(vecs.values())))
    cents = {i: list(vecs[i]) for i in range(k) if i in vecs}

    def assign(v, cs):
        return min(
            (sum((x - c) * (x - c) for x, c in zip(v, cv)), cid)
            for cid, cv in sorted(cs.items())
        )

    for _ in range(iters):
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for _id, v in vecs.items():
            _, cid = assign(v, cents)
            s = sums.setdefault(cid, [0] * dim)
            for p, x in enumerate(v):
                s[p] += x
            counts[cid] = counts.get(cid, 0) + 1
        cents = {cid: [s // counts[cid] for s in comp] for cid, comp in sums.items()}
    final = {i: assign(v, cents) for i, v in vecs.items()}  # id -> (dist, k)
    return final, cents


@pytest.mark.parametrize("seed", [97, 1717])
def test_pq_adc_topk_matches_python_replay(spark, tmp_path, seed):
    """ann_pq_adc_topk end-to-end on a random embeddings table vs a
    pure-Python replay: per-subspace Lloyd codebooks (reusing the
    k-means replay rules), 2-symbol code assignment, per-query LUT
    construction, ADC = two lookups + add, and (distance, neighbor_id)
    deterministic top-10."""
    import numpy as np

    from hailstorm_spark.queries.similarity import (
        PQ_DIM,
        PQ_ITERS,
        PQ_K,
        PQ_SUB,
    )
    from hailstorm_spark.registry import QUERIES

    rng = random.Random(seed)
    n = 80
    vecs = {
        i: [rng.randrange(-8000, 8001) / 8.0 for _ in range(PQ_DIM)] for i in range(n)
    }
    pdf = pd.DataFrame(
        [(i, np.asarray(v, dtype=np.float32), i % 5) for i, v in vecs.items()],
        columns=["vec_id", "embedding", "label"],
    )
    pdf.to_parquet(str(tmp_path / "embeddings.parquet"), index=False)

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist)
        for r in QUERIES["ann_pq_adc_topk"].fn(spark, str(tmp_path)).collect()
    }

    qv = {i: [round(x * 1000) for x in v] for i, v in vecs.items()}
    s1 = {i: v[:PQ_SUB] for i, v in qv.items()}
    s2 = {i: v[PQ_SUB:] for i, v in qv.items()}
    f1, c1 = _py_kmeans(s1, PQ_K, PQ_ITERS)
    f2, c2 = _py_kmeans(s2, PQ_K, PQ_ITERS)
    N_Q, TOP_K = 8, 10
    expected = {}
    for qid in range(N_Q):
        lut1 = {k: sum((x - c) ** 2 for x, c in zip(s1[qid], cv)) for k, cv in c1.items()}
        lut2 = {k: sum((x - c) ** 2 for x, c in zip(s2[qid], cv)) for k, cv in c2.items()}
        scored = sorted(
            (lut1[f1[i][1]] + lut2[f2[i][1]], i) for i in vecs if i != qid
        )
        for rank, (d, i) in enumerate(scored[:TOP_K], start=1):
            expected[(qid, rank)] = (i, d)
    assert got == expected


# ------------------------------------------------------ IVF retrieval


@pytest.mark.parametrize("seed", [101, 2323])
def test_ivf_topk_matches_python_replay(spark, tmp_path, seed):
    """ann_cosine_topk_ivf end-to-end on a random embeddings table vs a
    pure-Python replay of the whole path: literal centroids (vid <
    IVF_CENTROIDS), float affinity dot/sqrt(cnorm) with ties to the
    smallest cid, top-nprobe probe lists ordered by (score desc, cid
    asc), candidate gathering over the probed lists, and exact-cosine
    re-rank with (cosine desc, neighbor_id asc). Floats replay exactly:
    both sides are IEEE doubles applying the same operations."""
    import math as _math

    import numpy as np

    from hailstorm_spark.operators.similarity import IVF_CENTROIDS, IVF_NPROBE
    from hailstorm_spark.queries.similarity import N_QUERIES, TOP_K
    from hailstorm_spark.registry import QUERIES

    rng = random.Random(seed)
    n, dim = 90, 16
    vecs = {
        i: [rng.randrange(-8000, 8001) / 8.0 for _ in range(dim)] for i in range(n)
    }
    pdf = pd.DataFrame(
        [(i, np.asarray(v, dtype=np.float32), i % 5) for i, v in vecs.items()],
        columns=["vec_id", "embedding", "label"],
    )
    pdf.to_parquet(str(tmp_path / "embeddings.parquet"), index=False)

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in QUERIES["ann_cosine_topk_ivf"].fn(spark, str(tmp_path)).collect()
    }

    qv = {i: [round(x * 1000) for x in v] for i, v in vecs.items()}
    norm = {i: sum(x * x for x in v) for i, v in qv.items()}
    cents = {i: (qv[i], norm[i]) for i in range(IVF_CENTROIDS)}

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def affinity(v, cid):
        cv, cn = cents[cid]
        return dot(v, cv) / _math.sqrt(float(cn)) if cn else None

    def assigned_cid(v):
        # array_max over struct(score, -cid): ties to the smallest cid
        return max(cents, key=lambda cid: (affinity(v, cid), -cid))

    lists: dict[int, list[int]] = {}
    for i, v in qv.items():
        lists.setdefault(assigned_cid(v), []).append(i)

    expected = {}
    for qid in range(N_QUERIES):
        probes = sorted(cents, key=lambda cid: (-affinity(qv[qid], cid), cid))[
            :IVF_NPROBE
        ]
        cand = [i for c in probes for i in lists.get(c, []) if i != qid]
        scored = sorted(
            (
                -(dot(qv[qid], qv[i]) / _math.sqrt(float(norm[qid]) * float(norm[i]))),
                i,
            )
            for i in cand
        )
        for rank, (negcos, i) in enumerate(scored[:TOP_K], start=1):
            expected[(qid, rank)] = (i, -negcos)
    assert got == expected


# -------------------------------------- weighted priority sampling


@pytest.mark.parametrize("seed", [131, 616])
def test_weighted_priority_sample_matches_python_replay(spark, tmp_path, seed):
    """sample_weighted_priority_per_source on a random corpus vs a
    pure-Python replay of the integer A-ES cousin (priority =
    hash div (n_chars+1), bottom-K per source with (priority, doc_id)
    ties), plus the size-bias property: in a source split between
    10x-longer and short docs, long docs dominate the sample."""
    import hailstorm_spark.queries.corpus_extras  # noqa: F401
    from hailstorm_spark.registry import QUERIES

    K_PER_SOURCE = 5  # module-local constant inside the register closure

    rng = random.Random(seed)
    docs = []
    did = 0
    for s in range(4):
        for _ in range(30):
            long = rng.random() < 0.5
            n_chars = rng.randrange(2000, 4000) if long else rng.randrange(50, 200)
            docs.append((did, "x", "en", f"src{s}", n_chars))
            did += 1
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)

    got = {
        (r.source, r.k_rank): (r.doc_id, r.priority)
        for r in QUERIES["sample_weighted_priority_per_source"]
        .fn(spark, str(tmp_path))
        .collect()
    }

    by_src: dict = {}
    n_chars_of = {}
    for did_, _, _, src, nc in docs:
        pri = _h60(str(did_), salt="wps") // (nc + 1)
        by_src.setdefault(src, []).append((pri, did_))
        n_chars_of[did_] = nc
    expected = {}
    for src, items in by_src.items():
        for rank, (pri, did_) in enumerate(sorted(items)[:K_PER_SOURCE], start=1):
            expected[(src, rank)] = (did_, pri)
    assert got == expected
    sampled = [d for d, _ in got.values()]
    long_frac = sum(n_chars_of[d] > 1000 for d in sampled) / len(sampled)
    assert long_frac > 0.7  # size bias: long docs dominate


# ---------------------------------------------------- hashing trick


@pytest.mark.parametrize("seed", [137, 717])
def test_feature_hashing_matches_python_replay(spark, tmp_path, seed):
    """text_feature_hashing_buckets on a random corpus vs a pure-Python
    replay of the signed hashing trick: md5-salted bucket and sign per
    token occurrence (with multiplicity), per-source bucket weights and
    occurrence counts exact — colliding tokens of opposite sign cancel
    in weight while still counting occurrences."""
    import hailstorm_spark.queries.textstats  # noqa: F401
    from hailstorm_spark.registry import QUERIES

    B = 64  # module-local constant inside the register closure
    rng = random.Random(seed)
    docs = []
    for did in range(50):
        n = rng.randrange(0, 20)
        docs.append(
            (did, " ".join(rng.choice(_VOCAB) for _ in range(n)), "en",
             f"src{did % 3}", n)
        )
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)

    got = {
        (r.source, r.bucket): (r.weight, r.n_occurrences)
        for r in QUERIES["text_feature_hashing_buckets"]
        .fn(spark, str(tmp_path))
        .collect()
    }

    expected: dict = {}
    for _, text, _, src, _ in docs:
        for t in _py_tokens(text):
            b = _h60(t, salt="fh") % B
            s = 1 if _h60(t, salt="fs") % 2 == 0 else -1
            w, n = expected.get((src, b), (0, 0))
            expected[(src, b)] = (w + s, n + 1)
    assert got == expected


# ------------------------------------------- token frequency histogram


@pytest.mark.parametrize("seed", [157, 828])
def test_token_freq_histogram_matches_python_replay(spark, tmp_path, seed):
    """text_token_freq_histogram on a random Zipf-ish corpus vs a
    pure-Python replay of digit-count magnitude bucketing: a planted
    1000+-occurrence token lands in magnitude 4, singletons fill
    magnitude 1, and empty docs contribute nothing."""
    import hailstorm_spark.queries.textstats  # noqa: F401
    from hailstorm_spark.registry import QUERIES

    rng = random.Random(seed)
    docs = []
    texts = []
    for did in range(60):
        n = rng.choice([0, 3, 10, 25])
        # skewed choice so some tokens repeat across docs heavily
        words = [rng.choice(_VOCAB[: rng.choice([2, 8, 24])]) for _ in range(n)]
        texts.append(" ".join(words))
    texts.append(" ".join(["hot"] * 1100))  # planted magnitude-4 token
    for did, t in enumerate(texts):
        docs.append((did, t, "en", "src0", len(t)))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)

    got = {
        r.freq_magnitude: (r.n_terms, r.n_occurrences)
        for r in QUERIES["text_token_freq_histogram"].fn(spark, str(tmp_path)).collect()
    }

    counts: dict = {}
    for t in texts:
        for w in _py_tokens(t):
            counts[w] = counts.get(w, 0) + 1
    expected: dict = {}
    for w, c in counts.items():
        m = len(str(c))
        n, occ = expected.get(m, (0, 0))
        expected[m] = (n + 1, occ + c)
    assert got == expected
    assert 4 in got  # the planted hot token


# ----------------------------------------------- keep-best cluster dedup


def _py_quality(text: str) -> float:
    """Replay of operators/text.py::quality_score (same rational
    weights, same double divisions)."""
    from hailstorm_spark.functions.text import STOPWORDS

    toks = _py_tokens(text)
    n = len(toks)
    chars = sum(len(t) for t in toks)
    mean_len = chars / max(n, 1)
    stop_ratio = sum(1 for t in toks if t in STOPWORDS) / max(n, 1)
    len_ok = 1.0 if 20 <= n <= 1000 else 0.0
    word_ok = 1.0 if 2.0 <= mean_len <= 12.0 else 0.0
    stop_ok = 1.0 if stop_ratio >= 0.01 else 0.0
    return (len_ok + word_ok + stop_ok) / 3.0


@pytest.mark.parametrize("seed", [59, 8282])
def test_keep_best_matches_python_replay(spark, tmp_path, seed):
    """dedup_clusters_keep_best vs a full Python replay: band-key LSH
    candidates + exact-dup star edges + union-find components + the
    quality replay + the (quality desc, doc_id asc) survivor rule —
    whatever the LSH collisions turn out to be, both sides must agree
    edge-for-edge. Planted: exact-duplicate groups (guaranteed
    clusters, quality tie -> lowest id survives), 19-token originals
    whose ' zz' mutant crosses the len>=20 quality band (when LSH
    connects them, the HIGHER id wins on quality — the policy's whole
    point), sub-shingle docs reachable only via exact edges, and
    singletons that must not appear at all."""
    from hailstorm_spark.queries.dedup import MUTATE_BELOW, MUTATE_ID_SHIFT
    from hailstorm_spark.registry import QUERIES

    rng = random.Random(seed)
    texts: dict[int, str] = {}
    # ids < MUTATE_BELOW get auto-mutants (text + ' zz'); give them
    # 19 content tokens so the mutant crosses the length band
    for did in range(0, 8):
        toks = [rng.choice(_VOCAB) for _ in range(18)] + ["the"]
        texts[did] = " ".join(toks)
    # exact-duplicate triple above the mutate range (quality tie)
    dup_text = " ".join(rng.choice(_VOCAB) for _ in range(25)) + " of"
    for did in (200, 201, 202):
        texts[did] = dup_text
    # sub-shingle exact pair (no band keys; exact edge only)
    texts[300] = "xy ab"
    texts[301] = "xy ab"
    # singletons: random unrelated docs
    for did in range(400, 420):
        texts[did] = " ".join(rng.choice(_VOCAB) for _ in range(rng.choice([0, 2, 15, 30])))
    pdf = pd.DataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in sorted(texts.items())],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)

    got = {
        r.doc_id: (r.cluster_id, r.quality, r.keep)
        for r in QUERIES["dedup_clusters_keep_best"].fn(spark, str(tmp_path)).collect()
    }

    # replay the augmented corpus
    corpus = dict(texts)
    for did in list(texts):
        if did < MUTATE_BELOW:
            corpus[did + MUTATE_ID_SHIFT] = texts[did] + " zz"
    # LSH candidate edges
    bands: dict = {}
    for did, text in corpus.items():
        for bk in _py_band_keys(text) or []:
            bands.setdefault(bk, []).append(did)
    edges = set()
    for mem in bands.values():
        mem = sorted(set(mem))
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                edges.add((mem[i], mem[j]))
    # exact-dup star edges
    by_text: dict = {}
    for did, text in corpus.items():
        by_text.setdefault(text, []).append(did)
    for ids in by_text.values():
        m = min(ids)
        for d in ids:
            if d != m:
                edges.add((m, d))
    # union-find
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)
    expected: dict = {}
    for members in comp.values():
        cid = min(members)
        ranked = sorted(members, key=lambda d: (-_py_quality(corpus[d]), d))
        for d in members:
            expected[d] = (cid, _py_quality(corpus[d]), d == ranked[0])
    assert got == expected
    # planted decisions: exact-dup tie -> lowest id; sub-shingle pair present
    assert expected[200][2] and not expected[201][2] and not expected[202][2]
    assert expected[300][2] and not expected[301][2]
    # every original<8 that LSH connected to its mutant lost to it on quality
    crossed = [
        d for d in range(0, 8)
        if d in expected and expected[d][0] == expected.get(d + MUTATE_ID_SHIFT, (None,))[0]
    ]
    assert crossed, "no original-mutant pair landed in one cluster"
    for d in crossed:
        assert expected[d + MUTATE_ID_SHIFT][2] and not expected[d][2]
        assert expected[d + MUTATE_ID_SHIFT][1] > expected[d][1]


# ------------------------------------------- simhash candidate pairs


@pytest.mark.parametrize("seed", [67, 4141])
def test_simhash_candidates_match_python_replay(spark, seed):
    """operators/dedup.py::simhash_candidates vs a Python replay of the
    whole pipeline: per-doc simhash, 8-bit band bucketing, pairwise
    XOR popcount, hamming <= 3 filter. Pigeonhole makes banding
    lossless at this threshold, so replay == exhaustive: EVERY pair
    within hamming 3 must surface (recall), and nothing above it
    (the popcount filter). Planted: exact duplicates (hamming 0),
    one-token-swapped near-dups (small nonzero hamming), and empty
    docs (sig 0, mutually hamming-0 pairs)."""
    from hailstorm_spark.operators.dedup import simhash_candidates

    rng = random.Random(seed)
    rows = [(i, _random_text(rng)) for i in range(80)]
    dup = "pack my box with five dozen liquor jugs"
    rows += [(500, dup), (501, dup)]                      # hamming 0
    rows += [(510, dup + " extra"), (511, dup + " bonus")]  # near
    rows += [(520, ""), (521, "   ")]                     # sig 0 pair
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_candidates(df, "doc_id", "text").collect()
    }

    def sig(text):
        hs = [_h60(t) for t in _py_tokens(text)]
        v = 0
        for j in range(SIMHASH_BITS):
            if sum(1 if (h >> j) & 1 else -1 for h in hs) > 0:
                v |= 1 << j
        return v

    sigs = {i: sig(t) for i, t in rows}
    expected = {}
    ids = sorted(sigs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                expected[(a, b)] = h
    assert got == expected
    assert got[(500, 501)] == 0 and got[(520, 521)] == 0
    # at least one strictly-between pair exercised the popcount filter
    assert any(0 < h <= 3 for h in expected.values())
