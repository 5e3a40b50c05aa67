"""Third-engine replay for embedding_dispersion_by_label: the DuckDB
oracle REBUILDS the same moment identity in SQL, so a systematic
misapplication of E||x-y||^2 = 2(E||x||^2 - ||Ex||^2) would red
neither side. This replay computes the PAIRWISE sum directly in pure
Python — sum over all ordered pairs (i, j) of ||xi - xj||^2 — on
seeded random corpora with degenerate shapes (singleton groups,
all-identical groups, components at the +/- analysis bound, zero
vectors), and requires the query's disp_scaled to equal it exactly.

Components are INTEGER-valued floats (float32-exact, quantization has
no rounding boundary), so the replay is a check of the identity, the
grouping, and the integer plumbing — not of cross-engine rounding,
which the parity fixture already pins on real-valued vectors.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

import hailstorm_spark.queries.similarity  # noqa: F401 (registry)
from hailstorm_spark.operators.similarity import QUANT_SCALE
from hailstorm_spark.registry import QUERIES

DIM = 6  # small on purpose: degenerate dims caught the r6 LSH bug


def _pairwise_disp_scaled(vecs: list[list[int]]) -> int:
    """Direct double-sum over ordered pairs, in quantized units^2."""
    q = [[x * QUANT_SCALE for x in v] for v in vecs]
    total = 0
    for a in q:
        for b in q:
            total += sum((xa - xb) ** 2 for xa, xb in zip(a, b))
    return total


@pytest.mark.parametrize("seed", [5, 77])
def test_dispersion_equals_brute_force_pairwise(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows = []
    by_label: dict[int, list[list[int]]] = {}
    vid = 0
    for label in range(5):
        n = [1, 1, 2, 7, 12][label]  # singleton groups included
        for _ in range(n):
            if label == 2:
                v = [100, -100, 0, 7, -3, 50]  # identical pair: disp 0
            elif label == 3 and rng.random() < 0.3:
                v = [0] * DIM  # zero vectors mixed in
            else:
                v = [rng.randint(-100, 100) for _ in range(DIM)]
            by_label.setdefault(label, []).append(v)
            rows.append((vid, np.asarray(v, dtype=np.float32), label))
            vid += 1
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).astype(
        {"vec_id": "int64", "label": "int32"}
    ).to_parquet(str(tmp_path / "embeddings.parquet"), index=False)

    got = {
        r["label"]: (r["n_vecs"], r["disp_scaled"], r["disp_mean"])
        for r in QUERIES["embedding_dispersion_by_label"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    for label, vecs in by_label.items():
        n = len(vecs)
        want_scaled = _pairwise_disp_scaled(vecs)
        assert got[label][0] == n
        assert got[label][1] == want_scaled, (
            f"identity diverged from brute force for label {label}"
        )
        assert got[label][2] == pytest.approx(
            want_scaled / (n * n) / (QUANT_SCALE * QUANT_SCALE), abs=0.0
        )
    # degenerate shapes behaved: singletons and the identical pair are 0
    assert got[0][1] == 0 and got[1][1] == 0 and got[2][1] == 0
    assert got[4][1] > 0


def test_wide_dispersion_overlap_equals_narrow_and_exceeds_int64(spark):
    """embedding_dispersion_wide must (a) agree exactly with the narrow
    int64 query on every REAL label (the overlap regime, where both are
    exact), and (b) actually exercise the >2^63 regime on its planted
    stress label — if the stress fixture ever shrinks below the int64
    bound the wide path is no longer tested where it matters."""
    from tests.conftest import SF_DIR

    from hailstorm_spark.queries.similarity import _DISP_WIDE_LABEL

    narrow = {
        r["label"]: (r["n_vecs"], int(r["disp_scaled"]))
        for r in QUERIES["embedding_dispersion_by_label"].fn(spark, SF_DIR).collect()
    }
    wide = {
        r["label"]: (r["n_vecs"], int(r["disp_scaled_str"]))
        for r in QUERIES["embedding_dispersion_wide"].fn(spark, SF_DIR).collect()
    }
    assert set(wide) == set(narrow) | {_DISP_WIDE_LABEL}
    for label, nv in narrow.items():
        assert wide[label] == nv, f"overlap regime diverged on label {label}"
    stress_n, stress_disp = wide[_DISP_WIDE_LABEL]
    assert stress_disp > 2**63, (
        f"stress label no longer exceeds int64: {stress_disp}"
    )
    assert stress_n == 8000


@pytest.mark.parametrize("seed", [13, 99])
def test_centroid_drift_equals_brute_force_fractions(spark, tmp_path, seed):
    """Third-engine check of the common-denominator identity behind
    embedding_centroid_drift_by_source: exact-rational centroids
    (fractions.Fraction) computed directly per source must satisfy
    ||c_s - c_g||^2 == drift_num / (n*N)^2 for every source —
    including a single-vector source and a source exactly AT the
    corpus centroid (drift 0 by construction)."""
    from fractions import Fraction

    import hailstorm_spark.queries.similarity  # noqa: F401

    rng = random.Random(seed)
    rows, docs = [], []
    by_src: dict[str, list[list[int]]] = {}
    vid = 0

    def add(src, v):
        nonlocal vid
        by_src.setdefault(src, []).append(v)
        rows.append((vid, np.asarray(v, dtype=np.float32), 0))
        docs.append((vid, src))
        vid += 1

    for _ in range(3):
        add("srcA", [rng.randint(-100, 100) for _ in range(DIM)])
    add("srcB", [rng.randint(-100, 100) for _ in range(DIM)])  # singleton
    for _ in range(7):
        add("srcC", [rng.randint(-100, 100) for _ in range(DIM)])
    # srcD: two vectors symmetric around a point — not necessarily the
    # corpus centroid, just more shape; plus a mirrored pair
    w = [rng.randint(-50, 50) for _ in range(DIM)]
    add("srcD", [x + 3 for x in w])
    add("srcD", [x - 3 for x in w])

    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).astype(
        {"vec_id": "int64", "label": "int32"}
    ).to_parquet(str(tmp_path / "embeddings.parquet"), index=False)
    pd.DataFrame(docs, columns=["doc_id", "source"]).astype(
        {"doc_id": "int64"}
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)

    got = {
        r["source"]: (r["n_vecs"], r["denom"], int(r["drift_num_str"]))
        for r in QUERIES["embedding_centroid_drift_by_source"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    all_q = [
        [x * QUANT_SCALE for x in v] for vs in by_src.values() for v in vs
    ]
    big_n = len(all_q)
    c_g = [Fraction(sum(col), big_n) for col in zip(*all_q)]
    for src, vecs in by_src.items():
        q = [[x * QUANT_SCALE for x in v] for v in vecs]
        n = len(q)
        c_s = [Fraction(sum(col), n) for col in zip(*q)]
        want = sum((a - b) ** 2 for a, b in zip(c_s, c_g))
        n_vecs, denom, num = got[src]
        assert n_vecs == n and denom == n * big_n
        assert Fraction(num, denom**2) == want, f"identity broke for {src}"
