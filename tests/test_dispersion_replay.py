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
