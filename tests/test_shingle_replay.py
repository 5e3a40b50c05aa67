"""Third-engine (pure-Python) replay for dedup_unaligned_shingle_spans.

The DuckDB oracle rebuilds the same shingle pipeline in SQL, so a
systematic defect in the shared design (slice off-by-one at the
len==W boundary, keeper ties, overlapping-coverage double counting,
the descending-sequence trap on short docs) could in principle red
neither side. This replay recomputes the full pipeline independently
on seeded random corpora drawn from a TINY vocabulary — so cross-doc
repeats occur naturally and overlap heavily, not just at the planted
banner — plus the planted-header transform itself.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

import hailstorm_spark.queries.dedup  # noqa: F401  (registry population)
from hailstorm_spark.queries.dedup import _SH_HEADER, _SH_W
from hailstorm_spark.registry import QUERIES

_VOCAB = ["a", "b", "c", "d", "e", "f", "g", "h"]  # tiny: repeats abound


def _planted_text(doc_id: int, text: str) -> str:
    """Replicate the query's fixture plant in pure Python."""
    if doc_id % 3 != 1:
        return text
    pad = [f"u{doc_id}x{j}" for j in range(1, doc_id % 5 + 1)]
    return " ".join(pad + [_SH_HEADER]) + " " + text


def _expected(docs: dict[int, str]) -> dict[int, tuple[int, int, str]]:
    toks = {d: _planted_text(d, t).lower().split() for d, t in docs.items()}
    per_doc: dict[int, list[tuple[int, str]]] = {}
    owners: dict[str, set[int]] = {}
    for d, tk in toks.items():
        per_doc[d] = [
            (s, " ".join(tk[s : s + _SH_W])) for s in range(len(tk) - _SH_W + 1)
        ]
        for _s, sh in per_doc[d]:
            owners.setdefault(sh, set()).add(d)
    keeper = {sh: min(ds) for sh, ds in owners.items() if len(ds) >= 2}
    out = {}
    for d, tk in toks.items():
        if not tk:  # both engines emit no row for token-less docs
            continue
        cov: set[int] = set()
        for s, sh in per_doc[d]:
            if sh in keeper and keeper[sh] != d:
                cov.update(range(s, s + _SH_W))
        kept = [t for i, t in enumerate(tk) if i not in cov]
        out[d] = (len(tk), len(tk) - len(kept), " ".join(kept))
    return out


@pytest.mark.parametrize("seed", [7, 91, 2026])
def test_unaligned_shingle_spans_match_python_replay(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs = {}
    for did in range(40):
        n = rng.choice([0, 1, _SH_W - 1, _SH_W, _SH_W + 1, 12, 20, 30])
        docs[did] = " ".join(rng.choice(_VOCAB) for _ in range(n))
    # two exact-duplicate docs: every shingle repeats, keep-first must
    # empty the higher doc_id entirely (when long enough to shingle)
    docs[40] = docs[41] = " ".join(rng.choice(_VOCAB) for _ in range(16))
    pd.DataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in docs.items()],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in QUERIES["dedup_unaligned_shingle_spans"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    want = _expected(docs)
    assert got == want
    # non-vacuous: the duplicate pair fired — doc 41 lost every token,
    # while doc 40 (also a PLANTED doc: 40 % 3 == 1) keeps the tail of
    # the shared text as its keeper but loses the banner to doc 1's
    # earlier copy (header/text boundary shingles may also collide with
    # other planted docs, so only the tail is guaranteed to survive)
    assert want[41][1] == want[41][0] and want[41][2] == ""
    assert 0 < want[40][1] < want[40][0]
    assert "banner" not in want[40][2]
    assert want[40][2] and docs[40].endswith(want[40][2].split(" ", 1)[-1])


@pytest.mark.parametrize("seed", [13, 404])
def test_hashed_shingle_spans_equal_string_twin_and_replay(spark, tmp_path, seed):
    """The scale-grade hashed detector (xxhash64 keys + Bloom prefilter)
    must equal BOTH the string-keyed twin and the pure-Python replay on
    a tiny-vocabulary random corpus where repeats overlap heavily —
    a Bloom false-negative (impossible by construction), a hash-key
    mix-up, or a prefilter that drops a true duplicate occurrence
    would each desynchronize the three."""
    rng = random.Random(seed)
    docs = {}
    for did in range(40):
        n = rng.choice([0, 1, _SH_W - 1, _SH_W, _SH_W + 1, 12, 20, 30])
        docs[did] = " ".join(rng.choice(_VOCAB) for _ in range(n))
    docs[40] = docs[41] = " ".join(rng.choice(_VOCAB) for _ in range(16))
    pd.DataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in docs.items()],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)

    def run(name):
        return {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
            for r in QUERIES[name].fn(spark, str(tmp_path)).collect()
        }

    hashed = run("dedup_hashed_shingle_spans")
    stringk = run("dedup_unaligned_shingle_spans")
    want = _expected(docs)
    assert hashed == stringk
    assert hashed == want
    # non-vacuous: the exact-duplicate pair fired through the hashed path
    assert hashed[41][1] == hashed[41][0] and hashed[41][2] == ""
