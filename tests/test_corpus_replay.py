"""Third-engine replays for the corpus-prep family.

Each of these queries has a DuckDB oracle that restates the formula in
SQL; these tests replay the math in pure Python on seeded random
corpora with the boundary shapes the formulas exist to decide:
serpentine dealing with rank ties and remainders, the RANK-based
integer percentile inequality on all-tie and singleton sources, the
over-cap/under-cap bypass split with ties spanning the cap boundary,
and the keyed-hash dropout contract replayed hash-for-hash."""

from __future__ import annotations

import hashlib
import random

import pandas as pd
import pytest

import hailstorm_spark.queries.corpus_pipeline  # noqa: F401
import hailstorm_spark.queries.corpus_extras  # noqa: F401
from hailstorm_spark.queries.corpus_extras import N_SHARDS
from hailstorm_spark.queries.corpus_pipeline import (
    _DROPOUT_THRESHOLD,
    SOURCE_CAP,
)
from hailstorm_spark.registry import QUERIES


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _py_tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip().split() if t]


def _stage_documents(tmp_path, rows) -> str:
    """rows: (doc_id, text, source); n_chars derived."""
    pdf = pd.DataFrame(
        [(d, t, "en", s, len(t)) for d, t, s in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)
    return str(tmp_path)


_WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi",
]


@pytest.mark.parametrize("seed,n_docs", [(19, 43), (7070, 120)])
def test_shard_assignment_matches_python_replay(spark, tmp_path, seed, n_docs):
    """corpus_shard_assignment vs a Python replay of the (n_chars desc,
    doc_id asc) global rank and the serpentine deal. Planted: heavy
    n_chars ties (the tiebreak decides shard membership), a doc count
    with a partial final pass, and the balance property the serpentine
    exists for — per-shard totals within one max-doc of each other."""
    rng = random.Random(seed)
    rows = []
    for d in range(n_docs):
        # lots of duplicate lengths: words repeated k times
        k = rng.choice([1, 2, 2, 3, 3, 3, 8, 20])
        rows.append((d, " ".join(rng.choice(_WORDS) for _ in range(k)), "src0"))
    sf_dir = _stage_documents(tmp_path, rows)

    got = {
        r.shard: (r.n_docs, r.total_chars)
        for r in QUERIES["corpus_shard_assignment"].fn(spark, sf_dir).collect()
    }

    ranked = sorted(rows, key=lambda r: (-len(r[1]), r[0]))
    expected: dict = {}
    for r0, (d, t, _) in enumerate(ranked):
        q, m = divmod(r0, N_SHARDS)
        shard = m if q % 2 == 0 else N_SHARDS - 1 - m
        n, tot = expected.get(shard, (0, 0))
        expected[shard] = (n + 1, tot + len(t))
    assert got == expected
    # serpentine balance: totals within one max-doc of each other
    totals = [tot for _, tot in expected.values()]
    assert max(totals) - min(totals) <= max(len(t) for _, t, _ in rows)


@pytest.mark.parametrize("seed", [29, 8181])
def test_quality_percentile_filter_matches_python_replay(spark, tmp_path, seed):
    """corpus_quality_percentile_filter vs a Python replay of the keep
    rule 4*(rank-1) >= n-1 with RANK ties (rank-1 = count of strictly
    lower scores). Planted sources: a singleton (always kept), an
    ALL-TIE source with n > 1 (no score qualifies — the whole source
    drops, the documented boundary), a tie cluster sitting exactly at
    the quartile cut, and a normal spread."""
    rng = random.Random(seed)
    rows = []
    did = 0

    def doc(source, n_distinct):
        nonlocal did
        words = rng.sample(_WORDS, n_distinct) if n_distinct else []
        rows.append((did, " ".join(words), source))
        did += 1

    doc("solo", 5)  # singleton source: kept
    for _ in range(6):
        doc("alltie", 3)  # identical lex_score=3 sixfold: all dropped
    # boundary source: n = 8, cut at 4*(rank-1) >= 7 → rank >= 2.75 →
    # strictly-below count >= 2 keeps; two docs tie at the bottom
    for nd in (2, 2, 4, 5, 6, 7, 8, 9):
        doc("boundary", nd)
    for _ in range(20):
        doc("spread", rng.randrange(1, len(_WORDS) + 1))
    sf_dir = _stage_documents(tmp_path, rows)

    got = {
        (r.doc_id, r.source, r.lex_score)
        for r in QUERIES["corpus_quality_percentile_filter"].fn(spark, sf_dir).collect()
    }

    score = {d: len(set(_py_tokens(t))) for d, t, _ in rows}
    by_src: dict = {}
    for d, _, s in rows:
        by_src.setdefault(s, []).append(d)
    expected = set()
    for s, dids in by_src.items():
        n = len(dids)
        for d in dids:
            less = sum(1 for o in dids if score[o] < score[d])
            if 4 * less >= n - 1:
                expected.add((d, s, score[d]))
    assert got == expected
    assert (0, "solo", 5) in expected  # singleton kept
    assert not any(s == "alltie" for _, s, _ in expected)  # all-tie dropped
    kept_boundary = sorted(sc for _, s, sc in expected if s == "boundary")
    assert kept_boundary and kept_boundary[0] == 4  # the bottom ties drop


@pytest.mark.parametrize("seed", [37, 6464])
def test_source_cap_matches_python_replay(spark, tmp_path, seed):
    """corpus_source_cap (the over/under-cap bypass split) vs a plain
    Python replay of the per-source (n_chars desc, doc_id asc) top-K.
    Planted: an under-cap source (bypasses the window, kept whole), a
    source at exactly the cap, and an over-cap source whose rank-K
    boundary falls inside an n_chars TIE so doc_id decides the kept
    set."""
    rng = random.Random(seed)
    rows = []
    did = 0

    def doc(source, n_words):
        nonlocal did
        rows.append((did, " ".join(rng.choice(_WORDS) for _ in range(n_words)), source))
        did += 1

    for _ in range(SOURCE_CAP - 3):
        doc("small", rng.randrange(1, 10))
    for _ in range(SOURCE_CAP):
        doc("exact", rng.randrange(1, 10))
    # big source: 2*CAP docs, all the same length → pure doc_id cut
    for _ in range(2 * SOURCE_CAP):
        rows.append((did, "five five five", "bigtie"))
        did += 1
    for _ in range(3 * SOURCE_CAP):
        doc("big", rng.randrange(1, 30))
    sf_dir = _stage_documents(tmp_path, rows)

    got = {
        (r.doc_id, r.source, r.n_chars)
        for r in QUERIES["corpus_source_cap"].fn(spark, sf_dir).collect()
    }

    by_src: dict = {}
    for d, t, s in rows:
        by_src.setdefault(s, []).append((d, len(t)))
    expected = set()
    for s, docs in by_src.items():
        docs.sort(key=lambda x: (-x[1], x[0]))
        for d, n in docs[:SOURCE_CAP]:
            expected.add((d, s, n))
    assert got == expected
    assert sum(1 for _, s, _ in expected if s == "small") == SOURCE_CAP - 3
    assert sum(1 for _, s, _ in expected if s == "bigtie") == SOURCE_CAP
    # the bigtie kept set is exactly the lowest doc_ids
    bigtie_kept = sorted(d for d, s, _ in expected if s == "bigtie")
    bigtie_all = sorted(d for d, _, s in [(d, t, s) for d, t, s in rows] if s == "bigtie")
    assert bigtie_kept == bigtie_all[:SOURCE_CAP]


@pytest.mark.parametrize("seed", [41, 2345])
def test_token_dropout_matches_python_replay(spark, tmp_path, seed):
    """corpus_augment_token_dropout vs a hash-for-hash Python replay of
    the keyed decision h60(doc_id:position) >= threshold over 1-based
    positions. Planted: an empty doc (0 before, 0 after, empty string)
    and a long doc where ~15% of positions statistically drop."""
    rng = random.Random(seed)
    rows = []
    for did in range(60):  # all < 200 so every doc is in scope
        n = rng.choice([0, 1, 4, 9, 30])
        rows.append((did, " ".join(rng.choice(_WORDS) for _ in range(n)), "src0"))
    rows.append((60, " ".join(rng.choice(_WORDS) for _ in range(400)), "src0"))
    sf_dir = _stage_documents(tmp_path, rows)

    got = {
        r.doc_id: (r.n_before, r.n_after, r.text_aug)
        for r in QUERIES["corpus_augment_token_dropout"].fn(spark, sf_dir).collect()
    }

    expected = {}
    n_dropped_long = 0
    for did, t, _ in rows:
        toks = _py_tokens(t)
        kept = [
            w
            for i, w in enumerate(toks, start=1)
            if _h60(f"{did}:{i}") >= _DROPOUT_THRESHOLD
        ]
        expected[did] = (len(toks), len(kept), " ".join(kept))
        if did == 60:
            n_dropped_long = len(toks) - len(kept)
    assert got == expected
    assert expected[60][0] == 400 and 20 <= n_dropped_long <= 110


# ------------------------------------------------- snapshot diff


@pytest.mark.parametrize("seed", [61, 2929])
def test_snapshot_diff_matches_python_replay(spark, tmp_path, seed):
    """corpus_snapshot_diff vs a Python replay of the full-outer digest
    diff over the planted today-snapshot transform (drop %10 == 0, edit
    < DIFF_EDIT_BELOW, add clones at +DIFF_ADD_SHIFT). Planted: ids in
    the edit range that are ALSO dropped (removed wins — there is no
    today row to differ from), ids < DIFF_ADD_BELOW whose originals are
    dropped but whose clone is still added, duplicate texts across
    different ids (digest equality must not suppress id-keyed rows),
    and unchanged ids that must not appear at all."""
    from hailstorm_spark.queries.corpus_pipeline import (
        DIFF_ADD_BELOW,
        DIFF_ADD_SHIFT,
        DIFF_EDIT_BELOW,
    )

    rng = random.Random(seed)
    ids = sorted(
        set(
            list(range(0, 35))            # covers add+edit+drop interplay
            + [40, 49, 50, 60, 70, 95]    # edit boundary + drop at >= 50
            + [rng.randrange(100, 5000) for _ in range(40)]
        )
    )
    dup_text = "shared corpus boilerplate text"
    texts = {
        did: (dup_text if did % 7 == 3 else
              " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(1, 12))))
        for did in ids
    }
    sf_dir = _stage_documents(
        tmp_path, [(d, t, "src0") for d, t in sorted(texts.items())]
    )

    got = sorted(
        (r.doc_id, r.status)
        for r in QUERIES["corpus_snapshot_diff"].fn(spark, sf_dir).collect()
    )

    today = {
        did: (t + " v2" if did < DIFF_EDIT_BELOW else t)
        for did, t in texts.items()
        if did % 10 != 0
    }
    for did, t in texts.items():
        if did < DIFF_ADD_BELOW:
            today[did + DIFF_ADD_SHIFT] = "new " + t
    expected = []
    for did in set(texts) | set(today):
        if did not in texts:
            expected.append((did, "added"))
        elif did not in today:
            expected.append((did, "removed"))
        elif texts[did] != today[did]:
            expected.append((did, "changed"))
    assert got == sorted(expected)
    st = dict(expected)
    # planted decisions
    assert st[0] == "removed" and st[0 + DIFF_ADD_SHIFT] == "added"
    assert st[1] == "changed" and st[49] == "changed"
    assert st[50] == "removed"  # %10 drop above the edit range
    assert 60 not in st or st[60] == "removed"
    assert all(did not in st for did in ids if did >= 51 and did % 10 != 0)
