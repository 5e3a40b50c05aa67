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


# ---- maximal repeated spans (min-length gated) ----------------------

from hailstorm_spark.queries.dedup import _MS_FULL, _MS_L, _MS_MID


def _ms_planted_text(doc_id: int, text: str) -> str:
    if doc_id % 3 not in (1, 2):
        return text
    pad = [f"u{doc_id}x{j}" for j in range(1, doc_id % 5 + 1)]
    banner = _MS_FULL if doc_id % 3 == 1 else _MS_MID
    return " ".join(pad + [banner]) + " " + text


def _expected_maximal(docs: dict[int, str]) -> dict[int, tuple[int, int, int, str]]:
    """Independent pure-Python recompute: dup shingles -> consecutive
    runs -> min-length gate -> keep-first coverage rewrite."""
    toks = {d: _ms_planted_text(d, t).lower().split() for d, t in docs.items()}
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
        if not tk:
            continue
        dup_starts = sorted(s for s, sh in per_doc[d] if sh in keeper)
        runs: list[list[int]] = []
        for s in dup_starts:
            if runs and s == runs[-1][-1] + 1:
                runs[-1].append(s)
            else:
                runs.append([s])
        qual = [r for r in runs if r[-1] - r[0] + _SH_W >= _MS_L]
        cov: set[int] = set()
        for r in qual:
            sh_of = dict(per_doc[d])
            for s in r:
                if keeper[sh_of[s]] != d:
                    cov.update(range(s, s + _SH_W))
        kept = [t for i, t in enumerate(tk) if i not in cov]
        out[d] = (len(tk), len(qual), len(tk) - len(kept), " ".join(kept))
    return out


def test_maximal_spans_nested_plant_separates_semantics(spark, tmp_path):
    """The controlled nested fixture: the full 16-token banner fires
    (>= L) and is stripped outside its carrier, while its separately
    planted MIDDLE 9 tokens are cross-doc duplicated yet KEPT (< L) —
    exactly where coverage-union semantics would have removed them."""
    docs = {
        0: " ".join(f"f0w{i}" for i in range(10)),
        3: " ".join(f"f3w{i}" for i in range(10)),
        1: " ".join(f"f1w{i}" for i in range(6)),  # + full banner (query plant)
        4: " ".join(f"f4w{i}" for i in range(6)),  # + full banner
        2: " ".join(f"f2w{i}" for i in range(6)),  # + mid 9 tokens
        5: " ".join(f"f5w{i}" for i in range(6)),  # + mid 9 tokens
    }
    pd.DataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in docs.items()],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["n_removed"], r["cleaned_text"])
        for r in QUERIES["dedup_maximal_repeated_spans"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == _expected_maximal(docs)
    # full banner: detected in both carriers, stripped only outside
    assert got[1][1] == 1 and got[1][2] == 0          # carrier keeps
    assert got[4][1] == 1 and got[4][2] == 16         # non-carrier loses 16
    assert _MS_FULL.split()[0] not in got[4][3]
    # nested mid copy: duplicated cross-doc but too short to fire
    assert got[2][1] == 0 and got[2][2] == 0
    assert got[5][1] == 0 and got[5][2] == 0
    assert _MS_MID in got[5][3]
    # unplanted docs untouched
    assert got[0][2] == 0 and got[3][2] == 0


@pytest.mark.parametrize("seed", [29, 1009])
def test_maximal_spans_match_python_replay_random(spark, tmp_path, seed):
    """Seeded tiny-vocabulary corpora where natural runs nest and
    overlap heavily: the query must equal the independent Python
    recompute (run-merging, gate, keep-first) on every doc."""
    rng = random.Random(seed)
    docs = {}
    for did in range(30):
        n = rng.choice([0, _SH_W, _MS_L - 1, _MS_L, _MS_L + 4, 24, 40])
        docs[did] = " ".join(rng.choice(_VOCAB) for _ in range(n))
    # exact duplicates long enough to fire
    docs[30] = docs[31] = " ".join(rng.choice(_VOCAB) for _ in range(20))
    pd.DataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in docs.items()],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["n_removed"], r["cleaned_text"])
        for r in QUERIES["dedup_maximal_repeated_spans"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    want = _expected_maximal(docs)
    assert got == want
    # non-vacuous: the planted 20-token duplicate fired somewhere
    assert want[31][1] >= 1
    assert want[31][2] > 0 or want[30][2] > 0


@pytest.mark.parametrize("seed", [57])
def test_maximal_spans_hashed_detection_equals_string_form(spark, tmp_path, seed):
    """The maximal-span docstring promises the 100 TB path: detection
    through hashed_shingle_spans(with_keeper=True) instead of the
    string-keyed exchange. Pin that promise: rebuilding the full
    maximal-span pipeline (run-merge, gate, keep-first, rewrite) on
    the hashed operator's (doc_id, s, keeper) rows must equal the
    registered string-keyed query on a heavy-overlap random corpus."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hailstorm_spark.operators.dedup import hashed_shingle_spans
    from hailstorm_spark.queries.dedup import (
        _MS_L,
        _maximal_span_fixture_tokens,
        _shingle_coverage_rewrite,
    )

    rng = random.Random(seed)
    docs = {}
    for did in range(30):
        n = rng.choice([0, _SH_W, _MS_L, _MS_L + 6, 28])
        docs[did] = " ".join(rng.choice(_VOCAB) for _ in range(n))
    docs[30] = docs[31] = " ".join(rng.choice(_VOCAB) for _ in range(20))
    pd.DataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in docs.items()],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(tmp_path / "documents.parquet"), index=False)

    tk = _maximal_span_fixture_tokens(spark, str(tmp_path))
    ds = hashed_shingle_spans(tk, w=_SH_W, with_keeper=True)
    w = Window.partitionBy("doc_id").orderBy("s")
    runs = ds.withColumn("grp", F.col("s") - F.row_number().over(w))
    spans = (
        runs.groupBy("doc_id", "grp")
        .agg(F.min("s").alias("s1"), F.max("s").alias("s2"))
        .filter(F.col("s2") - F.col("s1") + _SH_W >= _MS_L)
    )
    nsp = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans")
    )
    rem = (
        runs.join(spans.select("doc_id", "grp"), ["doc_id", "grp"])
        .filter(F.col("keeper") != F.col("doc_id"))
        .select("doc_id", "s")
    )
    hashed = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["n_removed"], r["cleaned_text"])
        for r in _shingle_coverage_rewrite(tk, rem)
        .join(nsp, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
            "n_removed",
            "cleaned_text",
        )
        .collect()
    }
    stringk = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["n_removed"], r["cleaned_text"])
        for r in QUERIES["dedup_maximal_repeated_spans"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert hashed == stringk
    assert any(v[2] > 0 for v in hashed.values())  # non-vacuous


def test_streaming_shingle_exchange_carries_no_text(spark):
    """The streaming index's staged stream and state derive entirely
    from shingle_hash_occurrences: pin its schema to exactly
    (doc_id, s, h) fixed-width integers — no token array, no shingle
    string — so nothing text-shaped can ride the stage, the fold
    exchange, or the standing state."""
    from hailstorm_spark.operators.dedup import shingle_hash_occurrences

    tk = spark.createDataFrame(
        [(1, ["a"] * 12)], "doc_id long, tk array<string>"
    )
    occ = shingle_hash_occurrences(tk, w=8)
    assert [(f.name, f.dataType.simpleString()) for f in occ.schema.fields] == [
        ("doc_id", "bigint"),
        ("s", "int"),
        ("h", "bigint"),
    ]


def test_docsafe_vs_atomic_fold_on_document_splitting_batches(spark, tmp_path):
    """Teeth for streaming_shingle_docsafe_dedup's claim (r11 verdict
    nit #2): a document SPLIT across triggers makes the atomic twin's
    per-batch count_distinct-summed ``df`` double-count the document —
    here a shingle occurring twice in ONE doc (offsets of different
    parity) is falsely promoted to df=2 "cross-doc duplicate" by the
    atomic fold, while the (hash, doc) presence state stays exact.
    Both folds are driven directly on the same occurrence-parity
    batching the registered docsafe query stages."""
    from pyspark.sql import functions as F

    from hailstorm_spark.operators.dedup import shingle_hash_occurrences
    from hailstorm_spark.streaming.statefold import (
        bucketed_monoid_fold,
        read_state,
    )

    base = list("abcdefgh")
    # the 8-gram 'a..h' occurs at s=0 (even) and s=9 (odd) in doc 0:
    # one document, two occurrences, straddling the parity batching
    tk0 = base + ["z"] + base
    tk1 = list("qrstuvwx")  # unrelated singleton content
    tkdf = spark.createDataFrame(
        [(0, tk0), (1, tk1)], "doc_id long, tk array<string>"
    )
    occ = shingle_hash_occurrences(tkdf, w=8).localCheckpoint(eager=True)
    rep_h = occ.filter((F.col("doc_id") == 0) & (F.col("s") == 0)).collect()[
        0
    ]["h"]
    waves = [
        occ.filter(F.col("s") % 2 == 0),
        occ.filter(F.col("s") % 2 == 1),
    ]

    atomic_dir = str(tmp_path / "atomic")
    atomic = bucketed_monoid_fold(
        atomic_dir,
        key="h",
        cols={"df": "sum", "keeper": "min"},
        epoch=str(tmp_path / "ck_a"),
    )
    for bid, w in enumerate(waves):
        atomic(
            w.groupBy("h").agg(
                F.count_distinct("doc_id").cast("long").alias("df"),
                F.min("doc_id").alias("keeper"),
            ),
            bid,
        )
    atomic_df = {
        r["h"]: r["df"] for r in read_state(spark, atomic_dir).collect()
    }
    # the documented failure is REAL on this batching: the one-doc
    # repeat double-counts (were this 1, the docsafe variant would be
    # solving a non-problem)
    assert atomic_df[rep_h] == 2

    safe_dir = str(tmp_path / "safe")
    safe = bucketed_monoid_fold(
        safe_dir,
        key="hd",
        cols={"h": "min", "doc_id": "min"},
        epoch=str(tmp_path / "ck_s"),
    )
    for bid, w in enumerate(waves):
        safe(
            w.select(
                F.concat_ws(":", "h", "doc_id").alias("hd"), "h", "doc_id"
            ),
            bid,
        )
    safe_df = {
        r["h"]: r["df"]
        for r in read_state(spark, safe_dir)
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    assert safe_df[rep_h] == 1  # one distinct carrying doc — exact
    # and no shingle anywhere gains a spurious duplicate verdict
    assert all(v == 1 for v in safe_df.values())
