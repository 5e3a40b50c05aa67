"""Third-engine (pure-Python) replays for the text-scoring family.

The DuckDB oracles for these queries REBUILD the same formula in SQL,
so a systematic error in the shared arithmetic contract (the rational
idf form, the argmax tie chain, the vocabulary boundary rank) could in
principle red neither side. Each test here stages a seeded random
corpus as parquet, runs the registered Spark query, and replays the
math independently in Python — planting the edge shape the formula
exists to handle (rank-boundary ties, all-zero argmax, df == N terms,
sub-top-k documents, empty documents)."""

from __future__ import annotations

import random

import pandas as pd
import pytest

# registry population
import hailstorm_spark.queries.textstats  # noqa: F401
from hailstorm_spark.operators.text import LANG_MARKERS
from hailstorm_spark.registry import QUERIES


def _py_tokens(text: str) -> list[str]:
    # ASCII-only inputs below, where Java \s+ and str.split() agree.
    return [t for t in text.lower().strip().split() if t]


_VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "pack", "my", "box", "with", "five", "dozen", "liquor", "jugs",
    "sphinx", "of", "black", "quartz", "judge", "vow", "zebra", "mix",
]


def _stage_documents(tmp_path, texts: list[str], sources=None) -> None:
    rows = [
        (
            did,
            t,
            "en",
            (sources[did] if sources is not None else "src0"),
            len(t),
        )
        for did, t in enumerate(texts)
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"), index=False)


# ---------------------------------------------------------------- tf-idf


@pytest.mark.parametrize("seed", [13, 4242])
def test_tfidf_top_terms_match_python_replay(spark, tmp_path, seed):
    """text_tfidf_top_terms vs an independent replay of the rational
    BM25-style idf tf*(N-df+0.5)/(df+0.5) and the (tfidf desc, term
    asc) top-5 window. Planted shapes: a term present in EVERY doc
    (df == N, idf collapses to 0.5/(N+0.5)), docs with fewer than five
    distinct terms (window emits what exists), and empty docs (no rows
    at all)."""
    rng = random.Random(seed)
    texts = []
    for _ in range(50):
        n = rng.choice([0, 1, 3, 8, 20])
        words = [rng.choice(_VOCAB[: rng.choice([4, 12, 24])]) for _ in range(n)]
        words.append("ubiquitous")  # df == N among non-empty docs
        texts.append(" ".join(words))
    texts.append("")  # empty doc: contributes to N, emits no terms
    _stage_documents(tmp_path, texts)

    out = QUERIES["text_tfidf_top_terms"].fn(spark, str(tmp_path)).collect()
    got = {
        (r.doc_id, r.term): (r.tf, r.df, r.tfidf, r.top_rank) for r in out
    }
    assert len(got) == len(out)  # (doc, term) unique

    n_docs = len(texts)
    tf: dict[tuple[int, str], int] = {}
    for did, t in enumerate(texts):
        for w in _py_tokens(t):
            tf[(did, w)] = tf.get((did, w), 0) + 1
    df: dict[str, int] = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    scored: dict[int, list[tuple[float, str, int, int]]] = {}
    for (did, w), c in tf.items():
        s = float(c) * ((float(n_docs - df[w]) + 0.5) / (float(df[w]) + 0.5))
        scored.setdefault(did, []).append((s, w, c, df[w]))
    expected = {}
    for did, terms in scored.items():
        terms.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, w, c, d) in enumerate(terms[:5], start=1):
            expected[(did, w)] = (c, d, s, rank)
    assert set(got) == set(expected)
    for k, (c, d, s, rank) in expected.items():
        gc, gd, gs, grank = got[k]
        assert (gc, gd, grank) == (c, d, rank), k
        # every arithmetic step is a single correctly-rounded IEEE op
        assert gs == s, k
    # the df==N term exists and never outranks genuinely rare terms
    assert any(k[1] == "ubiquitous" for k in tf)


# ------------------------------------------------------------ unigram LM


@pytest.mark.parametrize("seed", [5, 777])
def test_unigram_lm_score_matches_python_replay(spark, tmp_path, seed):
    """text_unigram_lm_score vs an exact integer replay of
    freq_sum = Σ tf(doc,term)·cnt(term) and the rational mean
    P(token) score. Planted: a boilerplate doc of one hot token (top
    score), a singleton-token doc (score 1/N), empty docs (no output
    row)."""
    rng = random.Random(seed)
    texts = []
    for _ in range(40):
        n = rng.choice([0, 2, 6, 15])
        texts.append(
            " ".join(rng.choice(_VOCAB[: rng.choice([3, 10, 24])]) for _ in range(n))
        )
    texts.append(" ".join(["boiler"] * 50))  # hot-token boilerplate
    texts.append("xyzzyhapax")  # singleton: score exactly 1/N
    _stage_documents(tmp_path, texts)

    out = QUERIES["text_unigram_lm_score"].fn(spark, str(tmp_path)).collect()
    got = {r.doc_id: (r.n_tokens, r.freq_sum, r.score) for r in out}

    tf: dict[tuple[int, str], int] = {}
    for did, t in enumerate(texts):
        for w in _py_tokens(t):
            tf[(did, w)] = tf.get((did, w), 0) + 1
    cnt: dict[str, int] = {}
    for (_, w), c in tf.items():
        cnt[w] = cnt.get(w, 0) + c
    n_total = sum(cnt.values())
    expected: dict[int, tuple[int, int, float]] = {}
    for (did, w), c in tf.items():
        n, fs = expected.get(did, (0, 0))
        expected[did] = (n + c, fs + c * cnt[w])
    expected = {
        did: (n, fs, float(fs) / (float(n) * float(n_total)))
        for did, (n, fs) in expected.items()
    }
    assert got == expected
    # empty docs emit no row; the hapax scores exactly 1/N
    assert all(did in expected for did in got)
    hapax_id = len(texts) - 1
    assert got[hapax_id][2] == 1.0 / n_total


# -------------------------------------------------------------- langid


@pytest.mark.parametrize("seed", [21, 909])
def test_langid_matches_python_replay_with_tie_chain(spark, tmp_path, seed):
    """text_langid vs a replay of the multiplicity-counting argmax with
    the alphabetical-first tie chain. Planted rows pin every branch:
    an exact en/fr tie ('en' wins alphabetically), multiplicity
    deciding over distinct-marker count ('le le the' → fr), all-zero
    ('und'), and an empty doc ('und')."""
    rng = random.Random(seed)
    markers = {c: list(ws) for c, ws in LANG_MARKERS.items()}
    noise = ["zz", "qq", "brown", "fox", "jumps"]
    texts = []
    for _ in range(40):
        words = []
        for _ in range(rng.choice([0, 3, 8, 15])):
            if rng.random() < 0.6:
                code = rng.choice(sorted(markers))
                words.append(rng.choice(markers[code]))
            else:
                words.append(rng.choice(noise))
        texts.append(" ".join(words))
    texts += [
        "le the",        # 1-1 en/fr tie → en (alphabetical)
        "le le the",     # fr by multiplicity
        "zz qq zz",      # all-zero → und
        "",              # empty → und
        "der die und le la et",  # 3-3 de/fr tie → de
    ]
    _stage_documents(tmp_path, texts)

    out = QUERIES["text_langid"].fn(spark, str(tmp_path)).collect()
    got = {r.doc_id: r.predicted_lang for r in out}

    def replay(text: str) -> str:
        toks = _py_tokens(text)
        best_code, best = "und", 0
        for code in sorted(markers):
            score = sum(1 for t in toks if t in markers[code])
            if score > best:
                best_code, best = code, score
        return best_code

    expected = {did: replay(t) for did, t in enumerate(texts)}
    assert got == expected
    n = len(texts)
    assert [expected[i] for i in range(n - 5, n)] == [
        "en", "fr", "und", "und", "de"
    ]


# ------------------------------------------------------- tokenizer OOV


@pytest.mark.parametrize("seed", [31, 616])
def test_tokenizer_oov_rate_matches_python_replay(spark, tmp_path, seed):
    """text_tokenizer_oov_rate vs a replay of the top-1000 (count desc,
    term asc) vocabulary cut and the integer-scaled per-source OOV
    rate. The corpus plants >1000 distinct terms with a COUNT TIE
    spanning the rank-1000 boundary, so the alphabetical tiebreak
    decides membership; one source is built mostly from tail terms so
    its rate is visibly nonzero."""
    rng = random.Random(seed)
    vocab_k = 1000
    # head terms: distinct counts, safely inside the vocabulary
    head = [f"h{i:04d}" for i in range(800)]
    # boundary terms: all with the SAME count, straddling rank 1000 —
    # 800 head + 400 boundary candidates → 200 make the cut by name
    boundary = [f"m{i:04d}" for i in range(400)]
    # tail: singletons, strictly below the boundary count
    tail = [f"t{i:04d}" for i in range(500)]

    texts, sources = [], []
    doc = []
    for i, w in enumerate(head):
        doc.extend([w] * (3 + (i % 5)))  # counts 3..7, all > boundary
    texts.append(" ".join(doc))
    sources.append("src_head")
    texts.append(" ".join(w for w in boundary for _ in range(2)))  # count 2 each
    sources.append("src_boundary")
    # tail-heavy source: singletons plus a sprinkle of head terms
    tail_doc = list(tail)
    tail_doc += [rng.choice(head) for _ in range(100)]
    rng.shuffle(tail_doc)
    texts.append(" ".join(tail_doc))
    sources.append("src_tail")
    _stage_documents(tmp_path, texts, sources=sources)

    out = QUERIES["text_tokenizer_oov_rate"].fn(spark, str(tmp_path)).collect()
    got = {r.source: (r.n_tokens, r.n_oov, r.oov_rate_x10000) for r in out}

    cnt: dict[str, int] = {}
    per_source: dict[str, list[str]] = {}
    for t, s in zip(texts, sources):
        toks = _py_tokens(t)
        per_source.setdefault(s, []).extend(toks)
        for w in toks:
            cnt[w] = cnt.get(w, 0) + 1
    assert len(cnt) > vocab_k  # the cut is real
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {w for w, _ in ranked[:vocab_k]}
    # the boundary count-tie really spans the cut
    cut_count = ranked[vocab_k - 1][1]
    assert ranked[vocab_k][1] == cut_count

    expected = {}
    for s, toks in per_source.items():
        n = len(toks)
        oov = sum(1 for w in toks if w not in vocab)
        expected[s] = (n, oov, (oov * 10000) // n)
    assert got == expected
    assert got["src_tail"][1] > 0  # the planted OOV source registers


# ------------------------------------------ conjunctive inverted index


@pytest.mark.parametrize("seed", [41, 6161])
def test_inverted_index_conjunctive_matches_python_replay(spark, tmp_path, seed):
    """text_inverted_index_conjunctive vs a Python replay of the full
    chain: term ranking by (count desc, term asc), query terms picked
    at ranks 5 and 10, posting-list intersection, count/min/max of the
    intersected doc set. Planted: count TIES spanning the rank-5 and
    rank-10 boundaries (the lexicographic tiebreak decides which term
    becomes the query), documents containing one term many times but
    not the other (per-doc DISTINCT, conjunction fails), and a seed
    geometry where NO document holds both terms (zero-count row with
    NULL min/max must still come back)."""
    rng = random.Random(seed)
    # 14-term vocabulary with engineered tie plateaus around ranks 5/10
    terms = [f"t{chr(ord('a') + i)}" for i in range(14)]
    # target frequencies: ties at the 4/5/6 and 9/10/11 boundaries
    freq = [40, 36, 33, 30, 30, 30, 24, 20, 17, 17, 17, 9, 6, 3]
    bag: list[str] = []
    for t, f in zip(terms, freq):
        bag += [t] * f
    rng.shuffle(bag)
    # by the freq plan the query terms are fixed: rank 5 = "te" (the
    # 30-tie resolves td<te<tf), rank 10 = "tj" (the 17-tie ti<tj<tk)
    qa, qb = "te", "tj"
    # deal the bag into 60 documents; repeat some terms within a doc.
    # Odd seeds: route qa to docs 0-29 and qb to docs 30-59 so the
    # intersection is empty by construction (counts are unchanged).
    texts = ["" for _ in range(60)]
    for t in bag:
        if seed % 2 == 1 and t == qa:
            d = rng.randrange(0, 30)
        elif seed % 2 == 1 and t == qb:
            d = rng.randrange(30, 60)
        else:
            d = rng.randrange(60)
        # dealing collisions give in-doc repetition (the DISTINCT path)
        texts[d] = (texts[d] + " " + t).strip()
    _stage_documents(tmp_path, texts)

    got = QUERIES["text_inverted_index_conjunctive"].fn(
        spark, str(tmp_path)
    ).collect()[0]

    # replay: term counts over ALL occurrences, rank, intersect
    counts: dict = {}
    posting: dict = {}
    for d, text in enumerate(texts):
        for tok in _py_tokens(text):
            counts[tok] = counts.get(tok, 0) + 1
            posting.setdefault(tok, set()).add(d)
    ranked = sorted(counts, key=lambda t: (-counts[t], t))
    term_a, term_b = ranked[4], ranked[9]
    assert (term_a, term_b) == (qa, qb)  # the freq plan held
    both = posting.get(term_a, set()) & posting.get(term_b, set())
    assert (got.term_a, got.term_b) == (term_a, term_b)
    assert got.n_docs_both == len(both)
    assert got.min_doc == (min(both) if both else None)
    assert got.max_doc == (max(both) if both else None)
    if seed % 2 == 1:
        assert len(both) == 0  # the zero-intersection path really ran
    else:
        assert len(both) > 0
    # the tie plateaus really straddle the rank cuts
    vals = sorted(counts.values(), reverse=True)
    assert vals[3] == vals[4] or vals[4] == vals[5]


# --------------------------------------------------- UDTF token chunking


@pytest.mark.parametrize("seed", [43, 7878])
def test_udtf_chunk_documents_matches_python_replay(spark, tmp_path, seed):
    """udtf_chunk_documents vs a Python replay of fixed-budget token
    windowing + per-chunk md5. Planted sizes bracket every boundary the
    ceil/slice arithmetic owns: 0 tokens (no rows at all), 1, size-1,
    exactly size (one full chunk, no empty trailer), size+1 (trailer of
    one), 2*size, and 2*size+1 — plus random sizes and multi-space /
    mixed-case text the tokenizer must canonicalize identically."""
    import hashlib

    from hailstorm_spark.queries.udtf_api import CHUNK_TOKENS as SZ

    rng = random.Random(seed)
    sizes = [0, 1, SZ - 1, SZ, SZ + 1, 2 * SZ, 2 * SZ + 1] + [
        rng.randrange(0, 3 * SZ) for _ in range(10)
    ]
    texts = []
    for n in sizes:
        toks = [rng.choice(_VOCAB).upper() if rng.random() < 0.3
                else rng.choice(_VOCAB) for _ in range(n)]
        texts.append(("  " if n else "").join(toks) if n else "")
    _stage_documents(tmp_path, texts)

    got = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_md5, r.n_tokens)
        for r in QUERIES["udtf_chunk_documents"].fn(spark, str(tmp_path)).collect()
    )

    expected = []
    for did, text in enumerate(texts):
        toks = _py_tokens(text)
        for i in range(0, len(toks), SZ):
            chunk = toks[i : i + SZ]
            expected.append(
                (did, i // SZ,
                 hashlib.md5(" ".join(chunk).encode()).hexdigest(), len(chunk))
            )
    assert got == sorted(expected)
    # zero-token doc emitted nothing; the exact-size doc got ONE chunk
    assert all(d != 0 for d, *_ in got)
    assert [r for r in got if r[0] == 3] == [
        (3, 0, got[[r[0] for r in got].index(3)][2], SZ)
    ]


# ------------------------------------------- audio activity segments


@pytest.mark.parametrize("seed", [47, 9292])
def test_audio_activity_segments_match_python_replay(spark, tmp_path, seed):
    """multimodal_audio_activity_segments vs a Python replay of the
    whole chain: byte-PCM fake decode, 64/32 overlapping windows,
    integer sum-of-squares RMS, the >= VAD_RMS_MIN gate (char 'X' = 88
    sits EXACTLY on rms 40.0 — active; 'Y' = 39.0 — inactive), and the
    gaps-and-islands run compression. Planted: an all-quiet doc (no
    output row), an all-loud doc (one segment spanning every window),
    alternating loud/quiet 64-char blocks (multiple segments split by
    the mixed-energy transition windows), the exact-threshold doc, and
    a partial final window."""
    import math

    from hailstorm_spark.queries.multimodal import VAD_RMS_MIN

    rng = random.Random(seed)
    loud, quiet = "D", "z"           # rms 60 vs 6 on constant runs
    texts = [
        quiet * 256,                  # all quiet: absent
        loud * 256,                   # all loud: one long segment
        (loud * 64 + quiet * 64) * 3, # alternating blocks
        "X" * 96,                     # rms exactly 40.0 everywhere
        "Y" * 96,                     # rms exactly 39.0: absent
        loud * 50,                    # shorter than one hop: partial windows
    ]
    for _ in range(25):
        n = rng.choice([1, 31, 33, 65, 200])
        texts.append("".join(rng.choice([loud, quiet, "X", "p", "&"])
                             for _ in range(n)))
    _stage_documents(tmp_path, texts)

    got = {
        r.doc_id: (r.n_segments, r.n_active_windows, r.longest_segment)
        for r in QUERIES["multimodal_audio_activity_segments"].fn(
            spark, str(tmp_path)
        ).collect()
    }

    WIN, HOP = 64, 32
    expected = {}
    for did, text in enumerate(texts):
        s = [ord(ch) - 128 for ch in text]
        n = len(s)
        if n == 0:
            continue
        actives = []
        for w in range((n - 1) // HOP + 1):
            seg = s[w * HOP : w * HOP + WIN]
            rms = math.sqrt(float(sum(x * x for x in seg)) / len(seg))
            actives.append(rms >= VAD_RMS_MIN)
        runs = []
        cur = 0
        for a in actives:
            if a:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        if runs:
            expected[did] = (len(runs), sum(runs), max(runs))
    assert got == expected
    assert 0 not in got and 4 not in got          # quiet + just-below absent
    assert got[1][0] == 1                          # all-loud: one segment
    assert got[2][0] >= 2                          # alternating: split runs
    assert 3 in got                                # exact threshold active
