"""Duplicate-cluster formation: pairs → connected components → keep-one.

The augmented corpus plants a mutated near-copy of every doc_id < 50
(id + 100000), so each planted pair must land in one cluster whose
survivor is the original (minimum) id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hailstorm_spark.operators.dedup import connected_components
from hailstorm_spark.queries.dedup import MUTATE_ID_SHIFT, dedup_clusters_keep_one
from tests.conftest import SF_DIR


def test_planted_pairs_collapse_to_one_survivor(spark):
    out = dedup_clusters_keep_one(spark, SF_DIR)
    rows = {r.doc_id: r for r in out.collect()}
    planted = [d for d in rows if d >= MUTATE_ID_SHIFT]
    assert len(planted) > 0, "planted mutated docs must appear in clusters"
    for d in planted:
        orig = d - MUTATE_ID_SHIFT
        # the mutated copy is never the survivor, and it clusters with
        # a smaller-id doc (its original, unless a chain merges further)
        assert not rows[d].keep
        assert rows[d].cluster_id <= orig
    # exactly one keep per cluster, and it is the cluster minimum
    keeps = out.filter("keep").select("cluster_id", "doc_id").collect()
    assert len(keeps) == out.select("cluster_id").distinct().count()
    assert all(r.cluster_id == r.doc_id for r in keeps)


def test_connected_components_on_known_graph(spark):
    # two components: a 4-chain {1,2,3,4} and a triangle {10,11,12}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_id, r.cluster_id) for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (12, 10)}


def test_jaccard_stop_shingle_cap(spark):
    """A shingle shared by more docs than the cap must not generate
    candidate pairs (it is boilerplate, and at scale it is the join
    bomb); docs that only share capped shingles drop out entirely."""
    from hailstorm_spark.operators.dedup import jaccard_pairs

    boiler = "all rights reserved forever"
    rows = [(i, f"{boiler} unique{i} tokens{i} here{i}") for i in range(5)]
    rows += [(10, "real duplicate text body one two"), (11, "real duplicate text body one two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {(r.doc_a, r.doc_b) for r in jaccard_pairs(df, "doc_id", "text", None).collect()}
    capped = {(r.doc_a, r.doc_b) for r in jaccard_pairs(df, "doc_id", "text", 4).collect()}
    # boilerplate shingles link all 5 docs pairwise without the cap
    assert (0, 1) in uncapped
    # with df cap 4, the 5-doc boilerplate shingles are dropped; only
    # the genuine duplicate pair (all its shingles have df=2) remains
    assert capped == {(10, 11)}
    dup = [r for r in jaccard_pairs(df, "doc_id", "text", 4).collect() if r.doc_a == 10]
    assert dup[0].jaccard == 1.0


def test_star_contraction_matches_min_label_on_random_graphs(spark):
    """Star contraction and min-label propagation must produce identical
    labelings — including on long chains, where min-label needs
    O(length) rounds but star contraction stays logarithmic."""
    import random

    from hailstorm_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(17)
    edges = {tuple(sorted(rng.sample(range(80), 2))) for _ in range(60)}
    # a 30-node chain: diameter 30 — the star algorithm's home turf
    edges |= {(1000 + i, 1000 + i + 1) for i in range(30)}
    edf = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")

    ml = {(r.doc_id, r.cluster_id) for r in connected_components(edf, max_iter=50).collect()}
    st = {(r.doc_id, r.cluster_id) for r in connected_components_star(edf).collect()}
    assert st == ml
    # chain collapsed to its minimum
    assert (1030, 1000) in st


# ------------------------------------------- ER family replay (r11)


def test_er_family_equals_python_replay_on_random_customers(spark, tmp_path):
    """Third-engine pin for the ER pipeline: blocked match rule,
    transitive closure, and survivorship recomputed in pure Python on
    a RANDOM synthetic customer table (names built to collide across
    blocks, balances clustered so the cents window fires organically,
    segments drawn from two values so some candidate pairs fail on
    segment alone). The oracle pins the fixture shape; this pins the
    RULE on inputs where organic chains (a~b~c with a~c unmatched)
    actually occur."""
    import itertools
    import random

    import pandas as pd

    from hailstorm_spark.registry import all_queries

    rng = random.Random(11)
    rows = []
    for i in range(120):
        # 18-char names: fixed middle, binary last-4 — every in-block
        # pair is lev <= 2 by construction, so chains hinge on the
        # nation/segment/cents agreements
        name = "Customer#00000" + "".join(rng.choice("01") for _ in range(4))
        rows.append(
            (
                i,
                name,
                rng.randrange(2),
                round(rng.choice([10.0, 10.3, 10.6, 900.0]) + rng.random(), 2),
                rng.choice(["AUTO", "STEEL"]),
            )
        )
    pd.DataFrame(
        rows,
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    ).to_parquet(str(tmp_path / "customer.parquet"), index=False)

    # pure-Python replay of the registered rule (incl. planted variants)
    def lev(a, b):
        if a == b:
            return 0
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    from hailstorm_spark.queries.dedup import _ER_VARIANT_SHIFT

    recs = {}
    for k, name, nat, bal, seg in rows:
        cents = round(bal * 100)
        recs[k] = (name, nat, seg, cents)
        if k % 7 == 3:
            vname = name[:16] + name[17] + name[16]
            recs[k + _ER_VARIANT_SHIFT] = (vname, nat, seg, cents + 37)
    pairs = set()
    for a, b in itertools.combinations(sorted(recs), 2):
        na, nata, sega, ca = recs[a]
        nb, natb, segb, cb = recs[b]
        if (
            nata == natb
            and na[:16] == nb[:16]
            and sega == segb
            and abs(cb - ca) <= 100
            and lev(na, nb) <= 2
        ):
            pairs.add((a, b))

    got_pairs = {
        (r["a_custkey"], r["b_custkey"])
        for r in all_queries()["er_blocked_customer_match"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got_pairs == pairs
    assert pairs, "replay fixture produced no matches — vacuous"

    # transitive closure + survivorship truth
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ents = {}
    for k in {x for p in pairs for x in p}:
        ents.setdefault(find(k), []).append(k)
    want_golden = {}
    for eid, members in ents.items():
        ms = [recs[m] for m in members]
        want_golden[min(members)] = (
            len(members),
            min(m[0] for m in ms),
            min(m[1] for m in ms),
            min(m[2] for m in ms),
            max(m[3] for m in ms),
            len({m[0] for m in ms}),
            len({m[1] for m in ms}) > 1,
        )
    got_golden = {
        r["entity_id"]: (
            r["n_records"], r["name"], r["nation"], r["segment"],
            r["cents"], r["n_name_variants"], r["nation_conflict"],
        )
        for r in all_queries()["er_survivorship_golden_record"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got_golden == want_golden
    # non-vacuous chains: at least one entity with >2 records exists
    assert any(v[0] > 2 for v in want_golden.values()), (
        "no organic chain formed — tighten the name alphabet"
    )
