"""Randomized-input parity tests: each operator vs an independent
reference implementation (pandas merge_asof, pure-python union-find) on
seeded random data — the property-test layer of SURVEY §5 step 4,
covering input shapes the fixture tables never produce (ties, empty
groups, singletons, dense duplicate bursts)."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hailstorm_spark.operators.asof import asof_join
from hailstorm_spark.operators.dedup import connected_components


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    rng = random.Random(seed)
    left = [
        (rng.randrange(8), rng.randrange(0, 1000), i) for i in range(300)
    ]
    # unique (key, ts) on the right — merge_asof and our operator then
    # agree without tiebreak semantics entering the comparison
    right_keys = {(rng.randrange(8), rng.randrange(0, 1000)) for _ in range(200)}
    right = [(k, ts, 1000 + i) for i, (k, ts) in enumerate(sorted(right_keys))]

    ldf = spark.createDataFrame(left, "k long, ts long, lid long")
    rdf = spark.createDataFrame(right, "k long, rts long, rid long")
    got = {
        (r.lid, r.rid)
        for r in asof_join(ldf, rdf, "k", "ts", "rts", ("rid",)).collect()
    }

    lp = pd.DataFrame(left, columns=["k", "ts", "lid"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame(right, columns=["k", "rts", "rid"]).sort_values("rts", kind="stable")
    m = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k", direction="backward"
    )
    expected = {
        (int(r.lid), None if pd.isna(r.rid) else int(r.rid)) for r in m.itertuples()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [3, 99])
def test_connected_components_matches_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(60))
    edges = {
        tuple(sorted(rng.sample(nodes, 2)))
        for _ in range(45)
    }
    edf = spark.createDataFrame(
        [(a, b) for a, b in sorted(edges)], "doc_a long, doc_b long"
    )
    got = {(r.doc_id, r.cluster_id) for r in connected_components(edf).collect()}

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {n for e in edges for n in e}
    expected = {(n, min(m for m in touched if find(m) == find(n))) for n in touched}
    assert got == expected
