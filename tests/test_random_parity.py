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
@pytest.mark.parametrize("impl", ["propagation", "star"])
def test_connected_components_matches_union_find(spark, seed, impl):
    """Both CC implementations — min-label propagation AND the
    large-star/small-star contraction — against the same union-find
    reference on the same random graphs."""
    from hailstorm_spark.operators.dedup import connected_components_star

    cc = connected_components if impl == "propagation" else connected_components_star
    rng = random.Random(seed)
    nodes = list(range(60))
    edges = {
        tuple(sorted(rng.sample(nodes, 2)))
        for _ in range(45)
    }
    edf = spark.createDataFrame(
        [(a, b) for a, b in sorted(edges)], "doc_a long, doc_b long"
    )
    got = {(r.doc_id, r.cluster_id) for r in cc(edf).collect()}

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


@pytest.mark.parametrize("seed", [11, 77])
def test_set_similarity_join_matches_bruteforce_random(spark, seed):
    """Prefix-filter Jaccard join vs O(n²) brute force on random sets —
    exercises set-size spreads, duplicate sets, and τ-boundary pairs
    the fixtures can't systematically produce."""
    from hailstorm_spark.operators.similarity import set_similarity_join

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(40)]
    rows = [
        (i, sorted(rng.sample(vocab, rng.randrange(1, 12))))
        for i in range(60)
    ] + [(100, ["t0", "t1", "t2"]), (101, ["t0", "t1", "t2"])]  # exact dup
    df = spark.createDataFrame(rows, "doc_id long, s array<string>")
    got = {
        (r.doc_a, r.doc_b, r.jaccard_pct)
        for r in set_similarity_join(df, tau_num=6, tau_den=10).collect()
    }
    want = set()
    for i, (ida, sa) in enumerate(rows):
        for idb, sb in rows[i + 1 :]:
            a, b = set(sa), set(sb)
            inter, union = len(a & b), len(a | b)
            if union and 10 * inter >= 6 * union:
                lo, hi = min(ida, idb), max(ida, idb)
                want.add((lo, hi, (100 * inter) // union))
    assert got == want


@pytest.mark.parametrize("seed", [5, 123])
def test_exact_kth_matches_sorted_random(spark, seed):
    from hailstorm_spark.operators.selection import exact_kth_smallest

    rng = random.Random(seed)
    vals = [rng.randrange(-10**9, 10**9) for _ in range(500)]
    # inject heavy duplicates + extremes
    vals += [vals[0]] * 50 + [-(10**12), 10**12]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    ref = sorted(vals)
    for k in sorted(rng.sample(range(1, len(vals) + 1), 5)):
        assert exact_kth_smallest(df, "v", k, buckets=16) == ref[k - 1]


@pytest.mark.parametrize("seed", [21, 84])
def test_pagerank_matches_python_replay_random_graph(spark, seed):
    from hailstorm_spark.operators.graph import pagerank_integer
    from tests.test_graph import _python_pagerank

    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(25)]
    und = {
        tuple(sorted(rng.sample(nodes, 2))): rng.randrange(1, 5)
        for _ in range(60)
    }
    edges = []
    for (a, b), w in und.items():
        edges += [(a, b, w), (b, a, w)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r.node: r.pr for r in pagerank_integer(df, iters=4, scale=10**9).collect()}
    assert got == _python_pagerank(edges, 4, 10**9)


@pytest.mark.parametrize("seed", [2, 31])
def test_bloom_never_false_negative_random(spark, seed):
    from hailstorm_spark.operators.bloom import bloom_build, bloom_might_contain

    rng = random.Random(seed)
    keys = [f"k{rng.randrange(10**9)}" for _ in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    packed = bloom_build(df, F.col("key"), 512, 3)
    misses = df.filter(~bloom_might_contain(F.col("key"), packed, 512, 3)).count()
    assert misses == 0


@pytest.mark.parametrize("seed", [19, 88])
def test_set_containment_join_matches_bruteforce_random(spark, seed):
    """Containment prefix-filter join vs O(n²) ordered brute force —
    covers subset pairs, τ-boundary (exactly 90%), duplicate sets
    (mutual containment → both ordered pairs), and singleton sets."""
    from hailstorm_spark.operators.similarity import set_containment_join

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(30)]
    rows = [
        (i, sorted(rng.sample(vocab, rng.randrange(1, 12))))
        for i in range(50)
    ]
    # strict subset pair (containment 100 one way, partial the other)
    rows += [(200, ["t0", "t1", "t2", "t3", "t4"]), (201, ["t0", "t1"])]
    # exact duplicates → both ordered pairs qualify
    rows += [(300, ["t5", "t6", "t7"]), (301, ["t5", "t6", "t7"])]
    df = spark.createDataFrame(rows, "doc_id long, s array<string>")
    got = {
        (r.doc_small, r.doc_big, r.containment_pct)
        for r in set_containment_join(df, tau_num=9, tau_den=10).collect()
    }
    want = set()
    for ida, sa in rows:
        for idb, sb in rows:
            if ida == idb:
                continue
            a, b = set(sa), set(sb)
            inter = len(a & b)
            if len(a) and 10 * inter >= 9 * len(a):
                want.add((ida, idb, (100 * inter) // len(a)))
    assert got == want


@pytest.mark.parametrize("seed", [7, 42])
def test_bfs_multi_source_matches_python_random(spark, seed):
    """Distributed min-plus BFS vs a plain Python BFS on random
    directed graphs — covers unreachable nodes, multiple shortest
    paths, and seeds that reach each other."""
    from collections import deque

    from hailstorm_spark.operators.graph import bfs_multi_source

    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(30)]
    edges = set()
    while len(edges) < 70:
        a, b = rng.sample(nodes, 2)
        edges.add((a, b))
    edges = sorted(edges)
    seeds = rng.sample(nodes, 3)
    HOPS = 4

    edf = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame(
        [(s, s) for s in seeds], "seed string, node string"
    )
    got = {
        (r.seed, r.node, r.dist)
        for r in bfs_multi_source(edf, sdf, HOPS).collect()
    }

    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    want = set()
    for s in seeds:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] == HOPS:
                continue
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        want |= {(s, n, d) for n, d in dist.items()}
    assert got == want


@pytest.mark.parametrize("seed", [3, 99])
def test_label_propagation_matches_python_replay_random(spark, seed):
    """Synchronous weighted LPA vs a pure-Python replay of the same
    rounds — pins the max-weight/min-label tie rule on random weighted
    graphs (symmetrized, like the word-graph caller)."""
    from hailstorm_spark.operators.graph import label_propagation

    rng = random.Random(seed)
    nodes = [f"w{i}" for i in range(25)]
    raw = {}
    while len(raw) < 60:
        a, b = rng.sample(nodes, 2)
        raw[(a, b)] = rng.randrange(1, 6)
    sym = {}
    for (a, b), w in raw.items():
        sym[(a, b)] = sym.get((a, b), 0) + w
        sym[(b, a)] = sym.get((b, a), 0) + w
    edges = sorted((a, b, w) for (a, b), w in sym.items())
    ITERS = 3

    edf = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {(r.node, r.label) for r in label_propagation(edf, ITERS).collect()}

    labels = {n: n for n in {x for e in edges for x in e[:2]}}
    for _ in range(ITERS):
        incoming = {}
        for a, b, w in edges:
            # operator semantics: node `src` hears neighbor `dst`'s label
            incoming.setdefault(a, {}).setdefault(labels[b], 0)
            incoming[a][labels[b]] += w
        labels = {
            n: min(
                (lbl for lbl, s in inc.items()
                 if s == max(inc.values())),
            )
            for n, inc in incoming.items()
        }
    assert got == set(labels.items())


@pytest.mark.parametrize("seed", [13, 55])
def test_kcore_peel_matches_python_random(spark, seed):
    """Distributed k-core peeling vs a Python replay of the same
    synchronous rounds on random symmetrized graphs — covers full
    erosion (everything peels) and stable cores."""
    from hailstorm_spark.operators.graph import kcore_peel

    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(20)]
    und = set()
    while len(und) < 40:
        a, b = rng.sample(nodes, 2)
        und.add((min(a, b), max(a, b)))
    edges = sorted({(a, b) for a, b in und} | {(b, a) for a, b in und})
    K, ITERS = 3, 4

    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.src, r.dst) for r in kcore_peel(edf, K, ITERS).collect()}

    cur = set(edges)
    for _ in range(ITERS):
        deg = {}
        for a, _b in cur:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, d in deg.items() if d >= K}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    assert got == cur


@pytest.mark.parametrize("seed", [5, 21])
def test_kcore_peel_k_above_max_degree_and_disconnected(spark, seed):
    """k-core edge cases: (a) k larger than the max degree — every node
    peels in round 1 and the result is EMPTY without erroring; (b) a
    disconnected graph — a clique that survives peeling next to a chain
    component that fully erodes, so survivorship is decided per
    component, not globally."""
    from hailstorm_spark.operators.graph import kcore_peel

    rng = random.Random(seed)

    # (a) sparse random graph, then ask for k > max degree.
    nodes = [f"s{i}" for i in range(12)]
    und = set()
    while len(und) < 10:
        a, b = rng.sample(nodes, 2)
        und.add((min(a, b), max(a, b)))
    edges = sorted(und | {(b, a) for a, b in und})
    max_deg = max(
        sum(1 for s, _ in edges if s == n) for n in {s for s, _ in edges}
    )
    edf = spark.createDataFrame(edges, "src string, dst string")
    assert kcore_peel(edf, max_deg + 1, 3).count() == 0

    # (b) K4 clique (3-core) + a 4-node path (erodes under k=2... use
    # k=3 so the path definitely erodes and the clique definitely
    # survives), components disconnected from each other.
    clique = [f"c{i}" for i in range(4)]
    clique_edges = {
        (a, b) for a in clique for b in clique if a != b
    }
    path = [("p0", "p1"), ("p1", "p2"), ("p2", "p3")]
    path_edges = {e for e in path} | {(b, a) for a, b in path}
    all_edges = sorted(clique_edges | path_edges)
    edf2 = spark.createDataFrame(all_edges, "src string, dst string")
    got = {(r.src, r.dst) for r in kcore_peel(edf2, 3, 4).collect()}
    assert got == clique_edges  # path component fully eroded


@pytest.mark.parametrize("seed,descending", [(13, False), (13, True), (87, False)])
def test_global_row_number_heavy_ties_at_bucket_boundaries(spark, seed, descending):
    """Distributed ranker vs python sorted() on a distribution engineered
    so that a handful of heavy-tie key values dominate — approxQuantile
    boundaries then LAND on the tie values, exercising the strict-left
    bucket rule (equal keys must share a bucket) and duplicate-boundary
    collapse. Also covers descending order and a bucket count far above
    the distinct-key count."""
    from hailstorm_spark.operators.ranking import global_row_number

    rng = random.Random(seed)
    # 400 rows over only 5 distinct key values, zipf-ish weights: the
    # 0.25/0.5/0.75... quantiles all hit the heavy values.
    heavy = [10, 10, 10, 20, 30]
    rows = [
        (rng.choice(heavy) if rng.random() < 0.9 else rng.randrange(100), i)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k long, uid long")
    got = {
        (r.uid, r.rn)
        for r in global_row_number(
            df, "k", "uid", descending=descending, num_buckets=64
        ).collect()
    }
    expected = {
        (uid, i + 1)
        for i, (_k, uid) in enumerate(
            sorted(rows, key=lambda t: (-t[0] if descending else t[0], t[1]))
        )
    }
    assert got == expected


@pytest.mark.parametrize("seed,width", [(9, 1), (9, 7), (51, 100)])
def test_point_in_interval_join_matches_bruteforce(spark, seed, width):
    """Bucketed point-in-interval join vs O(n·m) brute force on random
    integer data straddling zero (pre-epoch values exercise the
    floor-vs-truncate bucketing distinction) across bucket widths from
    degenerate (1) to interval-spanning (100)."""
    from hailstorm_spark.operators.rangejoin import point_in_interval_join

    rng = random.Random(seed)
    points = [(rng.randrange(-200, 200), i) for i in range(150)]
    intervals = []
    for j in range(60):
        s = rng.randrange(-220, 200)
        intervals.append((s, s + rng.randrange(0, 40), 1000 + j))

    pdf = spark.createDataFrame(points, "t long, pid long")
    idf = spark.createDataFrame(intervals, "s long, e long, iid long")
    got = sorted(
        (r.pid, r.iid)
        for r in point_in_interval_join(pdf, "t", idf, "s", "e", width).collect()
    )
    expected = sorted(
        (pid, iid)
        for t, pid in points
        for s, e, iid in intervals
        if s <= t <= e
    )
    assert got == expected  # exactly-once: sorted WITH duplicates


@pytest.mark.parametrize("seed,width", [(31, 5), (31, 64), (77, 13)])
def test_interval_overlap_join_matches_bruteforce(spark, seed, width):
    """Bucketed interval-overlap join vs brute force — multiset equality
    proves the first-shared-bucket trick emits each overlapping pair
    EXACTLY once (the failure mode is once per shared bucket). Includes
    touching endpoints (l_end == r_start counts, inclusive semantics)
    and zero-length intervals."""
    from hailstorm_spark.operators.rangejoin import interval_overlap_join

    rng = random.Random(seed)
    left = []
    for i in range(70):
        s = rng.randrange(-150, 150)
        left.append((s, s + rng.randrange(0, 60), i))
    right = []
    for j in range(70):
        s = rng.randrange(-150, 150)
        # a third of the right side is zero-length (points-as-intervals)
        ln = 0 if j % 3 == 0 else rng.randrange(0, 60)
        right.append((s, s + ln, 1000 + j))
    # plant exact endpoint touches
    left.append((500, 510, 98))
    right.append((510, 520, 1998))  # touches at 510 — must match
    right.append((511, 520, 1999))  # gap of 1 — must NOT match

    ldf = spark.createDataFrame(left, "ls long, le long, lid long")
    rdf = spark.createDataFrame(right, "rs long, re long, rid long")
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            ldf, "ls", "le", rdf, "rs", "re", width
        ).collect()
    )
    expected = sorted(
        (lid, rid)
        for ls, le, lid in left
        for rs, re_, rid in right
        if ls <= re_ and rs <= le
    )
    assert got == expected
    assert (98, 1998) in got and (98, 1999) not in got


@pytest.mark.parametrize("seed,how", [(17, "inner"), (17, "left"), (63, "inner")])
def test_salted_join_result_identical_to_plain_join(spark, seed, how):
    """salted_join must be a pure data-placement change: multiset-equal
    to the plain equi-join for inner AND left semantics, on skewed data
    (one hot key carrying half the probe side, plus probe keys with no
    build match and build keys with no probe match)."""
    from hailstorm_spark.operators.skew import salted_join

    rng = random.Random(seed)
    probe = [(0 if rng.random() < 0.5 else rng.randrange(1, 20), i) for i in range(300)]
    probe += [(999, 9001)]  # key with no build match
    build = [(k, f"v{k}_{j}") for k in range(15) for j in range(rng.randrange(0, 3))]
    build += [(777, "orphan")]  # key with no probe match

    pdf = spark.createDataFrame(probe, "k long, pid long")
    bdf = spark.createDataFrame(build, "k long, val string")
    got = sorted(
        (r.k, r.pid, r.val)
        for r in salted_join(pdf, bdf, "k", salt=4, how=how).collect()
    )
    expected = sorted(
        (r.k, r.pid, r.val) for r in pdf.join(bdf, "k", how).collect()
    )
    assert got == expected


def test_exact_kth_duplicates_spanning_boundary_and_extremes(spark):
    """exact_kth_smallest where the k-th order statistic sits INSIDE a
    run of duplicates (the residual-rank walk must count duplicates,
    not distinct values), plus k=1, k=n, and a negative-heavy column."""
    from hailstorm_spark.operators.selection import exact_kth_smallest

    vals = [-5] * 10 + [0] * 20 + [3] * 5 + [7, 8, 9]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    ref = sorted(vals)
    n = len(vals)
    # k values chosen to land at the first/last element of each dup run
    for k in (1, 10, 11, 30, 31, 35, 36, n):
        assert exact_kth_smallest(df, "v", k, buckets=8) == ref[k - 1], k


@pytest.mark.parametrize("seed", [53, 777])
def test_kmeans_integer_matches_python_replay(spark, seed):
    """operators/clustering.py::kmeans_integer vs an exact pure-Python
    Lloyd replay on random integer vectors: same id<k seeding, argmin
    with lowest-centroid tiebreak, per-cluster component sums, and
    Python FLOOR division (negative components included, where floor
    and truncate diverge — the pitfall the module docstring pins).
    Seeds 2 and 3 share a vector, so cluster 3 starts empty (ties go to
    the lower id) and must disappear identically on both sides."""
    from hailstorm_spark.operators.clustering import kmeans_integer

    rng = random.Random(seed)
    dim, k, iters = 4, 4, 3
    rows = [(i, [rng.randrange(-1000, 1001) for _ in range(dim)]) for i in range(60)]
    rows[3] = (3, list(rows[2][1]))  # duplicate seed => empty cluster 3
    df = spark.createDataFrame(rows, "id long, qv array<long>")
    got_df, got_cents = kmeans_integer(df, "id", "qv", k, iters)
    got = {(r.id, r.k, r.dist) for r in got_df.collect()}

    vecs = dict(rows)
    cents = {i: list(vecs[i]) for i in range(k)}

    def assign(v, cs):
        return min(
            (sum((x - c) * (x - c) for x, c in zip(v, cv)), cid)
            for cid, cv in sorted(cs.items())
        )

    for _ in range(iters):
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for i, v in vecs.items():
            _, cid = assign(v, cents)
            s = sums.setdefault(cid, [0] * dim)
            for p, x in enumerate(v):
                s[p] += x
            counts[cid] = counts.get(cid, 0) + 1
        cents = {
            cid: [s // counts[cid] for s in comp] for cid, comp in sums.items()
        }
    assert got_cents == cents
    expected = set()
    for i, v in vecs.items():
        d, cid = assign(v, cents)
        expected.add((i, cid, d))
    assert got == expected
    assert 3 not in got_cents  # the duplicate seed's cluster died


@pytest.mark.parametrize("seed", [61, 888])
def test_leakage_free_split_never_separates_duplicates(spark, seed):
    """The leakage-free split pipeline composition (minhash candidates
    + exact-dup star edges -> connected components -> cluster-hash
    split) on random corpora with planted exact-duplicate groups and
    one-token-appended near-dups: every md5-identical text group gets
    exactly ONE cluster and ONE split (the eval-contamination guard),
    near-dup pairs that band together land in the same split, and both
    splits are nonempty at this corpus size."""
    import hashlib

    from pyspark.sql import functions as F

    from hailstorm_spark.operators.dedup import (
        connected_components,
        exact_dup_star_edges,
        minhash_lsh_candidates,
    )

    rng = random.Random(seed)
    vocab = ["the", "data", "engine", "spark", "query", "table", "join",
             "scan", "group", "sort", "hash", "merge", "row", "batch"]
    docs, nid = [], 0
    for _ in range(60):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randrange(4, 12)))
        copies = rng.choice([1, 1, 1, 2, 3])  # plant exact-dup groups
        for _ in range(copies):
            docs.append((nid, text)); nid += 1
        if rng.random() < 0.3:  # plant a near-dup
            docs.append((nid, text + " zz")); nid += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")

    edges = (
        minhash_lsh_candidates(df, "doc_id", "text")
        .union(exact_dup_star_edges(df, "doc_id", "text"))
        .distinct()
    )
    labels = connected_components(edges)
    assigned = (
        df.select("doc_id")
        .join(labels.withColumnRenamed("cluster_id", "cc"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cc"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn(
            "split",
            F.when(
                F.conv(F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 15), 16, 10)
                .cast("long") % 10 == 0,
                "val",
            ).otherwise("train"),
        )
    )
    rows = {r.doc_id: (r.cluster_id, r.split) for r in assigned.collect()}
    assert len(rows) == len(docs)

    by_text: dict[str, list[int]] = {}
    for i, t in docs:
        by_text.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append(i)
    for h, ids in by_text.items():
        clusters = {rows[i][0] for i in ids}
        splits = {rows[i][1] for i in ids}
        assert len(clusters) == 1, ("exact dups split across clusters", ids)
        assert len(splits) == 1, ("LEAKAGE: exact dups in both splits", ids)
    # split comes from the cluster id on every member
    for i, (c, s) in rows.items():
        expect = "val" if int(hashlib.md5(str(c).encode()).hexdigest()[:15], 16) % 10 == 0 else "train"
        assert s == expect
    assert {s for _, s in rows.values()} == {"train", "val"}


@pytest.mark.parametrize("seed", [17, 971])
def test_jaccard_pairs_df_cap_matches_python_replay(spark, seed):
    """operators/dedup.py::jaccard_pairs vs a Python replay of the full
    inverted-index math INCLUDING the stop-shingle df cap: postings
    with df > max_shingle_df are dropped BEFORE set sizes are counted,
    so jaccard is computed over the FILTERED sets. Planted: a
    boilerplate shingle shared by more docs than the cap (df == cap
    stays, df == cap+1 goes), a pair whose ONLY common shingles are
    capped away (pair must vanish entirely), and the uncapped
    max_shingle_df=None path on the same corpus."""
    from hailstorm_spark.operators.dedup import SHINGLE_N, jaccard_pairs

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj"]
    cap = 3

    def shingles(text):
        toks = [t for t in text.lower().strip().split() if t]
        out, seen = [], set()
        for i in range(len(toks) - SHINGLE_N + 1):
            s = " ".join(toks[i : i + SHINGLE_N])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out

    docs = {}
    # boilerplate prefix in exactly cap+1 docs: its shingle is dropped
    for did in range(4):
        tail = " ".join(rng.choice(vocab) for _ in range(4))
        docs[did] = "copy right line " + tail
    # a pair whose ONLY overlap is the boilerplate shingle
    docs[10] = "copy right line " + "qq rr ss"
    docs[11] = "copy right line " + "tt uu vv"
    # a shingle in exactly cap docs: kept
    for did in (20, 21, 22):
        docs[did] = "rare shared gram " + " ".join(rng.choice(vocab) for _ in range(3))
    # random tail docs
    for did in range(30, 55):
        docs[did] = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 9)))
    df = spark.createDataFrame(
        sorted(docs.items()), "doc_id long, text string"
    )

    for max_df in (cap, None):
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in jaccard_pairs(df, "doc_id", "text", max_shingle_df=max_df).collect()
        }
        # replay
        posting: dict = {}
        for did, text in docs.items():
            for s in shingles(text):
                posting.setdefault(s, set()).add(did)
        if max_df is not None:
            posting = {s: ds for s, ds in posting.items() if len(ds) <= max_df}
        sizes: dict = {}
        inter: dict = {}
        for s, ds in posting.items():
            for d in ds:
                sizes[d] = sizes.get(d, 0) + 1
            ds = sorted(ds)
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    inter[(ds[i], ds[j])] = inter.get((ds[i], ds[j]), 0) + 1
        expected = {
            p: n / (sizes[p[0]] + sizes[p[1]] - n) for p, n in inter.items()
        }
        assert got == expected, f"max_shingle_df={max_df}"
        if max_df is not None:
            # docs 10/11 overlap ONLY via the capped boilerplate: gone
            assert (10, 11) not in got
            # the df==cap 'rare shared gram' trio is intact
            assert (20, 21) in got and (20, 22) in got and (21, 22) in got
        else:
            assert (10, 11) in got


@pytest.mark.parametrize("seed", [23, 787])
def test_semantic_dedup_matches_python_bruteforce_replay(spark, tmp_path, seed):
    """semantic_dedup_keep_one vs a brute-force Python replay of the
    whole SemDeDup chain: float32 ingest → +0.01 perturbed clones →
    HALF_UP integer quantization → exact integer-dot cosine ≥ 0.99 →
    union-find components → min-id survivor, singletons kept. The
    Spark side goes through hyperplane-LSH candidates, so this also
    re-checks banding recall on random data. Planted: a quantized pair
    ONE integer step each side of the 0.99 boundary (components
    (1000,142) in at 0.99007, (1000,143) out at 0.98993), a three-hop
    chain A~B~C where cos(A,C) is BELOW threshold yet one cluster by
    transitivity, perturbed clones (ids < PERTURB_BELOW) that must
    cluster with their originals, and isolated singletons."""
    import math

    import numpy as np

    from hailstorm_spark.queries.similarity import (
        NEAR_DUP_THRESHOLD,
        PERTURB_BELOW,
        PERTURB_ID_SHIFT,
        QUANT_SCALE,
    )
    from hailstorm_spark.registry import QUERIES

    rng = random.Random(seed)
    dim = 6
    vecs: dict[int, list[float]] = {}
    # ids < PERTURB_BELOW: clones will be planted by the query itself
    for vid in range(0, 6):
        vecs[vid] = [rng.uniform(-1, 1) for _ in range(dim)]
    # boundary pair: one integer step straddles 0.99
    vecs[60] = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    vecs[61] = [1.0, 0.142, 0.0, 0.0, 0.0, 0.0]   # cos 0.99007 -> edge
    # negative second component: one step below threshold vs 60 AND far
    # from 61 (else transitivity would pull it into the cluster anyway)
    vecs[62] = [1.0, -0.143, 0.0, 0.0, 0.0, 0.0]  # cos 0.98993 -> none
    # transitive chain at ~7.5 degrees per hop: adjacent in, A-C out
    # chain lives in the (2,3) plane so it can't touch the boundary trio
    th = math.radians(7.5)
    for k, vid in enumerate((70, 71, 72)):
        vecs[vid] = [0.0, 0.0, math.cos(k * th), math.sin(k * th), 0.0, 0.0]
    # random singletons / occasional collisions
    for vid in range(100, 160):
        vecs[vid] = [rng.uniform(-1, 1) for _ in range(dim)]
    pdf = pd.DataFrame(
        [(vid, np.array(v, dtype=np.float32), 0) for vid, v in sorted(vecs.items())],
        columns=["vec_id", "embedding", "label"],
    )
    pdf.to_parquet(str(tmp_path / "embeddings.parquet"), index=False)

    got = {
        r.vec_id: (r.cluster_id, r.keep)
        for r in QUERIES["semantic_dedup_keep_one"].fn(spark, str(tmp_path)).collect()
    }

    # ---- replay: perturbed corpus in DOUBLE, from the float32 bytes
    corpus: dict[int, list[float]] = {
        vid: [float(np.float32(x)) for x in v] for vid, v in vecs.items()
    }
    for vid in list(corpus):
        if vid < PERTURB_BELOW:
            c = list(corpus[vid])
            c[0] = c[0] + 0.01
            corpus[vid + PERTURB_ID_SHIFT] = c

    def half_up(x: float) -> int:
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    q = {vid: [half_up(x * QUANT_SCALE) for x in v] for vid, v in corpus.items()}
    norm = {vid: sum(c * c for c in v) for vid, v in q.items()}
    ids = sorted(q)
    edges = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            if norm[a] == 0 or norm[b] == 0:
                continue
            dot = sum(x * y for x, y in zip(q[a], q[b]))
            cos = dot / math.sqrt(float(norm[a]) * float(norm[b]))
            if cos >= NEAR_DUP_THRESHOLD:
                edges.append((a, b))
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
    label = {}
    for vid in parent:
        r = find(vid)
        label[vid] = min(label.get(r, r), r)
    roots = {vid: find(vid) for vid in parent}
    expected = {
        vid: (roots.get(vid, vid), roots.get(vid, vid) == vid) for vid in corpus
    }
    assert got == expected
    # planted decisions
    assert expected[61][0] == 60 and expected[62][0] == 62  # boundary straddle
    assert expected[70][0] == 70 and expected[71][0] == 70 and expected[72][0] == 70
    for vid in range(0, 6):
        assert expected[vid + PERTURB_ID_SHIFT][0] == expected[vid][0]


@pytest.mark.parametrize("seed", [83, 505])
def test_zorder_interleave_matches_python_replay(spark, seed):
    """layout.py::z_interleave_expr (Spark dialect) vs a pure-Python
    Morton interleave on random and planted 16-bit coordinates: 0, the
    QMAX corner, single-axis extremes (all odd / all even z-bits), the
    alternating patterns 0xAAAA/0x5555 (whose interleave fills every
    other bit pair), and the locality property z-order exists for —
    the interleave must be monotone within any power-of-two-aligned
    quadrant."""
    from hailstorm_spark.queries.layout import QMAX, z_interleave_expr

    rng = random.Random(seed)
    pts = [(0, 0), (QMAX, QMAX), (QMAX, 0), (0, QMAX),
           (0xAAAA, 0x5555), (0x5555, 0xAAAA), (1, 2)]
    pts += [(rng.randrange(QMAX + 1), rng.randrange(QMAX + 1)) for _ in range(200)]
    df = spark.createDataFrame(pts, "qx long, qy long")
    got = {
        (r.qx, r.qy): r.z
        for r in df.selectExpr(
            "qx", "qy", z_interleave_expr("qx", "qy", "spark") + " AS z"
        ).collect()
    }

    def morton(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for (x, y) in pts:
        assert got[(x, y)] == morton(x, y), (x, y)
    assert got[(QMAX, QMAX)] == (1 << 32) - 1
    assert got[(QMAX, 0)] == 0x55555555 and got[(0, QMAX)] == 0xAAAAAAAA
    # quadrant locality: all points of the low quadrant sort before any
    # point of the high quadrant (the property zone-map skipping uses)
    lo = [morton(x, y) for x in (3, 7000) for y in (5, 8000)]
    hi = [morton(x, y) for x in (40000, 65000) for y in (40000, 65000)]
    assert max(lo) < min(hi)


@pytest.mark.parametrize("seed", [89, 606])
def test_payload_dhash_matches_python_replay(spark, seed):
    """operators/multimodal.py::payload_dhash vs a pure-Python replay
    of the fractional resample + adjacent-difference bit pack. Planted:
    payloads of length 0 and 1 (skipped entirely), exactly 2 (all 61
    sample positions collapse onto two bytes), 61/62 (around one byte
    per position), a long payload and a lightly-retouched copy (the
    near-dup property: most sampled positions agree), and equal
    payloads (equal hashes)."""
    from hailstorm_spark.operators.multimodal import PHASH_BITS, payload_dhash

    rng = random.Random(seed)

    def rnd(n):
        return bytes(rng.randrange(256) for _ in range(n))

    long_payload = rnd(5000)
    touched = bytearray(long_payload)
    for k in range(0, 5000, 997):
        touched[k] ^= 0x01  # low-bit retouch
    payloads = {
        0: b"", 1: b"\x42", 2: b"\x01\x02", 3: b"\x02\x01",
        4: rnd(PHASH_BITS + 1), 5: rnd(PHASH_BITS + 2),
        6: long_payload, 7: bytes(touched), 8: long_payload,
    }
    for did in range(20, 60):
        payloads[did] = rnd(rng.choice([2, 5, 37, 300, 4096]))
    df = spark.createDataFrame(
        sorted(payloads.items()), "doc_id long, content binary"
    )
    got = {r.doc_id: r.phash for r in payload_dhash(df).collect()}

    expected = {}
    for did, s in payloads.items():
        n = len(s)
        if n < 2:
            continue
        idx = [(j * (n - 1)) // PHASH_BITS for j in range(PHASH_BITS + 1)]
        h = 0
        for j in range(PHASH_BITS):
            if s[idx[j + 1]] > s[idx[j]]:
                h |= 1 << j
        expected[did] = h
    assert got == expected
    assert 0 not in got and 1 not in got
    assert got[6] == got[8]
    # near-dup property: the retouched copy differs in only a few bits
    assert bin(got[6] ^ got[7]).count("1") <= 8


@pytest.mark.parametrize("seed", [7, 42])
def test_incremental_components_equals_full_cc_multiwave(spark, seed):
    """incremental_components_update folded over K successive edge
    waves must equal from-scratch CC over the union after EVERY wave —
    including waves that bridge standing clusters, extend them with
    brand-new nodes, and land entirely inside one cluster (no-ops).
    Sparse random graphs at this size produce all three shapes."""
    from hailstorm_spark.operators.dedup import (
        connected_components,
        incremental_components_update,
    )

    rng = random.Random(seed)
    nodes = list(range(80))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(70)})
    rng.shuffle(edges)
    waves = [edges[w::4] for w in range(4)]

    def df(es):
        return spark.createDataFrame(
            [(a, b) for a, b in es], "doc_a long, doc_b long"
        )

    labels = connected_components(df(waves[0]))
    seen = list(waves[0])
    for w in waves[1:]:
        labels = incremental_components_update(labels, df(w))
        seen += w
        got = {(r["doc_id"], r["cluster_id"]) for r in labels.collect()}
        want = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(df(seen)).collect()
        }
        assert got == want


@pytest.mark.parametrize("seed", [11])
def test_delta_closure_local_equals_distributed_fallback(spark, seed, monkeypatch):
    """The delta-closure gate (r13): the driver union-find under the
    cap and the distributed min-label loop above it must produce the
    IDENTICAL (old_label, new_label) mapping — forced here by shrinking
    the cap to 0 so the same random graph runs both paths."""
    import hailstorm_spark.operators.dedup as dd

    rng = random.Random(seed)
    nodes = list(range(60))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(50)})
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    local = {
        (r["old_label"], r["new_label"])
        for r in dd._delta_closure_mapping(df).collect()
    }
    monkeypatch.setattr(dd, "DELTA_CLOSURE_LOCAL_CAP", 0)
    dist = {
        (r["old_label"], r["new_label"])
        for r in dd._delta_closure_mapping(df).collect()
    }
    assert local == dist and local


@pytest.mark.parametrize("seed", [13, 29])
def test_cc_local_gate_equals_distributed_loop(spark, seed, monkeypatch):
    """r14 optimization round: connected_components (and the star
    variant) take a driver union-find fast path for edge lists under
    DELTA_CLOSURE_LOCAL_CAP. Both paths must label identically — forced
    here by shrinking the cap to 0 so the same random graph (mixed
    components, chains, singleton-free by construction) runs the local
    gate AND the distributed loop."""
    import hailstorm_spark.operators.dedup as dd

    rng = random.Random(seed)
    nodes = list(range(90))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(75)})
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    local = {
        (r["doc_id"], r["cluster_id"])
        for r in dd.connected_components(df).collect()
    }
    local_star = {
        (r["doc_id"], r["cluster_id"])
        for r in dd.connected_components_star(df).collect()
    }
    monkeypatch.setattr(dd, "DELTA_CLOSURE_LOCAL_CAP", 0)
    dist = {
        (r["doc_id"], r["cluster_id"])
        for r in dd.connected_components(df).collect()
    }
    dist_star = {
        (r["doc_id"], r["cluster_id"])
        for r in dd.connected_components_star(df).collect()
    }
    assert local == dist and local
    assert local_star == dist_star == local


@pytest.mark.parametrize("seed", [17])
def test_indexed_changes_local_equals_distributed(
    spark, tmp_path, seed, monkeypatch
):
    """r14: _er_indexed_changes' driver-local fast path (pairs collected
    under the delta-closure cap, endpoint resolution + union-find +
    new-node detection in Python, one bucket-pruned endpoint-label
    fetch) must emit the IDENTICAL change set as the r13 distributed
    chain — forced by capping to 0 so the same standing state and the
    same random pair delta run both paths, across two waves (the second
    wave exercises merges of standing clusters, brand-new nodes, and
    in-cluster no-op pairs against non-trivial state)."""
    import hailstorm_spark.operators.dedup as dd
    import hailstorm_spark.queries.streaming_queries as sq
    from hailstorm_spark.streaming.statefold import bucketed_latest_fold

    rng = random.Random(seed)
    labels_dir = str(tmp_path / "labels")
    index_dir = str(tmp_path / "clusteridx")
    lf = bucketed_latest_fold(
        labels_dir, key="doc_id", order_cols=("v",),
        n_buckets=sq._ER_STATE_BUCKETS,
    )
    ixf = bucketed_latest_fold(
        index_dir, key="ikey", order_cols=("v",),
        n_buckets=sq._ER_STATE_BUCKETS, bucket_col="icluster",
    )
    seed_rows = spark.createDataFrame(
        [(i, i - (i % 3), 0) for i in range(60)],
        "doc_id long, cluster_id long, v long",
    )
    lf(seed_rows, 0)
    ixf(
        seed_rows.selectExpr(
            "concat(doc_id, ':', cluster_id) AS ikey",
            "doc_id",
            "cluster_id AS icluster",
            "CAST(1 AS INT) AS alive",
            "v",
        ),
        0,
    )
    for wave in range(2):
        raw = {
            tuple(sorted(rng.sample(range(120), 2))) for _ in range(25)
        }
        pairs = spark.createDataFrame(
            sorted(raw), "doc_a long, doc_b long"
        ).localCheckpoint(eager=True)
        local = {
            (r["doc_id"], r["cluster_id"], r["old_cluster_id"])
            for r in sq._er_indexed_changes(
                spark, labels_dir, index_dir, pairs
            ).collect()
        }
        monkeypatch.setattr(dd, "DELTA_CLOSURE_LOCAL_CAP", 0)
        dist = {
            (r["doc_id"], r["cluster_id"], r["old_cluster_id"])
            for r in sq._er_indexed_changes(
                spark, labels_dir, index_dir, pairs
            ).collect()
        }
        monkeypatch.setattr(dd, "DELTA_CLOSURE_LOCAL_CAP", 200_000)
        assert local == dist
        # fold the change set in so wave 2 runs against moved state
        changes = spark.createDataFrame(
            sorted(local), "doc_id long, cluster_id long, old_cluster_id long"
        ).withColumn("v", F.lit(wave + 1).cast("long"))
        alive = changes.selectExpr(
            "concat(doc_id, ':', cluster_id) AS ikey", "doc_id",
            "cluster_id AS icluster", "CAST(1 AS INT) AS alive", "v",
        )
        tombs = changes.filter("old_cluster_id IS NOT NULL").selectExpr(
            "concat(doc_id, ':', old_cluster_id) AS ikey", "doc_id",
            "old_cluster_id AS icluster", "CAST(0 AS INT) AS alive", "v",
        )
        ixf(alive.unionByName(tombs), wave + 1)
        lf(changes.select("doc_id", "cluster_id", "v"), wave + 1)
