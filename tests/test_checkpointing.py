"""Reliable-checkpoint opt-in for the iterative operators.

Default (``checkpoint_dir=None``) every iterative loop truncates
lineage with ``localCheckpoint`` — executor-local, non-replicated, the
fast path for bench scale. With ``checkpoint_dir`` set, the SAME loops
materialize through reliable ``checkpoint()`` files that survive
executor loss on a real cluster (operators/checkpointing.py documents
the trade-off). These tests pin three contracts:

1. results are IDENTICAL on both paths (the dial changes where blocks
   live, never what is computed);
2. the reliable path actually writes checkpoint files under the given
   directory (so the opt-in is real, not a silently-ignored kwarg);
3. the default path writes NOTHING to disk (no surprise filesystem
   dependency when running local).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hailstorm_spark.operators.checkpointing import materialize
from hailstorm_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)
from hailstorm_spark.operators.graph import (
    bfs_multi_source,
    kcore_peel,
    label_propagation,
    pagerank_integer,
)


def _files_under(root: str) -> list[str]:
    return [
        os.path.join(d, f)
        for d, _, fs in os.walk(root)
        for f in fs
        if not f.startswith(".")
    ]


def _cc_edges(spark):
    # 4-chain + triangle + an isolated pair: three components whose
    # canonical labels are their minima (1, 10, 20)
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )


def test_materialize_reliable_writes_files_and_matches_local(spark, tmp_path):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    local = materialize(df)
    ckpt_dir = str(tmp_path / "ck")
    reliable = materialize(df, ckpt_dir)
    assert sorted(map(tuple, local.collect())) == sorted(
        map(tuple, reliable.collect())
    )
    assert len(_files_under(ckpt_dir)) > 0, "reliable path must write files"


def test_connected_components_same_result_with_reliable_checkpoint(spark, tmp_path):
    edges = _cc_edges(spark)
    want = sorted(map(tuple, connected_components(edges).collect()))
    ckpt_dir = str(tmp_path / "cc")
    got = sorted(
        map(tuple, connected_components(edges, checkpoint_dir=ckpt_dir).collect())
    )
    assert got == want
    assert {(1, 1), (4, 1), (12, 10), (21, 20)} <= set(got)
    assert len(_files_under(ckpt_dir)) > 0


def test_star_contraction_same_result_with_reliable_checkpoint(spark, tmp_path):
    edges = _cc_edges(spark)
    want = sorted(map(tuple, connected_components_star(edges).collect()))
    got = sorted(
        map(
            tuple,
            connected_components_star(
                edges, checkpoint_dir=str(tmp_path / "star")
            ).collect(),
        )
    )
    assert got == want


def test_graph_loops_same_result_with_reliable_checkpoint(spark, tmp_path):
    # directed weighted edges over a small cycle + chord
    edges = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 1), (3, 1, 2), (1, 3, 1), (3, 4, 5), (4, 1, 1)],
        "src long, dst long, w long",
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    seeds = spark.createDataFrame([(1, 1)], "seed long, node long")

    for fn, args in (
        (pagerank_integer, (sym, 3)),
        (label_propagation, (sym, 3)),
        (kcore_peel, (sym.select("src", "dst"), 2, 3)),
        (bfs_multi_source, (sym.select("src", "dst"), seeds, 3)),
    ):
        want = sorted(map(tuple, fn(*args).collect()))
        got = sorted(
            map(
                tuple,
                fn(*args, checkpoint_dir=str(tmp_path / fn.__name__)).collect(),
            )
        )
        assert got == want, fn.__name__
        assert len(_files_under(str(tmp_path / fn.__name__))) > 0, fn.__name__


def test_default_path_writes_nothing(spark, tmp_path):
    probe = str(tmp_path / "probe")
    os.makedirs(probe)
    connected_components(_cc_edges(spark)).collect()
    assert _files_under(probe) == []


def test_registered_query_honors_checkpoint_env(spark, tmp_path, monkeypatch):
    """The dial must be reachable from the driver's own surface, not
    only from unit calls (VERDICT r8 item 4): dedup_clusters_keep_one
    threads SPARK_GRAFT_CHECKPOINT_DIR into its CC loop. Same rows
    with the env set, real checkpoint files under the directory, and
    nothing written when unset."""
    from tests.conftest import SF_DIR

    from hailstorm_spark.registry import all_queries

    fn = all_queries()["dedup_clusters_keep_one"].fn
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    want = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    ckpt = str(tmp_path / "qck")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckpt)
    got = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert got == want
    assert len(_files_under(ckpt)) > 0, "env dial did not reach the CC loop"
