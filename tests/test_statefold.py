"""The bucketed in-place keyed-state fold (streaming/statefold.py):
write locality, replay idempotence, NULL keys, and latest-wins truth.

The scale claim the module makes — per-batch cost O(|batch| + touched
buckets), never O(|state|) — is only real if an untouched bucket's
files are left byte-for-byte alone by a batch that doesn't hash into
it. These tests snapshot every file's (name, size, mtime_ns) across
batches and assert exactly that, which is the file-level pin the
round-8 verdict asked for ("counts rewritten files/partitions per
batch").
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hailstorm_spark.streaming.statefold import bucketed_latest_fold, read_state

B = 8
SCHEMA = "user_id long, event_id long, ts_us long, payload string"


def _bucket_of(spark, uid) -> int:
    return (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(uid).cast("long")), F.lit(B)).cast("int"))
        .collect()[0][0]
    )


def _files(state_dir: str) -> dict[str, tuple[int, int]]:
    out: dict[str, tuple[int, int]] = {}
    for root, _dirs, names in os.walk(state_dir):
        for n in names:
            if n.startswith(("_", ".")):
                continue  # _SUCCESS / CRC bookkeeping
            p = os.path.join(root, n)
            st = os.stat(p)
            out[os.path.relpath(p, state_dir)] = (st.st_size, st.st_mtime_ns)
    return out


def _rows(spark, state_dir):
    return {
        (r["user_id"], r["event_id"], r["ts_us"], r["payload"])
        for r in read_state(spark, state_dir).collect()
    }


def test_untouched_buckets_are_not_rewritten(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    log: list[tuple[int, tuple[int, ...]]] = []
    fold = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"),
        n_buckets=B, touched_log=log,
    )
    # batch 0: keys 0..49 spread over (almost certainly) every bucket
    fold(
        spark.createDataFrame(
            [(u, u, 100, f"v0-{u}") for u in range(50)], SCHEMA
        ),
        0,
    )
    snap0 = _files(state_dir)
    buckets0 = {p.split(os.sep)[0] for p in snap0}
    assert len(buckets0) > 2, "fixture too small to exercise locality"

    # batch 1: a single key — exactly one touched bucket
    fold(
        spark.createDataFrame([(7, 1000, 200, "v1-7")], SCHEMA),
        1,
    )
    b7 = _bucket_of(spark, 7)
    assert log[1] == (1, (b7,))
    snap1 = _files(state_dir)
    touched_prefix = f"bucket={b7}{os.sep}"
    for path, meta in snap0.items():
        if not path.startswith(touched_prefix):
            assert snap1.get(path) == meta, f"untouched file rewritten: {path}"
    # the touched bucket WAS rewritten (new file names)
    assert {p for p in snap1 if p.startswith(touched_prefix)} != {
        p for p in snap0 if p.startswith(touched_prefix)
    }
    # and only rows from the touched key changed
    rows = _rows(spark, state_dir)
    assert (7, 1000, 200, "v1-7") in rows
    assert (7, 7, 100, "v0-7") not in rows
    assert (8, 8, 100, "v0-8") in rows


def test_latest_wins_and_replay_idempotence(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    fold = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=B
    )
    fold(
        spark.createDataFrame(
            [(1, 10, 100, "a"), (1, 11, 100, "b"), (2, 20, 500, "c")], SCHEMA
        ),
        0,
    )
    # ties on ts_us resolve by event_id desc: (1, 11) wins
    assert _rows(spark, state_dir) == {
        (1, 11, 100, "b"),
        (2, 20, 500, "c"),
    }
    batch1 = spark.createDataFrame(
        [(1, 12, 99, "stale"), (2, 21, 600, "d")], SCHEMA
    )
    fold(batch1, 1)
    want = {(1, 11, 100, "b"), (2, 21, 600, "d")}
    assert _rows(spark, state_dir) == want
    # at-least-once replay of the same batch: state unchanged
    fold(batch1, 1)
    assert _rows(spark, state_dir) == want


def test_null_keys_fold_like_any_other_key(spark, tmp_path):
    """xxhash64(NULL) is deterministic, so NULL keys land in one stable
    bucket and latest-wins applies to them as a group — the state table
    keeps exactly one NULL-key row, the newest."""
    state_dir = str(tmp_path / "state")
    fold = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=B
    )
    fold(
        spark.createDataFrame(
            [(None, 1, 100, "n0"), (5, 2, 100, "x")], SCHEMA
        ),
        0,
    )
    fold(spark.createDataFrame([(None, 3, 200, "n1")], SCHEMA), 1)
    rows = _rows(spark, state_dir)
    assert (None, 3, 200, "n1") in rows
    assert (None, 1, 100, "n0") not in rows
    assert (5, 2, 100, "x") in rows


def test_empty_batch_is_a_noop(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    log: list = []
    fold = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"),
        n_buckets=B, touched_log=log,
    )
    fold(spark.createDataFrame([(1, 1, 1, "a")], SCHEMA), 0)
    snap = _files(state_dir)
    fold(spark.createDataFrame([], SCHEMA), 1)
    assert _files(state_dir) == snap
    assert log[1] == (1, ())


# ------------------------------------------------- immutable fold


def test_immutable_fold_appends_without_rewriting_standing_files(
    spark, tmp_path
):
    """r14 optimization round: the immutable mode must (a) produce the
    SAME state table as the latest-wins mode for key-unique immutable
    batches, (b) never touch standing files (O(delta) write, not
    O(touched-bucket contents)), and (c) stay idempotent under
    at-least-once replay and stale replay — the fence the latest mode
    got for free from full-rewrite idempotence."""
    imm_dir = str(tmp_path / "imm")
    ref_dir = str(tmp_path / "ref")
    imm = bucketed_latest_fold(
        imm_dir, key="user_id", order_cols=("user_id",), n_buckets=B,
        immutable=True,
    )
    ref = bucketed_latest_fold(
        ref_dir, key="user_id", order_cols=("user_id",), n_buckets=B,
    )
    batch0 = spark.createDataFrame(
        [(u, u, 100, f"v-{u}") for u in range(0, 40)], SCHEMA
    )
    batch1 = spark.createDataFrame(
        [(u, u, 100, f"v-{u}") for u in range(40, 60)], SCHEMA
    )
    imm(batch0, 0)
    ref(batch0, 0)
    snap0 = _files(imm_dir)
    imm(batch1, 1)
    ref(batch1, 1)
    # (a) same table as the latest-wins reference
    assert _rows(spark, imm_dir) == _rows(spark, ref_dir)
    # (b) batch 1 only ADDED files — every batch-0 file byte-identical
    snap1 = _files(imm_dir)
    for path, meta in snap0.items():
        assert snap1.get(path) == meta, f"standing file rewritten: {path}"
    assert len(snap1) > len(snap0)
    # (c) at-least-once replay: no duplicate rows, no new files
    imm(batch1, 1)
    assert _files(imm_dir) == snap1
    # stale replay of batch 0 after batch 1: skipped entirely
    imm(batch0, 0)
    assert _files(imm_dir) == snap1
    assert _rows(spark, imm_dir) == _rows(spark, ref_dir)


def test_immutable_fold_respects_bucket_col_layout(spark, tmp_path):
    """bucket_col co-location survives the append path: rows land in
    pmod(xxhash64(bucket_col)) partitions (probes prune on it), and the
    layout stamp verifies against the bucket column, not the key."""
    from hailstorm_spark.streaming.statefold import state_bucket_count

    state_dir = str(tmp_path / "state")
    fold = bucketed_latest_fold(
        state_dir, key="event_id", order_cols=("event_id",), n_buckets=B,
        bucket_col="user_id", immutable=True,
    )
    fold(
        spark.createDataFrame(
            [(u % 3, 100 + u, 100, f"v-{u}") for u in range(30)], SCHEMA
        ),
        0,
    )
    assert state_bucket_count(state_dir, 999) == B
    got = (
        spark.read.parquet(state_dir)
        .filter(
            F.col("bucket")
            != F.pmod(F.xxhash64("user_id"), F.lit(B)).cast("int")
        )
        .count()
    )
    assert got == 0
    assert len(_rows(spark, state_dir)) == 30


# ------------------------------------------------- additive fold


from hailstorm_spark.streaming.statefold import bucketed_additive_fold  # noqa: E402

ADD_SCHEMA = "user_id long, one long, cents long"


def _add_rows(spark, state_dir):
    return {
        r["user_id"]: (r["one"], r["cents"])
        for r in read_state(spark, state_dir).collect()
    }


def test_additive_fold_sums_and_prunes(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    log: list = []
    fold = bucketed_additive_fold(
        state_dir, key="user_id", sum_cols=("one", "cents"),
        n_buckets=B, touched_log=log,
    )
    fold(
        spark.createDataFrame(
            [(u, 1, 10 * u) for u in range(30)] + [(3, 1, 5)], ADD_SCHEMA
        ),
        0,
    )
    snap0 = _files(state_dir)
    assert _add_rows(spark, state_dir)[3] == (2, 35)
    # batch 1 touches only key 3: every other bucket byte-identical
    fold(spark.createDataFrame([(3, 1, 100), (3, 1, -5)], ADD_SCHEMA), 1)
    b3 = _bucket_of(spark, 3)
    assert log[1] == (1, (b3,))
    snap1 = _files(state_dir)
    for path, meta in snap0.items():
        if not path.startswith(f"bucket={b3}{os.sep}"):
            assert snap1.get(path) == meta, f"untouched file rewritten: {path}"
    got = _add_rows(spark, state_dir)
    assert got[3] == (4, 130)  # 2+2 rows, 35+100-5 (signed retraction)
    assert got[4] == (1, 40)


def test_additive_fold_replay_is_fenced_file_identical(spark, tmp_path):
    """A replayed batch must not double-add — and must not even
    rewrite the fenced buckets (the skip leaves files byte-identical,
    the strongest possible idempotence witness)."""
    state_dir = str(tmp_path / "state")
    log: list = []
    fold = bucketed_additive_fold(
        state_dir, key="user_id", sum_cols=("one", "cents"),
        n_buckets=B, touched_log=log,
    )
    fold(spark.createDataFrame([(1, 1, 10), (2, 1, 20)], ADD_SCHEMA), 0)
    batch1 = spark.createDataFrame([(1, 1, 7)], ADD_SCHEMA)
    fold(batch1, 1)
    want = _add_rows(spark, state_dir)
    snap = _files(state_dir)
    fold(batch1, 1)  # at-least-once redelivery
    assert _files(state_dir) == snap, "replay rewrote a fenced bucket"
    assert _add_rows(spark, state_dir) == want
    assert log[2] == (1, ()), "fence did not skip the replayed batch"
    # replaying batch 0 (an OLDER batch) is also fenced
    fold(spark.createDataFrame([(1, 1, 10), (2, 1, 20)], ADD_SCHEMA), 0)
    assert _add_rows(spark, state_dir) == want


def test_standing_read_prunes_bucket_partitions(spark, tmp_path):
    """The O(touched) claim needs bucket to be a PARTITION column of
    the layout: an isin() on it must surface as PartitionFilters (scan
    prunes to directories), not a post-scan Filter. Guards against a
    refactor that stops partitionBy-ing the state write — the file
    tests would still pass on semantics, but every batch would scan
    the whole table."""
    state_dir = str(tmp_path / "state")
    fold = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=B
    )
    fold(
        spark.createDataFrame([(u, u, 1, "x") for u in range(20)], SCHEMA), 0
    )
    plan = (
        spark.read.parquet(state_dir)
        .filter(F.col("bucket").isin([0, 1]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:200], plan[:2000]


# ------------------------------------------- tombstone compaction


def test_compaction_empties_a_fully_expired_bucket(spark, tmp_path):
    """The bucket-level twin of the matview emptied-day hazard: a dirty
    bucket whose EVERY row is an expired tombstone must end up EMPTY on
    disk, not silently keep its stale files (dynamic overwrite only
    rewrites partitions present in the output). Also pins: clean
    buckets untouched (file-identical), mixed buckets keep survivors,
    and the sweep is idempotent."""
    from pyspark.sql import functions as F

    from hailstorm_spark.streaming.statefold import (
        bucketed_latest_fold,
        compact_expired_tombstones,
        read_state,
    )

    state_dir = str(tmp_path / "state")
    fold = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=B
    )
    # pick three keys in three distinct buckets
    keys = {}
    u = 0
    while len(keys) < 3:
        b = _bucket_of(spark, u)
        if b not in keys.values():
            keys[u] = b
        u += 1
    (k_dead, b_dead), (k_mix, b_mix), (k_live, b_live) = keys.items()
    # a DIFFERENT key hashing into the mixed bucket (xxhash64 is not
    # modular — search for one)
    k_surv = 1000
    while _bucket_of(spark, k_surv) != b_mix or k_surv == k_mix:
        k_surv += 1
    rows = [
        (k_dead, 1, 100, True),   # old tombstone — whole bucket expires
        (k_mix, 2, 100, True),    # old tombstone in a mixed bucket...
        (k_surv, 3, 900, False),  # ...whose other key survives
        (k_live, 4, 900, False),  # clean bucket: never dirty
    ]
    fold(
        spark.createDataFrame(
            rows, "user_id long, event_id long, ts_us long, is_delete boolean"
        ),
        0,
    )
    snap = _files(state_dir)
    expired = F.col("is_delete") & (F.col("ts_us") < 500)
    dirty = compact_expired_tombstones(spark, state_dir, expired)
    assert set(dirty) == {b_dead, b_mix}
    got = {
        (r["user_id"], r["is_delete"])
        for r in read_state(spark, state_dir).collect()
    }
    assert got == {(k_surv, False), (k_live, False)}
    # the fully-expired bucket is EMPTY: its stale files are gone
    # (replaced by the empty overwrite's zero-row commit) and it
    # contributes no rows
    stale = {p for p in snap if p.startswith(f"bucket={b_dead}{os.sep}")}
    assert stale and not (stale & set(_files(state_dir))), "stale files survived"
    assert (
        spark.read.parquet(f"{state_dir}/bucket={b_dead}").count() == 0
    )
    # clean bucket byte-identical
    for path, meta in snap.items():
        if path.startswith(f"bucket={b_live}{os.sep}"):
            assert _files(state_dir).get(path) == meta
    # idempotent: second sweep is a no-op
    snap2 = _files(state_dir)
    assert compact_expired_tombstones(spark, state_dir, expired) == ()
    assert _files(state_dir) == snap2


# ------------------------------------------- checkpoint-epoch fence


def test_additive_epoch_guard_fails_loudly_on_fresh_checkpoint(spark, tmp_path):
    """The r9 footgun: batch ids are monotone only within ONE
    checkpoint. Re-pointing a FRESH checkpoint (ids restart at 0) at
    standing additive state must raise, not silently swallow batches
    0..N as replays of the old sequence."""
    state_dir = str(tmp_path / "state")
    fold_a = bucketed_additive_fold(
        state_dir, key="user_id", sum_cols=("one", "cents"),
        n_buckets=B, epoch="ckpt-A",
    )
    fold_a(spark.createDataFrame([(1, 1, 10), (2, 1, 20)], ADD_SCHEMA), 0)
    fold_a(spark.createDataFrame([(1, 1, 5)], ADD_SCHEMA), 1)
    want = _add_rows(spark, state_dir)
    # same epoch, replay: fenced as before (guard changes nothing)
    fold_a(spark.createDataFrame([(1, 1, 5)], ADD_SCHEMA), 1)
    assert _add_rows(spark, state_dir) == want
    # fresh checkpoint, batch ids restart at 0 — the old behavior was
    # silent data loss (bucket stamped _b=1 >= 0 → "replay" → skip)
    fold_b = bucketed_additive_fold(
        state_dir, key="user_id", sum_cols=("one", "cents"),
        n_buckets=B, epoch="ckpt-B",
    )
    with pytest.raises(RuntimeError, match="epoch"):
        fold_b(spark.createDataFrame([(1, 1, 999)], ADD_SCHEMA), 0)
    assert _add_rows(spark, state_dir) == want, "guarded merge mutated state"
    # an UNSTAMPED standing table (pre-guard, or marker lost) is
    # adopted ONLY when its _b frontier is behind the caller's batch
    # id — adoption meeting a covering frontier is indistinguishable
    # from swallowing a real batch and must raise (review r10)
    os.remove(os.path.join(state_dir, "_epoch"))
    fold_c0 = bucketed_additive_fold(
        state_dir, key="user_id", sum_cols=("one", "cents"),
        n_buckets=B, epoch="ckpt-C",
    )
    with pytest.raises(RuntimeError, match="frontier"):
        fold_c0(spark.createDataFrame([(1, 1, 999)], ADD_SCHEMA), 0)
    assert _add_rows(spark, state_dir) == want
    # the failed adoption did NOT stamp — a retry re-raises (loud and
    # stable) instead of a stamped marker turning it into a silent skip
    assert not os.path.exists(os.path.join(state_dir, "_epoch"))
    with pytest.raises(RuntimeError, match="frontier"):
        fold_c0(spark.createDataFrame([(1, 1, 999)], ADD_SCHEMA), 0)
    fold_c = bucketed_additive_fold(
        state_dir, key="user_id", sum_cols=("one", "cents"),
        n_buckets=B, epoch="ckpt-C",
    )
    fold_c(spark.createDataFrame([(2, 1, 1)], ADD_SCHEMA), 2)
    assert _add_rows(spark, state_dir)[2] == (2, 21)
    with open(os.path.join(state_dir, "_epoch"), encoding="utf-8") as f:
        assert f.read() == "ckpt-C"


# ------------------------------------------------- re-bucketing


from hailstorm_spark.streaming.statefold import rebucket_state  # noqa: E402


def test_rebucket_preserves_latest_fold_output_and_locality(spark, tmp_path):
    """n_buckets is frozen into the layout at creation; rebucket_state
    is the one-shuffle migration. Pins: (a) read_state identical
    across the migration (both up- and down-sizing), (b) the migrated
    layout is still bucket-local — a single-key batch afterwards
    rewrites exactly one NEW-layout bucket."""
    state_dir = str(tmp_path / "state")
    fold8 = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=B
    )
    fold8(
        spark.createDataFrame(
            [(u, u, 100 + (u % 3), f"v-{u}") for u in range(60)], SCHEMA
        ),
        0,
    )
    fold8(spark.createDataFrame([(7, 1000, 999, "new-7")], SCHEMA), 1)
    before = _rows(spark, state_dir)

    new_b = 32
    buckets = rebucket_state(spark, state_dir, key="user_id", new_n_buckets=new_b)
    assert _rows(spark, state_dir) == before
    assert set(buckets) <= set(range(new_b)) and len(buckets) > B
    assert not os.path.exists(state_dir + ".rebucket.tmp")
    assert not os.path.exists(state_dir + ".rebucket.old")

    # the migrated layout accepts folds and stays bucket-local
    log: list = []
    fold32 = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"),
        n_buckets=new_b, touched_log=log,
    )
    snap = _files(state_dir)
    fold32(spark.createDataFrame([(7, 2000, 1500, "newer-7")], SCHEMA), 2)
    b7 = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(7).cast("long")), F.lit(new_b)).cast("int"))
        .collect()[0][0]
    )
    assert log[0] == (2, (b7,))
    after = _files(state_dir)
    for path, meta in snap.items():
        if not path.startswith(f"bucket={b7}{os.sep}"):
            assert after.get(path) == meta, f"untouched file rewritten: {path}"
    rows = _rows(spark, state_dir)
    assert (7, 2000, 1500, "newer-7") in rows and (7, 1000, 999, "new-7") not in rows

    # down-sizing works too (a shrunken keyspace compacts its layout)
    rebucket_state(spark, state_dir, key="user_id", new_n_buckets=4)
    assert {p.split(os.sep)[0] for p in _files(state_dir)} <= {
        f"bucket={i}" for i in range(4)
    }
    assert _rows(spark, state_dir) == (before - {(7, 1000, 999, "new-7")}) | {
        (7, 2000, 1500, "newer-7")
    }


def test_rebucket_preserves_additive_fence_and_epoch(spark, tmp_path):
    """Fence survival: per-row _b stamps are carried verbatim, so a
    replayed pre-migration batch still skips (file-identical) in the
    NEW layout, and the _epoch stamp rides along."""
    state_dir = str(tmp_path / "state")
    fold8 = bucketed_additive_fold(
        state_dir, key="user_id", sum_cols=("one", "cents"),
        n_buckets=B, epoch="ckpt-A",
    )
    fold8(spark.createDataFrame([(u, 1, 10 * u) for u in range(20)], ADD_SCHEMA), 0)
    batch1 = spark.createDataFrame([(3, 1, 7)], ADD_SCHEMA)
    fold8(batch1, 1)
    want = _add_rows(spark, state_dir)

    rebucket_state(spark, state_dir, key="user_id", new_n_buckets=32)
    assert _add_rows(spark, state_dir) == want
    with open(os.path.join(state_dir, "_epoch"), encoding="utf-8") as f:
        assert f.read() == "ckpt-A"

    log: list = []
    fold32 = bucketed_additive_fold(
        state_dir, key="user_id", sum_cols=("one", "cents"),
        n_buckets=32, epoch="ckpt-A", touched_log=log,
    )
    snap = _files(state_dir)
    fold32(batch1, 1)  # pre-migration batch redelivered post-migration
    assert _files(state_dir) == snap, "replay rewrote a fenced bucket post-migration"
    assert _add_rows(spark, state_dir) == want
    assert log[0] == (1, ())
    # and genuinely NEW batches still apply
    fold32(spark.createDataFrame([(3, 1, 3)], ADD_SCHEMA), 2)
    assert _add_rows(spark, state_dir)[3] == (3, 40)
    # the epoch guard survives the migration: a fresh checkpoint still raises
    fold_fresh = bucketed_additive_fold(
        state_dir, key="user_id", sum_cols=("one", "cents"),
        n_buckets=32, epoch="ckpt-B",
    )
    with pytest.raises(RuntimeError, match="epoch"):
        fold_fresh(spark.createDataFrame([(1, 1, 1)], ADD_SCHEMA), 0)


# --------------------------------------------- schema evolution


def test_latest_fold_add_column_evolution_is_bucket_local(spark, tmp_path):
    """Add-only, batch-authoritative evolution: a later batch carries a
    NEW column; old files NULL-fill it through the batch's schema, the
    evolved write touches only its buckets (untouched buckets keep
    their pre-evolution bytes AND schema), and read_state merges the
    mixed layout."""
    state_dir = str(tmp_path / "state")
    fold = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=B
    )
    fold(
        spark.createDataFrame(
            [(u, u, 100, f"v-{u}") for u in range(40)], SCHEMA
        ),
        0,
    )
    snap0 = _files(state_dir)
    evolved = "user_id long, event_id long, ts_us long, payload string, country string"
    fold(
        spark.createDataFrame([(7, 1000, 200, "v2-7", "DE")], evolved), 1
    )
    b7 = _bucket_of(spark, 7)
    snap1 = _files(state_dir)
    for path, meta in snap0.items():
        if not path.startswith(f"bucket={b7}{os.sep}"):
            assert snap1.get(path) == meta, f"untouched file rewritten: {path}"
    got = {
        r["user_id"]: (r["event_id"], r["payload"], r["country"])
        for r in read_state(spark, state_dir).collect()
    }
    assert got[7] == (1000, "v2-7", "DE")
    # pre-evolution rows read back with the new column NULL-filled —
    # including standing rows in the TOUCHED bucket that lost the merge
    # race but were rewritten through the evolved schema
    assert got[8] == (8, "v-8", None)
    assert len(got) == 40


def test_additive_fold_new_sum_column_is_null_until_observed(spark, tmp_path):
    """Additive evolution: a new sum column is NULL (never observed),
    not 0, for keys with no contribution since it appeared — and sums
    normally once observed."""
    state_dir = str(tmp_path / "state")
    fold_old = bucketed_additive_fold(
        state_dir, key="user_id", sum_cols=("one", "cents"), n_buckets=B
    )
    fold_old(spark.createDataFrame([(1, 1, 10), (2, 1, 20)], ADD_SCHEMA), 0)
    fold_new = bucketed_additive_fold(
        state_dir, key="user_id", sum_cols=("one", "cents", "bonus"), n_buckets=B
    )
    fold_new(
        spark.createDataFrame(
            [(1, 1, 5, 3)], "user_id long, one long, cents long, bonus long"
        ),
        1,
    )
    got = {
        r["user_id"]: (r["one"], r["cents"], r["bonus"])
        for r in read_state(spark, state_dir).collect()
    }
    assert got[1] == (2, 15, 3)
    assert got[2] == (1, 20, None)


def test_compaction_null_expiry_predicate_means_keep(spark, tmp_path):
    """ADVICE r9: a row whose expiry predicate evaluates to NULL must
    be KEPT even when it shares a bucket with a truly expired row
    (previously filter(~expired) silently dropped it)."""
    from hailstorm_spark.streaming.statefold import compact_expired_tombstones

    state_dir = str(tmp_path / "state")
    fold = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=1
    )
    fold(
        spark.createDataFrame(
            [(1, 1, 100, True), (2, 2, None, True), (3, 3, 900, False)],
            "user_id long, event_id long, ts_us long, is_delete boolean",
        ),
        0,
    )
    # ts_us < 500 is NULL for key 2 — same bucket (n_buckets=1) as the
    # genuinely expired key 1
    dirty = compact_expired_tombstones(
        spark, state_dir, F.col("is_delete") & (F.col("ts_us") < 500)
    )
    assert dirty == (0,)
    got = {r["user_id"] for r in read_state(spark, state_dir).collect()}
    assert got == {2, 3}, "NULL-predicate row was dropped or expired row kept"


def test_fold_with_stale_n_buckets_fails_loudly(spark, tmp_path):
    """rebucket_state's twin footgun: a caller still configured with
    the OLD bucket count after a migration would prune the standing
    read to the wrong directories and silently duplicate keys. The
    layout marker must make that a loud error, for both fold types."""
    from hailstorm_spark.streaming.statefold import rebucket_state

    state_dir = str(tmp_path / "state")
    fold8 = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=B
    )
    fold8(spark.createDataFrame([(u, u, 100, "x") for u in range(20)], SCHEMA), 0)
    rebucket_state(spark, state_dir, key="user_id", new_n_buckets=32)
    before = _rows(spark, state_dir)
    with pytest.raises(RuntimeError, match="n_buckets"):
        fold8(spark.createDataFrame([(7, 99, 200, "y")], SCHEMA), 1)
    assert _rows(spark, state_dir) == before, "guarded fold mutated state"
    add_dir = str(tmp_path / "add")
    bucketed_additive_fold(
        add_dir, key="user_id", sum_cols=("one", "cents"), n_buckets=B
    )(spark.createDataFrame([(1, 1, 10)], ADD_SCHEMA), 0)
    with pytest.raises(RuntimeError, match="n_buckets"):
        bucketed_additive_fold(
            add_dir, key="user_id", sum_cols=("one", "cents"), n_buckets=4
        )(spark.createDataFrame([(1, 1, 1)], ADD_SCHEMA), 1)
    # a pre-marker layout is ADOPTED, not rejected (legacy dirs)
    os.remove(os.path.join(add_dir, "_n_buckets"))
    bucketed_additive_fold(
        add_dir, key="user_id", sum_cols=("one", "cents"), n_buckets=B
    )(spark.createDataFrame([(1, 1, 5)], ADD_SCHEMA), 1)
    assert _add_rows(spark, add_dir)[1] == (2, 15)
    with open(os.path.join(add_dir, "_n_buckets"), encoding="utf-8") as f:
        assert int(f.read()) == B


def test_rebucket_unifies_a_mid_evolution_mixed_schema_layout(spark, tmp_path):
    """Composition of the two round-10 ops events: a layout caught
    MID-EVOLUTION (touched buckets carry the added column, untouched
    ones don't) must migrate losslessly — the rebucket read merges
    footers, so post-migration every row carries the evolved schema
    with NULLs where the column never existed, and values survive."""
    from hailstorm_spark.streaming.statefold import rebucket_state

    state_dir = str(tmp_path / "state")
    fold = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=B
    )
    fold(
        spark.createDataFrame(
            [(u, u, 100, f"v-{u}") for u in range(40)], SCHEMA
        ),
        0,
    )
    evolved = "user_id long, event_id long, ts_us long, payload string, country string"
    fold(spark.createDataFrame([(7, 1000, 200, "v2-7", "DE")], evolved), 1)
    want = {
        (r["user_id"], r["event_id"], r["payload"], r["country"])
        for r in read_state(spark, state_dir).collect()
    }
    rebucket_state(spark, state_dir, key="user_id", new_n_buckets=32)
    got = {
        (r["user_id"], r["event_id"], r["payload"], r["country"])
        for r in read_state(spark, state_dir).collect()
    }
    assert got == want
    assert (7, 1000, "v2-7", "DE") in got and (8, 8, "v-8", None) in got
    # post-migration the layout is schema-uniform: a plain (non-merge)
    # read of any single bucket already exposes the evolved column
    import glob

    one_bucket = sorted(glob.glob(f"{state_dir}/bucket=*"))[0]
    assert "country" in spark.read.parquet(one_bucket).columns


def test_unstamped_layout_adoption_verifies_the_claimed_count(spark, tmp_path):
    """Review r10: adopting a pre-marker layout must not take the
    caller's n_buckets on faith — the one-time verification scan
    (bucket == pmod(xxhash64(key), n) for every standing row) raises
    on a wrong claim and accepts a right one."""
    state_dir = str(tmp_path / "state")
    fold8 = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=B
    )
    fold8(spark.createDataFrame([(u, u, 100, "x") for u in range(30)], SCHEMA), 0)
    os.remove(os.path.join(state_dir, "_n_buckets"))
    wrong = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=4
    )
    with pytest.raises(RuntimeError, match="does NOT match"):
        wrong(spark.createDataFrame([(7, 99, 200, "y")], SCHEMA), 1)
    # the failed verification did not stamp the wrong count
    assert not os.path.exists(os.path.join(state_dir, "_n_buckets"))
    # the RIGHT claim verifies, adopts, and folds normally
    fold8b = bucketed_latest_fold(
        state_dir, key="user_id", order_cols=("ts_us", "event_id"), n_buckets=B
    )
    fold8b(spark.createDataFrame([(7, 99, 200, "y")], SCHEMA), 1)
    assert (7, 99, 200, "y") in _rows(spark, state_dir)
    with open(os.path.join(state_dir, "_n_buckets"), encoding="utf-8") as f:
        assert int(f.read()) == B


# ------------------------------------------- monoid fold (r11)

from hailstorm_spark.streaming.statefold import bucketed_monoid_fold  # noqa: E402

MONO_SCHEMA = "user_id long, n long, mn long, mx long, bits long"


def _mono_rows(spark, state_dir):
    return {
        r["user_id"]: (r["n"], r["mn"], r["mx"], r["bits"])
        for r in read_state(spark, state_dir).collect()
    }


def test_monoid_fold_merges_per_column_ops_and_fences_replays(spark, tmp_path):
    """min/max/bit_or state folds correctly across batches (the ops
    the additive fold cannot carry), and the _b fence still leaves a
    replayed batch's buckets byte-identical — exactly-once is the
    fence's property, not sum's."""
    state_dir = str(tmp_path / "state")
    log: list = []
    fold = bucketed_monoid_fold(
        state_dir,
        key="user_id",
        cols={"n": "sum", "mn": "min", "mx": "max", "bits": "bit_or"},
        n_buckets=B,
        touched_log=log,
    )
    fold(
        spark.createDataFrame(
            [(1, 1, 50, 50, 1), (1, 1, 20, 20, 4), (2, 1, 7, 7, 2)], MONO_SCHEMA
        ),
        0,
    )
    assert _mono_rows(spark, state_dir) == {1: (2, 20, 50, 5), 2: (1, 7, 7, 2)}
    batch1 = spark.createDataFrame([(1, 1, 90, 90, 8), (2, 1, 3, 3, 2)], MONO_SCHEMA)
    fold(batch1, 1)
    want = {1: (3, 20, 90, 13), 2: (2, 3, 7, 2)}
    assert _mono_rows(spark, state_dir) == want
    snap = _files(state_dir)
    fold(batch1, 1)  # at-least-once redelivery
    assert _files(state_dir) == snap, "replay rewrote a fenced bucket"
    assert _mono_rows(spark, state_dir) == want
    assert log[2] == (1, ()), "fence did not skip the replayed batch"


def test_monoid_fold_rejects_unknown_op_eagerly(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported monoid op"):
        bucketed_monoid_fold(
            str(tmp_path / "state"), key="user_id", cols={"x": "avg"}
        )


def test_additive_fold_is_the_all_sum_monoid_special_case(spark, tmp_path):
    """The refactor contract: bucketed_additive_fold(sum_cols) and
    bucketed_monoid_fold(all-sum) must produce identical state over
    the same batches."""
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "m")
    fa = bucketed_additive_fold(d1, key="user_id", sum_cols=("one", "cents"), n_buckets=B)
    fm = bucketed_monoid_fold(
        d2, key="user_id", cols={"one": "sum", "cents": "sum"}, n_buckets=B
    )
    for bid, rows in enumerate(
        [[(u, 1, 10 * u) for u in range(20)], [(3, 1, -5), (21, 1, 7)]]
    ):
        df = spark.createDataFrame(rows, ADD_SCHEMA)
        fa(df, bid)
        fm(df, bid)
    assert _add_rows(spark, d1) == _add_rows(spark, d2)


def test_monoid_fold_new_min_column_is_null_until_observed(spark, tmp_path):
    """ADD-only evolution composes with non-sum ops: a min column that
    appears mid-stream reads back NULL ('never observed') for keys
    with no contribution since it appeared, and folds normally after."""
    state_dir = str(tmp_path / "state")
    fold0 = bucketed_monoid_fold(
        state_dir, key="user_id", cols={"n": "sum"}, n_buckets=B
    )
    fold0(spark.createDataFrame([(1, 1), (2, 1)], "user_id long, n long"), 0)
    fold1 = bucketed_monoid_fold(
        state_dir, key="user_id", cols={"n": "sum", "mn": "min"}, n_buckets=B
    )
    fold1(
        spark.createDataFrame([(1, 1, 42)], "user_id long, n long, mn long"), 1
    )
    got = {
        r["user_id"]: (r["n"], r["mn"])
        for r in read_state(spark, state_dir).collect()
    }
    assert got[1] == (2, 42)
    assert got[2] == (1, None)


def test_latest_fold_bucket_col_layout_and_locality(spark, tmp_path):
    """The bucket_col decoupling (r12, the ER blocked-record index):
    rows keyed by ``id`` but CO-LOCATED by ``blk`` must (a) land in
    bucket pmod(xxhash64(blk), B) — the layout a block-key reader
    prunes on, (b) keep latest-wins dedup per ``id`` across rows that
    share a block, and (c) leave every bucket a batch's blocks don't
    hash into byte-identical on disk."""
    state_dir = str(tmp_path / "state")
    fold = bucketed_latest_fold(
        state_dir,
        key="id",
        order_cols=("v", "id"),
        n_buckets=B,
        bucket_col="blk",
    )
    rows0 = [(i, f"blk{i % 7}", 1, f"p{i}") for i in range(30)]
    fold(
        spark.createDataFrame(rows0, "id long, blk string, v long, payload string"),
        0,
    )
    # (a) layout: every standing row's partition == pmod(xxhash64(blk))
    standing = spark.read.parquet(state_dir)
    bad = standing.filter(
        F.col("bucket")
        != F.pmod(F.xxhash64(F.col("blk")), F.lit(B)).cast("int")
    ).count()
    assert bad == 0

    before = _files(state_dir)
    # batch 1: ONE block only — an update for id 3 (same blk3 block)
    # plus a new id in that block
    blk = "blk3"
    target = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(blk)), F.lit(B)).cast("int"))
        .collect()[0][0]
    )
    rows1 = [(3, blk, 2, "updated"), (100, blk, 1, "new")]
    fold(
        spark.createDataFrame(rows1, "id long, blk string, v long, payload string"),
        1,
    )
    after = _files(state_dir)
    changed_buckets = {
        p.split("/")[0]
        for p in (set(before) ^ set(after))
        | {p for p in before if p in after and before[p] != after[p]}
    }
    assert changed_buckets == {f"bucket={target}"}

    # (b) latest-wins per id across the shared block
    got = {
        r["id"]: (r["v"], r["payload"])
        for r in read_state(spark, state_dir)
        .filter(F.col("blk") == blk)
        .collect()
    }
    assert got[3] == (2, "updated")
    assert got[100] == (1, "new")

    # (c) a mismatched bucket count refuses to fold (layout stamp)
    import pytest as _pytest

    bad_fold = bucketed_latest_fold(
        state_dir, key="id", order_cols=("v", "id"), n_buckets=B * 2,
        bucket_col="blk",
    )
    with _pytest.raises(RuntimeError, match="n_buckets"):
        bad_fold(
            spark.createDataFrame(
                rows1, "id long, blk string, v long, payload string"
            ),
            2,
        )


def test_latest_fold_bucket_col_must_be_function_of_key(spark, tmp_path):
    """ADVICE r12: bucket_col must be a pure function of the KEY —
    latest-wins placement is per row, so a key whose later version
    computes a different bucket_col would leave its old version
    stranded in the old bucket (silent duplicate rows on read). The
    fold asserts functional dependence over every row it can see and
    dies loudly instead.

    Case 1 — violation inside one batch: always visible."""
    state_dir = str(tmp_path / "state")
    fold = bucketed_latest_fold(
        state_dir, key="id", order_cols=("v", "id"), n_buckets=B,
        bucket_col="blk",
    )
    # two blks guaranteed to land in different buckets (else the rows
    # would legitimately co-locate and the assert must NOT fire)
    blks = [f"b{i}" for i in range(20)]
    bks = {
        b: spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(b)), F.lit(B)).cast("int"))
        .collect()[0][0]
        for b in blks
    }
    b1 = blks[0]
    b2 = next(b for b in blks if bks[b] != bks[b1])
    rows = [(5, b1, 1, "x"), (5, b2, 2, "y")]
    with pytest.raises(Exception, match="not a pure function"):
        fold(
            spark.createDataFrame(rows, "id long, blk string, v long, payload string"),
            0,
        )

    # Case 2 — violation across batches, old bucket touched: the
    # standing row of the moved key unions into the merge and the
    # assert fires (the untouched-old-bucket case is the documented
    # structural blind spot).
    state2 = str(tmp_path / "state2")
    fold2 = bucketed_latest_fold(
        state2, key="id", order_cols=("v", "id"), n_buckets=B,
        bucket_col="blk",
    )
    fold2(
        spark.createDataFrame(
            [(5, b1, 1, "x")], "id long, blk string, v long, payload string"
        ),
        0,
    )
    bad_batch = [(5, b2, 2, "moved"), (6, b1, 1, "touches-old-bucket")]
    with pytest.raises(Exception, match="not a pure function"):
        fold2(
            spark.createDataFrame(
                bad_batch, "id long, blk string, v long, payload string"
            ),
            1,
        )


def test_rebucket_live_bucket_col_index_and_marker_driven_probe(spark, tmp_path):
    """Judge r13 item 3: a LIVE re-bucket of a ``bucket_col``
    latest-wins fold — the ER element/band INDEX shape, where rows are
    keyed by record id but co-located (and probed) by the lookup key.
    The migration hashes on the BUCKET COLUMN (that is what placement
    means for an index layout), and afterwards:

    (a) a fold still configured with the old count REFUSES loudly (the
        ``_n_buckets`` layout-marker teeth — silent wrong-modulus
        pruning is the hazard);
    (b) the pruned READ path needs no reconfiguration at all: probes
        take their modulus from the marker (ADVICE r13), so the
        standing rows keep being found — proven by pair correctness,
        which fails if even one touched bucket were mis-pruned;
    (c) a fold configured with the new count continues, latest-wins
        intact, every rid exactly once.
    """
    from hailstorm_spark.queries.streaming_queries import _keyed_pair_probe
    from hailstorm_spark.streaming.statefold import (
        rebucket_state,
        state_bucket_count,
    )

    idx = str(tmp_path / "bands")
    ischema = "rid string, doc_id long, bkey string"

    def batch(docs):
        return spark.createDataFrame(
            [(f"{d}#k{d % 5}", d, f"k{d % 5}") for d in docs], ischema
        )

    fold8 = bucketed_latest_fold(
        idx, key="rid", order_cols=("rid",), n_buckets=B, bucket_col="bkey"
    )
    fold8(batch(range(0, 30)), 0)
    fold8(batch(range(30, 40)), 1)

    # quiesced: migrate the index layout 8 -> 32 on the bucket column
    rebucket_state(spark, idx, key="bkey", new_n_buckets=32)
    assert state_bucket_count(idx, B) == 32

    # (a) stale-count fold refuses before any state damage
    with pytest.raises(RuntimeError, match="n_buckets"):
        fold8(batch([100]), 2)

    # (b) marker-driven probe finds every standing partner post-migration
    probe = batch([100, 101])  # keys k0 / k1
    got = {
        (r["doc_a"], r["doc_b"])
        for r in _keyed_pair_probe(probe, idx, "bkey").collect()
    }
    want = {(d, 100) for d in range(0, 40, 5)} | {
        (d, 101) for d in range(1, 40, 5)
    }
    assert got == want

    # (c) the new-count fold continues on the migrated layout
    fold32 = bucketed_latest_fold(
        idx, key="rid", order_cols=("rid",), n_buckets=32, bucket_col="bkey"
    )
    fold32(probe, 2)
    rows = read_state(spark, idx)
    assert rows.count() == 42
    assert rows.select("rid").distinct().count() == 42


def test_driver_xxhash64_matches_spark(spark):
    """r14 optimization round: the driver-side xxhash64 twin
    (functions.hashing.spark_bucket and friends) lets bucket-pruned
    readers compute touched-bucket lists without a Spark job — but ONLY
    if it is bit-identical to Spark's xxhash64 on the layer's two key
    encodings (LongType, StringType/UTF-8). Property-pinned here over
    boundary values and randomized keys; any divergence would make a
    pruned read silently open the wrong directories."""
    import random

    from pyspark.sql import functions as F

    from hailstorm_spark.functions.hashing import (
        spark_bucket,
        xxhash64_bytes,
        xxhash64_long,
    )

    rng = random.Random(99)
    longs = [0, 1, -1, 2**63 - 1, -(2**63), 42] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(300)
    ]
    df = spark.createDataFrame([(v,) for v in longs], "v long")
    got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    assert got == [xxhash64_long(v) for v in longs]
    strs = ["", "a", "k1", "1:17", "x" * 31, "y" * 32, "z" * 100] + [
        "".join(
            rng.choice("abcdefgh0123456789#|:ÿπ")
            for _ in range(rng.randint(0, 80))
        )
        for _ in range(300)
    ]
    df2 = spark.createDataFrame([(s,) for s in strs], "s string")
    got2 = [r[0] for r in df2.select(F.xxhash64("s")).collect()]
    assert got2 == [xxhash64_bytes(s.encode("utf-8")) for s in strs]
    # and the composed bucket id (pmod semantics) for both encodings
    for n in (8, 16, 32):
        b = [
            r[0]
            for r in df.select(
                F.pmod(F.xxhash64("v"), F.lit(n)).cast("int")
            ).collect()
        ]
        assert b == [spark_bucket(v, n) for v in longs]
        b2 = [
            r[0]
            for r in df2.select(
                F.pmod(F.xxhash64("s"), F.lit(n)).cast("int")
            ).collect()
        ]
        assert b2 == [spark_bucket(s, n) for s in strs]
