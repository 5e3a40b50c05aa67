"""Bucketed keyed-state folds for foreachBatch streaming queries.

The naive versioned fold (state_v{N} = merge(state_v{N-1}, batch))
rewrites the ENTIRE state table every micro-batch: correct, but at
100 TB the per-batch write cost is O(|state|), not O(|batch|) — a
billion-key latest-value table would be rewritten end-to-end to apply
a thousand-row change batch. This module applies the same discipline
``events_matview_incremental_deletes`` uses per day, per HASH BUCKET:

1. the state table lives in ONE directory, hash-partitioned on
   ``bucket = pmod(xxhash64(key), n_buckets)``;
2. each batch computes its TOUCHED buckets (a bounded collect of at
   most ``n_buckets`` ints — the distinct-bucket aggregation is one
   tiny shuffle of the batch only);
3. only those buckets' standing rows are read back (``isin`` on the
   partition column — a static partition filter, so the scan prunes
   to the touched directories and the cold buckets are never opened);
4. one per-key window resolves latest-wins over (standing ∪ batch);
5. the result is written with DYNAMIC partition overwrite, which
   replaces exactly the partitions present in the output — the
   touched buckets — and leaves every other bucket's files byte-for-
   byte untouched (pinned by tests/test_statefold.py, which snapshots
   file (path, mtime, size) across batches).

Per-batch cost is therefore O(|batch| + |state restricted to touched
buckets|). ``n_buckets`` is the granularity dial: more buckets →
smaller rewrite amplification per batch but more files; size it so a
bucket ≈ a comfortable parquet task split at the target scale.

Exactly-once: foreachBatch is at-least-once, and this fold is applied
IN PLACE (no version fencing), so idempotence must come from the merge
itself — latest-wins by a total (order_cols, key) ranking is idempotent
under replays (re-merging rows already in the state re-selects the
same winners) and commutative for rows of DIFFERENT keys. What it is
NOT is order-insensitive for the SAME key when the order columns tie
across distinct payloads — callers must make the ranking total
(ts + a unique id tiebreaker), which every caller here does.

In production the directory becomes a MERGE INTO on a bucketed table
(Delta/Iceberg); the shape — shuffle the batch, prune to touched
buckets, rewrite only those — is identical.

Self-read-overwrite assumption: each fold reads ``state_dir`` and
writes ``mode('overwrite')`` back to the SAME path in one action — a
pattern older Spark releases reject ("Cannot overwrite a path that is
also being read from"). It is safe here because the Spark 4 file-source
V2 write stages the whole output under a job-attempt directory and
only moves files at job commit, after every read task of the same
action has finished; the matview maintenance queries rely on the same
behavior. It is still not crash-atomic on a plain filesystem — a crash
mid-commit can lose touched buckets' standing rows (untouched buckets
are never at risk). On an object store, or wherever mid-commit crashes
must be survivable, ride a transactional table format instead; this
module is the layout/algorithm layer, not the commit protocol.

Layout contract on disk: ``bucket=<i>/`` parquet partition directories
plus two tiny driver-side markers — ``_n_buckets`` (the bucket count
the layout was written with; folds check it and refuse a mismatched
configuration, which would prune standing reads with the wrong modulus
and silently duplicate keys) and ``_epoch`` (the checkpoint identity
fencing the additive fold's ``_b`` batch-id stamps; see
``_check_epoch``). ``rebucket_state`` carries both markers across a
migration.

Schema evolution envelope (both folds): ADD-only, batch-authoritative.
The standing read uses the batch's schema explicitly, so a column the
batch adds is NULL-filled from old files, and a column the batch stops
sending is dropped from TOUCHED buckets at their next rewrite
(untouched buckets keep their bytes until touched — ``read_state``
merges footers so mixed-schema layouts read consistently). For the
additive fold a newly added sum column is NULL (not 0) for keys with
no contribution since the column appeared — "never observed", not
"observed zero".
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bucketed_additive_fold",
    "bucketed_latest_fold",
    "bucketed_monoid_fold",
    "compact_expired_tombstones",
    "read_state",
    "rebucket_state",
    "state_bucket_count",
]

_EPOCH_FILE = "_epoch"
_LAYOUT_FILE = "_n_buckets"
_MONOID_FILE = "_monoid.json"

#: log-structured segment threshold (r15): an append-mode bucket whose
#: file count reaches this is folded down to ONE segment by the same
#: batch that touches it next. Bounds both the read fan-in (read_state
#: merges at most this many segments per bucket) and the replay fence
#: scan (per-bucket max(_b) reads this many footers), at the cost of
#: one bucket-local rewrite every K touches — the LSM trade. A dial,
#: not a core-count tune: the right K is about merge amortization and
#: is scale-independent.
_COMPACT_SEGMENTS = int(os.environ.get("SPARK_GRAFT_STATE_COMPACT_SEGMENTS", "8"))


def _bucket_file_counts(state_dir: str) -> dict[int, int]:
    """Per-bucket data-file counts, driver-side (one listdir per bucket
    directory — the local/HDFS stand-in for a table format's file
    index). Used only to pick compaction candidates; correctness never
    depends on it."""
    out: dict[int, int] = {}
    if not os.path.isdir(state_dir):
        return out
    for name in os.listdir(state_dir):
        if not name.startswith("bucket="):
            continue
        try:
            b = int(name.split("=", 1)[1])
        except ValueError:
            continue
        d = os.path.join(state_dir, name)
        out[b] = sum(
            1 for f in os.listdir(d) if not f.startswith(("_", "."))
        )
    return out


@contextmanager
def _plan_pinned(s, n_buckets: int):
    """Run a fold's actions with AQE off and the shuffle width derived
    from the LAYOUT, not the session. The fold plans are FIXED SHAPE —
    a touched-bucket distinct, a fence read, and a union → aggregate →
    ``repartition(n_buckets)`` → dynamic-overwrite write whose output
    partitioning is pinned by the on-disk layout — so adaptive
    execution has nothing to adapt (no joins, no skew, the final
    partition count is the bucket count by contract) and only adds one
    scheduling round per exchange: measured 5 jobs per fold call with
    AQE vs 2 without, identical results, at EVERY scale — the
    multi-trigger drains pay that floor dozens of times per run. With
    AQE off the intermediate exchanges would fall back to the session's
    ``shuffle.partitions`` (core-count locally), scheduling near-empty
    tasks per fold; ``n_buckets`` is the principled width at any scale
    because the bucket count IS the state-layer parallelism dial (the
    sizing rule in SCALE.md: a bucket ≈ a comfortable task split at
    the target scale — a keyspace that outgrows it gets re-bucketed,
    which widens these exchanges in the same move). Session-conf
    toggle (not thread-local) like the partitionOverwriteMode toggle
    below. Concurrency contract (r15): folds either run serially
    inside foreachBatch, or overlap under
    streaming_queries._run_folds, which pins these exact values for
    the whole overlap region first — every concurrent save/set then
    reads and writes the same pinned values in any interleaving, so
    the toggles stay race-free BY VALUE, and the outer restore is the
    only one that writes anything else."""
    saved_aqe = s.conf.get("spark.sql.adaptive.enabled", "true")
    saved_sp = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", str(n_buckets))
    try:
        yield
    finally:
        s.conf.set("spark.sql.adaptive.enabled", saved_aqe)
        s.conf.set("spark.sql.shuffle.partitions", saved_sp)


def _has_state(state_dir: str) -> bool:
    # first batch: the directory (or its first commit) does not exist
    # yet. The probe is "any committed bucket= partition directory" —
    # NOT a _SUCCESS marker: the dynamic-partition-overwrite commits
    # these folds use don't write one (verified on Spark 4.1), and the
    # staging output a crashed job leaves behind lives under dotted
    # temporary dirs that never match the bucket= prefix.
    return os.path.isdir(state_dir) and any(
        name.startswith("bucket=") for name in os.listdir(state_dir)
    )


def _check_epoch(state_dir: str, epoch: str) -> bool:
    """Fail loudly when a NEW batch-id sequence meets standing fenced
    state. foreachBatch batch ids are monotone only within one
    checkpoint; re-pointing a FRESH checkpoint (ids restart at 0) at
    existing additive state would make the ``_b`` fence silently
    swallow every early batch as a "replay" — data loss with no error.
    The state directory therefore carries an ``_epoch`` stamp (the
    caller's checkpoint identity); a mismatch against standing state
    raises instead of merging.

    Returns True when an UNSTAMPED standing table (built before the
    guard existed, or the marker was lost) is a candidate for adoption
    this call. Adoption is NOT stamped here: the stamp cannot
    distinguish that table's old batch-id frontier from the caller's
    sequence, so the FOLD first checks for a fence conflict (any
    standing ``max(_b) >= batch_id``) — a conflict raises WITHOUT
    stamping (the retry re-raises, loud and stable, instead of a
    stamped marker turning the retry into a silent skip), and a clean
    adoption is stamped via :func:`_stamp_epoch` before the data
    write, after which a crash-retry re-enters as a normal fenced
    replay. The fresh-creation path (no standing state) stamps
    immediately; a crash before the first data commit leaves
    marker-without-state, which re-enters creation harmlessly.
    """
    path = os.path.join(state_dir, _EPOCH_FILE)
    stored = None
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            stored = f.read()
    if stored == epoch:
        return False
    if stored is not None and _has_state(state_dir):
        raise RuntimeError(
            f"additive state at {state_dir} is fenced for checkpoint epoch "
            f"{stored!r} but this query runs under epoch {epoch!r}. A fresh "
            "checkpoint restarts batch ids at 0, which the per-bucket _b "
            "fence would misread as replays and silently drop. Either "
            "resume the original checkpoint, or deliberately migrate: "
            "delete the _epoch stamp AND reset the _b column (the fence is "
            "only meaningful within one batch-id sequence)."
        )
    if _has_state(state_dir):
        return True  # adoption candidate — fold stamps after its fence check
    _stamp_epoch(state_dir, epoch)
    return False


def _stamp_epoch(state_dir: str, epoch: str) -> None:
    os.makedirs(state_dir, exist_ok=True)
    path = os.path.join(state_dir, _EPOCH_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(epoch)
    os.replace(tmp, path)


def _stamp_monoid(state_dir: str, key: str, cols: dict[str, str]) -> None:
    """Stamp (or refresh) the monoid layout's merge sidecar: the key
    and per-column ops ``read_state`` needs to fold the log-structured
    segments back into one row per key. Batch-authoritative like the
    schema envelope — when a fold's ``cols`` evolve, the sidecar
    follows. Driver-side, one tiny JSON file, rewritten only on
    change."""
    doc = {"key": key, "cols": dict(cols)}
    path = os.path.join(state_dir, _MONOID_FILE)
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            if f.read() == json.dumps(doc):
                return
    os.makedirs(state_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(json.dumps(doc))
    os.replace(tmp, path)


def state_bucket_count(state_dir: str, default: int) -> int:
    """The layout's authoritative bucket count for READ-path pruning
    (ADVICE r13): a pruned read that hashes keys with a count the
    layout was not written with prunes the WRONG directories and
    silently misses standing rows — and unlike the fold path, a read
    has no merge step to catch it. Probes therefore take the modulus
    FROM the ``_n_buckets`` marker the folds stamp and
    ``rebucket_state`` carries, so read-path pruning can never disagree
    with the on-disk layout; ``default`` (the caller's configured
    count) applies only before the first fold stamps the marker — when
    there is no committed state to prune against anyway."""
    path = os.path.join(state_dir, _LAYOUT_FILE)
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            return int(f.read())
    return default


def _check_layout(state_dir: str, n_buckets: int, spark, key: str) -> None:
    """Fail loudly when a fold's ``n_buckets`` disagrees with the
    layout on disk. The hazard is rebucket_state's twin footgun: after
    a migration to B'=32, a caller still configured with B=8 would
    hash a key into bucket 13's row... under bucket 5 — the touched-
    bucket pruning then READS THE WRONG DIRECTORIES, the standing row
    is never merged, and the key silently ends up with DUPLICATE rows
    in state. The bucket count is therefore stamped into the layout
    (``_n_buckets``) at creation, carried by rebucket_state, and
    checked on every fold.

    Adopting a pre-stamp layout is NOT taken on faith (the epoch
    stamp's adoption policy would be unsafe here — a mismatched count
    is exactly the hazard, and bucket-id ranges alone can't prove a
    match in either direction): adoption VERIFIES, once, that every
    standing row satisfies bucket == pmod(xxhash64(key), n_buckets) —
    a single column-pruned scan of (key, partition column) returning
    one count — and raises when any row disagrees.
    """
    path = os.path.join(state_dir, _LAYOUT_FILE)
    stored = None
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            stored = int(f.read())
    if stored == n_buckets:
        return
    if stored is not None and _has_state(state_dir):
        raise RuntimeError(
            f"state at {state_dir} is laid out with n_buckets={stored} but "
            f"this fold is configured with n_buckets={n_buckets}. Folding "
            "with a mismatched bucket count prunes the standing read to the "
            "WRONG directories and silently duplicates keys. Update the "
            "caller's n_buckets to match the layout (it changes only via "
            "rebucket_state, which restamps the marker)."
        )
    if stored is None and _has_state(state_dir):
        bad = (
            spark.read.parquet(state_dir)
            .filter(
                F.col("bucket")
                != F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
            )
            .limit(1)
            .count()
        )
        if bad:
            raise RuntimeError(
                f"unstamped state at {state_dir} does NOT match "
                f"n_buckets={n_buckets}: standing rows hash to different "
                "buckets under this count. Determine the layout's real "
                "bucket count (or rebucket_state it) before folding — "
                "adopting the wrong count would silently duplicate keys."
            )
    os.makedirs(state_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(n_buckets))
    os.replace(tmp, path)


def bucketed_latest_fold(
    state_dir: str,
    *,
    key: str,
    order_cols: tuple[str, ...],
    n_buckets: int = 16,
    touched_log: list[tuple[int, tuple[int, ...]]] | None = None,
    bucket_col: str | None = None,
    immutable: bool = False,
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch(fold) maintaining a latest-wins keyed state
    table at ``state_dir``, bucket-partitioned; per batch only touched
    buckets are read and rewritten. ``order_cols`` rank DESC and must
    be total per key (append a unique id). ``touched_log``, if given,
    receives (batch_id, touched_buckets) — driver-side, bounded by
    n_buckets per entry — so tests and ops can assert write locality.

    ``bucket_col`` decouples co-location from identity: by default the
    layout buckets on ``key`` (pure keyed state), but an INDEX-shaped
    consumer — the streaming ER record store, where rows are keyed by
    record id but every LOOKUP is by block key — buckets on the lookup
    column instead, so a reader pruning to a block's bucket finds ALL
    records of that block in one partition directory. The column rides
    the layout stamp (the ``_n_buckets`` check verifies bucket ==
    pmod(xxhash64(bucket_col)) on adoption), and latest-wins dedup
    still runs per ``key``.

    ``bucket_col`` CONTRACT (ADVICE r12): the column must be a pure
    function of the KEY — equivalently, immutable per key across
    versions. Latest-wins placement is per row, so if a key's later
    version computed a DIFFERENT bucket_col (a record update changing
    its block key), the old version would sit untouched in the old
    bucket and ``read_state`` would silently return duplicate rows for
    that key; the per-row ``_n_buckets`` layout check can never catch
    this (each row's bucket matches its own bucket_col). The fold
    therefore ASSERTS functional dependence per batch: within the rows
    it can see (standing rows of touched buckets ∪ the batch), every
    key must map to exactly one bucket, or the fold dies loudly
    instead of mis-placing state. The one blind spot — a key whose
    stale version lives in a bucket this batch never touches — is
    structural (checking it would need a full-state scan per batch);
    callers needing mutable placement keys must tombstone the old
    bucket explicitly or bucket on the key itself.

    ``immutable=True`` (r14 optimization round): for stores whose rows
    NEVER change once written — element/band/vector/record stores,
    where ``order_cols`` is the key itself and latest-wins dedup is
    vacuous — the fold appends O(|batch|) bytes instead of rewriting
    every touched bucket's full contents. At 100 TB that is the
    difference between O(delta) and O(state/n_buckets × touched) write
    amplification per trigger (measured 2.3× faster at fixture scale
    on the largest element store, and asymptotically the only shape
    that scales). Mechanics: rows are stamped with a ``_b`` batch-id
    DATA column (the monoid fold's fence, reused) and appended under
    their bucket partitions; a replayed batch reads the touched
    buckets' per-bucket max(_b) (one column-pruned scan) and skips
    buckets already at/above its id — append never double-applies.
    ``read_state`` already drops ``_b``; probes select explicit
    columns. Contract (caller-guaranteed): a key's row — including its
    bucket_col — is identical wherever it reappears, so skipped
    re-appends lose nothing; the schema is frozen for the store's
    lifetime (append never rewrites old files — evolve via
    rebucket_state, which compacts). Batch-internal key uniqueness is
    no longer taken on faith (ADVICE r14): the append rides a
    per-(key, bucket) aggregation — satisfied by the write's own
    bucket partitioning, so it adds NO exchange — that dies loudly on
    a key duplicated within its bucket instead of silently appending
    duplicate state. The one blind spot, a key whose bucket_col drifts
    ACROSS buckets within a batch, would need an exchange on the key
    to check; it remains contract (the mutable path's FD assert had
    the mirror-image blind spot: a key whose stale version lives in an
    untouched bucket).

    File growth is bounded (r15): each batch appends ≤1 file per
    touched bucket, and a touched bucket whose segment count reaches
    ``_COMPACT_SEGMENTS`` is folded down to ONE file by that same
    batch (rows and their ``_b`` stamps carried verbatim, so the
    per-bucket fence — max(_b) — is preserved exactly); the fence scan
    therefore reads a bounded number of footers per bucket forever.

    r15, committed-frontier fast path (both append-mode folds): within
    one fold closure batch ids are monotone and the closure is the
    state's only writer (the foreachBatch contract), so a batch id
    STRICTLY ABOVE the closure's last-committed id cannot be a replay
    — the touched-bucket collect and the fence scan are skipped and
    the whole fold is ONE job (the append write). The first call of a
    closure (a fresh process — exactly where a replay can arrive) and
    any id at/below the frontier take the fenced path unchanged.
    ``touched_log`` also disables the fast path: its contract is the
    exact per-batch touched list.
    """
    bcol = bucket_col or key
    frontier: list[int | None] = [None]  # this closure's committed max id

    def _imm_append(s, rows, batch_id: int, todo) -> None:
        """Append-mode write: batch rows (restricted to ``todo`` when
        given) land as one new segment per bucket; touched buckets at
        the segment threshold are compacted in the same call. The
        per-(key, bucket) uniqueness guard rides the append's own
        partitioning (see docstring)."""
        out = rows if todo is None else rows.filter(
            F.col("bucket").isin(list(todo))
        )
        out = out.withColumn("_b", F.lit(batch_id).cast("long"))
        payload = [c for c in out.columns if c not in (key, "bucket")]
        guard = F.coalesce(
            F.assert_true(
                F.col("_n") == 1,
                F.concat(
                    F.lit(
                        f"bucketed_latest_fold(immutable) at {state_dir}: "
                        "batch is not key-unique within bucket — appending "
                        "would create silent duplicate state rows. "
                        "Offending key: "
                    ),
                    F.col(key).cast("string"),
                ),
            ).cast("int"),
            F.lit(0),
        )
        checked = (
            out.repartition(n_buckets, F.col("bucket"))
            .groupBy(key, "bucket")
            .agg(*[F.first(c).alias(c) for c in payload], F.count(F.lit(1)).alias("_n"))
            .withColumn("_n", guard)
            .filter(F.col("_n") == 0)
            .select(*out.columns)
        )
        counts = _bucket_file_counts(state_dir)
        over = {b for b, c in counts.items() if c >= _COMPACT_SEGMENTS}
        if over and todo is None:
            with _plan_pinned(s, n_buckets):
                todo = tuple(
                    sorted(
                        r[0]
                        for r in rows.select("bucket").distinct().collect()
                    )
                )
        compact = sorted(over & set(todo)) if todo is not None else []
        append_part = (
            checked
            if not compact
            else checked.filter(~F.col("bucket").isin(compact))
        )
        plain = todo is not None and len(compact) == len(todo)
        if not plain:
            with _plan_pinned(s, n_buckets):
                append_part.write.partitionBy("bucket").mode("append").parquet(
                    state_dir
                )
        if compact:
            # fold the bucket's segments + this batch down to one file;
            # every row keeps its own _b, so per-bucket max(_b) — the
            # fence — is carried exactly
            standing = (
                s.read.schema(checked.schema)
                .parquet(state_dir)
                .filter(F.col("bucket").isin(compact))
            )
            merged = standing.unionByName(
                checked.filter(F.col("bucket").isin(compact))
            ).repartition(len(compact), F.col("bucket"))
            saved = s.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                with _plan_pinned(s, n_buckets):
                    merged.write.partitionBy("bucket").mode(
                        "overwrite"
                    ).parquet(state_dir)
            finally:
                s.conf.set("spark.sql.sources.partitionOverwriteMode", saved)

    def fold(
        batch_df: DataFrame, batch_id: int, touched_hint=None
    ) -> None:
        s = batch_df.sparkSession
        _check_layout(state_dir, n_buckets, s, bcol)
        rows = batch_df.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(bcol)), F.lit(n_buckets)).cast("int")
        )
        if (
            immutable
            and touched_log is None
            and touched_hint is None
            and frontier[0] is not None
            and batch_id > frontier[0]
        ):
            # committed-frontier fast path: provably not a replay, so
            # no touched collect and no fence scan — one append job
            _imm_append(s, rows, batch_id, None)
            frontier[0] = batch_id
            return
        if touched_hint is not None:
            # caller-computed EXACT touched set (driver-local batches:
            # the label step knows its change rows) — the driver-side
            # spark_bucket twin is bit-equal to pmod(xxhash64(·)),
            # pinned in tests. Must be exact: a superset only wastes a
            # pruned read; a SUBSET would silently duplicate keys.
            touched = tuple(sorted(set(touched_hint)))
        else:
            with _plan_pinned(s, n_buckets):
                touched = tuple(
                    sorted(r[0] for r in rows.select("bucket").distinct().collect())
                )
        if touched_log is not None:
            touched_log.append((batch_id, touched))
        if not touched:  # empty batch (e.g. a no-data trigger): no-op
            return
        if immutable:
            todo = touched
            if _has_state(state_dir):
                # replay fence: per-bucket max(_b) over the touched
                # buckets (column-pruned scan — reads two thin columns,
                # never payloads); buckets already stamped with this or
                # a later batch were committed by a previous attempt
                with _plan_pinned(s, n_buckets):
                    applied = {
                        r["bucket"]
                        for r in s.read.parquet(state_dir)
                        .filter(F.col("bucket").isin(list(touched)))
                        .groupBy("bucket")
                        .agg(F.max("_b").alias("mb"))
                        .filter(F.col("mb") >= batch_id)
                        .collect()
                    }
                todo = tuple(b for b in touched if b not in applied)
                if not todo:
                    frontier[0] = max(frontier[0] or -1, batch_id)
                    return
            _imm_append(s, rows, batch_id, todo)
            frontier[0] = max(frontier[0] or -1, batch_id)
            return
        if _has_state(state_dir):
            # the batch schema is authoritative (add-only evolution, see
            # module docstring): reading standing files THROUGH it NULL-
            # fills columns the batch just added, drops columns the batch
            # stopped sending, and skips footer-based schema inference
            standing = s.read.schema(rows.schema).parquet(state_dir).filter(
                F.col("bucket").isin(list(touched))
            )
            rows = standing.unionByName(rows)
        # latest-wins via max_by over the (order_cols) struct — r14
        # optimization round: one partially-aggregating HashAggregate
        # replaces the previous Exchange+Sort+Window(row_number) (the
        # map side pre-selects each key's local winner, so the exchange
        # carries at most one row per key per map partition and no full
        # sort runs; measured ~20% off every fold write at fixture
        # scale, and strictly fewer shuffled bytes at any scale — guide
        # §2.3 "aggregate before you shuffle"). Winner identity is
        # unchanged: struct comparison is lexicographic by field with
        # NULL fields smallest, exactly the desc/NULLS-LAST row_number
        # ranking; ties are impossible across distinct payloads by the
        # caller contract (total (order_cols, key) ranking), and
        # replay-duplicate rows tie only with byte-identical rows.
        payload = [c for c in rows.columns if c != key]
        aggs = [
            F.max_by(
                F.struct(*payload), F.struct(*[F.col(c) for c in order_cols])
            ).alias("_w")
        ]
        # bucket_col functional-dependence assert (ADVICE r12): rides
        # the SAME per-key aggregation (min/max of bucket in the same
        # partial agg — no extra exchange) and is folded into a filter
        # so column pruning cannot elide it — a key seen in two buckets
        # among the rows this batch reads is a contract violation that
        # would otherwise become silent duplicate state. Skipped when
        # bucketing on the key itself (FD by construction).
        fd_check = bucket_col is not None and bucket_col != key
        if fd_check:
            aggs += [
                F.min("bucket").alias("_bmin"),
                F.max("bucket").alias("_bmax"),
            ]
        g = rows.groupBy(key).agg(*aggs)
        if fd_check:
            fd_ok = F.coalesce(
                F.assert_true(
                    F.col("_bmin") == F.col("_bmax"),
                    F.concat(
                        F.lit(
                            f"bucketed_latest_fold at {state_dir}: bucket_col "
                            f"{bcol!r} is not a pure function of key {key!r} "
                            "— one key maps to multiple buckets, which "
                            "latest-wins placement would turn into silent "
                            "duplicate rows. Offending key: "
                        ),
                        F.col(key).cast("string"),
                    ),
                ).cast("int"),
                F.lit(0),
            )
        else:
            fd_ok = F.lit(0)
        merged = (
            g.withColumn("_fd", fd_ok)
            .filter(F.col("_fd") == 0)
            .select(key, "_w.*")
            .select(*rows.columns)  # restore the layout's column order
            # cluster writers by bucket: ONE file per touched bucket per
            # batch instead of (shuffle tasks × buckets) shards — the
            # small-file guard; the aggregation already shuffled by key,
            # so this moves only the touched buckets' winners once more
            # (n_buckets target partitions, not shuffle.partitions —
            # no point scheduling more writer tasks than buckets)
            .repartition(n_buckets, F.col("bucket"))
        )
        saved = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            with _plan_pinned(s, n_buckets):
                merged.write.partitionBy("bucket").mode("overwrite").parquet(
                    state_dir
                )
        finally:
            s.conf.set("spark.sql.sources.partitionOverwriteMode", saved)

    # layout facts for callers that compute touched_hint driver-side
    fold.n_buckets = n_buckets
    fold.key = key
    fold.bucket_col = bcol
    return fold


def bucketed_additive_fold(
    state_dir: str,
    *,
    key: str,
    sum_cols: tuple[str, ...],
    n_buckets: int = 16,
    touched_log: list[tuple[int, tuple[int, ...]]] | None = None,
    epoch: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch(fold) maintaining an ADDITIVE keyed state
    table (running SUMs per key; encode COUNT as a lit(1) column and
    deletes/retractions as signed values) with the same bucket-local
    write discipline as ``bucketed_latest_fold``.

    Unlike latest-wins, an additive merge is NOT naturally idempotent:
    a replayed batch would double-add. Fencing is stored IN the state
    itself — every row carries ``_b``, the batch_id whose append last
    wrote its bucket. Per batch: buckets whose standing ``max(_b)`` is
    already >= batch_id are SKIPPED entirely (not even touched — a
    full replay leaves their files byte-identical, which the tests pin
    at the file level); the rest receive the batch's per-key partials
    as a new log segment stamped ``_b = batch_id`` (see
    :func:`bucketed_monoid_fold` for the r15 log-structured layout —
    reads merge segments, a threshold compacts them). Because a
    bucket's partition commit is atomic at job commit, a replay
    observes either the pre-batch state (re-applies — correct) or the
    post-batch stamp (skips — correct) per bucket. On an object store
    without atomic job commit the same discipline rides a
    transactional table format (Delta / Iceberg MERGE), where data and
    fence commit together.

    The batch is partially aggregated per (key, bucket) BEFORE the
    merge — map-side combine keeps the shuffle O(distinct batch keys),
    and the standing read prunes to touched buckets, so per-batch cost
    is O(|batch| + touched buckets), never O(|state|).

    The ``_b`` fence is only meaningful within ONE monotone batch-id
    sequence — i.e. one checkpoint. Pass ``epoch`` (any stable string
    identifying the checkpoint, e.g. its directory path) and the fold
    stamps the state directory with it and REFUSES to merge when a
    different epoch meets standing state, instead of silently
    swallowing the restarted ids 0..N as replays (see ``_check_epoch``).
    ``epoch=None`` keeps the unguarded legacy behavior for callers that
    manage the invariant themselves.
    """
    return bucketed_monoid_fold(
        state_dir,
        key=key,
        cols={c: "sum" for c in sum_cols},
        n_buckets=n_buckets,
        touched_log=touched_log,
        epoch=epoch,
    )


#: merge operators a fenced fold may carry per column. Correctness
#: requirement: the ``_b`` fence applies each batch to each bucket
#: EXACTLY once, so the op need not be idempotent — it must only be
#: associative and commutative across batches (every entry here is),
#: with NULL = "no contribution" (Spark aggregates ignore NULLs, so a
#: key silent in a batch, or a column added mid-evolution, composes
#: correctly on every op, not just sum).
_MONOID_OPS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "bit_or": F.bit_or,
    "bit_and": F.bit_and,
}


def bucketed_monoid_fold(
    state_dir: str,
    *,
    key: str,
    cols: dict[str, str],
    n_buckets: int = 16,
    touched_log: list[tuple[int, tuple[int, ...]]] | None = None,
    epoch: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """The additive fold generalized to per-column MONOIDS: ``cols``
    maps each state column to its merge op — ``sum`` / ``min`` /
    ``max`` / ``bit_or`` / ``bit_and`` — and the fold maintains, per
    key, the op-fold of every contribution ever delivered, under the
    exact same bucket-local write discipline, ``_b`` replay fence,
    checkpoint-epoch stamp, layout guard and ADD-only schema-evolution
    envelope as :func:`bucketed_additive_fold` (which is now the
    all-``sum`` special case of this).

    Why the fence makes this sound for NON-idempotent, NON-invertible
    ops: the per-bucket ``_b`` stamp guarantees each batch's partial is
    merged into each bucket exactly once, so the only algebra the op
    must supply is associativity + commutativity ACROSS batches (batch
    arrival order is not deterministic under retries). Sum, min, max
    and the bitwise ops all qualify; means/variances ride as (sum,
    count) pairs; distinct-ish state rides bit_or over register words
    (the portable-HLL/bitmap pattern). What canNOT ride: any op needing
    retraction (min over a stream with DELETES — a retracted minimum is
    unrecoverable without a full re-fold) — that is matview territory,
    not a fold.

    All state columns are ``long`` (the fold casts) — encode dates as
    epoch days, decimals as scaled integers, register words as longs;
    exactness end-to-end is the point of the fenced fold.

    Cost shape (r15, log-structured): per batch, one map-side-combined
    partial aggregation of the batch (O(distinct batch keys) on the
    exchange) APPENDED as a new segment under the touched bucket
    partitions — the standing contents are no longer read or rewritten
    per trigger (the same O(delta) discipline the immutable latest
    fold got in r14, here for MUTABLE monoid state: the segments are
    partials and the monoid's own associativity merges them). The
    folded value is produced on READ: ``read_state`` recognizes the
    layout via the ``_monoid.json`` sidecar (key + per-column ops,
    stamped by this fold) and merges segments with the declared ops —
    reads pay one aggregation; writes stop paying O(touched-bucket
    contents) every trigger. A touched bucket whose segment count
    reaches ``_COMPACT_SEGMENTS`` is folded down to one segment by
    that same batch (its rows re-aggregated per key; the compacted
    rows carry max(_b) of their contributors per key, so the
    per-bucket fence is preserved exactly). The ``_b`` replay fence,
    checkpoint-epoch stamp, layout guard and ADD-only schema-evolution
    envelope are unchanged — a replayed batch's partial is simply
    never appended to a bucket whose fence already covers it. Standing
    pre-r15 layouts (fully-merged rows) upgrade in place: a merged row
    is just a segment whose value happens to cover every prior batch.

    The committed-frontier fast path (see ``bucketed_latest_fold``)
    applies: a batch id strictly above this closure's last committed
    id cannot be a replay, so the touched collect and fence scan are
    skipped and the fold is ONE job.
    """
    bad = {c: op for c, op in cols.items() if op not in _MONOID_OPS}
    if bad:
        raise ValueError(
            f"unsupported monoid op(s) {bad}; supported: {sorted(_MONOID_OPS)}"
        )
    aggs = [_MONOID_OPS[op](c).cast("long").alias(c) for c, op in cols.items()]
    frontier: list[int | None] = [None]  # this closure's committed max id

    def _append_segments(s, partial, batch_id: int, todo) -> None:
        """Append the batch's partials (restricted to ``todo`` when
        given) as one segment per touched bucket; compact any touched
        bucket at the segment threshold in the same call."""
        part = partial if todo is None else partial.filter(
            F.col("bucket").isin(list(todo))
        )
        counts = _bucket_file_counts(state_dir)
        over = {b for b, c in counts.items() if c >= _COMPACT_SEGMENTS}
        if over and todo is None:
            with _plan_pinned(s, n_buckets):
                todo = tuple(
                    sorted(
                        r[0]
                        for r in part.select("bucket").distinct().collect()
                    )
                )
                part = part.localCheckpoint(eager=True)
        compact = sorted(over & set(todo)) if todo is not None else []
        if not (todo is not None and len(compact) == len(todo)):
            with _plan_pinned(s, n_buckets):
                (
                    part.filter(~F.col("bucket").isin(compact))
                    if compact
                    else part
                ).repartition(n_buckets, F.col("bucket")).write.partitionBy(
                    "bucket"
                ).mode("append").parquet(state_dir)
        if compact:
            # fold the bucket's segments + this batch's partial down to
            # one row per key; max(_b) per key keeps the bucket's fence
            # (= max over rows) exactly where it was
            standing = (
                s.read.schema(partial.schema)
                .parquet(state_dir)
                .filter(F.col("bucket").isin(compact))
            )
            merged = (
                standing.unionByName(part.filter(F.col("bucket").isin(compact)))
                .groupBy(key, "bucket")
                .agg(*aggs, F.max("_b").alias("_b"))
                .repartition(len(compact), F.col("bucket"))
            )
            saved = s.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                with _plan_pinned(s, n_buckets):
                    merged.write.partitionBy("bucket").mode(
                        "overwrite"
                    ).parquet(state_dir)
            finally:
                s.conf.set("spark.sql.sources.partitionOverwriteMode", saved)

    def fold(
        batch_df: DataFrame, batch_id: int, touched_hint=None
    ) -> None:
        s = batch_df.sparkSession
        _check_layout(state_dir, n_buckets, s, key)
        _stamp_monoid(state_dir, key, cols)
        adopted = False
        if epoch is not None:
            adopted = _check_epoch(state_dir, epoch)
        partial = (
            batch_df.withColumn(
                "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
            )
            .groupBy(key, "bucket")
            .agg(*aggs)
            .withColumn("_b", F.lit(batch_id).cast("long"))
        )
        if (
            not adopted
            and touched_log is None
            and touched_hint is None
            and frontier[0] is not None
            and batch_id > frontier[0]
        ):
            # committed-frontier fast path: provably not a replay (see
            # bucketed_latest_fold) — one append job, no collects
            _append_segments(s, partial, batch_id, None)
            frontier[0] = batch_id
            return
        if touched_hint is not None:
            touched = tuple(sorted(set(touched_hint)))
        else:
            with _plan_pinned(s, n_buckets):
                touched = tuple(
                    sorted(
                        r[0]
                        for r in partial.select("bucket").distinct().collect()
                    )
                )
        todo = touched
        if _has_state(state_dir):
            if adopted:
                # adoption soundness is a GLOBAL property: the unstamped
                # table's whole _b frontier (not just the touched
                # buckets') must be behind this batch id, else its
                # sequence cannot be verified as this checkpoint's. One
                # single-column agg over the fence column only.
                adopt_frontier = (
                    s.read.schema(partial.schema)
                    .parquet(state_dir)
                    .agg(F.max("_b"))
                    .collect()[0][0]
                )
                if adopt_frontier is not None and adopt_frontier >= batch_id:
                    # raise WITHOUT stamping: the retry re-raises, loud
                    # and stable, instead of a stamped marker turning
                    # the retry into a silent skip (the r9 footgun)
                    raise RuntimeError(
                        f"standing state at {state_dir} has no _epoch stamp "
                        f"and its _b frontier ({adopt_frontier}) already "
                        f"covers batch_id {batch_id} — its batch-id "
                        "sequence cannot be verified as this checkpoint's, "
                        "and skipping would silently drop batches. Resume "
                        "the original checkpoint, or deliberately migrate "
                        "(reset _b / stamp _epoch by hand)."
                    )
                # clean adoption: stamp BEFORE the data write so a
                # crash-retry re-enters as a normal fenced replay
                _stamp_epoch(state_dir, epoch)
            # batch-authoritative schema (add-only evolution): a new sum
            # column is NULL-filled from pre-evolution files; sum() then
            # yields NULL for keys with no contribution since it appeared
            if touched:
                # replay fence: buckets already stamped with this (or a
                # later) batch_id were committed by a previous attempt —
                # bounded collect, <= n_buckets rows
                standing = (
                    s.read.schema(partial.schema)
                    .parquet(state_dir)
                    .filter(F.col("bucket").isin(list(touched)))
                )
                with _plan_pinned(s, n_buckets):
                    applied = {
                        r["bucket"]
                        for r in standing.groupBy("bucket")
                        .agg(F.max("_b").alias("mb"))
                        .filter(F.col("mb") >= batch_id)
                        .collect()
                    }
                todo = tuple(b for b in touched if b not in applied)
            if not todo:
                if touched_log is not None:
                    touched_log.append((batch_id, ()))
                frontier[0] = max(frontier[0] or -1, batch_id)
                return
        if touched_log is not None:
            touched_log.append((batch_id, todo))
        if not todo:
            return
        _append_segments(s, partial, batch_id, todo)
        frontier[0] = max(frontier[0] or -1, batch_id)

    # layout facts for callers that compute touched_hint driver-side
    fold.n_buckets = n_buckets
    fold.key = key
    fold.bucket_col = key
    return fold


def compact_expired_tombstones(
    spark,
    state_dir: str,
    expired,  # Column: true for rows to physically remove
    probe_buckets=None,  # optional bucket ids bounding the dirty probe
) -> tuple[int, ...]:
    """Retention sweep over a bucketed state table: physically remove
    rows matching ``expired``, rewriting ONLY the buckets that contain
    at least one such row. Returns the dirty bucket ids (bounded by
    the layout's bucket count).

    The emptied-bucket hazard (the bucket-level twin of the matview
    emptied-day case): a dirty bucket whose EVERY row expires has no
    rows in the output, and dynamic partition overwrite only replaces
    partitions PRESENT in the output — the stale files would silently
    survive. Buckets with survivors ride dynamic overwrite; fully
    emptied buckets get a targeted empty overwrite of their own
    directory (replaces the files with an empty commit), so the sweep
    is correct whatever the expiry pattern. All driver-side lists here
    are bucket ids — bounded, tiny.

    Cost shape: the dirty-bucket PROBE is a full column-pruned scan of
    the state (``expired`` is a data predicate, not a partition filter
    — parquet row-group stats skip most pages, but every bucket is
    opened); only the REWRITE is dirty-bucket-local. That is the right
    trade for a scheduled retention sweep; to bound the probe too,
    maintain a per-bucket min-tombstone-timestamp sidecar and prune to
    buckets behind the horizon.

    A NULL ``expired`` (e.g. the predicate references a column that is
    NULL for some rows) means KEEP on every path: it neither marks a
    bucket dirty nor drops the row from a bucket made dirty by another
    row — normalized once below so the two filters cannot disagree.

    ``probe_buckets`` (r14) is the sidecar bound the cost-shape note
    above prescribes: a caller that TRACKS which buckets can hold
    expired rows (e.g. the indexed-label step's tombstone-version
    sidecar) passes them and the dirty probe becomes a static bucket
    partition filter instead of a full-state scan; an EMPTY iterable
    short-circuits with zero Spark jobs. The bound must be
    conservative (a superset of the truly dirty buckets) — rows
    outside it are silently kept, which for retention sweeps is the
    safe direction (GC delayed, never wrong). ``None`` keeps the full
    probe.
    """
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    if probe_buckets is not None:
        probe_buckets = sorted(set(probe_buckets))
        if not probe_buckets:
            return ()
    expired = F.coalesce(expired, F.lit(False))
    state = spark.read.option("mergeSchema", "true").parquet(state_dir)
    if probe_buckets is not None:
        state = state.filter(F.col("bucket").isin(probe_buckets))
    dirty = tuple(
        sorted(
            r[0]
            for r in state.filter(expired).select("bucket").distinct().collect()
        )
    )
    if not dirty:
        return dirty
    survivors = state.filter(F.col("bucket").isin(list(dirty))).filter(~expired)
    surviving = {
        r[0] for r in survivors.select("bucket").distinct().collect()
    }
    if surviving:
        saved = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            survivors.repartition(len(surviving), F.col("bucket")).write.partitionBy(
                "bucket"
            ).mode("overwrite").parquet(state_dir)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)
    empty = spark.createDataFrame([], survivors.drop("bucket").schema)
    for b in dirty:
        if b not in surviving:
            empty.write.mode("overwrite").parquet(f"{state_dir}/bucket={b}")
    return dirty


def read_state(spark, state_dir: str) -> DataFrame:
    """The maintained table, layout/fencing columns dropped (bucket and
    _b are implementation details, not part of the keyed-state
    contract). mergeSchema: mid-evolution the layout is legitimately
    mixed-schema (touched buckets carry the added column, untouched
    ones not yet), so the read must merge footers, not trust one file.

    Log-structured monoid layouts (r15): when the ``_monoid.json``
    sidecar is present the directory holds per-batch PARTIALS, and the
    read merges them with the declared ops — one aggregation on the
    read path buys O(delta) writes on every trigger. The merge is
    keyed on the layout's key alone (not the bucket), so a rebucketed
    layout reads identically; NULL composes as "no contribution"
    exactly as in the fold (a column added mid-evolution is NULL for
    keys with no contribution since it appeared, matching the eager
    path's envelope).
    """
    df = (
        spark.read.option("mergeSchema", "true").parquet(state_dir).drop("bucket")
    )
    mpath = os.path.join(state_dir, _MONOID_FILE)
    if os.path.exists(mpath):
        with open(mpath, encoding="utf-8") as f:
            doc = json.load(f)
        aggs = [
            _MONOID_OPS[op](c).cast("long").alias(c)
            for c, op in doc["cols"].items()
        ]
        return df.groupBy(doc["key"]).agg(*aggs)
    return df.drop("_b") if "_b" in df.columns else df


def rebucket_state(
    spark, state_dir: str, *, key: str, new_n_buckets: int
) -> tuple[int, ...]:
    """Migrate a bucketed state table to a new bucket count — the ops
    half of the layout: ``n_buckets`` is frozen into the directory at
    creation, and a keyspace that outgrows its bucket sizing needs ONE
    reshuffle, not a hand-rolled rewrite. Returns the new layout's
    bucket ids.

    One shuffle: read everything (mergeSchema — a mid-evolution layout
    migrates too), recompute ``bucket = pmod(xxhash64(key), new_B)``,
    write the new layout to a sibling staging directory, then swap
    directories. Every non-layout column — including the additive
    fold's per-row ``_b`` fence stamp and the ``_epoch`` checkpoint
    stamp — is carried verbatim, so replay fencing survives: a replayed
    batch sees ``max(_b)`` per NEW bucket >= the stamp of every old
    bucket that contributed rows, and skips exactly as before.

    QUIESCE FIRST. The fence is per-bucket, so mixing rows from an old
    bucket stamped through batch N with rows from one stamped through
    N-1 (a crash mid-batch) makes the merged bucket's ``max(_b)`` lie
    for the lagging keys — a replay of batch N would be skipped for
    rows that never received it. Run this only with the stream stopped
    after a clean drain (every touched bucket stamped to the same
    frontier), which is also what makes the directory swap safe.

    The swap is two renames, not one atomic op: a crash in between
    leaves ``<state_dir>.rebucket.old`` holding the intact pre-
    migration state and possibly no ``state_dir`` — recovery is to
    rename it back. On an object store, do this as a table-format
    REPLACE instead; this is the local/HDFS layout-layer shape.
    """
    if not _has_state(state_dir):
        raise ValueError(f"no committed state at {state_dir}")
    df = (
        spark.read.option("mergeSchema", "true").parquet(state_dir).drop("bucket")
    )
    out = df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(new_n_buckets)).cast("int")
    )
    base = state_dir.rstrip("/")
    tmp, old = base + ".rebucket.tmp", base + ".rebucket.old"
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    out.repartition(new_n_buckets, F.col("bucket")).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(tmp)
    # carry every top-level metadata sidecar (`_epoch`, the indexed-
    # label step's `_tomb_vmin.json`, ...) into the new layout verbatim
    # — a sidecar that stamps the bucket count it was written under
    # (and any correct sidecar must, since bucket-scoped facts do not
    # survive a re-bucket) reads as STALE afterwards and repairs itself
    # conservatively; silently DROPPING it instead would read as
    # "fresh state", which for the tomb-vmin bound means the migrated
    # tombstones are never probed again. `_SUCCESS` belongs to the new
    # write and `_n_buckets` is restamped below.
    for name in os.listdir(state_dir):
        src = os.path.join(state_dir, name)
        if (
            name.startswith("_")
            and name not in ("_SUCCESS", _LAYOUT_FILE)
            and os.path.isfile(src)
        ):
            shutil.copy2(src, os.path.join(tmp, name))
    with open(os.path.join(tmp, _LAYOUT_FILE), "w", encoding="utf-8") as f:
        f.write(str(new_n_buckets))
    os.rename(state_dir, old)
    os.rename(tmp, state_dir)
    shutil.rmtree(old)
    return tuple(
        sorted(
            int(name.split("=", 1)[1])
            for name in os.listdir(state_dir)
            if name.startswith("bucket=")
        )
    )
