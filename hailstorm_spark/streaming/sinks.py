"""Streaming sinks: global top-k re-rank + exactly-once writers.

The reference's sink rewrites top_words.txt every 500 tuples
(WordCountSample.hs:214-232) and explicitly EXCLUDES sinks from its
exactly-once guarantee (paper hailstorm.tex:400-403). Here the sink is
a foreachBatch function keyed by batch_id: Structured Streaming
replays a failed batch with the SAME batch_id, so any write that is
deterministic-by-batch_id (overwrite a per-batch path, upsert with
batch_id fencing) is exactly-once end-to-end — strictly stronger than
the reference.

Streaming global top-k (the reference topn → merge_sort stage pair) is
not expressible as a streaming sort; the idiomatic form is: keep the
running counts in the state store (update-mode aggregation), and in
each batch re-rank the *updated* aggregate and atomically publish.
That is the same partial-heap → final-merge algorithm the reference
hand-codes (WordCountSample.hs:121-132,185-188), executed per trigger.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk_memory_sink(
    counts: DataFrame,
    query_name: str,
    k: int = 20,
    count_col: str = "cnt",
    key_col: str = "word",
):
    """Publish the global top-k to an in-memory table each trigger
    (complete output mode) — the test/demo sink."""
    ranked = counts.orderBy(F.desc(count_col), F.asc(key_col)).limit(k)
    return (
        ranked.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
    )


def topk_file_sink(
    counts: DataFrame,
    path: str,
    checkpoint: str,
    k: int = 20,
    count_col: str = "cnt",
    key_col: str = "word",
):
    """Reference K2 parity: atomically rewrite a `word,count` file with
    the current global top-k on every trigger, idempotent by batch_id.

    The per-batch work is a k-row collect of an already-aggregated
    stream — the only driver-side materialization in the engine, and
    it is O(k), not O(data).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        top = (
            batch_df.orderBy(F.desc(count_col), F.asc(key_col))
            .limit(k)
            .collect()
        )

        def cell(v) -> str:
            # RFC 4180: whitespace-split words can still carry commas
            # and double quotes ('comma,' tokenizes as one word), and a
            # bare f-string write would shear such a row on read-back
            s = str(v)
            if any(ch in s for ch in ',"\r\n'):
                s = '"' + s.replace('"', '""') + '"'
            return s

        payload = "".join(f"{cell(r[key_col])},{r[count_col]}\n" for r in top)
        # atomic tmp+rename, same trick as the reference's snapshot
        # store (DirSnapshotStore.hs:23-29); rename makes replays of
        # the same batch_id harmless.
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        os.replace(tmp, path)

    return (
        counts.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )


def console_sink(df: DataFrame, output_mode: str = "update", num_rows: int = 20):
    """Reference K3 console sink (paper hailstorm.tex:392-399): print
    each micro-batch to stdout. Debug surface only — the console sink
    collects `num_rows` to the driver per trigger by design."""
    return (
        df.writeStream.outputMode(output_mode)
        .format("console")
        .option("numRows", str(num_rows))
        .option("truncate", "false")
    )


def db_upsert_sink(
    df: DataFrame,
    connect,
    table: str,
    key_cols: tuple[str, ...],
    value_cols: tuple[str, ...],
    checkpoint: str,
):
    """Reference K3 database sink with exactly-once upserts.

    ``connect`` is a zero-arg factory returning a DBAPI-style connection
    (tested against DuckDB in-sandbox; any transactional store works).
    Idempotency: a ``{table}__batches`` fencing table records applied
    batch_ids inside the SAME transaction as the data upsert, so a
    replayed batch (same batch_id after a crash) is a no-op — the sink
    is exactly-once even though Structured Streaming's contract for
    foreachBatch is at-least-once.

    The per-batch collect is O(updated keys) for an update-mode
    aggregate, not O(stream). For raw-row firehoses at scale, use the
    executor-side JDBC path (``batch_df.write.jdbc`` inside
    foreachBatch with the same fencing table) instead of a driver-side
    DBAPI connection.
    """
    write_batch = make_db_batch_writer(connect, table, key_cols, value_cols)
    return (
        df.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )


def make_db_batch_writer(
    connect, table: str, key_cols: tuple[str, ...], value_cols: tuple[str, ...]
):
    """The foreachBatch function behind ``db_upsert_sink``, exposed so
    the fencing contract is directly testable (same batch_id twice ⇒
    applied once)."""
    cols = tuple(key_cols) + tuple(value_cols)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = [tuple(r) for r in batch_df.select(*cols).collect()]
        con = connect()
        try:
            con.execute("BEGIN")
            con.execute(
                f"CREATE TABLE IF NOT EXISTS {table}__batches (batch_id BIGINT)"
            )
            seen = con.execute(
                f"SELECT count(*) FROM {table}__batches WHERE batch_id = {int(batch_id)}"
            ).fetchone()[0]
            if seen:
                con.execute("ROLLBACK")
                return
            key_pred = " AND ".join(f"{k} = ?" for k in key_cols)
            placeholders = ", ".join("?" for _ in cols)
            for row in rows:
                con.execute(
                    f"DELETE FROM {table} WHERE {key_pred}",
                    list(row[: len(key_cols)]),
                )
                con.execute(
                    f"INSERT INTO {table} VALUES ({placeholders})", list(row)
                )
            con.execute(
                f"INSERT INTO {table}__batches VALUES ({int(batch_id)})"
            )
            con.execute("COMMIT")
        finally:
            con.close()

    return write_batch


def exactly_once_json_dir_sink(df: DataFrame, out_dir: str, checkpoint: str):
    """Exactly-once directory sink: each batch writes (distributed,
    executor-side — nothing is collected to the driver) to a directory
    derived from batch_id with mode=overwrite. Structured Streaming
    replays a failed batch under the SAME batch_id, and overwrite of the
    per-batch directory makes the replay idempotent — the same fencing
    the per-file rename gave, at any batch size."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(out_dir, f"batch-{batch_id:010d}")
        batch_df.write.mode("overwrite").json(target)

    os.makedirs(out_dir, exist_ok=True)
    return (
        df.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
