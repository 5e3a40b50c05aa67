"""The bolt contract: stateful commutative-monoid aggregation.

The reference bolt (Processor.hs:42-53) is a 4-tuple
(emptyState, tupleToStateConverter, mergeFn, transformTupleFn) over an
opaque commutative monoid, with exactly-once state maintained by the
snapshot protocol. Spark's streaming aggregation IS this contract:
zero/update/merge map onto partial aggregation, the state store holds
per-key state across micro-batches, and checkpointing gives the same
exactly-once guarantee without any coordination code.

Two tiers:
- MonoidBolt: declarative — key columns + built-in aggregate
  expressions. The fast path (JVM, vectorized, RocksDB state store);
  covers every monoid the reference sample uses (count/sum/top-N).
- stateful_bolt: arbitrary Python state via applyInPandasWithState —
  the escape hatch for monoids Spark can't express. Arrow-batched;
  state must stay small per key (documented budget, not enforced).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


@dataclass(frozen=True)
class MonoidBolt:
    """Declarative bolt: groupBy(keys).agg(aggregates) in update mode.

    ``aggregates`` are ordinary aggregate Columns (F.count, F.sum,
    F.min/max, collect-free expressions). Commutativity is the user's
    obligation, exactly as in the reference (paper hailstorm.tex:273-276)
    — Spark's shuffle gives no ordering guarantee either.
    """

    keys: tuple[str, ...]
    aggregates: tuple[Column, ...] = field(default_factory=tuple)

    def apply(self, stream: DataFrame) -> DataFrame:
        return stream.groupBy(*self.keys).agg(*self.aggregates)


def streaming_word_counts(words: DataFrame, word_col: str = "word") -> DataFrame:
    """The reference count bolt (WordCountSample.hs:82-117): per-word
    running total, emitted on every update (output mode 'update')."""
    from pyspark.sql import functions as F

    return MonoidBolt(keys=(word_col,), aggregates=(F.count(F.lit(1)).alias("cnt"),)).apply(
        words
    )


def stateful_bolt(
    stream: DataFrame,
    keys: list[str],
    zero: Callable[[], object],
    lift: Callable[[object], object],
    merge: Callable[[object, object], object],
    finish: Callable[[tuple, object], list],
    output_schema: str,
    state_schema: str,
    encode_state: Callable[[object], tuple],
    decode_state: Callable[[tuple], object],
) -> DataFrame:
    """Arbitrary-monoid bolt via applyInPandasWithState.

    The 4 user functions are literally the reference's bolt record:
    zero ≡ emptyState, lift ≡ tupleToStateConverter, merge ≡ mergeFn,
    finish ≡ transformTupleFn (``finish(key, state) → rows``, where
    ``key`` is the grouping-key tuple — emitted rows almost always need
    it). State is checkpointed by the engine; on recovery the stream
    replays from logged offsets — ST5/ST7 for free.

    Scale: state is Arrow-serialized per key per batch; keep it O(k),
    e.g. a bounded heap, never an unbounded list.
    """
    import pandas as pd

    # Arrow maps output columns BY NAME — rows from finish() are
    # positional tuples, so stamp the schema's column names on them.
    # Parse via Spark's own DDL parser: naive comma-splitting breaks on
    # parameterized/nested types like decimal(10,2) or map<string,int>.
    from pyspark.sql.types import _parse_datatype_string

    out_cols = _parse_datatype_string(output_schema).fieldNames()

    def fn(key, pdf_iter, state):
        acc = decode_state(state.get) if state.exists else zero()
        for pdf in pdf_iter:
            for row in pdf.itertuples(index=False):
                acc = merge(acc, lift(row))
        state.update(encode_state(acc))
        yield pd.DataFrame(finish(key, acc), columns=out_cols)

    return stream.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(
    stream: DataFrame,
    keys: list[str],
    event_time: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication — the ingestion-time twin of the
    batch dedup operators (one output row per distinct key, state-store
    backed, exactly-once across restarts).

    With ``event_time`` set, uses dropDuplicatesWithinWatermark: a
    duplicate arriving within ``delay`` of the original is dropped and
    key state is EVICTED once the watermark passes — bounded memory on
    an endless stream (the production form for ingest dedup, where
    duplicates arrive in bursts near the original). Without it, plain
    dropDuplicates keeps all key state forever — correct for bounded
    replays, a memory leak on endless ones.
    """
    if event_time is not None:
        return stream.withWatermark(event_time, delay).dropDuplicatesWithinWatermark(keys)
    return stream.dropDuplicates(keys)


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually RUN here.

    The operator's Python runner speaks a protobuf control protocol to
    the JVM (state requests flow over it), so it needs the real
    ``google.protobuf`` package at runtime — unlike
    applyInPandasWithState, whose state plumbing is Arrow-only. The
    surface below is importable regardless; this probe gates tests and
    callers, mirroring the Kafka-connector capability probe.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def transform_with_state_counts(stream: DataFrame, key: str = "word") -> DataFrame:
    """The monoid count bolt (reference A1,
    Sample/WordCountSample.hs:82-117) on transformWithStateInPandas —
    Spark 4's successor to applyInPandasWithState and the closest
    modern analogue of the reference's bolt contract: ``init`` receives
    a handle to named, TYPED state (ValueState/ListState/MapState per
    key, RocksDB-backed, TTL-able), ``handleInputRows`` is
    tupleToStateConverter+mergeFn over Arrow batches, and the yielded
    frame is transformTupleFn's per-update output.

    Scale notes: state lives in the RocksDB store partitioned by the
    group key — the same key the shuffle hashes on; per-batch work is
    one Arrow round-trip per key group, and TTL/timers (timeMode) give
    the eviction policy applyInPandasWithState lacks.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState(
                "count", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timer_values):
            n = sum(len(pdf) for pdf in rows)
            prev = self._count.get()
            total = (prev[0] if prev else 0) + n
            self._count.update((total,))
            yield pd.DataFrame({key_name: [key[0]], "cnt": [total]})

        def close(self) -> None:
            pass

    key_name = key
    out_schema = StructType(
        [StructField(key, StringType()), StructField("cnt", LongType())]
    )
    return stream.groupBy(key).transformWithStateInPandas(
        statefulProcessor=RunningCount(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def session_timeout_bolt(
    stream: DataFrame,
    key: str,
    ts_us_col: str,
    order_col: str,
    gap_us: int,
) -> DataFrame:
    """Gap-sessionization with EVENT-TIME TIMERS — the stateful pattern
    applyInPandasWithState exists for and the one piece of the bolt
    contract the declarative forms can't express: per-key state that
    must emit when time passes, not when data arrives. Each key keeps
    its open session (ordinal, start, last-seen, count); in-batch gaps
    close sessions inline, and the OPEN session closes when the
    watermark passes last-seen + gap (``GroupStateTimeout.EventTimeTimeout``
    — the timer callback receives no rows, emits the session, clears
    state). A user who goes silent forever still gets their final
    session emitted, with state evicted — the property the reference's
    LWM machinery (SURVEY §2.7 ST1) cannot provide because it tracks
    processing progress, not event time.

    The caller must ``withWatermark`` the stream first. Scale: state is
    4 longs per key; the per-batch work is one Arrow round-trip per
    key group, and every timer fire is O(1).
    """
    import pandas as pd

    out_cols = [key, "session_id", "n_events", "duration_sec"]
    gap_ms = gap_us // 1000

    def fn(k, pdf_iter, state):
        out = []
        if state.hasTimedOut:
            sid, start, last, n = state.get
            state.remove()
            out.append((k[0], sid, n, (last - start) // 1_000_000))
        else:
            pdfs = [p for p in pdf_iter]
            rows = pd.concat(pdfs).sort_values([ts_us_col, order_col])
            if state.exists:
                sid, start, last, n = state.get
            else:
                sid, start, last, n = 0, None, None, 0
            for ts in rows[ts_us_col]:
                ts = int(ts)
                if start is None:
                    sid, start, last, n = sid + 1, ts, ts, 1
                elif ts - last > gap_us:
                    out.append((k[0], sid, n, (last - start) // 1_000_000))
                    sid, start, last, n = sid + 1, ts, ts, 1
                else:
                    last, n = ts, n + 1
            state.update((sid, start, last, n))
            state.setTimeoutTimestamp(last // 1000 + gap_ms)
        yield pd.DataFrame(out, columns=out_cols)

    return stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{key} long, session_id long, n_events long, duration_sec long"
        ),
        stateStructType="sid long, start_us long, last_us long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
