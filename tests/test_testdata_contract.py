"""Testdata contract: the properties of the driver-generated parquet
this library actually RELIES on.

Round 3 was lost to silent schema drift (events.ts flipped from
TIMESTAMP(NANOS) to TIMESTAMP_NTZ micros between rounds and every
events query went red before any code ran). The loaders are now
encoding-adaptive; this test asserts the REMAINING assumptions — the
ones the code cannot adapt around — so the next generator change fails
here first, with a message naming the drift, instead of as 11
inscrutable red driver rows.

Deliberately liberal: only properties whose violation would actually
break a query are pinned (column presence, category of type), never
exact physical encodings.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hailstorm_spark.io import TABLES, table_path
from tests.conftest import SF_DIR

#: column -> acceptable pyarrow type predicate, per table. Only columns
#: the library reads are listed; extra columns are always fine.
_int = pa.types.is_integer


def _stringish(t):
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def _floatish(t):
    return pa.types.is_floating(t)


def _ts_or_long(t):
    # the two encodings normalize_events_ts handles
    return pa.types.is_timestamp(t) or pa.types.is_integer(t)


def _float_list(t):
    return (pa.types.is_list(t) or pa.types.is_large_list(t)) and _floatish(
        t.value_type
    )


CONTRACT = {
    "events": {
        "event_id": _int,
        "ts": _ts_or_long,
        "user_id": _int,
        "event_type": _stringish,
        "value": _floatish,
        "props": _stringish,
    },
    "documents": {
        "doc_id": _int,
        "text": _stringish,
        "lang": _stringish,
        "source": _stringish,
    },
    "embeddings": {
        "vec_id": _int,
        "embedding": _float_list,
        "label": _int,
    },
    "orders": {
        "o_orderkey": _int,
        "o_custkey": _int,
        "o_orderdate": lambda t: pa.types.is_date(t) or pa.types.is_timestamp(t),
        "o_totalprice": _floatish,
        "o_orderpriority": _stringish,
    },
    "lineitem": {
        "l_orderkey": _int,
        "l_partkey": _int,
        "l_suppkey": _int,
        "l_quantity": lambda t: _floatish(t) or pa.types.is_integer(t),
        "l_extendedprice": _floatish,
        "l_discount": _floatish,
        "l_tax": _floatish,
        "l_returnflag": _stringish,
        "l_linestatus": _stringish,
        "l_shipdate": lambda t: pa.types.is_date(t) or pa.types.is_timestamp(t),
    },
    "customer": {"c_custkey": _int, "c_mktsegment": _stringish},
    "supplier": {"s_suppkey": _int, "s_nationkey": _int},
    "part": {"p_partkey": _int, "p_type": _stringish, "p_brand": _stringish},
    "nation": {"n_nationkey": _int, "n_regionkey": _int, "n_name": _stringish},
    "region": {"r_regionkey": _int, "r_name": _stringish},
}


@pytest.mark.parametrize("table", list(CONTRACT))
def test_testdata_schema_contract(table):
    schema = pq.read_schema(table_path(SF_DIR, table))
    names = set(schema.names)
    for col, pred in CONTRACT[table].items():
        assert col in names, (
            f"TESTDATA DRIFT: {table}.{col} disappeared — generator changed; "
            f"present columns: {sorted(names)}"
        )
        t = schema.field(col).type
        assert pred(t), (
            f"TESTDATA DRIFT: {table}.{col} is now {t} — a type category the "
            f"library does not handle; adapt the loader (see io.py / "
            f"normalize_events_ts for the round-3 precedent)"
        )


def test_all_tables_exist_and_nonempty():
    for t in TABLES:
        md = pq.read_metadata(table_path(SF_DIR, t))
        assert md.num_rows > 0, f"TESTDATA DRIFT: {t} is empty"


#: every temporal column the library reads, with its accepted physical
#: encodings. Round 3 was lost to events.ts flipping encodings; this
#: enumerates ALL temporal columns so the next generator change fails
#: ONE named test here instead of a wall of red driver rows.
TEMPORAL_COLUMNS = {
    ("events", "ts"): ("timestamp", "int"),
    ("orders", "o_orderdate"): ("timestamp", "date"),
    ("lineitem", "l_shipdate"): ("timestamp", "date"),
}


@pytest.mark.parametrize("table_col", list(TEMPORAL_COLUMNS), ids=lambda tc: f"{tc[0]}.{tc[1]}")
def test_temporal_encoding_contract(table_col):
    table, col = table_col
    accepted = TEMPORAL_COLUMNS[table_col]
    t = pq.read_schema(table_path(SF_DIR, table)).field(col).type
    kind = (
        "timestamp"
        if pa.types.is_timestamp(t)
        else "date"
        if pa.types.is_date(t)
        else "int"
        if pa.types.is_integer(t)
        else str(t)
    )
    assert kind in accepted, (
        f"TESTDATA DRIFT: {table}.{col} is now {t} ({kind}) — accepted "
        f"encodings are {accepted}; extend the loader normalization "
        f"(io.py) AND this contract together"
    )
    if kind == "timestamp":
        # both nanos (needs nanosAsLong) and micros (NTZ) are handled by
        # the adaptive loader; anything else is new ground
        assert t.unit in ("ns", "us", "ms", "s"), (
            f"TESTDATA DRIFT: {table}.{col} timestamp unit {t.unit}"
        )


def test_documents_text_is_ascii():
    """TWO kernels treat text CONTENT as bytes (uint8 of UTF-8) while
    their oracles score per-character codepoints: multimodal_audio_
    window_rms (PCM framing) and multimodal_phash_dup_groups (dHash
    resampling, operators/multimodal.py::payload_dhash). They agree
    with their oracles only while the corpus is pure ASCII (1 char ==
    1 byte). Pin that property so a multilingual generator round fails
    HERE with a named cause instead of silently redding both queries.
    (Fix path if this fires: make BOTH oracles byte-based via DuckDB's
    encode()/blob functions.)"""
    import pyarrow.compute as pc

    tbl = pq.read_table(table_path(SF_DIR, "documents"), columns=["text"])
    n_chars = pc.sum(pc.utf8_length(tbl["text"])).as_py()
    n_bytes = pc.sum(pc.binary_length(tbl["text"])).as_py()
    assert n_chars == n_bytes, (
        f"TESTDATA DRIFT: documents.text is no longer pure ASCII "
        f"({n_bytes - n_chars} multi-byte chars) — the byte-based kernels "
        f"(audio_window_rms, payload_dhash) and their codepoint-based "
        f"oracles now disagree; switch BOTH oracles to byte arithmetic"
    )
