"""Third-engine replays for the IO round-trip family on HOSTILE
strings (carried VERDICT r6/r7 task): the sf fixtures are benign ASCII,
so the CSV quote/newline escape path and the JSON string-escape path
were exercised only on shapes that never stress them. Here the same
registered queries run over planted tables whose string columns carry
embedded double quotes, commas, raw newlines and CRLFs, tabs,
backslashes, JSON-looking payloads, unicode (CJK, emoji, combining
marks, RTL), and empty strings — and three checks stack:

1. cross-engine: the query result must still hash-match its DuckDB
   oracle on the same hostile parquet (the oracle never round-trips,
   so a writer/reader mangle shows as a digest/count break);
2. third engine: the JSONL per-lang digest is recomputed in PURE
   PYTHON (hashlib over the parquet rows) — independent of both SQL
   engines' md5/escape code paths;
3. zero quarantine: n_corrupt must be 0 — hostile VALUES are legal
   content; a reader that quarantines them is corrupting, not
   defending.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

import hailstorm_spark.queries.io_roundtrip  # noqa: F401
from hailstorm_spark.registry import QUERIES
from tests.conftest import TABLES, assert_matches_oracle, table_path

#: shapes legal in BOTH formats (JSONL escapes everything; single-line
#: CSV carries them under RFC 4180 quoting)
HOSTILE_TEXTS = [
    'plain ascii',
    'comma, separated, text',
    'double "quoted" middle',
    '"leading and trailing"',
    "single 'quotes' and `backticks`",
    'tab\tseparated\tcells',
    'backslash \\n literal and \\ alone',
    'trailing backslash \\',
    '{"json": "looking", "n": [1, 2]}',
    'unicode: 日本語 \U0001f600 é שלום',
    'NULL',
    '',
    'quote-at-end "',
    'semicolon; pipe| colon:',
    'very ' + 'long ' * 200 + 'tail',
]

#: raw line breaks are legal JSON STRING content (escaped to \n on the
#: wire) but CANNOT ride single-line CSV — the documents/JSONL fixture
#: includes them, the CSV orders fixture excludes them, and a dedicated
#: test pins that a newline-bearing CSV row quarantines loudly instead
#: of silently mangling
NEWLINE_TEXTS = ['embedded\nnewline', 'crlf\r\nline']


@pytest.fixture(scope="module")
def hostile_dir(spark, tmp_path_factory):
    """A miniature sf_dir whose documents.text and orders string
    columns are the hostile shapes above."""
    out = tmp_path_factory.mktemp("io_hostile")
    docs = pd.DataFrame(
        [
            (i, t, ["en", "de", "fr"][i % 3], f"src{i % 2}", len(t))
            for i, t in enumerate(HOSTILE_TEXTS + NEWLINE_TEXTS)
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.to_parquet(str(out / "documents.parquet"), index=False)
    orders = pd.DataFrame(
        [
            (
                i,
                i % 5,
                ["O", 'Q"Q', "P,P", "N;N", "T\tT"][i % 5],
                round(100.0 + 7.77 * i, 2),
                pd.Timestamp("2024-03-01") + pd.Timedelta(days=i % 4),
                HOSTILE_TEXTS[i % len(HOSTILE_TEXTS)] or "EMPTY->PRIORITY",
            )
            for i in range(40)
        ],
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    orders.to_parquet(str(out / "orders.parquet"), index=False)
    # lineitem for the ORC query: numeric/date columns only, small
    li = pd.DataFrame(
        [
            (i, ["A", "N", "R"][i % 3], 900.0 + i, float(1 + i % 7),
             pd.Timestamp("2024-03-01") + pd.Timedelta(days=i % 3))
            for i in range(30)
        ],
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_quantity", "l_shipdate"],
    )
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
    li.to_parquet(str(out / "lineitem.parquet"), index=False)
    return str(out)


@pytest.fixture(scope="module")
def hostile_oracle(hostile_dir):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{table_path(hostile_dir, t)}')"
            )
        except duckdb.IOException:
            pass  # only the three planted tables exist
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        "io_csv_roundtrip_orders",
        "io_json_roundtrip_documents",
        "io_orc_roundtrip_lineitem",
    ],
)
def test_io_roundtrips_survive_hostile_strings(
    spark, hostile_dir, hostile_oracle, name
):
    assert_matches_oracle(spark, hostile_oracle, QUERIES[name], hostile_dir)


def test_csv_roundtrip_quarantines_nothing_hostile(spark, hostile_dir):
    rows = QUERIES["io_csv_roundtrip_orders"].fn(spark, hostile_dir).collect()
    assert sum(r["n_orders"] for r in rows) == 40, "hostile rows were dropped"
    assert all(r["n_corrupt"] == 0 for r in rows), (
        "hostile string VALUES must round-trip, not quarantine"
    )


def test_csv_newline_values_detectable_and_multiline_exact(spark, tmp_path):
    """Raw line breaks inside values are the one shape single-line CSV
    cannot round-trip: the writer quotes them, but a multiLine=false
    reader splits records at the raw newline — and the fragments parse
    as PLAUSIBLE rows, so even PERMISSIVE's corrupt column stays empty
    (measured: 'line\\nbreak' came back as 'line' + a null-key
    fragment, n_corrupt 0). Two contracts pinned:

    1. the damage is DETECTABLE by the integrity checks every load
       runs: the row count inflates and a null-key fragment group
       appears — never a same-shape silent value swap;
    2. the documented fidelity path works: load_csv(multi_line=True)
       round-trips the identical export value-exactly (at the price
       of intra-file split parallelism — io.py's documented
       trade-off; JSONL stays the newline-safe splittable format).
    """
    from hailstorm_spark.io import load_csv

    orders = pd.DataFrame(
        [
            (i, i, "O", 10.0 + i,
             pd.Timestamp("2024-03-01"),
             "line\nbreak" if i == 3 else "CLEAN")
            for i in range(6)
        ],
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate", "o_orderpriority"],
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    orders.to_parquet(str(tmp_path / "orders.parquet"), index=False)

    rows = QUERIES["io_csv_roundtrip_orders"].fn(spark, str(tmp_path)).collect()
    assert sum(r["n_orders"] for r in rows) != 6, (
        "row-count drift is the loud signal; equality here would mean "
        "the fragments silently merged back into a same-shape result"
    )
    assert any(r["o_orderpriority"] is None for r in rows), (
        "the orphaned fragment must surface as a null-key group"
    )
    clean = [r for r in rows if r["o_orderpriority"] == "CLEAN"]
    assert clean and clean[0]["n_orders"] == 5, "clean rows must survive intact"

    # the fidelity path: same export, multiLine reader, exact values
    export = str(tmp_path / "csv_export")
    spark.read.parquet(str(tmp_path / "orders.parquet")).select(
        "o_orderkey", "o_orderpriority"
    ).write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(export)
    back = load_csv(
        spark, export, "o_orderkey bigint, o_orderpriority string",
        multi_line=True,
    )
    # (filtering on the corrupt column alone is disallowed by Spark —
    # collect the full rows once and check both facts from them)
    full = back.collect()
    got = {r["o_orderkey"]: r["o_orderpriority"] for r in full}
    assert got == {i: ("line\nbreak" if i == 3 else "CLEAN") for i in range(6)}
    assert all(r["_corrupt"] is None for r in full)


def test_jsonl_digest_matches_pure_python(spark, hostile_dir):
    """True third engine: the per-lang Merkle digest recomputed with
    hashlib straight off the parquet rows — no Spark, no DuckDB, no
    shared md5_hash60 SQL. Any JSON escape mangle (a reader that turns
    \\n into a literal 'n', drops a combining mark, or re-encodes a
    surrogate) shifts at least one row hash and breaks the sum."""
    got = {
        r["lang"]: (r["text_digest"], r["n_docs"], r["sum_text_len"])
        for r in QUERIES["io_json_roundtrip_documents"].fn(spark, hostile_dir).collect()
    }
    pdf = pd.read_parquet(table_path(hostile_dir, "documents"))
    want: dict[str, list[int]] = {}
    for _, row in pdf.iterrows():
        h = hashlib.md5(f"{row.doc_id}:{row.text}".encode("utf-8")).hexdigest()
        acc = want.setdefault(row.lang, [0, 0, 0])
        acc[0] = (acc[0] + int(h[:15], 16)) % (1 << 60)
        acc[1] += 1
        acc[2] += len(row.text)
    assert got == {k: tuple(v) for k, v in want.items()}
