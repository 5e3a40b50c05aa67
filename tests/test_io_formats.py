"""CSV / JSON-lines ingestion: explicit-schema round trips with
corrupt-record quarantine."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hailstorm_spark.io import load_csv, load_json_lines, load_table

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT, text STRING"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text"
    )


def test_csv_round_trip_with_explicit_schema(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "csv")
    d.write.option("header", "true").option("escape", '"').csv(path)
    # Spark disallows corrupt-column-only queries on raw CSV/JSON;
    # collect the parsed frame once and derive both checks from it.
    back = load_csv(spark, path, SCHEMA).collect()
    assert sum(1 for r in back if r["_corrupt"] is not None) == 0
    a = {tuple(r) for r in d.collect()}
    b = {tuple(r)[:-1] for r in back}
    assert a == b


def test_json_lines_round_trip_and_corrupt_quarantine(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "json")
    d.write.json(path)
    # plant one malformed line in its own file
    with open(os.path.join(path, "zz_bad.json"), "w") as f:
        f.write('{"doc_id": 999999, "lang": "xx", broken\n')
    back = load_json_lines(spark, path, SCHEMA).collect()
    assert sum(1 for r in back if r["_corrupt"] is not None) == 1
    a = {tuple(r) for r in d.collect()}
    b = {tuple(r)[:-1] for r in back if r["_corrupt"] is None}
    assert a == b


def test_load_evolving_parquet_merges_and_projects(spark, tmp_path):
    """Files written under three schema eras read back as ONE stable
    contract: merged columns, typed NULLs for gaps, extras dropped."""
    from hailstorm_spark.io import load_evolving_parquet

    era1 = spark.createDataFrame([(1, "a")], "id long, name string")
    era2 = spark.createDataFrame(
        [(2, "b", 3.5)], "id long, name string, score double"
    )
    era3 = spark.createDataFrame(
        [(3, 9.9, "junk")], "id long, score double, extra string"
    )
    era1.write.parquet(str(tmp_path / "d"), mode="append")
    era2.write.parquet(str(tmp_path / "d"), mode="append")
    era3.write.parquet(str(tmp_path / "d"), mode="append")

    out = load_evolving_parquet(
        spark, str(tmp_path / "d"), "id long, name string, score double"
    )
    assert [f.name for f in out.schema.fields] == ["id", "name", "score"]
    rows = {r.id: (r.name, r.score) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", 3.5), 3: (None, 9.9)}
