"""Arrow-native mapInArrow kernel: buffer arithmetic edge cases."""

from __future__ import annotations


def test_arrow_byte_sums_matches_python(spark):
    """mapInArrow buffer kernel vs a plain Python re-computation —
    including empty strings, batch boundaries, and non-ASCII bytes
    (the kernel itself is byte-correct for any UTF-8; only the SQL
    oracle needs the ASCII pin)."""
    from hailstorm_spark.operators.multimodal import arrow_byte_sums

    rows = [(1, "abc"), (2, ""), (3, "héllo"), (4, "zz" * 1000), (5, "")]
    df = spark.createDataFrame(rows, ["id", "text"]).repartition(3)
    got = {
        r["id"]: (r["byte_sum"], r["n_bytes"])
        for r in arrow_byte_sums(df, "id", "text").collect()
    }
    want = {
        i: (sum(t.encode()), len(t.encode())) for i, t in rows
    }
    assert got == want
