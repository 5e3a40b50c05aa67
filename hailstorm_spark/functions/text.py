"""Text tokenization primitives, portable between Spark and the oracle.

The reference's only text processing is bytes→string + word-per-line
ingestion (reference src/Hailstorm/Sample/WordCountSample.hs:77-78).
Here tokenization is a first-class columnar expression because the
dedup / text-analysis surface is built on it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal English stopword list used by the quality/language heuristics.
#: Kept deliberately tiny and embedded in both the Spark and SQL sides so
#: the oracle stays in lockstep.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a string column (lowercased, no empties)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != F.lit(""))


def tokens_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`tokens`."""
    return (
        f"list_filter(regexp_split_to_array(lower(trim({expr})), '\\s+'), t -> t <> '')"
    )
