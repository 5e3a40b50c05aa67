"""Query registry: the single source of truth for the engine's surface.

Every operator/query the engine claims to support registers itself here
with (a) a PySpark implementation ``fn(spark, sf_dir) -> DataFrame`` and
(b) where SQL-expressible, an equivalent ANSI-SQL oracle string that
DuckDB can run on the same parquet tables. The driver's correctness
harness consumes this via ``__spark_entry__.queries()`` /
``oracle_sql()``.

Column-name discipline: the harness sorts columns by name and
value-hashes, so the Spark result and the oracle must agree on every
output column name. Register oracles with the exact aliases used in the
DataFrame code.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation with optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effects: each module registers its queries.
    import hailstorm_spark.queries  # noqa: F401

    return QUERIES
