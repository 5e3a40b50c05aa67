"""Column-expression building blocks (all JVM-side, codegen-friendly).

Everything in this package returns pyspark ``Column`` expressions built
from ``pyspark.sql.functions`` — no Python UDFs — so they stay inside
whole-stage codegen and vectorized execution.
"""

from hailstorm_spark.functions.hashing import md5_hash60, md5_hash60_sql
from hailstorm_spark.functions.text import tokens, tokens_sql

__all__ = ["md5_hash60", "md5_hash60_sql", "tokens", "tokens_sql"]
