"""hailstorm_spark — a PySpark-native analytics/stream-processing engine.

A from-scratch re-expression of the capability surface of the reference
stream processor hailstorm-hs/hailstorm (a Storm-like exactly-once
framework; see SURVEY.md) as an idiomatic PySpark library:

- batch + streaming DataFrame pipelines (never RDDs in the hot path)
- stateful monoid-style aggregation (the reference's "bolt" contract,
  reference src/Hailstorm/Processor.hs:42-53) mapped onto Spark's
  partial-aggregation / Structured Streaming state store
- partitioned replayable sources (reference src/Hailstorm/InputSource.hs)
  mapped onto spark.readStream with checkpointed offsets
- exactly-once semantics via Structured Streaming checkpoints (the
  reference's Chandy-Lamport-style snapshot protocol, which Spark's
  micro-batch engine subsumes natively)
- plus the large-scale training-data-pipeline surface: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
  search, multimodal binary columns, and text analysis.

Everything is designed for 100 TB scale: declarative plans Catalyst can
optimize, broadcast hints on dimension joins, partial aggregation,
no collect-to-driver in any operator, AQE + skew-join enabled by default.
"""

from hailstorm_spark.session import build_spark
from hailstorm_spark.io import TABLES, load_tables

__all__ = ["build_spark", "load_tables", "TABLES"]

__version__ = "0.1.0"
