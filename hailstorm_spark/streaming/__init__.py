"""Streaming layer: the reference's capability surface on Structured
Streaming.

Mapping (SURVEY §2.7):
- spout/InputSource → source builders (sources.py); offsets live in the
  checkpoint's offset log (the reference's Clock, Clock.hs:10-14)
- bolt (commutative-monoid stateful aggregation, Processor.hs:42-53)
  → update-mode streaming aggregation / applyInPandasWithState (bolt.py)
- topn/merge_sort bolts → foreachBatch global top-k re-rank (sinks.py)
- sink → exactly-once foreachBatch sinks, idempotent by batch_id —
  strictly stronger than the reference, which excludes sinks from its
  guarantee (paper/hailstorm.tex:400-403)
- snapshot protocol (Negotiator.hs, ST1-ST7) → checkpointLocation;
  trigger(processingTime='10 seconds') reproduces the reference's
  10 s snapshot cadence (Negotiator.hs:25-29)
"""

from hailstorm_spark.streaming.bolt import MonoidBolt, stateful_bolt, streaming_word_counts
from hailstorm_spark.streaming.sinks import topk_file_sink, topk_memory_sink
from hailstorm_spark.streaming.sources import file_lines_stream, rate_words_stream

__all__ = [
    "MonoidBolt",
    "stateful_bolt",
    "streaming_word_counts",
    "topk_file_sink",
    "topk_memory_sink",
    "file_lines_stream",
    "rate_words_stream",
]
