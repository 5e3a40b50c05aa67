"""Custom Python DataSource: the reference's line-file input source as
a first-class Spark 4 connector.

The reference's ``FileSource`` (reference src/Hailstorm/InputSource.hs:
26-48, 132-159) reads a newline-delimited file, tracks per-partition
line offsets, and cyclically replays the file to simulate an endless
stream. Here that contract is a REGISTERED SPARK DATA SOURCE
(``spark.dataSource.register`` + ``spark.read.format("hailstorm_lines")``)
rather than bespoke harness code:

- **batch reader**: splits the file by BYTE ranges aligned to newlines
  (each partition skips its leading partial line and reads one line past
  its end — the TextInputFormat split rule), so a 100 TB file scans with
  full parallelism and no driver-side line counting;
- **streaming reader**: a ``SimpleDataSourceStreamReader`` whose offset
  is ``{"pos": byte, "cycle": n}``; each micro-batch reads up to
  ``maxLinesPerBatch`` lines, EOF wraps to the next cycle up to
  ``cycles`` (the reference's cyclic replay), and
  ``readBetweenOffsets`` re-reads any offset range deterministically —
  which is exactly the replayability Structured Streaming needs for
  exactly-once recovery (the reference builds the same guarantee from
  Kafka offsets + its snapshot clock).

Simple stream readers run on the driver by design (Spark prefetches and
caches the batches); they suit control-plane-sized streams. The batch
reader is the data-plane path and is fully distributed.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

DEFAULT_PARTITIONS = 8
DEFAULT_LINES_PER_BATCH = 10_000


class _ByteRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class LinesBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.n_parts = int(options.get("numPartitions", DEFAULT_PARTITIONS))

    def partitions(self):
        size = os.path.getsize(self.path)
        if size == 0:
            return [_ByteRange(0, 0)]
        n = max(1, min(self.n_parts, size))
        width = size // n
        bounds = [i * width for i in range(n)] + [size]
        return [_ByteRange(bounds[i], bounds[i + 1]) for i in range(n)]

    def read(self, partition: _ByteRange) -> Iterator[tuple]:
        # TextInputFormat split rule: a partition owns every line that
        # STARTS inside [start, end); a line straddling `end` is read
        # whole by THIS partition. The skip for start > 0 must seek to
        # start−1 before discarding (Hadoop's LineRecordReader trick):
        # if the byte at start−1 is the previous line's newline, the
        # discard consumes exactly that newline and the line STARTING AT
        # `start` is preserved — seeking to `start` and discarding would
        # throw that line away, losing one line per boundary that lands
        # exactly on a line start (caught by a split-aligned fixture in
        # tests/test_linesource.py).
        with open(self.path, "rb") as f:
            if partition.start > 0:
                f.seek(partition.start - 1)
                f.readline()
            while f.tell() < partition.end:
                raw = f.readline()
                if not raw:
                    break
                yield (raw.decode("utf-8").rstrip("\n"),)


class LinesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.per_batch = int(
            options.get("maxLinesPerBatch", DEFAULT_LINES_PER_BATCH)
        )
        self.cycles = int(options.get("cycles", 1))

    def initialOffset(self) -> dict:
        return {"pos": 0, "cycle": 0}

    def _read_from(self, pos: int, cycle: int):
        rows = []
        with open(self.path, "rb") as f:
            f.seek(pos)
            for _ in range(self.per_batch):
                raw = f.readline()
                if not raw:
                    break
                rows.append((cycle, raw.decode("utf-8").rstrip("\n")))
            new_pos = f.tell()
            at_eof = not f.readline()
        if at_eof and cycle + 1 < self.cycles:
            return rows, {"pos": 0, "cycle": cycle + 1}
        return rows, {"pos": new_pos, "cycle": cycle}

    def read(self, start: dict):
        rows, nxt = self._read_from(start["pos"], start["cycle"])
        return iter(rows), nxt

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Deterministic replay of a committed range — the recovery
        # path. Bounded by END, not by the CURRENT maxLinesPerBatch:
        # the option may legally change across a restart, and the
        # replay must return exactly the committed [start, end) rows.
        # A cycle-wrap commit (end = {pos: 0, cycle: c+1}) means
        # read-to-EOF of start's cycle.
        rows = []
        wraps = end["cycle"] > start["cycle"]
        # the engine commits one batch per offset pair, and a wrap
        # batch always ends at {pos: 0, cycle+1}; a coalesced range
        # crossing EOF with end.pos > 0 would need a two-segment read
        # this reader does not implement — fail loudly rather than
        # silently truncating at EOF of the start cycle
        if wraps and (end["cycle"] != start["cycle"] + 1 or end["pos"] != 0):
            raise ValueError(
                f"unsupported replay range across cycle wrap: {start} -> {end}"
            )
        with open(self.path, "rb") as f:
            f.seek(start["pos"])
            while True:
                if not wraps and f.tell() >= end["pos"]:
                    break
                raw = f.readline()
                if not raw:
                    break
                rows.append((start["cycle"], raw.decode("utf-8").rstrip("\n")))
        return iter(rows)


class LinesDataSource(DataSource):
    """``spark.read.format("hailstorm_lines").option("path", p)`` /
    ``spark.readStream.format("hailstorm_lines")``."""

    @classmethod
    def name(cls) -> str:
        return "hailstorm_lines"

    def schema(self) -> str:
        return "line string"

    def reader(self, schema) -> LinesBatchReader:
        return LinesBatchReader(self.options)


class LinesStreamDataSource(DataSource):
    """Streaming variant with the cycle column exposed (separate class:
    a DataSource's schema applies to both batch and stream forms)."""

    @classmethod
    def name(cls) -> str:
        return "hailstorm_lines_stream"

    def schema(self) -> str:
        return "cycle int, line string"

    def simpleStreamReader(self, schema) -> LinesStreamReader:
        return LinesStreamReader(self.options)


def register_line_sources(spark) -> None:
    """Idempotent registration of both source formats on a session."""
    for cls in (LinesDataSource, LinesStreamDataSource):
        try:
            spark.dataSource.register(cls)
        except Exception:
            pass  # already registered on this session
