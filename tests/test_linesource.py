"""Unit tests for the custom Python line DataSource: byte-range split
correctness on adversarial layouts, and stream-offset determinism."""

from __future__ import annotations

import os
import tempfile

import pytest

from hailstorm_spark.streaming.linesource import (
    LinesBatchReader,
    LinesStreamReader,
    register_line_sources,
)


def _write(lines, trailing_newline=True):
    d = tempfile.mkdtemp(prefix="hs_lines_test_")
    p = os.path.join(d, "f.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + ("\n" if trailing_newline else ""))
    return p


ADVERSARIAL = [
    "a",
    "",  # empty line
    "long line with several words to push a split boundary mid-line",
    "",
    "x" * 200,
    "tail",
]


@pytest.mark.parametrize("n_parts", [1, 2, 3, 7, 64])
@pytest.mark.parametrize("trailing", [True, False])
def test_batch_split_rule_loses_and_duplicates_nothing(n_parts, trailing):
    p = _write(ADVERSARIAL, trailing_newline=trailing)
    reader = LinesBatchReader({"path": p, "numPartitions": str(n_parts)})
    got = []
    for part in reader.partitions():
        got.extend(line for (line,) in reader.read(part))
    want = list(ADVERSARIAL)
    assert got == want  # order preserved too: partitions are file order


def test_batch_empty_file():
    p = _write([], trailing_newline=False)
    reader = LinesBatchReader({"path": p, "numPartitions": "4"})
    rows = [r for part in reader.partitions() for r in reader.read(part)]
    assert rows == []


def test_stream_offsets_walk_all_cycles():
    lines = [f"l{i}" for i in range(10)]
    p = _write(lines)
    r = LinesStreamReader({"path": p, "maxLinesPerBatch": "4", "cycles": "3"})
    off = r.initialOffset()
    got = []
    for _ in range(100):
        rows, nxt = r.read(off)
        rows = list(rows)
        if not rows and nxt == off:
            break
        got.extend(rows)
        off = nxt
    assert [ln for _, ln in got] == lines * 3
    assert [c for c, _ in got] == [0] * 10 + [1] * 10 + [2] * 10


def test_stream_replay_is_deterministic():
    lines = [f"l{i}" for i in range(10)]
    p = _write(lines)
    r = LinesStreamReader({"path": p, "maxLinesPerBatch": "4", "cycles": "2"})
    start = r.initialOffset()
    first, nxt = r.read(start)
    replay = r.readBetweenOffsets(start, nxt)
    assert list(first) == list(replay)


def test_registered_formats_round_trip(spark):
    register_line_sources(spark)
    p = _write([f"row {i}" for i in range(100)])
    df = (
        spark.read.format("hailstorm_lines")
        .option("path", p)
        .option("numPartitions", 5)
        .load()
    )
    assert sorted(r.line for r in df.collect()) == sorted(
        f"row {i}" for i in range(100)
    )


def test_batch_split_boundary_on_line_start_loses_nothing(spark, tmp_path):
    """Fixed-width lines force split boundaries to land EXACTLY on line
    starts — the case the start−1 skip rule exists for (a seek-to-start
    discard loses one line per aligned boundary; reproduced before the
    fix: numPartitions=2 dropped 'line00005' of ten 10-byte lines)."""
    p = tmp_path / "fixed.txt"
    lines = [f"line{i:05d}" for i in range(10)]  # 10 bytes each with \n
    p.write_text("\n".join(lines) + "\n")
    for parts in (1, 2, 3, 5, 7, 10):
        got = sorted(
            r["line"]
            for r in spark.read.format("hailstorm_lines")
            .option("path", str(p))
            .option("numPartitions", parts)
            .load()
            .collect()
        )
        assert got == lines, f"numPartitions={parts}: {got}"


def test_stream_replay_honors_committed_end_after_option_change(tmp_path):
    """readBetweenOffsets must replay the COMMITTED [start, end) range
    even when maxLinesPerBatch changed across a restart — the
    exactly-once recovery contract."""
    from hailstorm_spark.streaming.linesource import LinesStreamReader

    p = tmp_path / "w.txt"
    p.write_text("".join(f"l{i}\n" for i in range(8)))
    committed = LinesStreamReader({"path": str(p), "maxLinesPerBatch": "3"})
    rows, end = committed._read_from(0, 0)
    assert [r[1] for r in rows] == ["l0", "l1", "l2"]
    # restart with a DIFFERENT batch size: replay must match the commit
    restarted = LinesStreamReader({"path": str(p), "maxLinesPerBatch": "5"})
    replay = list(restarted.readBetweenOffsets({"pos": 0, "cycle": 0}, end))
    assert [r[1] for r in replay] == ["l0", "l1", "l2"]
