"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode/transform plumbing.

Pattern: media never becomes a "type" — it is a ``binary`` column
(inline for small payloads; at 100 TB usually a content-addressed
reference into object storage) plus a metadata struct, and every
decode / feature-extract / resize / frame-sample step is a
``mapInPandas`` stage: Arrow batches in, Arrow batches out, executors
never hold more than ``spark.sql.execution.arrow.maxRecordsPerBatch``
payloads at once. Partitioning, schema, and UDF signatures here are
the real production plumbing; only the codec inside the UDF is faked.

The actual decoders (PIL/ffmpeg/soundfile) are not in this container,
so the decode kernel is gated behind an import-try and replaced by a
DETERMINISTIC FAKE that derives metadata from the payload bytes alone
— making the whole pipeline oracle-checkable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

DECODED_SCHEMA = (
    "doc_id bigint, byte_len bigint, width int, height int, n_frames int, ok boolean"
)

try:  # pragma: no cover - the real codec path, absent in this container
    import PIL.Image  # noqa: F401

    HAVE_REAL_CODECS = True
except Exception:  # ImportError and friends
    HAVE_REAL_CODECS = False


def as_media(df: DataFrame, id_col: str, payload_col: Column, mime: str) -> DataFrame:
    """Wrap a payload expression as the engine's media shape:
    (id, content: binary, meta: struct<mime, byte_len>)."""
    content = payload_col.cast("binary")
    return df.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(content).cast("long").alias("byte_len"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video decode: metadata is a
    pure function of the byte length, so the oracle can mirror it."""
    n = len(payload)
    return n % 640 + 1, (n * 7) % 480 + 1, n % 10 + 1


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: binary content → typed metadata.

    With real codecs installed this is where PIL/ffmpeg would run,
    one Arrow batch at a time; the fake keeps the identical dataflow.
    """
    import pandas as pd

    id_col = media.columns[0]

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if HAVE_REAL_CODECS:  # pragma: no cover
                raise NotImplementedError(
                    "real media decode is intentionally not wired in this build"
                )
            dims = [_fake_decode(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": [len(bytes(b)) for b in pdf["content"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    "ok": True,
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: explode the (virtual) frame index space
    and keep every n-th — at scale this is the row-multiplying stage
    that must happen AFTER partitioning by media id, never before."""
    return decoded.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_n == 0)


#: fake-embedding dimension (pairs of md5 hex chars)
EMBED_DIM = 8


def embed_media(media: DataFrame) -> DataFrame:
    """Embedding-extraction stage: binary content → fixed-dim vector via
    an Arrow-batched ``mapInPandas`` kernel — the exact plumbing a real
    encoder model uses (Python kernel, batch in/batch out, executors
    bounded by the Arrow batch size). The kernel here is a DETERMINISTIC
    FAKE (md5-derived integers) so the downstream similarity math stays
    oracle-checkable; swap the body for a real model at will.
    """
    import hashlib

    from collections.abc import Iterator

    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for content in pdf["content"]:
                h = hashlib.md5(bytes(content)).hexdigest()
                embs.append(
                    [
                        ((ord(h[2 * j]) - 75) * 7 + (ord(h[2 * j + 1]) - 75)) / 1000.0
                        for j in range(EMBED_DIM)
                    ]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "emb": embs})

    # magnitudes ~|x| ≤ 0.3 — the quantize(×1000) step downstream
    # recovers the underlying integers exactly (n/1000.0 rounds back)
    return media.mapInPandas(kernel, "doc_id bigint, emb array<double>")


def resize_plan(decoded: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Resize stage: compute fit-in-box target dimensions (aspect
    preserved, never upscale) for every decoded item. The geometry is
    exact integer/rational arithmetic on the metadata — the actual
    pixel resample would run in the same mapInPandas kernel as
    decode_media (intentionally stubbed); everything the PLAN needs
    (schema, scale factors, row shape) is real.

    target = floor(dim · min(1, max_w/w, max_h/h)) with the ratio
    applied as one integer multiply+divide per axis (no float drift).
    """
    w, h = F.col("width"), F.col("height")
    # scale ratio min(max_w/w, max_h/h) chosen by cross-multiplication,
    # applied as exact integer floor-divide — no doubles anywhere
    use_w_ratio = (F.lit(max_w) * h) <= (F.lit(max_h) * w)
    num = F.when(use_w_ratio, F.lit(max_w)).otherwise(F.lit(max_h))
    den = F.when(use_w_ratio, w).otherwise(h)
    no_upscale = (w <= max_w) & (h <= max_h)

    def fit(dim: F.Column) -> F.Column:
        return (
            F.when(no_upscale, dim)
            .otherwise(((dim * num) - ((dim * num) % den)) / den)
            .cast("int")
        )

    return decoded.select(
        "doc_id",
        "width",
        "height",
        fit(w).alias("resized_w"),
        fit(h).alias("resized_h"),
    )


#: Audio framing parameters (samples per window / hop) for the fake-PCM
#: path; sized so every fixture document yields several windows.
AUDIO_WIN = 64
AUDIO_HOP = 32

AUDIO_RMS_SCHEMA = (
    "doc_id long, win_idx long, n_samples long, rms double"
)


def audio_window_rms(media: DataFrame) -> DataFrame:
    """Audio-shaped feature extraction: binary payload → fake PCM
    (signed sample = byte − 128, the deterministic stand-in where a
    real build would run soundfile/ffmpeg) → overlapping frames of
    AUDIO_WIN samples at AUDIO_HOP → per-window RMS.

    Same Arrow dataflow as decode_media: the kernel sees whole batches,
    framing is numpy per row (windows per doc = ⌊(n−1)/hop⌋+1, the last
    windows partial), and the sum-of-squares is integer-exact before
    the single double sqrt — so an engine-side oracle can reproduce
    RMS bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    id_col = media.columns[0]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, lens, rms = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["content"]):
                s = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64) - 128
                n = len(s)
                if n == 0:
                    continue
                n_wins = (n - 1) // AUDIO_HOP + 1
                for w in range(n_wins):
                    seg = s[w * AUDIO_HOP : w * AUDIO_HOP + AUDIO_WIN]
                    ids.append(doc_id)
                    wins.append(w)
                    lens.append(len(seg))
                    rms.append(float(np.sqrt(float(int((seg * seg).sum())) / len(seg))))
            yield pd.DataFrame(
                {"doc_id": ids, "win_idx": wins, "n_samples": lens, "rms": rms}
            )

    return media.mapInPandas(kernel, schema=AUDIO_RMS_SCHEMA)


def arrow_byte_sums(
    df: DataFrame, id_col: str, text_col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Zero-copy byte statistics via ``mapInArrow`` — the Arrow-NATIVE
    kernel tier below the pandas ones above: batches arrive as
    ``pyarrow.RecordBatch`` and the per-row byte sums are computed
    straight off the Arrow string column's underlying (offsets, data)
    buffers with ``numpy.add.reduceat`` — no pandas objects, no per-row
    Python, not even a copy of the character data. This is the tier for
    kernels that are pure byte arithmetic (checksums, entropy, framing
    scans): pandas conversion would materialize a Python object per
    string for zero benefit.

    Emits (id, byte_sum, n_bytes) per row; byte_sum is the sum of the
    UTF-8 byte VALUES (the testdata contract pins documents.text to
    ASCII, so the SQL-side codepoint sum is the exact twin — same
    boundary as audio_window_rms above).
    """
    import pyarrow as pa

    carried = [df.schema[c] for c in carry]
    out_schema = StructType(
        [
            StructField("id", LongType()),
            *carried,
            StructField("byte_sum", LongType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def kernel(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import numpy as np

        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            txt = batch.column(batch.schema.get_field_index(text_col))
            # combine_chunks not needed: RecordBatch columns are flat.
            # Arrow string layout: buffers = [validity, offsets, data]
            arr = txt.cast(pa.large_binary())
            offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                arr.offset : arr.offset + len(arr) + 1
            ]
            # slice the data buffer to the last offset: Arrow buffers
            # may carry padding past the used bytes, and reduceat's
            # final segment runs to the end of the array
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[: offsets[-1]]
            lens = np.diff(offsets)
            # reduceat needs non-empty slices: guard empty rows to 0
            sums = np.zeros(len(arr), dtype=np.int64)
            nonempty = lens > 0
            if nonempty.any():
                starts = offsets[:-1][nonempty]
                sums[nonempty] = np.add.reduceat(data.astype(np.int64), starts)
            # carried columns are re-emitted as the SAME Arrow arrays
            # (zero copy) — the reason this beats a post-hoc join at
            # scale: group keys ride along, no second scan, no shuffle
            carry_arrays = [
                batch.column(batch.schema.get_field_index(c)) for c in carry
            ]
            carry_fields = [(c, batch.schema.field(c).type) for c in carry]
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    *carry_arrays,
                    pa.array(sums, type=pa.int64()),
                    pa.array(lens, type=pa.int64()),
                ],
                schema=pa.schema(
                    [("id", pa.int64()), *carry_fields,
                     ("byte_sum", pa.int64()), ("n_bytes", pa.int64())]
                ),
            )

    return df.select(
        F.col(id_col), *[F.col(c) for c in carry], F.col(text_col)
    ).mapInArrow(kernel, out_schema)


PHASH_BITS = 60
PHASH_SCHEMA = "doc_id bigint, phash bigint"


def payload_dhash(media: DataFrame) -> DataFrame:
    """Difference-hash fingerprint of a binary payload — the
    perceptual-hash SHAPE (resample to a fixed grid, hash the signs of
    adjacent differences) applied to the payload byte stream, the
    deterministic stand-in for an image dHash where a real build would
    decode pixels first at this exact kernel boundary.

    Per payload: 61 byte positions at fixed fractional offsets
    (pos_j = j·(n−1) div 60), one bit per adjacent pair
    (1 iff s[pos_{j+1}] > s[pos_j]), packed little-endian into 60 bits
    — always non-negative in an int64. Resampling makes the
    fingerprint length-stable: a payload and a slightly-retouched copy
    mostly sample the same bytes, the near-dup property perceptual
    hashes exist for. Payloads shorter than 2 bytes are skipped.

    Arrow dataflow identical to the other kernels; inside, one numpy
    gather + compare per row — no per-byte Python.
    """
    import numpy as np
    import pandas as pd

    id_col = media.columns[0]
    weights = 1 << np.arange(PHASH_BITS, dtype=np.int64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["content"]):
                s = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = len(s)
                if n < 2:
                    continue
                idx = (np.arange(PHASH_BITS + 1, dtype=np.int64) * (n - 1)) // PHASH_BITS
                bits = (s[idx[1:]] > s[idx[:-1]]).astype(np.int64)
                ids.append(doc_id)
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    return media.mapInPandas(kernel, schema=PHASH_SCHEMA)
