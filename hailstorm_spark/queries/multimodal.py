"""Multimodal pipeline queries: binary payload → Arrow decode →
metadata aggregation, oracle-checked end-to-end (the fake decode is a
pure function of byte length — see operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hailstorm_spark.io import load_table
from hailstorm_spark.operators.multimodal import (
    as_media,
    decode_media,
    frame_sample_plan,
)
from hailstorm_spark.registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return as_media(docs, "doc_id", F.encode("text", "UTF-8"), mime="text/plain")


@register(
    "multimodal_decode_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height,
           CAST(octet_length(encode(text)) % 10 + 1 AS INT) AS n_frames
    FROM documents
    """,
    tags=("multimodal", "north-star", "pandas-udf"),
)
def multimodal_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary column → mapInPandas decode → typed metadata. The Arrow
    batch boundary is real; the codec is the deterministic fake."""
    return decode_media(_media(spark, sf_dir)).select(
        "doc_id", "byte_len", "width", "height", "n_frames"
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id, CAST(octet_length(encode(text)) % 10 + 1 AS INT) AS n_frames
      FROM documents
    )
    SELECT doc_id, i AS frame_idx
    FROM meta, range(10) t(i)
    WHERE i < n_frames AND i % 2 = 0
    """,
    tags=("multimodal", "north-star"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: explode the frame index space, keep every 2nd."""
    decoded = decode_media(_media(spark, sf_dir))
    return frame_sample_plan(decoded, every_n=2)


@register(
    "multimodal_size_histogram",
    oracle="""
    SELECT (octet_length(encode(text)) // 100) * 100 AS size_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY 1
    """,
    tags=("multimodal",),
)
def multimodal_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload size distribution from the metadata struct alone — no
    decode, no Python: metadata queries must never touch content."""
    media = _media(spark, sf_dir)
    bucket = (F.col("meta.byte_len") / 100).cast("long") * 100
    return media.groupBy(bucket.alias("size_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("meta.byte_len").alias("total_bytes"),
    )


_EMB_SQL = """list_transform(generate_series(0, 7), j ->
      CAST((ascii(substr(md5(text), 2*j+1, 1)) - 75) * 7
           + (ascii(substr(md5(text), 2*j+2, 1)) - 75) AS BIGINT))"""


@register(
    "multimodal_embed_topk",
    oracle=f"""
    WITH emb AS (SELECT doc_id, {_EMB_SQL} AS emb FROM documents),
    q AS (SELECT doc_id, emb AS qvec FROM emb),  -- quantize(x/1000·1000) round-trips to the md5 ints
    normed AS (
      SELECT doc_id, qvec,
             CAST(list_sum(list_transform(range(1, len(qvec) + 1),
                                          i -> qvec[i] * qvec[i])) AS BIGINT) AS qnorm
      FROM q
    ),
    scored AS (
      SELECT qs.doc_id AS query_id, c.doc_id AS neighbor_id,
             (CAST(list_sum(list_transform(range(1, len(qs.qvec) + 1),
                                           i -> qs.qvec[i] * c.qvec[i])) AS DOUBLE)
               / sqrt(CAST(qs.qnorm * c.qnorm AS DOUBLE))) AS cosine
      FROM normed qs JOIN normed c ON qs.doc_id <> c.doc_id
      WHERE qs.doc_id < 5
    )
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
    tags=("multimodal", "similarity", "north-star", "pandas-udf"),
)
def multimodal_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal similarity composition: binary payload →
    Arrow mapInPandas embedding kernel → quantized-cosine top-3 —
    media in, neighbors out, one declarative plan.

    The embedding kernel is the deterministic fake (md5-derived), so
    the oracle replays the identical pipeline; the Spark side exercises
    the REAL production plumbing (Arrow batch boundary, then the same
    brute-force top-k operator the embeddings table uses).
    """
    from hailstorm_spark.operators.multimodal import embed_media
    from hailstorm_spark.operators.similarity import brute_force_topk

    emb = embed_media(_media(spark, sf_dir))
    return brute_force_topk(emb, "doc_id", "emb", query_ids=range(5), k=3)


@register(
    "multimodal_resize_dims",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
             CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height
      FROM documents
    )
    SELECT doc_id, width, height,
           CAST(CASE WHEN width <= 224 AND height <= 224 THEN width
                     WHEN 224 * height <= 224 * width
                       THEN (width * 224) // width
                     ELSE (width * 224) // height END AS INT) AS resized_w,
           CAST(CASE WHEN width <= 224 AND height <= 224 THEN height
                     WHEN 224 * height <= 224 * width
                       THEN (height * 224) // width
                     ELSE (height * 224) // height END AS INT) AS resized_h
    FROM meta
    """,
    tags=("multimodal", "north-star"),
)
def multimodal_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: fit-in-224×224 target dimensions, aspect
    preserved, never upscaled — exact integer cross-multiplication
    geometry over the decoded metadata (the pixel resample itself
    belongs in the decode kernel; the plan-level shape is real)."""
    from hailstorm_spark.operators.multimodal import resize_plan

    decoded = decode_media(_media(spark, sf_dir))
    return resize_plan(decoded, 224, 224)


@register(
    "multimodal_audio_window_rms",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_transform(range(1, length(text) + 1),
                            i -> ascii(substr(text, i, 1)) - 128) AS smp,
             length(text) AS n
      FROM documents WHERE length(text) > 0
    ),
    w AS (
      SELECT doc_id, CAST(t.wi AS BIGINT) AS win_idx,
             smp[t.wi * 32 + 1 : least(t.wi * 32 + 64, n)] AS win
      FROM s, unnest(range(((n - 1) // 32) + 1)) AS t(wi)
    )
    SELECT doc_id, win_idx,
           CAST(len(win) AS BIGINT) AS n_samples,
           sqrt(CAST(list_sum(list_transform(win, x -> x * x)) AS DOUBLE)
                / len(win)) AS rms
    FROM w
    """,
    tags=("multimodal", "audio", "pandas-udf"),
)
def multimodal_audio_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio modality end-to-end: binary payload → fake PCM →
    overlapping 64-sample frames at hop 32 → per-window RMS, all inside
    one Arrow mapInPandas kernel (operators.multimodal.audio_window_rms).
    The oracle replays the identical framing over character codes —
    integer sum-of-squares then one double sqrt, so RMS matches
    bit-for-bit. The UTF-8 text payload stands in for PCM exactly like
    the image fake codec; a real build swaps soundfile in at the same
    kernel boundary.
    """
    from hailstorm_spark.operators.multimodal import audio_window_rms

    return audio_window_rms(_media(spark, sf_dir))


@register(
    "multimodal_arrow_byte_stats",
    oracle="""
    SELECT source,
           CAST(SUM(list_sum(list_transform(
                 range(1, length(text) + 1),
                 i -> ascii(substr(text, i, 1))))) AS BIGINT) AS byte_total,
           CAST(SUM(length(text)) AS BIGINT) AS n_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY source
    """,
    tags=("multimodal", "arrow", "bytes"),
)
def multimodal_arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source content checksums through the Arrow-NATIVE kernel
    tier (operators/multimodal.py::arrow_byte_sums): mapInArrow hands
    the kernel raw RecordBatches and the per-row byte sums come
    straight off the string column's (offsets, data) buffers with one
    vectorized reduceat — no pandas materialization, no per-row Python.
    The three Python-kernel tiers are now all exercised: row UDTF
    (chunking), pandas batches (decode/RMS/cogroup), and Arrow buffers
    (this) — pick by whether the kernel needs objects, frames, or
    bytes.

    The testdata contract's ASCII pin makes the SQL codepoint sum the
    exact oracle twin (same documented boundary as the audio-RMS
    kernel). At 100 TB this shape is the cheap integrity/fingerprint
    scan: one pass, map-side aggregation of two int64s per source.
    """
    from hailstorm_spark.operators.multimodal import arrow_byte_sums

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "source", "text"
    )
    per_doc = arrow_byte_sums(docs, "id", "text", carry=("source",))
    return per_doc.groupBy("source").agg(
        F.sum("byte_sum").cast("long").alias("byte_total"),
        F.sum("n_bytes").cast("long").alias("n_bytes"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


@register(
    "multimodal_phash_dup_groups",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, text
      FROM documents WHERE doc_id < 40
    ),
    s AS (
      SELECT doc_id, text, length(text) AS n
      FROM corpus WHERE length(text) >= 2
    ),
    h AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60), j ->
               CASE WHEN ascii(substr(text, CAST((j + 1) * (n - 1) // 60 AS INT) + 1, 1))
                     > ascii(substr(text, CAST(j * (n - 1) // 60 AS INT) + 1, 1))
                    THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END))
               AS BIGINT) AS phash
      FROM s
    )
    SELECT phash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM h GROUP BY phash HAVING COUNT(*) >= 2
    """,
    tags=("multimodal", "dedup", "phash", "pandas-udf"),
)
def multimodal_phash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media dedup by perceptual-hash-shaped fingerprints: every
    payload hashes to a 60-bit dHash (fixed-grid resample, adjacent-
    difference signs — operators/multimodal.py::payload_dhash), then
    duplicate groups are one hash-groupBy — the standard image-dedup
    pipeline (decode → phash → group/band) with the decode faked at
    the documented kernel boundary and everything downstream real.
    The oracle replays the resampling and bit-packing over character
    codes (ASCII pinned by the testdata contract).

    Scale: the fingerprint is 8 bytes per payload computed map-side in
    one Arrow kernel; the only shuffle moves (hash, id) — the same
    16-byte-digest discipline as exact dedup, applied to media. A real
    build swaps in pixel decoding at the kernel boundary and optionally
    bands the 60 bits for Hamming-radius grouping (the simhash
    machinery next door already does exactly that for text).
    """
    from hailstorm_spark.operators.multimodal import as_media, payload_dhash

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant exact copies (ids shifted) so duplicate groups exist at every
    # SF - the same planted-input discipline as the dedup fixtures; the
    # copies MUST collide, so an empty result is a broken kernel, not a
    # quiet corpus
    corpus = docs.unionAll(
        docs.filter(F.col("doc_id") < 40).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
    )
    media = as_media(corpus, "doc_id", F.encode("text", "UTF-8"), mime="text/plain")
    h = payload_dhash(media)
    return (
        h.groupBy("phash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


#: Activity threshold on the window RMS (byte-PCM units): windows with
#: at least this energy count as "active" — the fake-PCM analogue of a
#: VAD energy gate.
VAD_RMS_MIN = 40.0


@register(
    "multimodal_audio_activity_segments",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             list_transform(range(1, length(text) + 1),
                            i -> ascii(substr(text, i, 1)) - 128) AS smp,
             length(text) AS n
      FROM documents WHERE length(text) > 0
    ),
    w AS (
      SELECT doc_id, CAST(t.wi AS BIGINT) AS win_idx,
             smp[t.wi * 32 + 1 : least(t.wi * 32 + 64, n)] AS win
      FROM s, unnest(range(((n - 1) // 32) + 1)) AS t(wi)
    ),
    r AS (
      SELECT doc_id, win_idx,
             sqrt(CAST(list_sum(list_transform(win, x -> x * x)) AS DOUBLE)
                  / len(win)) >= {VAD_RMS_MIN} AS active
      FROM w
    ),
    g AS (
      SELECT doc_id, win_idx, active,
             win_idx - ROW_NUMBER() OVER (PARTITION BY doc_id, active
                                          ORDER BY win_idx) AS grp
      FROM r
    ),
    seg AS (
      SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS seg_len
      FROM g WHERE active GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(seg_len) AS BIGINT) AS n_active_windows,
           CAST(MAX(seg_len) AS BIGINT) AS longest_segment
    FROM seg GROUP BY doc_id
    """,
    tags=("multimodal", "audio", "segments", "pandas-udf"),
)
def multimodal_audio_activity_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-style segmentation over the audio modality:
    the Arrow RMS kernel's windows gate on an energy threshold, then
    consecutive active windows compress into segments by the
    gaps-and-islands trick (win_idx − row_number per activity run is
    constant within a run — the same machinery as the SCD2 query,
    applied to media). Per doc: segment count, active-window total,
    longest run — the features an audio-curation pipeline filters on
    (silence-heavy or clipped payloads drop before training).

    Composition is the point: the kernel output (doc, win_idx, rms)
    feeds plain relational windows — media features become rows the
    instant they leave the Arrow boundary, and everything downstream
    inherits the engine's operators. One doc-partitioned window over
    the (bounded, windows-per-doc) kernel output; the RMS itself is
    integer sum-of-squares then one double sqrt, so the threshold
    compare cannot drift cross-engine.
    """
    from hailstorm_spark.operators.multimodal import audio_window_rms

    r = audio_window_rms(_media(spark, sf_dir)).select(
        "doc_id", "win_idx", (F.col("rms") >= VAD_RMS_MIN).alias("active")
    )
    w = Window.partitionBy("doc_id", "active").orderBy("win_idx")
    g = r.withColumn("grp", F.col("win_idx") - F.row_number().over(w))
    seg = (
        g.filter(F.col("active"))
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).cast("long").alias("seg_len"))
    )
    return seg.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("seg_len").cast("long").alias("n_active_windows"),
        F.max("seg_len").cast("long").alias("longest_segment"),
    )
