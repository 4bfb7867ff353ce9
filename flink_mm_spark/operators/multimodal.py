"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The reference engine's data model is numeric-only (SURVEY §1), but the
north-star workload — a large-scale training-data pipeline — needs media
columns. The design here follows the brief exactly:

- media payloads are **opaque ``BINARY`` columns** with a typed metadata
  struct alongside (width/height/format for images, sample_rate/duration for
  audio, n_frames/fps for video);
- decode / feature-extract / resize / frame-sample are **Arrow-batched
  Pandas UDFs over ``mapInPandas``** — the real 100 TB plumbing (schema,
  partitioning, batch shape) with the codec itself stubbed: the container
  has no PIL/ffmpeg, so the real-codec path raises ``NotImplementedError``
  and the default path is a *deterministic fake decode* (md5-derived
  features) that the DuckDB oracle can reproduce.

At 100 TB the payload column dominates I/O: every query below projects the
payload only inside the Pandas UDF stage and aggregates on metadata
columns otherwise, so parquet column pruning keeps the binary bytes out of
scans that don't need them (check ReadSchema in .explain).

Since the driver testdata has no binary table, ``media_table`` derives one
deterministically from ``documents`` (payload = UTF-8 bytes of ``text``)
entirely with JVM-side expressions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_mm_spark.registry import register
from flink_mm_spark.sources.tables import table

MEDIA_TYPES = ["image", "audio", "video"]


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → media(media_id, media_type, payload BINARY, meta STRUCT).

    Pure JVM expressions (no Python): payload is the UTF-8 encoding of the
    document text; modality and typed metadata derive from doc_id/n_chars.
    Metadata is one struct with per-modality nullable fields — the same
    shape a real ingest (EXIF/codec probe) would produce.
    """
    d = table(spark, sf_dir, "documents")
    mt = F.element_at(F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int"))
    is_img, is_aud, is_vid = (mt == m for m in MEDIA_TYPES)
    return d.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.when(is_img, (32 * (F.col("doc_id") % 8 + 1)).cast("int")).alias("width"),
            F.when(is_img, (32 * ((F.col("doc_id") / 8).cast("long") % 8 + 1)).cast("int")).alias("height"),
            F.when(is_img, F.lit("png")).otherwise(F.when(is_aud, "wav").otherwise("mp4")).alias("format"),
            F.when(is_aud, (8000 * (F.col("doc_id") % 3 + 1)).cast("int")).alias("sample_rate"),
            F.when(is_aud, (100 * F.col("n_chars")).cast("bigint")).alias("duration_ms"),
            F.when(is_vid, (F.col("doc_id") % 30 + 1).cast("int")).alias("n_frames"),
            F.when(is_vid, F.lit(10)).cast("int").alias("fps"),
        ).alias("meta"),
        # payload size is ingest-time metadata (n_chars == octet_length for
        # this ASCII corpus, asserted in tests): metadata-only queries must
        # not force the payload/text column into their scan
        F.col("n_chars").alias("n_bytes"),
    )


# The SQL twin of media_table, kept in lockstep for the DuckDB oracles.
MEDIA_SQL = """
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
           text,
           CASE WHEN doc_id % 3 = 0 THEN CAST(32 * (doc_id % 8 + 1) AS INT) END AS width,
           CASE WHEN doc_id % 3 = 0 THEN CAST(32 * ((doc_id // 8) % 8 + 1) AS INT) END AS height,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
           CASE WHEN doc_id % 3 = 1 THEN CAST(8000 * (doc_id % 3 + 1) AS INT) END AS sample_rate,
           CASE WHEN doc_id % 3 = 1 THEN CAST(100 * n_chars AS BIGINT) END AS duration_ms,
           CASE WHEN doc_id % 3 = 2 THEN CAST(doc_id % 30 + 1 AS INT) END AS n_frames,
           CASE WHEN doc_id % 3 = 2 THEN 10 END AS fps,
           n_chars AS n_bytes
    FROM documents
"""


def _fake_decode(payload: bytes) -> tuple[str, float]:
    """Deterministic stand-in for a codec: md5 digest + a [0,1) 'luminance'.

    The first 8 hex digits, read as an integer over 2^32, emulate a mean
    pixel statistic; DuckDB reproduces it as CAST('0x'||substr(md5(t),1,8)
    AS BIGINT) / 2^32. Swap this body for PIL/libav when available.
    """
    digest = hashlib.md5(payload).hexdigest()
    return digest, round(int(digest[:8], 16) / 2**32, 6)


def decode_features(media: DataFrame, real_codec: bool = False) -> DataFrame:
    """Per-media feature extraction over mapInPandas (Arrow binary batches).

    ``real_codec=True`` is the marked stub for actual image/audio decoding —
    the container ships no PIL/ffmpeg, so it raises. The fake path exercises
    the exact production plumbing: binary column → Arrow → bytes per batch.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("payload_md5", T.StringType()),
            T.StructField("mean_luma", T.DoubleType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_codec:
                raise NotImplementedError(
                    "real codec decode (PIL/libav) is not available in this "
                    "container; use the deterministic fake path"
                )
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_md5": [d[0] for d in decoded],
                    "mean_luma": [d[1] for d in decoded],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(extract, schema)


def resize_images(media: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """Fake resize: metadata update + proportional payload-size estimate.

    A real implementation swaps the arithmetic for PIL inside the same
    mapInPandas stage; the schema contract (and hence the plan) is final.
    """
    img = media.filter(F.col("media_type") == "image")
    scale = (F.lit(new_w) * F.lit(new_h)) / (F.col("meta.width") * F.col("meta.height"))
    return img.select(
        "media_id",
        F.lit(new_w).alias("width"),
        F.lit(new_h).alias("height"),
        F.round(F.col("n_bytes") * scale, 2).alias("est_bytes"),
    )


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame sampling: explode frame indices JVM-side, then a
    per-frame 'extract' (fake: md5 of payload + frame ordinal) in Pandas.

    The explode happens before the UDF so Spark parallelizes by frame, not
    by video — the 100 TB shape where one long video must not pin a task.
    """
    vid = media.filter(F.col("media_type") == "video")
    frames = vid.select(
        "media_id",
        "payload",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_md5", T.StringType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_md5": [
                        hashlib.md5(p + b"#" + str(i).encode()).hexdigest()
                        for p, i in zip(pdf["payload"], pdf["frame_idx"])
                    ],
                }
            )

    return frames.mapInPandas(extract, schema)


@register(
    "media_metadata",
    oracle=f"""
    WITH media AS ({MEDIA_SQL})
    SELECT media_type,
           CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(max(coalesce(width, 0)) AS INT) AS max_width,
           CAST(max(coalesce(sample_rate, 0)) AS INT) AS max_sample_rate,
           CAST(sum(coalesce(n_frames, 0)) AS BIGINT) AS total_frames
    FROM media GROUP BY media_type ORDER BY media_type
    """,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup per modality — runs without touching payload
    bytes (column pruning drops the binary column from the scan)."""
    m = media_table(spark, sf_dir)
    return (
        m.groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max(F.coalesce(F.col("meta.width"), F.lit(0))).alias("max_width"),
            F.max(F.coalesce(F.col("meta.sample_rate"), F.lit(0))).alias("max_sample_rate"),
            F.sum(F.coalesce(F.col("meta.n_frames"), F.lit(0))).alias("total_frames"),
        )
        .orderBy("media_type")
    )


@register(
    "media_decode_features",
    oracle=f"""
    WITH media AS ({MEDIA_SQL})
    SELECT media_id, media_type, md5(text) AS payload_md5,
           ROUND(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) / 4294967296.0, 6) AS mean_luma,
           n_bytes
    FROM media WHERE media_id < 200 ORDER BY media_id
    """,
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas fake-decode over binary payloads (SNIPPETS [2] pattern);
    the oracle reproduces the md5-derived features byte-for-byte."""
    m = media_table(spark, sf_dir).filter(F.col("media_id") < 200)
    return decode_features(m).orderBy("media_id")


@register(
    "media_frame_sample",
    oracle=f"""
    WITH media AS ({MEDIA_SQL}),
    frames AS (
      SELECT media_id, text, CAST(f.i - 1 AS INT) AS frame_idx
      FROM media, (SELECT unnest(range(1, 31)) AS i) f
      WHERE media_type = 'video' AND (f.i - 1) % 5 = 0 AND f.i - 1 < n_frames
    )
    SELECT media_id, frame_idx,
           md5(text || '#' || CAST(frame_idx AS VARCHAR)) AS frame_md5
    FROM frames WHERE media_id < 500 ORDER BY media_id, frame_idx
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-5th-frame sampling of video payloads: JVM-side frame explode →
    Pandas-UDF frame extract (md5 fake), parallel by frame."""
    m = media_table(spark, sf_dir).filter(F.col("media_id") < 500)
    return sample_frames(m, every_n=5).orderBy("media_id", "frame_idx")


@register(
    "media_resize_estimate",
    oracle=f"""
    WITH media AS ({MEDIA_SQL})
    SELECT media_id, CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
           ROUND(n_bytes * (64.0 * 64.0) / (width * height), 2) AS est_bytes
    FROM media WHERE media_type = 'image' ORDER BY media_id
    """,
)
def media_resize_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize-to-64x64 planning pass (metadata arithmetic only — the
    real pixel work slots into the same stage when a codec exists)."""
    return resize_images(media_table(spark, sf_dir), 64, 64).orderBy("media_id")


FRAME = 64  # samples per analysis frame (fake PCM = payload bytes)
# Frames analyzed per document, capped IDENTICALLY on the Spark side and in
# the oracle (ADVICE r1: the oracle's frame enumeration is necessarily
# bounded; an unbounded Spark side silently diverges on docs ≥ cap·FRAME
# bytes at larger scale factors). tests/test_multimodal.py guards the cap.
MAX_FRAMES = 256


@register(
    "media_audio_energy",
    oracle=f"""
    WITH media AS ({{MEDIA_SQL}}),
    aud AS (SELECT media_id, text, n_bytes FROM media WHERE media_type = 'audio'),
    frames AS (
      SELECT media_id, CAST(f.i - 1 AS INT) AS frame_idx,
             list_sum(list_transform(range(1, {FRAME} + 1),
               j -> CAST(ascii(substr(text, CAST((f.i - 1) * {FRAME} + j AS INT), 1)) AS BIGINT)
                    * CAST(ascii(substr(text, CAST((f.i - 1) * {FRAME} + j AS INT), 1)) AS BIGINT)
             )) AS energy
      FROM aud, (SELECT unnest(range(1, {MAX_FRAMES + 1})) AS i) f
      WHERE f.i * {FRAME} <= n_bytes
    )
    SELECT media_id, frame_idx, CAST(energy AS BIGINT) AS energy
    FROM frames WHERE media_id < 300 ORDER BY media_id, frame_idx
    """.format(MEDIA_SQL=MEDIA_SQL),
)
def media_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: per-frame energy over the payload treated
    as 8-bit PCM (the deterministic fake; a real decoder slots into the
    same mapInPandas stage). Frames are full 64-byte windows, capped at the
    first ``MAX_FRAMES`` per document (same cap in the oracle); energy =
    Σ sample² as exact integers so the oracle matches bit-for-bit.
    """
    aud = media_table(spark, sf_dir).filter(
        (F.col("media_type") == "audio") & (F.col("media_id") < 300)
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("energy", T.LongType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, fidx, energy = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n_frames = min(len(samples) // FRAME, MAX_FRAMES)
                if n_frames == 0:
                    continue
                e = (samples[: n_frames * FRAME].reshape(n_frames, FRAME) ** 2).sum(axis=1)
                ids.extend([mid] * n_frames)
                fidx.extend(range(n_frames))
                energy.extend(e.tolist())
            yield pd.DataFrame({"media_id": ids, "frame_idx": fidx, "energy": energy})

    return (
        aud.select("media_id", "payload")
        .mapInPandas(extract, schema)
        .orderBy("media_id", "frame_idx")
    )
