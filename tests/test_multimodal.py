"""Multimodal binary-column plumbing: schema, batch shape, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from flink_mm_spark.operators.multimodal import (
    decode_features,
    media_table,
    resize_images,
    sample_frames,
)
from tests.conftest import SF_DIR


def test_media_table_schema(spark):
    m = media_table(spark, SF_DIR)
    assert isinstance(m.schema["payload"].dataType, T.BinaryType)
    meta = m.schema["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert {f.name for f in meta.fields} == {
        "width", "height", "format", "sample_rate", "duration_ms", "n_frames", "fps",
    }
    row = m.filter("media_type = 'image'").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["width"] % 32 == 0 and row["meta"]["sample_rate"] is None


def test_n_bytes_metadata_matches_payload(spark):
    """media_table stores payload size as ingest metadata (from n_chars);
    this guards the corpus assumption that it equals the true byte length."""
    from pyspark.sql import functions as F

    m = media_table(spark, SF_DIR)
    bad = m.filter(F.octet_length("payload") != F.col("n_bytes")).count()
    assert bad == 0


def test_real_codec_path_is_stubbed(spark):
    m = media_table(spark, SF_DIR).limit(2)
    with pytest.raises(Exception, match="NotImplementedError|real codec"):
        decode_features(m, real_codec=True).collect()


def test_fake_decode_deterministic(spark):
    m = media_table(spark, SF_DIR).filter("media_id < 20")
    a = sorted(decode_features(m).collect())
    b = sorted(decode_features(m).collect())
    assert a == b
    assert all(len(r["payload_md5"]) == 32 and 0.0 <= r["mean_luma"] < 1.0 for r in a)


def test_frame_sample_counts(spark):
    m = media_table(spark, SF_DIR)
    frames = sample_frames(m, every_n=5)
    got = frames.groupBy("media_id").count().collect()
    meta = {r["media_id"]: r["meta"]["n_frames"] for r in m.filter("media_type='video'").collect()}
    assert len(got) == len(meta) > 0
    for r in got:
        n = meta[r["media_id"]]
        assert r["count"] == (n + 4) // 5  # ceil(n/5) sampled frames


def test_resize_prunes_payload(spark):
    plan = resize_images(media_table(spark, SF_DIR), 64, 64)._jdf.queryExecution().optimizedPlan().toString()
    assert "text" not in plan.lower() or "payload" not in plan  # payload column pruned
