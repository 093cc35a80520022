"""Multimodal plumbing: payload convention, decode metadata, feature
extraction, resize, frame sampling — schemas, batch shapes and size
invariants are real even though the media decode itself is stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_poc_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_payload,
    decode_media_stub,
    extract_features,
    resize_media,
    sample_frames,
)
from iceberg_poc_spark.sources import load_table
from tests.conftest import SF_DIR


@pytest.fixture
def payloads(spark):
    return attach_payload(
        load_table(spark, SF_DIR, "documents").limit(200).repartition(4)
    )


def test_payload_convention(payloads):
    assert dict(payloads.dtypes)["payload"] == "binary"
    meta = payloads.select("media_meta.byte_len", "media_meta.content_type").first()
    assert meta.byte_len > 0 and meta.content_type == "application/octet-stream"


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media_stub(b"\x89PNG...")


def test_extract_features_fixed_dim_normalized(payloads):
    out = extract_features(payloads)
    rows = out.collect()
    assert len(rows) == 200
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    assert all(abs(sum(r.features) - 1.0) < 1e-5 for r in rows)


def test_resize_enforces_target_size(payloads):
    out = resize_media(payloads, width=8, height=4)
    got = out.select(F.octet_length("payload").alias("n"), "width", "height")
    assert got.filter(F.col("n") != 32).count() == 0
    assert got.filter((F.col("width") != 8) | (F.col("height") != 4)).count() == 0


def test_sample_frames_expands_rows(payloads):
    out = sample_frames(payloads, frame_bytes=64, every_n=4)
    assert out.count() > 200  # row expansion: docs -> multiple frames
    per_doc = out.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert per_doc.filter(F.col("n") < 1).count() == 0
    # frame indexes step by every_n
    idx = out.filter(F.col("frame_idx") % 4 != 0).count()
    assert idx == 0
    # all but possibly the last frame of each doc are full-size
    sizes = out.select(F.octet_length("frame").alias("n"))
    assert sizes.filter(F.col("n") > 64).count() == 0
