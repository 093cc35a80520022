"""Multimodal plumbing: payload convention, real toy-codec roundtrip
(PPM/BMP/WAV), feature extraction, resize, frame sampling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from iceberg_poc_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_payload,
    decode_media,
    encode_media,
    extract_features,
    media_dims,
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


@pytest.mark.parametrize("doc_id", [0, 1, 2, 7, 30, 31, 32, 100, 997, 998, 12345])
def test_codec_roundtrip(doc_id):
    """encode -> decode recovers the generator's ground truth from the
    parsed container alone (dims from headers, stats from payload)."""
    kind, w, h = media_dims(doc_id)
    m = decode_media(encode_media(doc_id))
    assert (m["kind"], m["width"], m["height"]) == (kind, w, h)
    n = w if kind == "wav" else w * h * 3
    expect = ((doc_id + np.arange(n, dtype=np.int64)) % 256).astype(np.uint8)
    got = np.asarray(m["samples"]).reshape(-1)
    assert got.shape == expect.shape
    # BMP rows come back bottom-up; the byte multiset is order-invariant
    assert np.array_equal(np.sort(got), np.sort(expect))
    # mean must be exactly the closed-form mean the oracle computes
    assert np.asarray(m["samples"], dtype=np.float64).mean() == expect.astype(
        np.float64
    ).mean()


def test_decode_rejects_unknown_container():
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\n....")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=10**9))
    def test_codec_roundtrip_fuzz(doc_id):
        """Any doc_id's container decodes back to its generator ground
        truth — exercises header edge cases (1- vs 2-digit PPM dims, BMP
        stride padding 0-3 bytes, odd WAV data sizes) across the id
        space."""
        kind, w, h = media_dims(doc_id)
        m = decode_media(encode_media(doc_id))
        assert (m["kind"], m["width"], m["height"]) == (kind, w, h)
        n = w if kind == "wav" else w * h * 3
        assert np.asarray(m["samples"]).reshape(-1).shape == (n,)
except ImportError:  # hypothesis is available in this container; belt+braces
    pass


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
