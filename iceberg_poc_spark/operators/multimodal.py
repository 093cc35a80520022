"""Multimodal column plumbing (✦ north-star, SURVEY.md §2B).

Convention: media payloads are opaque ``binary`` columns next to a typed
metadata struct. The decode / feature-extract step runs as Arrow-batched
``mapInPandas`` so each Python worker sees whole record batches — the
real 100 TB pattern (decode happens where the bytes already live; only
small metadata shuffles).

The image/audio libraries are not in this container, so the actual decode
is STUBBED: :func:`decode_media_stub` raises NotImplementedError, and the
query path uses :func:`fake_decode_meta`, a deterministic arithmetic stand-
in, keeping the Spark-side plumbing (schema, batching, UDF signature) real
and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table

MEDIA_KINDS = ("image", "audio", "video")

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("byte_len", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("kind", StringType(), False),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Materialize the multimodal convention on the documents table: a
    ``binary`` payload column (utf-8 bytes of the text stand in for media
    bytes) plus a typed metadata struct."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("bigint").alias("byte_len"),
            F.lit("application/octet-stream").alias("content_type"),
        ).alias("media_meta"),
    )


def decode_media_stub(payload: bytes) -> dict:
    """REAL decode goes here (PIL / librosa / pyav). Not available in this
    container — deliberately stubbed."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this "
        "container; use fake_decode_meta for plumbing tests"
    )


def fake_decode_meta(doc_id: int, payload: bytes) -> tuple[int, int, int, int, str]:
    """Deterministic arithmetic stand-in for decode: derives fake
    width/height/kind from the byte length (mirrored by the oracle SQL)."""
    n = len(payload)
    return (
        doc_id,
        n,
        n % 640 + 16,
        (n * 7) % 480 + 16,
        MEDIA_KINDS[n % 3],
    )


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow record batches in, metadata batches out.

    The stand-in arithmetic vectorizes over the whole batch; a REAL decode
    (PIL/librosa) is per-row by nature — swap the vectorized lines for a
    ``payload.map(decode_media_stub)`` and the plumbing is unchanged."""
    kind_map = {i: k for i, k in enumerate(MEDIA_KINDS)}
    for pdf in batches:
        n = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": n.astype("int64"),
                "width": (n % 640 + 16).astype("int32"),
                "height": ((n * 7) % 480 + 16).astype("int32"),
                "kind": (n % 3).map(kind_map),
            }
        )


@register(
    "q_multimodal_meta",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)            AS byte_len,
           CAST(octet_length(encode(text)) % 640 + 16 AS INT)    AS width,
           CAST((octet_length(encode(text)) * 7) % 480 + 16 AS INT) AS height,
           CASE octet_length(encode(text)) % 3
                WHEN 0 THEN '{MEDIA_KINDS[0]}'
                WHEN 1 THEN '{MEDIA_KINDS[1]}'
                ELSE '{MEDIA_KINDS[2]}' END              AS kind
    FROM documents
    """,
    doc="Multimodal decode plumbing: binary payload + mapInPandas "
    "(Arrow-batched) metadata extraction with a deterministic fake "
    "decode; the oracle mirrors the arithmetic on octet_length.",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition: the corpus is one file; without it the Python decode
    # workers would see a single Arrow stream (no parallelism).
    docs = load_table(spark, sf_dir, "documents").repartition(F.col("doc_id"))
    with_payload = attach_payload(docs)
    return with_payload.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=META_SCHEMA
    )


# ------------------------------------------------ feature / resize / frames

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("features", ArrayType(FloatType(), False), False),
    ]
)


def extract_features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: payload -> fixed-size float feature vector.
    Deterministic stand-in (normalized 16-bin byte histogram) for a real
    embedding/CNN feature extractor; the plumbing — Arrow batches in,
    array<float> column out — is exactly what the real one uses."""
    import numpy as np

    for pdf in batches:
        feats = []
        for p in pdf["payload"]:
            arr = np.frombuffer(bytes(p), dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype("float32")
            total = hist.sum()
            feats.append((hist / total if total else hist).tolist())
        yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "features": feats})


def extract_features(docs_with_payload: DataFrame) -> DataFrame:
    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        extract_features_batches, schema=FEATURES_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)


def resize_media(docs_with_payload: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: binary in -> binary out at a declared target size.
    REAL decode+resample (PIL `Image.resize`) is unavailable in this
    container — the stand-in truncates/zero-pads to width*height bytes,
    keeping output schema, size invariants and batch shape identical to
    the real kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = [bytes(p)[:target].ljust(target, b"\0") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        kernel, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def sample_frames(
    docs_with_payload: DataFrame, frame_bytes: int = 64, every_n: int = 4
) -> DataFrame:
    """Frame-sampling plumbing (video -> every Nth frame as its own row):
    one input row expands to F rows — the UDTF shape a real pyav/ffmpeg
    sampler produces. Stand-in frames are fixed-size byte chunks."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = max(1, len(b) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(out)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        kernel, schema=FRAMES_SCHEMA
    )
