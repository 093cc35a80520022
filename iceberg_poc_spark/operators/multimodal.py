"""Multimodal column plumbing (✦ north-star, SURVEY.md §2B).

Convention: media payloads are opaque ``binary`` columns next to a typed
metadata struct. The decode / feature-extract step runs as Arrow-batched
``mapInPandas`` so each Python worker sees whole record batches — the
real 100 TB pattern (decode happens where the bytes already live; only
small metadata shuffles).

The decode is REAL: a pure-Python/numpy toy-codec suite for three actual
container formats parseable without media libraries — binary PPM (P6),
24-bit BMP (BITMAPINFOHEADER, bottom-up padded rows), and 8-bit PCM WAV
(RIFF chunk walk). :func:`decode_media` sniffs magic bytes and parses the
real header + payload (no metadata side-channel); the q_multimodal_meta
oracle recomputes every decoded field closed-form from doc_id, so a
broken encoder/decoder roundtrip fails the correctness gate. Swapping in
PIL/librosa for richer formats changes only :func:`decode_media`'s body —
the Arrow kernels, schemas and batch shapes are identical.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from iceberg_poc_spark.registry import register
from iceberg_poc_spark.sources import load_table
from iceberg_poc_spark.functions.sqlround import dround

MEDIA_KINDS = ("ppm", "bmp", "wav")
WAV_RATE = 8000

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("byte_len", LongType(), False),
        StructField("mean_val", DoubleType(), False),
    ]
)


# ----------------------------------------------------------- toy codec suite
def media_dims(doc_id: int) -> tuple[str, int, int]:
    """Deterministic (kind, width, height) for a doc — the generator's
    ground truth, mirrored closed-form by the oracle. For wav, width is
    the sample count and height is 1."""
    kid = doc_id % 3
    if kid == 0:
        return "ppm", doc_id % 32 + 8, (doc_id * 3) % 24 + 8
    if kid == 1:
        return "bmp", doc_id % 24 + 4, (doc_id * 5) % 16 + 4
    return "wav", doc_id % 1000 + 100, 1


def _pattern(doc_id: int, n: int) -> np.ndarray:
    """Pixel/sample byte k = (doc_id + k) % 256 — closed-form for SQL."""
    return ((doc_id + np.arange(n, dtype=np.int64)) % 256).astype(np.uint8)


def encode_media(doc_id: int) -> bytes:
    """Write REAL container bytes for the doc's assigned format."""
    kind, w, h = media_dims(doc_id)
    if kind == "ppm":
        return b"P6\n%d %d\n255\n" % (w, h) + _pattern(doc_id, w * h * 3).tobytes()
    if kind == "bmp":
        stride = (w * 3 + 3) // 4 * 4
        px = _pattern(doc_id, w * h * 3).reshape(h, w * 3)
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = px[::-1]  # BMP stores rows bottom-up
        size = 54 + stride * h
        header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
        )
        return header + rows.tobytes()
    n = w  # wav: width carries the sample count
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE, 1, 8)
        + b"data"
        + struct.pack("<I", n)
        + _pattern(doc_id, n).tobytes()
    )


def decode_media(payload: bytes) -> dict:
    """REAL decode: sniff the magic, parse the actual header, slice the
    actual pixel/sample bytes. Raises ValueError on unknown containers."""
    if payload[:2] == b"P6":
        # whitespace-separated ASCII header: P6 <w> <h> <maxval><ws>
        idx, tokens = 2, []
        while len(tokens) < 3:
            while payload[idx : idx + 1].isspace():
                idx += 1
            start = idx
            while not payload[idx : idx + 1].isspace():
                idx += 1
            tokens.append(int(payload[start:idx]))
        idx += 1  # exactly one whitespace byte after maxval
        w, h, _maxval = tokens
        px = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=idx)
        return {"kind": "ppm", "width": w, "height": h, "samples": px}
    if payload[:2] == b"BM":
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w = struct.unpack_from("<i", payload, 18)[0]
        h = abs(struct.unpack_from("<i", payload, 22)[0])
        bpp = struct.unpack_from("<H", payload, 28)[0]
        bytes_px = bpp // 8
        stride = (w * bytes_px + 3) // 4 * 4
        rows = np.frombuffer(
            payload, np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)
        return {
            "kind": "bmp",
            "width": w,
            "height": h,
            "samples": rows[:, : w * bytes_px],
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        off, fmt, data = 12, None, None
        while off + 8 <= len(payload):
            cid = payload[off : off + 4]
            sz = struct.unpack_from("<I", payload, off + 4)[0]
            if cid == b"fmt ":
                fmt = payload[off + 8 : off + 8 + sz]
            elif cid == b"data":
                data = payload[off + 8 : off + 8 + sz]
            off += 8 + sz + (sz & 1)
        if fmt is None or len(fmt) < 16 or data is None:
            raise ValueError("malformed WAVE container: missing fmt/data chunk")
        channels = struct.unpack_from("<H", fmt, 2)[0]
        bits = struct.unpack_from("<H", fmt, 14)[0]
        n = len(data) // (bits // 8) // channels
        return {
            "kind": "wav",
            "width": n,
            "height": 1,
            "samples": np.frombuffer(data, np.uint8),
        }
    raise ValueError(f"unknown media container: {payload[:4]!r}")


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


def encode_media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: doc ids in, real container bytes out — the
    synthetic-media generator (stands where an object-store fetch of raw
    media bytes would sit in a production pipeline)."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [encode_media(int(d)) for d in pdf["doc_id"]],
            }
        )


def decode_media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow record batches of binary payloads in,
    decoded metadata + pixel statistics out. Per-row decode by nature
    (each payload is its own container), numpy for the pixel math."""
    for pdf in batches:
        out = {
            "doc_id": [],
            "kind": [],
            "width": [],
            "height": [],
            "byte_len": [],
            "mean_val": [],
        }
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(p)
            m = decode_media(b)
            out["doc_id"].append(int(doc_id))
            out["kind"].append(m["kind"])
            out["width"].append(m["width"])
            out["height"].append(m["height"])
            out["byte_len"].append(len(b))
            # sum of <=3627 bytes is exact in float64 -> division matches
            # the oracle's list_avg bit-for-bit
            out["mean_val"].append(
                float(np.asarray(m["samples"], dtype=np.float64).mean())
            )
        yield pd.DataFrame(out)


@register(
    "q_multimodal_meta",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, doc_id % 3 AS kid,
               CASE doc_id % 3 WHEN 0 THEN doc_id % 32 + 8
                               WHEN 1 THEN doc_id % 24 + 4
                               ELSE doc_id % 1000 + 100 END AS w,
               CASE doc_id % 3 WHEN 0 THEN (doc_id * 3) % 24 + 8
                               WHEN 1 THEN (doc_id * 5) % 16 + 4
                               ELSE 1 END AS h
        FROM documents
    ),
    n AS (SELECT *, CASE WHEN kid = 2 THEN w ELSE w * h * 3 END AS npix FROM m)
    SELECT doc_id,
           CASE kid WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp' ELSE 'wav' END AS kind,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(CASE kid
                WHEN 0 THEN 9 + length(CAST(w AS VARCHAR))
                         + length(CAST(h AS VARCHAR)) + npix
                WHEN 1 THEN 54 + ((w * 3 + 3) // 4) * 4 * h
                ELSE 44 + npix END AS BIGINT) AS byte_len,
           {dround("list_avg(list_transform(range(0, npix), k -> (doc_id + k) % 256))", 4)}
             AS mean_val
    FROM n
    """,
    doc="REAL multimodal decode, end-to-end: an encode kernel writes "
    "actual PPM/BMP/WAV container bytes per document, a decode kernel "
    "sniffs magic bytes and parses the true headers + pixel/sample data "
    "(struct.unpack, stride/padding handling, RIFF chunk walk), and "
    "reports dimensions, container size and mean pixel value. The oracle "
    "recomputes every field closed-form from doc_id — any header-layout "
    "or byte-slicing bug in either codec direction breaks the hash "
    "match. Two chained Arrow kernels, no shuffle between them; bytes "
    "never leave the task that decoded them.",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition: the corpus is one file; without it the Python decode
    # workers would see a single Arrow stream (no parallelism).
    docs = load_table(spark, sf_dir, "documents").repartition(F.col("doc_id"))
    media = docs.select("doc_id").mapInPandas(
        encode_media_batches, schema="doc_id long, payload binary"
    )
    decoded = media.mapInPandas(decode_media_batches, schema=META_SCHEMA)
    return decoded.withColumn("mean_val", F.round("mean_val", 4))


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


def feature_hist_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: payload -> LONG-FORM exact histogram counts
    (doc_id, bin, cnt) over the decoded samples' high nibble. Integer
    counts (not the float32 normalized vector of extract_features) so the
    downstream share division happens JVM-side in float64 — exactly
    reproducible by the oracle; a float32 share would flake at the 4-dp
    rounding boundary."""
    import numpy as np

    for pdf in batches:
        doc_ids, bins, cnts = [], [], []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_media(bytes(p))
            arr = np.asarray(m["samples"], dtype=np.uint8).reshape(-1)
            hist = np.bincount(arr >> 4, minlength=FEATURE_DIM)
            for b in range(FEATURE_DIM):
                doc_ids.append(int(doc_id))
                bins.append(b)
                cnts.append(int(hist[b]))
        yield pd.DataFrame({"doc_id": doc_ids, "bin": bins, "cnt": cnts})


@register(
    "q_multimodal_features",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, doc_id % 3 AS kid,
               CASE doc_id % 3 WHEN 0 THEN doc_id % 32 + 8
                               WHEN 1 THEN doc_id % 24 + 4
                               ELSE doc_id % 1000 + 100 END AS w,
               CASE doc_id % 3 WHEN 0 THEN (doc_id * 3) % 24 + 8
                               WHEN 1 THEN (doc_id * 5) % 16 + 4
                               ELSE 1 END AS h
        FROM documents
    ),
    n AS (SELECT doc_id, CASE WHEN kid = 2 THEN w ELSE w * h * 3 END AS npix
          FROM m),
    s AS (
        SELECT doc_id, npix,
               CAST(((doc_id + UNNEST(range(npix))) % 256) // 16 AS INT) AS bin
        FROM n
    )
    SELECT doc_id, bin,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {dround("CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(npix)", 4)} AS share
    FROM s GROUP BY doc_id, bin
    """,
    doc="Multimodal feature extraction as an oracle-checked query: decode "
    "the real container bytes, histogram the samples' high nibble "
    "(16 bins — the deterministic stand-in for an embedding extractor), "
    "and report per-bin EXACT counts plus the float64 share. The kernel "
    "emits integer counts so the share division runs JVM-side in "
    "float64, bit-identical to the oracle's closed-form recomputation "
    "from doc_id; empty bins are absent on both sides (long-form "
    "sparsity). Chained Arrow kernels, map-side; the aggregate shuffles "
    "(doc, bin) count rows, never payload bytes.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(F.col("doc_id"))
    media = docs.select("doc_id").mapInPandas(
        encode_media_batches, schema="doc_id long, payload binary"
    )
    hist = media.mapInPandas(
        feature_hist_batches, schema="doc_id long, bin int, cnt long"
    )
    total = Window.partitionBy("doc_id")
    return (
        hist.filter(F.col("cnt") > 0)
        .withColumn(
            "share",
            F.round(F.col("cnt").cast("double") / F.sum("cnt").over(total), 4),
        )
    )


# ------------------------------------------------- resize / frame-sample

RESIZE_MAX = 8  # target grid edge (images) / frame count (audio)


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: decode, then nearest-neighbor-downsample images
    to an at-most RESIZE_MAX x RESIZE_MAX grid / stride-sample audio to
    at most RESIZE_MAX frames. Deterministic index math (source index
    i*src//dst) — the toy stand-in for a real resampler; emits exact
    integer sums so the mean division stays JVM-side float64. BMP rows
    are flipped back to logical top-down order (the container stores
    them bottom-up) so sampling indices agree with the closed-form
    oracle."""
    for pdf in batches:
        out = {
            "doc_id": [], "kind": [], "out_w": [], "out_h": [],
            "n_out": [], "sum_val": [],
        }
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            m = decode_media(bytes(p))
            kind, w, h = m["kind"], m["width"], m["height"]
            if kind == "wav":
                flat = np.asarray(m["samples"], dtype=np.int64).reshape(-1)
                n_out = min(w, RESIZE_MAX)
                idx = (np.arange(n_out, dtype=np.int64) * w) // n_out
                picked = flat[idx]
                ow, oh = n_out, 1
            else:
                arr = np.asarray(m["samples"], dtype=np.int64).reshape(h, w * 3)
                if kind == "bmp":
                    arr = arr[::-1]
                ow, oh = min(w, RESIZE_MAX), min(h, RESIZE_MAX)
                ri = (np.arange(oh, dtype=np.int64) * h) // oh
                cj = (np.arange(ow, dtype=np.int64) * w) // ow
                cols = (cj[:, None] * 3 + np.arange(3)).reshape(-1)
                picked = arr[np.ix_(ri, cols)].reshape(-1)
                n_out = ow * oh * 3
            out["doc_id"].append(int(doc_id))
            out["kind"].append(kind)
            out["out_w"].append(int(ow))
            out["out_h"].append(int(oh))
            out["n_out"].append(int(n_out))
            out["sum_val"].append(int(picked.sum()))
        yield pd.DataFrame(out)


@register(
    "q_multimodal_resize",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, doc_id % 3 AS kid,
               CASE doc_id % 3 WHEN 0 THEN doc_id % 32 + 8
                               WHEN 1 THEN doc_id % 24 + 4
                               ELSE doc_id % 1000 + 100 END AS w,
               CASE doc_id % 3 WHEN 0 THEN (doc_id * 3) % 24 + 8
                               WHEN 1 THEN (doc_id * 5) % 16 + 4
                               ELSE 1 END AS h
        FROM documents
    ),
    d AS (
        SELECT doc_id, kid, w, h,
               least(w, {RESIZE_MAX}) AS ow,
               CASE WHEN kid = 2 THEN 1 ELSE least(h, {RESIZE_MAX}) END AS oh
        FROM m
    ),
    s AS (
        SELECT doc_id, kid, w, h, ow, oh,
               CASE WHEN kid = 2 THEN ow ELSE ow * oh * 3 END AS n_out,
               CASE WHEN kid = 2 THEN
                 list_sum(list_transform(range(0, ow),
                   k -> (doc_id + (k * w) // ow) % 256))
               ELSE
                 list_sum(list_transform(range(0, ow * oh * 3),
                   k -> (doc_id
                         + (((k // (ow * 3)) * h // oh) * w
                            + (((k % (ow * 3)) // 3) * w // ow)) * 3
                         + k % 3) % 256))
               END AS sum_val
        FROM d
    )
    SELECT doc_id,
           CASE kid WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp' ELSE 'wav' END
               AS kind,
           CAST(ow AS INT) AS out_w,
           CAST(oh AS INT) AS out_h,
           CAST(n_out AS BIGINT) AS n_out,
           {dround("CAST(sum_val AS DOUBLE) / n_out", 4)} AS mean_val
    FROM s
    """,
    doc="Multimodal resize / frame-sample: decode the real container "
    f"bytes, nearest-neighbor-downsample images to <= {RESIZE_MAX}x"
    f"{RESIZE_MAX} (source row i*h//oh, col j*w//ow — the index math of "
    "a real NN resampler), stride-sample audio to <= "
    f"{RESIZE_MAX} frames (frame k at sample k*n//{RESIZE_MAX}), and "
    "report the sampled grid's dims and exact-integer mean. BMP's "
    "bottom-up row order is undone before sampling, so a row-flip bug "
    "shifts the sampled indices and breaks the hash against the "
    "closed-form oracle. Same chained-Arrow-kernel shape as "
    "q_multimodal_meta: decode+sample run where the bytes live, only "
    "(doc, dims, sum) rows ever shuffle — at 100 TB the payload never "
    "crosses the network, which is the entire point of pushing resize "
    "into the scan.",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").repartition(F.col("doc_id"))
    media = docs.select("doc_id").mapInPandas(
        encode_media_batches, schema="doc_id long, payload binary"
    )
    sampled = media.mapInPandas(
        resize_batches,
        schema="doc_id long, kind string, out_w int, out_h int, "
        "n_out long, sum_val long",
    )
    return sampled.select(
        "doc_id", "kind", "out_w", "out_h", "n_out",
        F.round(F.col("sum_val").cast("double") / F.col("n_out"), 4).alias(
            "mean_val"
        ),
    )


DUP_MOD = 64  # distinct media assets; every doc re-keys onto one of them


def _encode_media_by_key(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, media_id) in, real container bytes for
    media_id out — the duplicated-asset generator (the same image/audio
    file crawled under many URLs)."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": [encode_media(int(m)) for m in pdf["media_id"]],
            }
        )


@register(
    "q_multimodal_dedup",
    oracle=f"""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY doc_id % {DUP_MOD}
    ORDER BY canonical_doc_id
    """,
    doc=f"Binary-payload dedup — the image/audio exact-dedup step of "
    f"multimodal corpus prep (the same asset crawled under many URLs): "
    f"each document carries real container bytes for one of {DUP_MOD} "
    f"distinct media assets (doc_id % {DUP_MOD} through the PPM/BMP/WAV "
    f"codec suite — injective, since the byte pattern embeds the media "
    f"id), payloads are content-hashed JVM-SIDE with sha2(payload, 256) "
    f"— Python only generates bytes; the dedup groupBy shuffles 32-byte "
    f"digests, never payloads — and each duplicate group reports its "
    f"canonical (minimum) doc_id and multiplicity. The oracle derives "
    f"the same groups closed-form from the re-keying rule. At 100 TB "
    f"this is the only viable exact-dedup shape for media: hash where "
    f"the bytes live, shuffle only digests.",
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .repartition(F.col("doc_id"))
        .select("doc_id", (F.col("doc_id") % DUP_MOD).alias("media_id"))
    )
    with_payload = docs.mapInPandas(
        _encode_media_by_key, schema="doc_id long, payload binary"
    )
    return (
        with_payload.select("doc_id", F.sha2(F.col("payload"), 256).alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").cast("bigint").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("canonical_doc_id", "n_copies")
        .orderBy("canonical_doc_id")
    )
