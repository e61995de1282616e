"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata —
the same pattern as the crawl's ``content`` table (Content.java:51-63:
url → bytes + contentType + metadata). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so
bytes stream through workers in columnar batches and never transit the
driver.

The decode kernels themselves are STUBBED (the image/audio libraries
are not in this container): ``deterministic=True`` produces a seeded
fake (hash-derived) so the Spark-side plumbing — schema, partitioning,
UDF signature, batch shape — is real and testable end-to-end;
``deterministic=False`` raises NotImplementedError where a real
pillow/ffmpeg kernel would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, MapType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image|audio|video
    StructField("payload", BinaryType(), True),
    StructField("mime", StringType(), True),
    StructField("meta", MapType(StringType(), StringType()), True),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("embedding", ArrayType(FloatType()), True),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), True),
])


def _fake_decode(payload: bytes, dims: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: bytes → unit vector
    seeded by the payload digest."""
    digest = hashlib.md5(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    v = rng.standard_normal(dims).astype(np.float32)
    return v / max(float(np.linalg.norm(v)), 1e-9)


def image_features(media: DataFrame, dims: int = 8,
                   deterministic: bool = True) -> DataFrame:
    """Decode + feature-extract images → IMAGE_FEATURES_SCHEMA.
    Arrow-batched; each batch stays columnar worker-side."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real image decode requires pillow; container has "
                    "none — deterministic=True exercises the plumbing")
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(b).digest()
                rows.append({
                    "media_id": int(mid),
                    "width": 16 + digest[0] % 64,
                    "height": 16 + digest[1] % 64,
                    "embedding": _fake_decode(b, dims).tolist(),
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "embedding"])

    return (media.where(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(run, IMAGE_FEATURES_SCHEMA))


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("duration_ms", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("embedding", ArrayType(FloatType()), True),
])

RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("payload", BinaryType(), True),
])


def audio_features(media: DataFrame, dims: int = 8,
                   deterministic: bool = True) -> DataFrame:
    """Decode + feature-extract audio → AUDIO_FEATURES_SCHEMA
    (duration/sample-rate metadata + a fixed-dim embedding). Same
    Arrow-batched ``mapInPandas`` shape as ``image_features``; the
    stub derives duration/rate from the payload digest where a real
    kernel would read the container header (soundfile/ffmpeg)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real audio decode requires soundfile/ffmpeg; "
                    "container has none — deterministic=True exercises "
                    "the plumbing")
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(b).digest()
                rows.append({
                    "media_id": int(mid),
                    "duration_ms": 100 + digest[2] * 37,
                    "sample_rate": (8000, 16000, 44100)[digest[3] % 3],
                    "embedding": _fake_decode(b, dims).tolist(),
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "duration_ms", "sample_rate", "embedding"])

    return (media.where(F.col("kind") == "audio")
            .select("media_id", "payload")
            .mapInPandas(run, AUDIO_FEATURES_SCHEMA))


def resize_images(media: DataFrame, width: int = 32, height: int = 32,
                  deterministic: bool = True) -> DataFrame:
    """Resize images → RESIZED_SCHEMA (fixed target dims + new
    payload). The stub re-derives a payload of exactly width×height
    bytes from the source digest — byte-size behaves like a real
    thumbnail (bounded, independent of input size), so partition-size
    planning downstream is realistic; a pillow kernel slots into the
    same batch loop."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError(
                    "real image resize requires pillow")
            out = {"media_id": [], "width": [], "height": [],
                   "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(b).digest()
                rng = np.random.default_rng(
                    int.from_bytes(digest[8:16], "big"))
                out["media_id"].append(int(mid))
                out["width"].append(width)
                out["height"].append(height)
                out["payload"].append(rng.integers(
                    0, 256, size=width * height,
                    dtype=np.uint8).tobytes())
            yield pd.DataFrame(out)

    return (media.where(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(run, RESIZED_SCHEMA))


def sample_frames(media: DataFrame, every_n: int = 10,
                  max_frames: int = 4,
                  deterministic: bool = True) -> DataFrame:
    """Frame-sample videos → FRAME_SCHEMA (one row per sampled frame).
    The stub slices the payload bytes as fake frames; a real kernel
    would seek with ffmpeg at the same batch boundaries."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic:
                raise NotImplementedError("real frame sampling needs ffmpeg")
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n = min(max_frames, max(1, len(b) // max(every_n, 1)))
                for i in range(n):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["frame"].append(b[i * every_n:(i + 1) * every_n])
            yield pd.DataFrame(out)

    return (media.where(F.col("kind") == "video")
            .select("media_id", "payload")
            .mapInPandas(run, FRAME_SCHEMA))


def make_media_fixture(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media fixture (binary payloads + typed meta)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=64 + (i % 5) * 32,
                               dtype=np.uint8).tobytes()
        rows.append((i, kind, bytearray(payload),
                     {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[kind],
                     {"src": f"synthetic-{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
