"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata —
the same pattern as the crawl's ``content`` table (Content.java:51-63:
url → bytes + contentType + metadata). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so
bytes stream through workers in columnar batches and never transit the
driver.

Two kernel modes per operator:

- ``deterministic=True`` — a seeded fake (hash-derived) that exercises
  the Spark-side plumbing (schema, partitioning, UDF signature, batch
  shape) without decoding anything;
- ``deterministic=False`` — REAL decoders from
  :mod:`nutch_spark.functions.media_codecs` for the simple public
  formats implementable with numpy/stdlib alone: BMP, PPM/PGM
  (images), PCM WAV (audio), Y4M/YUV4MPEG2 (video). Formats that
  genuinely need pillow/ffmpeg (PNG/JPEG/MP3/MP4) raise
  ``NotImplementedError`` (``on_error="raise"``) or yield null
  features (``on_error="null"`` — the 100 TB production setting,
  where one corrupt payload must not kill the job).
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

from nutch_spark.functions import media_codecs as mc

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


def _decode_image(b: bytes) -> np.ndarray:
    """bytes → RGB/gray pixel array for the formats we truly decode."""
    fmt = mc.sniff_media(b)
    if fmt == "bmp":
        return mc.decode_bmp(b)
    if fmt in ("ppm", "pgm"):
        return mc.decode_pnm(b)
    raise NotImplementedError(
        f"image format {fmt!r} needs pillow; only BMP/PPM/PGM decode "
        "natively")


def _null_or_raise(on_error: str, exc: Exception):
    if on_error == "raise":
        raise exc
    return None


def image_features(media: DataFrame, dims: int = 8,
                   deterministic: bool = True,
                   on_error: str = "raise") -> DataFrame:
    """Decode + feature-extract images → IMAGE_FEATURES_SCHEMA.

    Real mode (``deterministic=False``): decodes BMP/PPM/PGM, reports
    true width/height, and embeds each image as its normalized
    ``dims``-bin grayscale histogram (BT.601 integer luma, bin =
    ``gray * dims // 256``, fractions summing to 1) — a classic
    cheap visual signature. Arrow-batched; bytes stay worker-side."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if deterministic:
                    digest = hashlib.md5(b).digest()
                    rows.append({
                        "media_id": int(mid),
                        "width": 16 + digest[0] % 64,
                        "height": 16 + digest[1] % 64,
                        "embedding": _fake_decode(b, dims).tolist(),
                    })
                    continue
                try:
                    px = _decode_image(b)
                except Exception as exc:  # noqa: BLE001
                    _null_or_raise(on_error, exc)
                    rows.append({"media_id": int(mid), "width": None,
                                 "height": None, "embedding": None})
                    continue
                gray = mc.to_gray(px)
                bins = (gray.astype(np.int32) * dims) >> 8
                hist = np.bincount(bins.ravel(), minlength=dims)
                emb = (hist / gray.size).astype(np.float32)
                rows.append({
                    "media_id": int(mid),
                    "width": int(px.shape[1]),
                    "height": int(px.shape[0]),
                    "embedding": emb.tolist(),
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
                   deterministic: bool = True,
                   on_error: str = "raise") -> DataFrame:
    """Decode + feature-extract audio → AUDIO_FEATURES_SCHEMA.

    Real mode: parses RIFF PCM WAV (stdlib ``wave``), reports true
    duration/sample-rate, and embeds the clip as its RMS energy
    envelope over ``dims`` equal time segments (mono-mixed, int16
    normalized by 32768) — computed in float64, stored float32."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if deterministic:
                    digest = hashlib.md5(b).digest()
                    rows.append({
                        "media_id": int(mid),
                        "duration_ms": 100 + digest[2] * 37,
                        "sample_rate": (8000, 16000, 44100)[digest[3] % 3],
                        "embedding": _fake_decode(b, dims).tolist(),
                    })
                    continue
                try:
                    if mc.sniff_media(b) != "wav":
                        raise NotImplementedError(
                            "audio format needs ffmpeg; only PCM WAV "
                            "decodes natively")
                    rate, _ch, samples = mc.decode_wav(b)
                except Exception as exc:  # noqa: BLE001
                    _null_or_raise(on_error, exc)
                    rows.append({"media_id": int(mid),
                                 "duration_ms": None,
                                 "sample_rate": None, "embedding": None})
                    continue
                mono = samples.astype(np.float64).mean(axis=1) / 32768.0
                n = len(mono)
                emb = np.zeros(dims, dtype=np.float64)
                if n:
                    edges = (np.arange(dims + 1) * n) // dims
                    for i in range(dims):
                        seg = mono[edges[i]:edges[i + 1]]
                        if len(seg):
                            emb[i] = np.sqrt(np.mean(seg * seg))
                rows.append({
                    "media_id": int(mid),
                    "duration_ms": int(round(n * 1000.0 / rate)),
                    "sample_rate": int(rate),
                    "embedding": emb.astype(np.float32).tolist(),
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "duration_ms", "sample_rate", "embedding"])

    return (media.where(F.col("kind") == "audio")
            .select("media_id", "payload")
            .mapInPandas(run, AUDIO_FEATURES_SCHEMA))


def resize_images(media: DataFrame, width: int = 32, height: int = 32,
                  deterministic: bool = True,
                  on_error: str = "raise") -> DataFrame:
    """Resize images → RESIZED_SCHEMA (fixed target dims + new
    payload).

    Real mode: nearest-neighbor resample (pure index arithmetic) and
    re-encode in the source format (BMP→BMP, PPM→PPM, PGM→PGM) —
    output bytes are bounded and independent of input size, so
    downstream partition planning holds at 100 TB."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if deterministic:
                    digest = hashlib.md5(b).digest()
                    rng = np.random.default_rng(
                        int.from_bytes(digest[8:16], "big"))
                    newb = rng.integers(0, 256, size=width * height,
                                        dtype=np.uint8).tobytes()
                else:
                    try:
                        fmt = mc.sniff_media(b)
                        px = _decode_image(b)
                        small = mc.resize_nearest(px, width, height)
                        if fmt == "bmp":
                            newb = mc.encode_bmp(small)
                        elif fmt == "ppm":
                            newb = mc.encode_ppm(small)
                        else:
                            newb = mc.encode_pgm(small)
                    except Exception as exc:  # noqa: BLE001
                        _null_or_raise(on_error, exc)
                        newb = None
                out["media_id"].append(int(mid))
                out["width"].append(width)
                out["height"].append(height)
                out["payload"].append(newb)
            yield pd.DataFrame(out)

    return (media.where(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(run, RESIZED_SCHEMA))


def sample_frames(media: DataFrame, every_n: int = 10,
                  max_frames: int = 4,
                  deterministic: bool = True,
                  on_error: str = "raise") -> DataFrame:
    """Frame-sample videos → FRAME_SCHEMA (one row per sampled frame).

    Real mode: parses Y4M (YUV4MPEG2) streams, takes every
    ``every_n``-th frame up to ``max_frames``, and emits each sampled
    luma plane as a PGM payload; ``frame_idx`` is the SOURCE frame
    index. Compressed containers (MP4 etc.) need ffmpeg and raise."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if deterministic:
                    n = min(max_frames,
                            max(1, len(b) // max(every_n, 1)))
                    for i in range(n):
                        out["media_id"].append(int(mid))
                        out["frame_idx"].append(i)
                        out["frame"].append(
                            b[i * every_n:(i + 1) * every_n])
                    continue
                try:
                    if mc.sniff_media(b) != "y4m":
                        raise NotImplementedError(
                            "video container needs ffmpeg; only Y4M "
                            "decodes natively")
                    _w, _h, frames = mc.decode_y4m(b)
                except Exception as exc:  # noqa: BLE001
                    _null_or_raise(on_error, exc)
                    continue
                taken = 0
                for idx, frame in enumerate(frames):
                    if idx % every_n:
                        continue
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx)
                    out["frame"].append(mc.encode_pgm(frame))
                    taken += 1
                    if taken >= max_frames:
                        break
            yield pd.DataFrame(out)

    return (media.where(F.col("kind") == "video")
            .select("media_id", "payload")
            .mapInPandas(run, FRAME_SCHEMA))


FRAME_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("mean_luma", FloatType(), True),
])


def frame_features(frames: DataFrame,
                   on_error: str = "raise") -> DataFrame:
    """Per-frame features over :func:`sample_frames` output: decode
    each PGM frame payload → (width, height, mean luma). Composes with
    sample_frames as a second Arrow-batched stage — the decode chain
    never leaves the workers."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, idx, payload in zip(
                    pdf["media_id"], pdf["frame_idx"], pdf["frame"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    px = mc.decode_pnm(b)
                except Exception as exc:  # noqa: BLE001
                    _null_or_raise(on_error, exc)
                    rows.append({"media_id": int(mid),
                                 "frame_idx": int(idx), "width": None,
                                 "height": None, "mean_luma": None})
                    continue
                gray = mc.to_gray(px)
                rows.append({
                    "media_id": int(mid),
                    "frame_idx": int(idx),
                    "width": int(gray.shape[1]),
                    "height": int(gray.shape[0]),
                    "mean_luma": float(gray.astype(np.float64).mean()),
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "width", "height",
                "mean_luma"])

    return frames.mapInPandas(run, FRAME_FEATURES_SCHEMA)


def make_media_fixture(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media fixture (binary payloads + typed meta) for
    the plumbing path — payloads are random bytes, not decodable."""
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


def make_real_media(ids: DataFrame, kind: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Derive a REAL decodable media table from an id column — every
    payload is a valid BMP / WAV / Y4M whose content is a closed-form
    function of the id, so decoded features are predictable by plain
    SQL (the correctness oracle for the real kernels):

    - image: solid-gray BMP, ``w = 8 + id % 9``,
      ``h = 8 + (id * 3) % 7``, gray ``v = id % 256`` (R=G=B=v keeps
      integer luma exactly v);
    - audio: constant-amplitude mono PCM WAV,
      ``rate = (8000, 16000, 44100)[id % 3]``, ``(id % 5 + 1) / 10`` s
      (exact ms), amplitude ``(id % 8) * 4096`` → every RMS segment is
      exactly ``(id % 8) / 8``;
    - video: 16×8 Y4M, ``2 + id % 6`` frames, frame *i* solid luma
      ``(id + 17 * i) % 256``.

    Runs as one Arrow-batched ``mapInPandas`` over the id column —
    payload construction is worker-side and distributed."""
    assert kind in ("image", "audio", "video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[id_col]:
                i = int(raw)
                if kind == "image":
                    w, h, v = 8 + i % 9, 8 + (i * 3) % 7, i % 256
                    px = np.full((h, w, 3), v, dtype=np.uint8)
                    b, mime = mc.encode_bmp(px), "image/bmp"
                elif kind == "audio":
                    rate = (8000, 16000, 44100)[i % 3]
                    nsamp = rate * (i % 5 + 1) // 10
                    amp = (i % 8) * 4096
                    sig = np.full(nsamp, amp, dtype=np.int16)
                    b, mime = mc.encode_wav(sig, rate), "audio/wav"
                else:
                    nf = 2 + i % 6
                    frames = [np.full((8, 16), (i + 17 * k) % 256,
                                      dtype=np.uint8)
                              for k in range(nf)]
                    b, mime = mc.encode_y4m(frames), "video/x-y4m"
                rows.append({"media_id": i, "kind": kind, "payload": b,
                             "mime": mime, "meta": {"src": "derived"}})
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "mime", "meta"])

    return ids.select(id_col).mapInPandas(run, MEDIA_SCHEMA)
