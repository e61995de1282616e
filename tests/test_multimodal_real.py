"""Real multimodal kernels end-to-end: encode fixture → decode kernel
→ features, checked against the closed-form expectations."""

import numpy as np
import pytest
from pyspark.errors.exceptions.captured import PythonException
from pyspark.sql import functions as F

from nutch_spark.functions import media_codecs as mc
from nutch_spark.operators import multimodal as mm


def _ids(spark, n=24):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_image_features_real(spark):
    media = mm.make_real_media(_ids(spark), "image")
    out = {r.media_id: r for r in
           mm.image_features(media, dims=8,
                             deterministic=False).collect()}
    assert len(out) == 24
    for i, r in out.items():
        assert r.width == 8 + i % 9
        assert r.height == 8 + (i * 3) % 7
        emb = np.array(r.embedding)
        assert emb.sum() == pytest.approx(1.0)
        assert emb[(i % 256) * 8 // 256] == pytest.approx(1.0)


def test_audio_features_real(spark):
    media = mm.make_real_media(_ids(spark), "audio")
    out = {r.media_id: r for r in
           mm.audio_features(media, dims=8,
                             deterministic=False).collect()}
    for i, r in out.items():
        assert r.sample_rate == (8000, 16000, 44100)[i % 3]
        assert r.duration_ms == (i % 5 + 1) * 100
        for v in r.embedding:
            assert v == pytest.approx((i % 8) / 8.0, abs=1e-7)


def test_resize_then_features_compose(spark):
    media = mm.make_real_media(_ids(spark), "image")
    resized = mm.resize_images(media, width=4, height=4,
                               deterministic=False) \
        .withColumn("kind", F.lit("image"))
    out = {r.media_id: r for r in
           mm.image_features(resized, dims=8,
                             deterministic=False).collect()}
    for i, r in out.items():
        assert (r.width, r.height) == (4, 4)
        # solid color survives the resize round-trip exactly
        assert np.array(r.embedding)[(i % 256) * 8 // 256] \
            == pytest.approx(1.0)


def test_resize_gradient_matches_kernel(spark):
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    media = spark.createDataFrame(
        [(0, "image", bytearray(mc.encode_ppm(px)), "image/x-ppm",
          {})], mm.MEDIA_SCHEMA)
    row = mm.resize_images(media, width=3, height=5,
                           deterministic=False).collect()[0]
    got = mc.decode_pnm(bytes(row.payload))
    assert np.array_equal(got, mc.resize_nearest(px, 3, 5))


def test_sample_frames_and_frame_features(spark):
    media = mm.make_real_media(_ids(spark), "video")
    fr = mm.sample_frames(media, every_n=2, max_frames=3,
                          deterministic=False)
    feats = mm.frame_features(fr).collect()
    got = {(r.media_id, r.frame_idx): r for r in feats}
    for i in range(24):
        nf = 2 + i % 6
        want_idx = [k for k in (0, 2, 4) if k < nf]
        have = sorted(k for (m, k) in got if m == i)
        assert have == want_idx
        for k in want_idx:
            r = got[(i, k)]
            assert (r.width, r.height) == (16, 8)
            assert r.mean_luma == pytest.approx((i + 17 * k) % 256)


def test_unsupported_format_raises_or_nulls(spark):
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    media = spark.createDataFrame(
        [(0, "image", bytearray(png), "image/png", {})],
        mm.MEDIA_SCHEMA)
    with pytest.raises(PythonException):
        mm.image_features(media, deterministic=False,
                          on_error="raise").collect()
    rows = mm.image_features(media, deterministic=False,
                             on_error="null").collect()
    assert rows[0].width is None and rows[0].embedding is None


def test_plumbing_mode_unchanged(spark):
    # deterministic=True still runs the seeded-fake plumbing path on
    # arbitrary bytes
    media = mm.make_media_fixture(spark, n=9)
    assert mm.image_features(media).count() == 3
    assert mm.audio_features(media).count() == 3
    assert mm.sample_frames(media).count() >= 3
