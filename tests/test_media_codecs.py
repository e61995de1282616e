"""Pure-python codec tests (no Spark): BMP / PNM / WAV / Y4M."""

import struct

import numpy as np
import pytest

from nutch_spark.functions import media_codecs as mc


def test_bmp_roundtrip_gradient_odd_width():
    # odd width exercises 4-byte row padding
    px = ((np.arange(5 * 3 * 3).reshape(3, 5, 3) * 7) % 256) \
        .astype(np.uint8)
    out = mc.decode_bmp(mc.encode_bmp(px))
    assert np.array_equal(out, px)


def test_bmp_golden_layout_1x1():
    px = np.array([[[255, 0, 0]]], dtype=np.uint8)  # one red pixel
    b = mc.encode_bmp(px)
    assert b[:2] == b"BM"
    assert struct.unpack_from("<I", b, 10)[0] == 54     # pixel offset
    assert struct.unpack_from("<ii", b, 18) == (1, 1)   # w, h
    assert struct.unpack_from("<H", b, 28)[0] == 24     # bpp
    # BGR order + row padded to 4 bytes
    assert b[54:58] == bytes([0, 0, 255, 0])
    assert len(b) == 58


def test_bmp_topdown_negative_height():
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    b = bytearray(mc.encode_bmp(px))
    # flip to top-down: negate height, un-reverse the stored rows
    h = struct.unpack_from("<i", b, 22)[0]
    struct.pack_into("<i", b, 22, -h)
    row = (2 * 3 + 3) & ~3
    body = bytes(b[54:])
    b[54:] = body[row:] + body[:row]
    assert np.array_equal(mc.decode_bmp(bytes(b)), px)


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        mc.decode_bmp(b"\x89PNG\r\n" + b"\x00" * 64)


def test_pnm_roundtrip_and_comment_header():
    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    assert np.array_equal(mc.decode_pnm(mc.encode_ppm(px)), px)
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.array_equal(mc.decode_pnm(mc.encode_pgm(gray)), gray)
    commented = b"P5\n# a comment\n4 3\n255\n" + gray.tobytes()
    assert np.array_equal(mc.decode_pnm(commented), gray)


def test_wav_roundtrip_mono_and_stereo():
    mono = (np.arange(100, dtype=np.int16) * 317) % 20000 - 10000
    rate, ch, out = mc.decode_wav(mc.encode_wav(mono, 8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(out[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    rate, ch, out = mc.decode_wav(
        mc.encode_wav(stereo, 44100, n_channels=2))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, stereo)


def test_y4m_roundtrip_odd_dims():
    frames = [np.full((5, 7), v, dtype=np.uint8) for v in (0, 99, 255)]
    w, h, it = mc.decode_y4m(mc.encode_y4m(frames, fps=30))
    assert (w, h) == (7, 5)
    got = list(it)
    assert len(got) == 3
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)


def test_resize_nearest_known_picks():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = mc.resize_nearest(px, 2, 2)
    assert small.tolist() == [[0, 2], [8, 10]]
    # upscale repeats source pixels
    up = mc.resize_nearest(np.array([[1, 2]], dtype=np.uint8), 4, 2)
    assert up.tolist() == [[1, 1, 2, 2], [1, 1, 2, 2]]


def test_to_gray_bt601_integer():
    px = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [255, 255, 255], [42, 42, 42]]], dtype=np.uint8)
    assert mc.to_gray(px).tolist() == [[76, 149, 28, 255, 42]]


def test_sniff_media():
    assert mc.sniff_media(mc.encode_bmp(
        np.zeros((1, 1, 3), np.uint8))) == "bmp"
    assert mc.sniff_media(b"P6\n1 1\n255\n\x00\x00\x00") == "ppm"
    assert mc.sniff_media(mc.encode_wav(
        np.zeros(4, np.int16), 8000)) == "wav"
    assert mc.sniff_media(mc.encode_y4m(
        [np.zeros((2, 2), np.uint8)])) == "y4m"
    assert mc.sniff_media(b"\x89PNG\r\n\x1a\n") == "unknown"
