"""Pure-numpy/stdlib codecs for simple public media formats.

These are REAL decoders/encoders — no pillow/ffmpeg required — for
formats whose specs are fully public and simple enough to implement
from scratch:

- **BMP** (Windows bitmap, uncompressed 24-bit BI_RGB, bottom-up rows
  with 4-byte row padding) — the classic DIB layout;
- **PPM/PGM** (netpbm P6/P5, binary, maxval 255);
- **WAV** (RIFF PCM, via the stdlib ``wave`` module);
- **Y4M** (YUV4MPEG2: plain-text stream header ``YUV4MPEG2 W.. H..``
  followed by ``FRAME\\n`` + raw planar YUV 4:2:0 frames) — the
  uncompressed interchange format ffmpeg/x264 pipe between tools.

Formats that genuinely need external libraries (PNG/JPEG deflate/DCT,
MP3, MP4) are *not* faked here — the multimodal operators raise
``NotImplementedError`` for those, per the project's honest-stub rule.

Reference analog: Nutch treats fetched payloads as opaque bytes with a
contentType (Content.java:51-63) and dispatches parsing by MIME; the
same dispatch-on-magic-bytes pattern is used here worker-side.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------- BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) → uncompressed 24-bit BMP bytes
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up, BGR, rows padded
    to 4 bytes)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    # pixel rows bottom-up, channels BGR
    rows = pixels[::-1, :, ::-1]
    padded = np.zeros((h, row_size), dtype=np.uint8)
    padded[:, : w * 3] = rows.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + info + padded.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP bytes → RGB uint8 (H, W, 3).
    Supports bottom-up (positive height) and top-down (negative)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB supported (bpp={bpp}, "
            f"compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    buf = np.frombuffer(data, dtype=np.uint8,
                        count=row_size * h, offset=offset)
    rows = buf.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------- PPM / PGM


def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB uint8 (H, W, 3) → binary P6 netpbm bytes."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def encode_pgm(pixels: np.ndarray) -> bytes:
    """Gray uint8 (H, W) → binary P5 netpbm bytes."""
    h, w = pixels.shape
    return b"P5\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def _pnm_header(data: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a netpbm binary header → (magic, w, h, maxval, offset).
    Handles whitespace runs and ``#`` comments per the spec."""
    magic = data[:2]
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    return magic, fields[0], fields[1], fields[2], pos + 1


def decode_pnm(data: bytes) -> np.ndarray:
    """P6 → RGB (H, W, 3); P5 → gray (H, W). Binary, maxval ≤ 255."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    magic, w, h, maxval, off = _pnm_header(data)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * ch,
                        offset=off)
    return arr.reshape((h, w, 3) if ch == 3 else (h, w)).copy()


# ----------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int,
               n_channels: int = 1) -> bytes:
    """int16 PCM samples (frames,) or (frames, ch) → RIFF WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF PCM WAV bytes → (sample_rate, n_channels, int16 samples
    shaped (frames, channels))."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        rate, ch = wf.getframerate(), wf.getnchannels()
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        raw = wf.readframes(wf.getnframes())
    samples = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
    return rate, ch, samples


# ----------------------------------------------------------------- Y4M


def encode_y4m(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """List of gray uint8 (H, W) frames → YUV4MPEG2 4:2:0 bytes with
    neutral (128) chroma planes."""
    h, w = frames[0].shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps)]
    cw, chh = (w + 1) // 2, (h + 1) // 2
    chroma = np.full(cw * chh, 128, dtype=np.uint8).tobytes()
    for f in frames:
        assert f.shape == (h, w)
        out.append(b"FRAME\n")
        out.append(f.astype(np.uint8).tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(data: bytes):
    """YUV4MPEG2 bytes → (w, h, iterator of gray uint8 (H, W) luma
    planes). Chroma planes are skipped (4:2:0 assumed per C420)."""
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii", "replace")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    w = h = None
    for tok in header.split()[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C") and not tok.startswith("C420"):
            raise NotImplementedError(f"only C420 supported, got {tok}")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    luma, chroma = w * h, 2 * (((w + 1) // 2) * ((h + 1) // 2))

    def frames():
        pos = nl + 1
        while pos < len(data):
            fnl = data.index(b"\n", pos)
            if not data[pos:fnl].startswith(b"FRAME"):
                raise ValueError("malformed Y4M frame marker")
            pos = fnl + 1
            yield np.frombuffer(data, dtype=np.uint8, count=luma,
                                offset=pos).reshape(h, w).copy()
            pos += luma + chroma

    return w, h, frames()


# ------------------------------------------------------------ helpers


def sniff_media(data: bytes) -> str:
    """Magic-byte dispatch: 'bmp' | 'ppm' | 'pgm' | 'wav' | 'y4m' |
    'unknown'."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"P5":
        return "pgm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:9] == b"YUV4MPEG2":
        return "y4m"
    return "unknown"


def resize_nearest(pixels: np.ndarray, width: int,
                   height: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W[, C]) → (height, width[, C]) —
    pure index arithmetic, the same sampling OpenCV INTER_NEAREST
    uses."""
    h, w = pixels.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return pixels[ys][:, xs]


def to_gray(pixels: np.ndarray) -> np.ndarray:
    """RGB (H, W, 3) → gray uint8 via integer BT.601 luma
    ((77R + 150G + 29B) >> 8), exactly reproducible in SQL."""
    if pixels.ndim == 2:
        return pixels
    p = pixels.astype(np.uint32)
    return ((77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2]) >> 8) \
        .astype(np.uint8)
