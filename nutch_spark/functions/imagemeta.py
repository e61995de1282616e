"""parse-tika image-path analog: typed image metadata from headers.

Reference: ``src/plugin/parse-tika`` routes ``image/*`` through Tika,
whose image parsers emit no text but populate parse metadata; the
plugin test (TestImageMetadata.java:53-66) pins the contract on
``parse-tika/sample/nutch_logo_tm.gif``: parse meta ``width`` ==
"121", ``height`` == "48" (dimension keys as decimal strings).

Header-only readers for the container formats a crawl actually sees —
GIF87a/89a (logical-screen descriptor), PNG (IHDR), JPEG (first SOFn
frame header), BMP (BITMAPINFOHEADER) — written from the public
format specs. Pixel decoding is NOT this module's job (the media
kernels in :mod:`nutch_spark.functions.media_codecs` own that); a
crawler extracting width/height from 10^9 images must read tens of
bytes per blob, not decode frames.
"""

from __future__ import annotations

import struct

__all__ = ["image_dims"]

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def image_dims(blob: bytes) -> tuple[str, int, int]:
    """Image bytes → ``(mime, width, height)``.
    Raises ``ValueError`` for unrecognized or truncated headers."""
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        if len(blob) < 10:
            raise ValueError("truncated GIF header")
        w, h = struct.unpack("<HH", blob[6:10])
        return "image/gif", w, h
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is mandatory-first: length(4) type(4) data(13)
        if len(blob) < 24 or blob[12:16] != b"IHDR":
            raise ValueError("PNG without leading IHDR")
        w, h = struct.unpack(">II", blob[16:24])
        return "image/png", w, h
    if blob[:2] == b"\xff\xd8":
        i, n = 2, len(blob)
        while i + 4 <= n:
            if blob[i] != 0xFF:
                raise ValueError("JPEG marker desync")
            marker = blob[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", blob[i + 2:i + 4])[0]
            if marker in _SOF_MARKERS:
                if i + 9 > n:
                    break
                h, w = struct.unpack(">HH", blob[i + 5:i + 9])
                return "image/jpeg", w, h
            i += 2 + seglen
        raise ValueError("JPEG without SOF frame header")
    if blob[:2] == b"BM":
        if len(blob) < 26:
            raise ValueError("truncated BMP header")
        w, h = struct.unpack("<ii", blob[18:26])
        return "image/bmp", w, abs(h)
    raise ValueError("unrecognized image container")
