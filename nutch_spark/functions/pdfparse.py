"""parse-tika PDF path stand-in — pure-Python PDF text extraction.

The reference routes application/pdf through Tika/PDFBox
(``parse-tika``; its own regression vectors are
``parse-tika/sample/pdftest.pdf`` and ``encrypted.pdf``, asserted to
contain ``A VERY SMALL PDF FILE`` — TestPdfParser.java:47-70). This
module re-implements the subset those vectors and a CC-style corpus
need, from the public PDF 1.7 specification:

- body object scan with indirect ``/Length`` resolution,
- ``FlateDecode`` stream filters (zlib),
- the Standard security handler, revisions 2-3 with an empty user
  password (Algorithms 2 + 1 of the spec: padded-password MD5 key
  derivation, the R3 50-fold rehash, per-object RC4 keys) — what
  ``encrypted.pdf`` uses (V1/R3/40-bit),
- text extraction from ``BT..ET`` blocks: ``Tj``/``'``/``\"``/``TJ``
  emit string runs (consecutive runs on one line concatenate, so
  kerned splits like ``(A VERY SMALL PDF FIL) Tj (E) Tj`` read back
  whole), ``Td/TD/T*/Tm`` line moves emit newlines; literal-string
  escapes and hex strings per spec, latin-1 byte decoding (simple
  single-byte font encodings; CID/cmap fonts are out of scope).

Both reference sample PDFs extract their expected text
(tests/test_pdfparse.py).
"""

from __future__ import annotations

import hashlib
import re
import struct
import zlib

__all__ = ["pdf_extract", "build_pdf", "PdfError"]


class PdfError(ValueError):
    """Not a parseable PDF."""


_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA0108"
    "2E2E00B6D0683E802F0CA9FE6453697A")

_OBJ = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.S)
_STREAM = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)


def _rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _hexstr(m: bytes) -> bytes:
    h = re.sub(rb"[^0-9A-Fa-f]", b"", m)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode())


def _encryption_key(data: bytes, enc_dict: bytes) -> tuple[bytes, int]:
    """File encryption key for the Standard handler with an empty
    user password (spec Algorithm 2). Returns (key, key_len)."""
    def _int(name, default=None):
        m = re.search(rb"/" + name + rb"\s+(-?\d+)", enc_dict)
        if m:
            return int(m.group(1))
        if default is None:
            raise PdfError(f"missing /{name.decode()}")
        return default

    r = _int(b"R")
    p = _int(b"P")
    length = _int(b"Length", 40)
    om = re.search(rb"/O\s*<([^>]*)>", enc_dict)
    if om is None:
        om = re.search(rb"/O\s*\(", enc_dict)
        raise PdfError("unsupported /O literal-string form")
    o = _hexstr(om.group(1))
    idm = re.search(rb"/ID\s*\[\s*<([^>]*)>", data)
    file_id = _hexstr(idm.group(1)) if idm else b""
    n = max(5, length // 8)
    h = hashlib.md5(_PAD + o[:32] + struct.pack("<i", p) + file_id)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n], n


def _object_key(base: bytes, n: int, num: int, gen: int) -> bytes:
    h = hashlib.md5(base + struct.pack("<i", num)[:3]
                    + struct.pack("<i", gen)[:2]).digest()
    return h[:min(n + 5, 16)]


_ESC = {ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
        ord("b"): b"\b", ord("f"): b"\f", ord("("): b"(",
        ord(")"): b")", ord("\\"): b"\\"}


def _extract_text(content: bytes) -> str:
    """Walk one content stream; string-show operators append runs,
    line-move operators break lines."""
    out: list[str] = []
    line: list[str] = []

    def flush() -> None:
        if line:
            s = "".join(line).strip()
            if s:
                out.append(s)
            line.clear()

    i, n = 0, len(content)
    # strings seen since the last operator: one for Tj/'/", any number
    # for a [ (..) kern (..) ] TJ array — ALL of them show, in order
    pending: list[str] = []
    while i < n:
        c = content[i]
        if c == 0x28:                    # ( literal string
            depth = 1
            i += 1
            buf = bytearray()
            while i < n and depth:
                ch = content[i]
                if ch == 0x5C and i + 1 < n:          # backslash
                    nxt = content[i + 1]
                    if nxt in _ESC:
                        buf += _ESC[nxt]
                        i += 2
                        continue
                    if 0x30 <= nxt <= 0x37:           # octal
                        oct_ = bytearray()
                        i += 1
                        while (i < n and len(oct_) < 3
                               and 0x30 <= content[i] <= 0x37):
                            oct_.append(content[i])
                            i += 1
                        buf.append(int(oct_, 8) & 0xFF)
                        continue
                    i += 2                            # line continuation &c
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if not depth:
                        i += 1
                        break
                buf.append(ch)
                i += 1
            pending.append(buf.decode("latin-1"))
            continue
        if c == 0x3C and i + 1 < n and content[i + 1] != 0x3C:  # <hex>
            end = content.find(b">", i)
            if end < 0:
                break
            pending.append(_hexstr(content[i + 1:end]).decode("latin-1"))
            i = end + 1
            continue
        if c == 0x5B:                    # [ ... ] TJ array: strings only
            i += 1
            continue
        # operator / token boundary
        m = re.match(rb"[A-Za-z'\"*]+", content[i:i + 8])
        if m:
            op = m.group(0)
            if op in (b"Tj", b"TJ"):
                line.extend(pending)
            elif op in (b"'", b'"'):
                flush()
                line.extend(pending)
            elif op in (b"Td", b"TD", b"T*", b"Tm", b"ET", b"BT"):
                flush()
            i += len(op)
            pending.clear()
            continue
        if c == 0x29 or c == 0x5D:
            i += 1
            continue
        # numbers / names / whitespace: within a TJ array, string
        # elements already landed in pending and are emitted at TJ
        if c == 0x2F:                    # /Name
            m2 = re.match(rb"/[^\s/<>\[\]()]*", content[i:])
            i += len(m2.group(0)) if m2 else 1
            continue
        i += 1
    flush()
    return "\n".join(out)


def pdf_extract(data: bytes) -> dict:
    """Extract ``{"text": str}`` from one PDF. Raises
    :class:`PdfError` when the container is not a PDF."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("missing %PDF- header")
    objs: dict[int, bytes] = {}
    for m in _OBJ.finditer(data):
        objs[int(m.group(1))] = m.group(3)

    # Standard security handler (empty user password)
    enc_key = None
    key_n = 0
    em = re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R", data)
    if em:
        enc = objs.get(int(em.group(1)), b"")
        if b"/Standard" not in enc:
            raise PdfError("unsupported security handler")
        enc_key, key_n = _encryption_key(data, enc)

    def _resolve_length(body: bytes) -> int | None:
        lm = re.search(rb"/Length\s+(\d+)(?:\s+(\d+)\s+R)?", body)
        if not lm:
            return None
        if lm.group(2) is None:
            return int(lm.group(1))
        ref = objs.get(int(lm.group(1)))
        if ref is None:
            return None
        rm = re.search(rb"(\d+)", ref)
        return int(rm.group(1)) if rm else None

    texts: list[str] = []
    for num, body in objs.items():
        sm = _STREAM.search(body)
        if not sm:
            continue
        raw = sm.group(1)
        ln = _resolve_length(body)
        if ln is not None and 0 < ln <= len(raw):
            raw = raw[:ln]
        if enc_key is not None:
            raw = _rc4(_object_key(enc_key, key_n, num, 0), raw)
        head = body.split(b"stream", 1)[0]
        if (b"/FlateDecode" in head
                or re.search(rb"/Filter\s*/Fl\b", head)):
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        if b"BT" not in raw:
            continue
        t = _extract_text(raw)
        if t:
            texts.append(t)
    return {"text": "\n".join(texts)}


def build_pdf(lines: list[str], compress: bool = True) -> bytes:
    """Assemble a minimal one-page PDF for tests/oracles: each entry
    of ``lines`` becomes one ``Tj`` text line. Deterministic bytes
    for a given input."""
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(") \
                .replace(")", r"\)")

    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for k, ln in enumerate(lines):
        if k:
            ops.append("0 -14 Td")
        ops.append(f"({esc(ln)}) Tj")
    ops.append("ET")
    content = "\r\n".join(ops).encode("latin-1")
    if compress:
        body = zlib.compress(content, 9)
        filt = "/Filter /FlateDecode "
    else:
        body, filt = content, ""
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        (f"<< /Length {len(body)} {filt}>>".encode()
         + b"\r\nstream\r\n" + body + b"\r\nendstream"),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\r\n")
    offsets = []
    for i, ob in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\r\n".encode() + ob + b"\r\nendobj\r\n"
    xref_at = len(out)
    out += f"xref\r\n0 {len(objects) + 1}\r\n".encode()
    out += b"0000000000 65535 f \r\n"
    for off in offsets:
        out += f"{off:010d} 00000 n \r\n".encode()
    out += (b"trailer\r\n<< /Size " + str(len(objects) + 1).encode()
            + b" /Root 1 0 R >>\r\nstartxref\r\n"
            + str(xref_at).encode() + b"\r\n%%EOF\r\n")
    return bytes(out)
