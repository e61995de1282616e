"""parse-swf plugin analog — pure-Python SWF (Flash) text extraction.

A from-scratch reader for the public SWF file format (Adobe "SWF File
Format Specification", v19) reproducing what the reference plugin
extracts via the javaswf library (``SWFParser.java``):

- glyph text from DefineText/DefineText2 tags, glyph indices mapped
  through font code tables captured from DefineFont2 /
  DefineFontInfo(2) (SWFParser.java:212-244, 282-340 ``TextDumper``):
  unknown font -> the literal ``\\n**** ?????????????? ****\\n``
  marker, glyph index beyond the code table -> the index itself as a
  char code ("system font"), a Y-offset change after the first ->
  newline, each finished text tag -> newline;
- the initial text of DefineEditText fields
  (SWFParser.java:250-257 ``tagDefineTextField``);
- "free text" from DoAction/DoInitAction ActionScript: constant-pool
  strings that the bytecode never consumes as an identifier survive
  in a set; pushes/calls/member accesses remove their operands from
  it (SWFParser.java:374-650 ``NutchSWFActions`` + ``SmallStack``);
- ``getURL`` action urls collected as outlinks
  (SWFParser.java:406-415), plus the generic free-text URL regex
  sweep of ``OutlinkExtractor.java:62`` over the final text.

Final text assembly (SWFParser.java:92-95,177-199): the ordered
strings joined by single spaces, then ``\\n--------\\n`` and the
sorted surviving action strings joined by newlines.

The reference's three sample movies (``parse-swf/sample/test*.swf``)
are used as golden parity vectors in ``tests/test_swfparse.py``.
"""

from __future__ import annotations

import re
import struct
import zlib

__all__ = ["swf_extract", "extract_free_text_urls", "SwfError",
           "build_swf"]


class SwfError(ValueError):
    """Malformed / unsupported SWF container."""


# OutlinkExtractor.java:62 URL_PATTERN, case-insensitive — the free-
# text sweep SWFParser applies to the extracted text.
_FREE_URL = re.compile(
    r"[A-Za-z][A-Za-z0-9+.-]{1,120}:[A-Za-z0-9/]"
    r"(?:[A-Za-z0-9$_.+!*,;/?:@&~=-]|%[A-Fa-f0-9]{2}){1,333}"
    r"(?:#[a-zA-Z0-9][a-zA-Z0-9$_.+!*,;/?:@&~=%-]{0,1000})?",
    re.I)


def extract_free_text_urls(text: str) -> list[str]:
    """OutlinkExtractor.getOutlinks analog: every URL-shaped token in
    free text, in match order."""
    return [m.group(0) for m in _FREE_URL.finditer(text or "")]


class _Bits:
    """MSB-first bit reader over a bytes buffer (SWF bit fields)."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos          # byte position
        self.bit = 0            # bit position within buf[pos]

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.pos >= len(self.buf):
                raise SwfError("bit read past end")
            v = (v << 1) | ((self.buf[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        if n and v & (1 << (n - 1)):
            v -= 1 << n
        return v

    def align(self) -> int:
        """Byte-align and return the byte position."""
        if self.bit:
            self.bit = 0
            self.pos += 1
        return self.pos


def _u8(b: bytes, p: int) -> int:
    return b[p]


def _u16(b: bytes, p: int) -> int:
    return b[p] | (b[p + 1] << 8)


def _u32(b: bytes, p: int) -> int:
    return struct.unpack_from("<I", b, p)[0]


def _string(b: bytes, p: int) -> tuple[str, int]:
    """Null-terminated SWF string; utf-8 (SWF>=6) with latin-1
    fallback for older ANSI movies."""
    end = b.find(0, p)
    if end < 0:
        end = len(b)
    raw = b[p:end]
    try:
        s = raw.decode("utf-8")
    except UnicodeDecodeError:
        s = raw.decode("latin-1")
    return s, end + 1


def _skip_rect(bits: _Bits) -> None:
    n = bits.read(5)
    bits.read(4 * n)


def _skip_matrix(bits: _Bits) -> None:
    if bits.read(1):                    # HasScale
        n = bits.read(5)
        bits.read(2 * n)
    if bits.read(1):                    # HasRotate
        n = bits.read(5)
        bits.read(2 * n)
    n = bits.read(5)                    # translate
    bits.read(2 * n)


# ---------------------------------------------------------------- tags

_TAG_END = 0
_TAG_DEFINE_TEXT = 11
_TAG_DO_ACTION = 12
_TAG_DEFINE_FONT_INFO = 13
_TAG_DEFINE_TEXT2 = 33
_TAG_DEFINE_EDIT_TEXT = 37
_TAG_DEFINE_FONT2 = 48
_TAG_DO_INIT_ACTION = 59
_TAG_DEFINE_FONT_INFO2 = 62
_TAG_DEFINE_FONT3 = 75

_UNKNOWN_FONT_MARK = "\n**** ?????????????? ****\n"


def _font2_codes(body: bytes, font3: bool = False) -> tuple[int, list[int]]:
    """DefineFont2/3: (font_id, glyph->charcode table). The glyph
    shapes are skipped by seeking straight to the code table via
    CodeTableOffset."""
    fid = _u16(body, 0)
    flags = _u8(body, 2)
    wide_offsets = bool(flags & 0x08)
    wide_codes = bool(flags & 0x04) or font3   # Font3 codes always wide
    name_len = _u8(body, 4)
    p = 5 + name_len
    nglyphs = _u16(body, p)
    p += 2
    if nglyphs == 0:
        return fid, []
    table_start = p
    osz = 4 if wide_offsets else 2
    code_off = (_u32 if wide_offsets else _u16)(
        body, table_start + nglyphs * osz)
    p = table_start + code_off
    csz = 2 if wide_codes else 1
    rd = _u16 if wide_codes else _u8
    codes = []
    for i in range(nglyphs):
        q = p + i * csz
        if q + csz > len(body):
            break
        codes.append(rd(body, q))
    return fid, codes


def _fontinfo_codes(body: bytes, v2: bool = False) -> tuple[int, list[int]]:
    """DefineFontInfo(2): (font_id, char codes for the glyphs of the
    referenced DefineFont)."""
    fid = _u16(body, 0)
    name_len = _u8(body, 2)
    p = 3 + name_len
    flags = _u8(body, p)
    p += 1
    if v2:
        p += 1                           # LanguageCode
    wide = bool(flags & 0x01)
    csz = 2 if wide else 1
    rd = _u16 if wide else _u8
    codes = []
    while p + csz <= len(body):
        codes.append(rd(body, p))
        p += csz
    return fid, codes


def _define_text(body: bytes, rgba: bool, fonts: dict,
                 strings: list[str]) -> None:
    """DefineText(2) TEXTRECORD walk — TextDumper semantics
    (SWFParser.java:282-340)."""
    bits = _Bits(body, 2)
    _skip_rect(bits)
    bits.align()                        # MATRIX starts byte-aligned
    _skip_matrix(bits)
    p = bits.align()
    glyph_bits = _u8(body, p)
    adv_bits = _u8(body, p + 1)
    p += 2
    font_id: int | None = None
    first_y = True
    while p < len(body):
        b = _u8(body, p)
        p += 1
        if b == 0:
            break
        if b & 0x80:                    # style-change fields
            if b & 0x08:
                font_id = _u16(body, p)
                p += 2
            if b & 0x04:
                p += 4 if rgba else 3
            if b & 0x01:
                p += 2                   # XOffset
            if b & 0x02:                 # YOffset -> newline after first
                p += 2
                if first_y:
                    first_y = False
                else:
                    strings.append("\n")
            if b & 0x08:
                p += 2                   # TextHeight
            count = _u8(body, p)
            p += 1
        else:                            # bare glyph record (SWF1 era)
            count = b
        gb = _Bits(body, p)
        codes = fonts.get(font_id)
        if codes is None:
            strings.append(_UNKNOWN_FONT_MARK)
            gb.read(count * (glyph_bits + adv_bits))
        else:
            chars = []
            for _ in range(count):
                idx = gb.read(glyph_bits)
                gb.sread(adv_bits)
                chars.append(chr(idx if idx >= len(codes) else codes[idx]))
            strings.append("".join(chars))
        p = gb.align()
    strings.append("\n")                # TextDumper.done()


def _edit_text(body: bytes, strings: list[str]) -> None:
    """DefineEditText: append the initial text if present
    (tagDefineTextField, SWFParser.java:250-257)."""
    bits = _Bits(body, 2)
    _skip_rect(bits)
    p = bits.align()
    f1 = _u8(body, p)
    f2 = _u8(body, p + 1)
    p += 2
    has_text = bool(f1 & 0x80)
    if f1 & 0x01:                        # HasFont
        p += 4
    if f2 & 0x80:                        # HasFontClass
        _, p = _string(body, p)
    if f1 & 0x04:                        # HasTextColor
        p += 4
    if f1 & 0x02:                        # HasMaxLength
        p += 2
    if f2 & 0x20:                        # HasLayout
        p += 9
    _, p = _string(body, p)             # VariableName
    if has_text:
        s, p = _string(body, p)
        strings.append(s)


class _ActionStack:
    """SmallStack (SWFParser.java:652-685): bounded at 100; the
    overflowed bottom element is purged from the free-string set;
    pops on empty return None."""

    def __init__(self, free: set):
        self._s: list = []
        self._free = free

    def push(self, v) -> None:
        if len(self._s) > 100:
            self._free.discard(self._s.pop(0))
        self._s.append(v)

    def pop(self):
        return self._s.pop() if self._s else None

    def drain(self) -> None:
        while self._s:
            self._free.discard(self._s.pop())


def _walk_actions(body: bytes, free: set, urls: list[str]) -> None:
    """DoAction / DoInitAction bytecode walk — NutchSWFActions
    (SWFParser.java:374-650): constant-pool strings enter the free
    set; operands the script consumes (string pushes, call / member /
    variable targets, function names/params) leave it; getURL urls
    are harvested; everything still on the simulated stack when the
    tag ends is purged (``done()``, SWFParser.java:504-508). One
    stack + constant pool per tag, the free set and urls shared
    across tags, matching the reference's per-tag NutchSWFActions
    over shared collections.

    Two javaswf-faithful quirks matter for parity with the sample
    movies: INTEGER pushes also index into the constant pool
    (``push(int)``, SWFParser.java:522-527 — so ints alias pool
    strings onto the stack, and the later consuming op decides
    whether the aliased string is "used"), and constant-ref pushes
    (``lookup``, SWFParser.java:452-457) push without removing."""
    stack = _ActionStack(free)
    pool: list[str] = []
    p = 0
    n = len(body)
    while p < n:
        code = _u8(body, p)
        p += 1
        if code == 0:                    # block end — drain happens per tag
            continue
        if code < 0x80:
            # single-byte ops, stack effects per NutchSWFActions:
            if code in (0x3d, 0x52):         # callFunction / callMethod
                free.discard(stack.pop())
            elif code == 0x4e:               # getMember: name
                free.discard(stack.pop())
            elif code == 0x4f:               # setMember: value, then name
                stack.pop()
                free.discard(stack.pop())
            elif code == 0x17:               # pop
                free.discard(stack.pop())
            elif code == 0x1c:               # getVariable
                free.discard(stack.pop())
            elif code == 0x41:               # defineLocal: pop, no remove
                # NOTE: javaswf routes 0x3C (DefineLocal-with-value)
                # to a defineLocalValue callback the reference does
                # NOT override, so 0x3C must not pop — only 0x41
                # reaches the overridden defineLocal() (verified
                # against the reference's three sample movies)
                stack.pop()
            elif code == 0x20:               # setTarget2 -> setTarget()
                free.discard(stack.pop())
            elif code == 0x22:               # getProperty: pop, no remove
                stack.pop()
            elif code == 0x40:               # newObject: pop, no remove
                stack.pop()
            # setVariable (0x1d) / setProperty (0x23) are explicit
            # no-ops in the reference (SWFParser.java:563-570)
            continue
        if p + 2 > n:
            break
        ln = _u16(body, p)
        p += 2
        payload = body[p:p + ln]
        p += ln
        if code == 0x88:                 # ConstantPool -> lookupTable
            cnt = _u16(payload, 0)
            q = 2
            pool = []
            for _ in range(cnt):
                s, q = _string(payload, q)
                pool.append(s)
                free.add(s)
        elif code == 0x96:               # Push
            q = 0
            while q < len(payload):
                t = payload[q]
                q += 1
                if t == 0:               # string literal: push + remove
                    s, q = _string(payload, q)
                    stack.push(s)
                    free.discard(s)
                elif t == 1:             # float -> push("" + f)
                    q += 4
                    stack.push("0.0")
                elif t == 2:             # null -> push("")
                    stack.push("")
                elif t == 3:             # undefined -> push("???")
                    stack.push("???")
                elif t == 4:             # register -> push("" + reg)
                    stack.push(str(payload[q]) if q < len(payload) else "")
                    q += 1
                elif t == 5:             # boolean -> push("true"/"false")
                    stack.push("true" if q < len(payload) and payload[q]
                               else "false")
                    q += 1
                elif t == 6:             # double -> push("" + d)
                    q += 8
                    stack.push("0.0")
                elif t == 7:             # int32 -> push(int): pool alias
                    v = (struct.unpack_from("<i", payload, q)[0]
                         if q + 4 <= len(payload) else -1)
                    q += 4
                    if 0 <= v < len(pool):
                        stack.push(pool[v])
                elif t == 8:             # constant8 -> lookup: no remove
                    i = payload[q] if q < len(payload) else -1
                    q += 1
                    if 0 <= i < len(pool):
                        stack.push(pool[i])
                elif t == 9:             # constant16 -> lookup
                    i = (_u16(payload, q) if q + 2 <= len(payload) else -1)
                    q += 2
                    if 0 <= i < len(pool):
                        stack.push(pool[i])
                else:
                    break
        elif code == 0x83:               # GetURL (literal)
            url, q = _string(payload, 0)
            target, q = _string(payload, q)
            stack.push(url)
            stack.push(target)
            free.discard(url)
            free.discard(target)
            urls.append(url)
        elif code in (0x8c, 0x8b):       # GotoLabel / SetTarget: push+rm
            s, _ = _string(payload, 0)
            stack.push(s)
            free.discard(s)
        elif code == 0x81:               # GotoFrame(int) -> push("" + n)
            stack.push(str(_u16(payload, 0)) if len(payload) >= 2 else "0")
        elif code == 0x9e:               # Call -> call(): pop + remove
            free.discard(stack.pop())
        elif code == 0x9f:               # GotoFrame2 -> gotoFrame(boolean)
            stack.push("true" if payload and payload[0] & 0x01 else "false")
        elif code in (0x8a, 0x8d):       # WaitForFrame(2): synthetic label
            stack.push("label#")         # pushed+removed in the reference
        elif code == 0x8f:               # Try: catch name (if not a reg)
            if len(payload) >= 8 and not (payload[0] & 0x04):
                s, _ = _string(payload, 7)
                free.discard(s)
        elif code == 0x9b:               # DefineFunction -> startFunction
            name, q = _string(payload, 0)
            stack.push(name)
            free.discard(name)
            if q + 2 <= len(payload):
                nparams = _u16(payload, q)
                q += 2
                for _ in range(nparams):
                    s, q = _string(payload, q)
                    free.discard(s)
        elif code == 0x8e:               # DefineFunction2 -> startFunction2
            name, q = _string(payload, 0)
            stack.push(name)
            free.discard(name)
            if q + 5 <= len(payload):
                nparams = _u16(payload, q)
                q += 3                   # NumParams + RegisterCount
                q += 2                   # Flags
                for _ in range(nparams):
                    q += 1               # param register
                    s, q = _string(payload, q)
                    free.discard(s)
    stack.drain()                        # done(): purge stack leftovers


def swf_extract(data: bytes) -> dict:
    """Parse one SWF movie; returns ``{"text": str, "urls": [str]}``
    following the reference's assembly (SWFParser.java:63-125):
    ``text`` is the ordered strings space-joined plus the sorted
    surviving action strings behind a ``\\n--------\\n`` divider;
    ``urls`` = getURL targets then the free-text URL sweep of the
    final text. Raises :class:`SwfError` on a malformed container."""
    if len(data) < 8 or data[1:3] != b"WS" or data[0] not in (0x46, 0x43):
        raise SwfError("not an SWF (FWS/CWS) stream")
    if data[0] == 0x43:                  # CWS: zlib body
        try:
            body = zlib.decompress(data[8:])
        except zlib.error as e:
            raise SwfError(f"bad CWS zlib body: {e}") from None
    else:
        body = bytes(data[8:])
    bits = _Bits(body, 0)
    _skip_rect(bits)
    p = bits.align() + 4                 # frame rate + frame count

    fonts: dict[int, list[int]] = {}
    strings: list[str] = []
    free: set[str] = set()
    urls: list[str] = []

    while p + 2 <= len(body):
        code_len = _u16(body, p)
        p += 2
        code = code_len >> 6
        ln = code_len & 0x3F
        if ln == 0x3F:
            if p + 4 > len(body):
                break
            ln = _u32(body, p)
            p += 4
        tag = body[p:p + ln]
        p += ln
        if code == _TAG_END:
            break
        try:
            if code in (_TAG_DEFINE_FONT2, _TAG_DEFINE_FONT3):
                fid, codes = _font2_codes(tag, code == _TAG_DEFINE_FONT3)
                fonts[fid] = codes
            elif code in (_TAG_DEFINE_FONT_INFO, _TAG_DEFINE_FONT_INFO2):
                fid, codes = _fontinfo_codes(
                    tag, code == _TAG_DEFINE_FONT_INFO2)
                fonts[fid] = codes
            elif code in (_TAG_DEFINE_TEXT, _TAG_DEFINE_TEXT2):
                _define_text(tag, code == _TAG_DEFINE_TEXT2, fonts, strings)
            elif code == _TAG_DEFINE_EDIT_TEXT:
                _edit_text(tag, strings)
            elif code in (_TAG_DO_ACTION, _TAG_DO_INIT_ACTION):
                _walk_actions(tag if code == _TAG_DO_ACTION else tag[2:],
                              free, urls)
        except (IndexError, struct.error, SwfError):
            # one broken tag must not void the rest of the movie
            continue

    text = " ".join(strings)
    atext = "\n".join(sorted(free))
    if atext:
        text += "\n--------\n" + atext
    out_urls = list(urls)
    out_urls.extend(extract_free_text_urls(text))
    return {"text": text, "urls": out_urls}


# ------------------------------------------------------- test builder

def build_swf(edit_texts: list[str] = (),
              pool_strings: list[str] = (),
              get_urls: list[str] = (),
              compressed: bool = False,
              version: int = 6) -> bytes:
    """Assemble a minimal valid SWF movie for tests/oracles:
    DefineEditText tags carrying ``edit_texts`` as initial text, one
    DoAction with a ConstantPool of ``pool_strings`` (left unconsumed
    -> they survive as free text) and literal GetURL actions for
    ``get_urls``. Deterministic bytes for a given input."""
    def tag(code: int, body: bytes) -> bytes:
        if len(body) < 0x3F:
            return struct.pack("<H", (code << 6) | len(body)) + body
        return struct.pack("<HI", (code << 6) | 0x3F, len(body)) + body

    tags = []
    for i, t in enumerate(edit_texts):
        # id, 9-byte-aligned empty RECT (nbits=0 -> 1 byte), flags:
        # HasText only, empty VariableName, the text
        body = (struct.pack("<H", i + 1) + b"\x00"
                + bytes([0x80, 0x00]) + b"\x00"
                + t.encode("utf-8") + b"\x00")
        tags.append(tag(_TAG_DEFINE_EDIT_TEXT, body))
    actions = b""
    if pool_strings:
        pool = b"".join(s.encode("utf-8") + b"\x00" for s in pool_strings)
        payload = struct.pack("<H", len(pool_strings)) + pool
        actions += bytes([0x88]) + struct.pack("<H", len(payload)) + payload
    for u in get_urls:
        payload = u.encode("utf-8") + b"\x00" + b"\x00"
        actions += bytes([0x83]) + struct.pack("<H", len(payload)) + payload
    if actions:
        tags.append(tag(_TAG_DO_ACTION, actions + b"\x00"))
    tags.append(tag(_TAG_END, b""))

    body = b"\x00" + struct.pack("<HH", 0x0C00, 1) + b"".join(tags)
    if compressed:
        payload = zlib.compress(body, 9)
        head = b"CWS" + bytes([version]) + struct.pack(
            "<I", 8 + len(body))
        return head + payload
    return (b"FWS" + bytes([version])
            + struct.pack("<I", 8 + len(body)) + body)
