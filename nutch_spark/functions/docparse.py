"""parse-tika MSWord-path analog: from-scratch Word-97 text reader.

Reference: ``src/plugin/parse-tika`` routes ``application/msword``
through Tika/POI; the plugin test (TestMSWordParser.java:73-89) pins
the contract on ``parse-tika/sample/word97.doc``: extracted text
starts with "This is a sample doc file prepared for nutch." and every
readable ``.doc`` yields non-empty text.

Two public formats are implemented from their specifications, with
no POI/Tika lineage:

- **CFB / OLE2 compound file** ([MS-CFB]): 512-byte header with a
  109-entry DIFAT, FAT sector chains, the directory stream, and the
  root entry's mini stream + miniFAT for streams under the 4096-byte
  cutoff (both streams of the 8 KB reference sample live there).
- **Word 97 binary** ([MS-DOC]): the FIB in the ``WordDocument``
  stream (``wIdent`` 0xA5EC), ``fWhichTblStm`` selecting
  ``1Table``/``0Table``, the CLX in the table stream (skipping
  ``clxt=1`` Prc blocks to the ``clxt=2`` Pcdt), and the PlcPcd piece
  table: per piece, bit 30 of ``fc`` selects cp1252 single-byte
  (``fc/2``) vs UTF-16LE text. Control characters map exactly as a
  text dump needs: CR/VT → newline, cell mark 0x07 → tab, field and
  formatting marks dropped.

Golden-tested against the reference sample in
``tests/test_docparse.py``; ``build_doc`` writes a minimal REAL
compound file + FIB + piece table so the Spark oracle query
round-trips closed-form.
"""

from __future__ import annotations

import io
import struct

__all__ = ["doc_extract", "build_doc"]

_ENDOFCHAIN = -2
_FREESECT = -1


class _Cfb:
    """Minimal CFB reader: directory + FAT + miniFAT chains."""

    def __init__(self, blob: bytes):
        if blob[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
            raise ValueError("not a compound file")
        self.blob = blob
        self.ssz = 1 << struct.unpack("<H", blob[30:32])[0]
        self.mssz = 1 << struct.unpack("<H", blob[32:34])[0]
        self.dir_start = struct.unpack("<i", blob[48:52])[0]
        self.mini_cutoff = struct.unpack("<I", blob[56:60])[0]
        self.minifat_start = struct.unpack("<i", blob[60:64])[0]
        n_difat = struct.unpack("<I", blob[72:76])[0]
        difat = list(struct.unpack("<109i", blob[76:512]))
        nxt = struct.unpack("<i", blob[68:72])[0]
        for _ in range(n_difat):  # chained DIFAT sectors (files > ~7 MB)
            sec = self._sector(nxt)
            vals = struct.unpack("<%di" % (self.ssz // 4), sec)
            difat.extend(vals[:-1])
            nxt = vals[-1]
        fat = []
        for s in difat:
            if s < 0:
                continue
            fat.extend(struct.unpack("<%di" % (self.ssz // 4),
                                     self._sector(s)))
        self.fat = fat
        self.minifat: list[int] = []
        for s in self._chain(self.minifat_start):
            self.minifat.extend(struct.unpack("<%di" % (self.ssz // 4),
                                              self._sector(s)))
        self.entries = self._read_dir()
        root = next(e for e in self.entries if e["type"] == 5)
        self.mini_container = self._read_chain(root["start"], root["size"])

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.ssz
        return self.blob[off:off + self.ssz]

    def _chain(self, start: int) -> list[int]:
        out, s, seen = [], start, set()
        while s >= 0 and s not in seen:
            seen.add(s)
            out.append(s)
            s = self.fat[s] if s < len(self.fat) else _ENDOFCHAIN
        return out

    def _read_chain(self, start: int, size: int) -> bytes:
        data = b"".join(self._sector(s) for s in self._chain(start))
        return data[:size]

    def _read_mini(self, start: int, size: int) -> bytes:
        out, s, seen = [], start, set()
        while s >= 0 and s not in seen:
            seen.add(s)
            out.append(self.mini_container[s * self.mssz:
                                           (s + 1) * self.mssz])
            s = self.minifat[s] if s < len(self.minifat) else _ENDOFCHAIN
        return b"".join(out)[:size]

    def _read_dir(self) -> list[dict]:
        data = self._read_chain(self.dir_start, 1 << 62)
        entries = []
        for off in range(0, len(data) - 127, 128):
            e = data[off:off + 128]
            nlen = struct.unpack("<H", e[64:66])[0]
            if not 2 <= nlen <= 64:
                continue
            entries.append({
                "name": e[:nlen - 2].decode("utf-16le", "replace"),
                "type": e[66],
                "start": struct.unpack("<i", e[116:120])[0],
                "size": struct.unpack("<I", e[120:124])[0]})
        return entries

    def stream(self, name: str) -> bytes:
        for e in self.entries:
            if e["name"] == name and e["type"] == 2:
                if e["size"] < self.mini_cutoff:
                    return self._read_mini(e["start"], e["size"])
                return self._read_chain(e["start"], e["size"])
        raise KeyError(name)


def _map_control(ch: str) -> str:
    o = ord(ch)
    if o in (0x0D, 0x0B):      # paragraph mark / hard line break
        return "\n"
    if o == 0x07:              # cell/row mark
        return "\t"
    if o == 0x0C:              # page/section break
        return "\n"
    if o in (0x13, 0x14, 0x15, 0x01, 0x02, 0x05, 0x08,
             0x1E, 0x1F, 0x00):  # field/anchor/format marks
        return ""
    return ch


def doc_extract(blob: bytes) -> dict:
    """Word-97 ``.doc`` bytes → ``{"text"}`` (main-document range).
    Raises on non-CFB input or a missing/foreign WordDocument."""
    cfb = _Cfb(blob)
    word = cfb.stream("WordDocument")
    if struct.unpack("<H", word[0:2])[0] != 0xA5EC:
        raise ValueError("WordDocument: wIdent is not Word 8+")
    flags = struct.unpack("<H", word[0x0A:0x0C])[0]
    table_name = "1Table" if flags & 0x0200 else "0Table"
    # FibRgLw97 ccpText: base(32) + csw field(2) + rgw(csw*2) +
    # cslw field(2), ccpText is rglw slot 3 (cbMac, ..., ccpText)
    csw = struct.unpack("<H", word[32:34])[0]
    rglw_off = 34 + csw * 2 + 2
    ccp_text = struct.unpack("<i", word[rglw_off + 3 * 4:
                                        rglw_off + 3 * 4 + 4])[0]
    cslw = struct.unpack("<H", word[rglw_off - 2:rglw_off])[0]
    fclcb_off = rglw_off + cslw * 4 + 2
    # FibRgFcLcb97: fcClx/lcbClx is pair 33
    fc_clx, lcb_clx = struct.unpack(
        "<Ii", word[fclcb_off + 33 * 8:fclcb_off + 33 * 8 + 8])

    table = cfb.stream(table_name)
    clx = table[fc_clx:fc_clx + lcb_clx]
    i = 0
    while i < len(clx) and clx[i] == 0x01:  # Prc blocks before the Pcdt
        cb = struct.unpack("<h", clx[i + 1:i + 3])[0]
        i += 3 + cb
    if i >= len(clx) or clx[i] != 0x02:
        raise ValueError("CLX without a Pcdt piece table")
    lcb_pcdt = struct.unpack("<I", clx[i + 1:i + 5])[0]
    plc = clx[i + 5:i + 5 + lcb_pcdt]
    n_pieces = (len(plc) - 4) // 12
    cps = struct.unpack("<%di" % (n_pieces + 1), plc[:4 * (n_pieces + 1)])
    out: list[str] = []
    emitted = 0
    for p in range(n_pieces):
        pcd = plc[4 * (n_pieces + 1) + 8 * p:
                  4 * (n_pieces + 1) + 8 * p + 8]
        fc_raw = struct.unpack("<I", pcd[2:6])[0]
        n_cp = cps[p + 1] - cps[p]
        take = min(n_cp, max(ccp_text - emitted, 0))
        if take <= 0:
            break
        if fc_raw & 0x40000000:
            fc = (fc_raw & 0x3FFFFFFF) // 2
            raw = word[fc:fc + take].decode("cp1252", "replace")
        else:
            raw = word[fc_raw:fc_raw + 2 * take].decode("utf-16le",
                                                        "replace")
        out.append("".join(_map_control(c) for c in raw))
        emitted += take
    return {"text": "".join(out)}


# --- builder (closed-form oracle round-trip) ---------------------------

def _dir_entry(name: str, typ: int, start: int, size: int,
               left: int = -1, right: int = -1, child: int = -1) -> bytes:
    raw = name.encode("utf-16le") + b"\x00\x00"
    e = bytearray(128)
    e[:len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw))
    e[66] = typ
    e[67] = 1  # black
    struct.pack_into("<iii", e, 68, left, right, child)
    struct.pack_into("<i", e, 116, start)
    struct.pack_into("<I", e, 120, size)
    return bytes(e)


def build_doc(paragraphs: list[str]) -> bytes:
    """Minimal REAL Word-97 compound file: one FAT sector, a
    directory with Root/WordDocument/0Table, both streams in the mini
    stream, a single cp1252 text piece. ``doc_extract(build_doc(ps))
    ["text"]`` == ``"\\n".join(ps) + "\\n"`` for cp1252-encodable
    input (each paragraph closed by a CR mark)."""
    text = "".join(p.replace("\n", "\r") + "\r" for p in paragraphs)
    raw = text.encode("cp1252")

    # WordDocument stream: FIB (csw=14, cslw=22, cbRgFcLcb=93) + text
    csw, cslw, npairs = 14, 22, 93
    fib_len = 32 + 2 + csw * 2 + 2 + cslw * 4 + 2 + npairs * 8
    fc_text = fib_len
    word = bytearray(fib_len + len(raw))
    struct.pack_into("<HH", word, 0, 0xA5EC, 0x00C1)
    struct.pack_into("<H", word, 0x0A, 0x0000)      # fWhichTblStm=0
    struct.pack_into("<H", word, 32, csw)
    rglw_off = 34 + csw * 2 + 2
    struct.pack_into("<H", word, rglw_off - 2, cslw)
    struct.pack_into("<i", word, rglw_off + 3 * 4, len(text))  # ccpText
    fclcb_off = rglw_off + cslw * 4 + 2
    struct.pack_into("<H", word, fclcb_off - 2, npairs)
    word[fc_text:] = raw

    # 0Table stream: CLX = Pcdt with one compressed piece
    n = 1
    plc = struct.pack("<ii", 0, len(text))
    pcd = struct.pack("<HIH", 0, (fc_text * 2) | 0x40000000, 0)
    pcdt = b"\x02" + struct.pack("<I", len(plc) + len(pcd)) + plc + pcd
    struct.pack_into("<Ii", word, fclcb_off + 33 * 8, 0, len(pcdt))
    table = pcdt
    word = bytes(word)

    # mini stream: both streams, 64-byte mini sectors
    def mini_pad(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % 64)

    mini = mini_pad(word) + mini_pad(table)
    word_msec0 = 0
    table_msec0 = len(mini_pad(word)) // 64
    n_mini = len(mini) // 64
    minifat = []
    for s0, blob_ in ((word_msec0, word), (table_msec0, table)):
        cnt = (len(blob_) + 63) // 64
        minifat.extend(list(range(s0 + 1, s0 + cnt)) + [_ENDOFCHAIN])
    minifat += [_FREESECT] * (128 - len(minifat))

    # sectors: 0=FAT 1=dir 2=miniFAT 3.. = mini stream container
    n_container = (len(mini) + 511) // 512
    mini = mini + b"\x00" * (n_container * 512 - len(mini))
    fat = [-3, _ENDOFCHAIN, _ENDOFCHAIN]
    fat += [4 + i for i in range(n_container - 1)] + [_ENDOFCHAIN]
    fat += [_FREESECT] * (128 - len(fat))

    d = (_dir_entry("Root Entry", 5, 3, len(mini), child=1)
         + _dir_entry("WordDocument", 2, word_msec0, len(word),
                      right=2)
         + _dir_entry("0Table", 2, table_msec0, len(table))
         + b"\x00" * 128)

    hdr = bytearray(512)
    hdr[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", hdr, 24, 0x003E)   # minor
    struct.pack_into("<H", hdr, 26, 0x0003)   # major
    struct.pack_into("<H", hdr, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", hdr, 30, 9)        # 512-byte sectors
    struct.pack_into("<H", hdr, 32, 6)        # 64-byte mini sectors
    struct.pack_into("<I", hdr, 44, 1)        # one FAT sector
    struct.pack_into("<i", hdr, 48, 1)        # directory at sector 1
    struct.pack_into("<I", hdr, 56, 4096)     # mini cutoff
    struct.pack_into("<i", hdr, 60, 2)        # miniFAT at sector 2
    struct.pack_into("<I", hdr, 64, 1)
    struct.pack_into("<i", hdr, 68, _ENDOFCHAIN)  # no DIFAT chain
    difat = [0] + [_FREESECT] * 108
    struct.pack_into("<109i", hdr, 76, *difat)

    out = io.BytesIO()
    out.write(hdr)
    out.write(struct.pack("<128i", *fat))
    out.write(d + b"\x00" * (512 - len(d) % 512 if len(d) % 512 else 0))
    out.write(struct.pack("<128i", *minifat))
    out.write(mini)
    return out.getvalue()
