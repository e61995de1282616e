"""parse-zip plugin analog, codec half: ZIP container walk + per-entry
sub-parse dispatch.

Reference: ``src/plugin/parse-zip`` — ZipParser.java:57-72 (the
Content-Length truncation gate: a byte count shorter than the declared
length fails the whole document with FAILED_TRUNCATED before any entry
is read), ZipTextExtractor.java:68-115 (entry walk: directories
skipped, entries without a ``.`` in the name skipped — ``lastIndexOf
('.') != -1`` gates the sub-parse — each remaining entry parsed by its
detected type, sub-parse outlinks accumulated, and ``resultText +=
entryName + " " + text + " "``; an entry whose sub-parse fails is
skipped without failing the document).

The sub-parser registry here is the engine's own: ``.html``/``.htm``
entries go through :func:`~nutch_spark.functions.htmlparse.parse_html`
(the reference routes through ParseUtil → parse-html), ``.txt`` is the
text/plain identity parse, anything else has no parser and is skipped
(the reference's ParseException path). Pure stdlib ``zipfile`` —
nothing here touches Spark.
"""

from __future__ import annotations

import io
import zipfile
from dataclasses import dataclass, field

from .htmlparse import parse_html

# fixed DOS timestamp so encode_zip is byte-deterministic (ZIP stores
# local mtimes; 1980-01-01 is the format's epoch)
_EPOCH = (1980, 1, 1, 0, 0, 0)

_TEXT_EXT = (".txt",)
_HTML_EXT = (".html", ".htm")


def encode_zip(entries: list[tuple[str, bytes]]) -> bytes:
    """Deterministic ZIP blob: STORED entries, epoch timestamps, given
    order. A name ending in ``/`` becomes a directory entry."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in entries:
            info = zipfile.ZipInfo(filename=name, date_time=_EPOCH)
            zf.writestr(info, data)
    return buf.getvalue()


@dataclass
class ZipParseResult:
    status: str                      # success | failed_truncated | failed
    text: str | None = None
    title: str = ""                  # ZipParser.java:90-92 — always ""
    outlinks: list[tuple[str, str]] = field(default_factory=list)


def parse_zip(blob: bytes | None, url: str,
              declared_len: int | None = None) -> ZipParseResult:
    """ZipParser.getParse semantics over one blob.

    ``declared_len`` is the protocol Content-Length header; a mismatch
    with the actual byte count fails the document up front
    (ZipParser.java:66-72) — the parser refuses incomplete archives
    rather than reading a prefix of them.
    """
    data = bytes(blob or b"")
    if declared_len is not None and len(data) != declared_len:
        return ZipParseResult(status="failed_truncated")
    text_parts: list[str] = []
    outlinks: list[tuple[str, str]] = []
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                name = info.filename
                dot = name.rfind(".")
                if dot == -1:          # ZipTextExtractor.java:84-85
                    continue
                ext = name[dot:].lower()
                payload = zf.read(info)
                sub_url = url + "/" + name
                if ext in _HTML_EXT:
                    r = parse_html(payload, sub_url)
                    sub_text = r.text
                    outlinks.extend(r.outlinks)
                elif ext in _TEXT_EXT:
                    try:
                        sub_text = payload.decode("utf-8")
                    except UnicodeDecodeError:
                        continue       # unparseable entry → skipped
                else:
                    continue           # no parser for this type
                # ZipTextExtractor.java:106 — name + " " + text + " "
                text_parts.append(f"{name} {sub_text} ")
    except (zipfile.BadZipFile, OSError, ValueError):
        return ZipParseResult(status="failed")
    return ZipParseResult(status="success", text="".join(text_parts),
                          outlinks=outlinks)
