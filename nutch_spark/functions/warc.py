"""WARC/1.0 record codec — pure stdlib (zlib/email-style headers).

Common Crawl publishes its corpus as WARC (ISO 28500): each record is

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...          (WARC-Type, WARC-Target-URI,
    \r\n                                     WARC-Date, Content-Length…)
    <Content-Length payload bytes>
    \r\n\r\n

optionally with every record its own gzip member (``.warc.gz`` —
concatenated members, which plain ``gzip.decompress`` handles only
one of; :func:`split_gzip_members` walks them with raw zlib).

For ``response`` records the payload is an HTTP/1.1 message; the page
bytes follow the first blank line.

Reference analog: Nutch ingests archives via ArcSegmentCreator
(tools/arc/ArcSegmentCreator.java) — ARC is WARC's predecessor; the
record-walk + header-parse + payload-slice structure is the same.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

CRLF = b"\r\n"


def encode_warc_record(url: str, date: str, payload: bytes,
                       warc_type: str = "response",
                       http_status: int = 200,
                       content_type: str = "text/html") -> bytes:
    """One WARC/1.0 record wrapping an HTTP response around
    ``payload``. ``date`` is the ISO-8601 WARC-Date."""
    http = (f"HTTP/1.1 {http_status} "
            f"{'OK' if http_status == 200 else 'ERR'}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("ascii") + payload
    headers = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: " + warc_type.encode("ascii") + CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
        + b"WARC-Date: " + date.encode("ascii") + CRLF
        + b"Content-Type: application/http; msgtype=response" + CRLF
        + b"Content-Length: " + str(len(http)).encode("ascii") + CRLF
        + CRLF)
    return headers + http + CRLF + CRLF


def encode_warc(records: list[tuple],
                gzip_members: bool = False) -> bytes:
    """Concatenate records — ``(url, date, payload)`` or ``(url,
    date, payload, http_status)`` tuples; ``gzip_members=True``
    compresses each record as its own gzip member (the ``.warc.gz``
    layout)."""
    out = []
    for url, date, payload, *rest in records:
        raw = encode_warc_record(url, date, payload,
                                 http_status=rest[0] if rest else 200)
        if gzip_members:
            co = zlib.compressobj(wbits=31)  # gzip container
            raw = co.compress(raw) + co.flush()
        out.append(raw)
    return b"".join(out)


def split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Walk concatenated gzip members (CC ``.warc.gz``): each
    ``decompressobj`` stops at its member's end and reports the
    unused tail, which seeds the next member."""
    rest = data
    while rest:
        do = zlib.decompressobj(wbits=31)
        yield do.decompress(rest)
        rest = do.unused_data


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Parse WARC bytes (plain or per-record-gzip, auto-detected) →
    dicts with the WARC headers (lower-cased names) plus ``payload``
    (the raw record block). Record boundaries come from
    Content-Length — never from scanning for markers, so binary
    payloads are safe."""
    if data[:2] == b"\x1f\x8b":
        chunks: Iterator[bytes] = split_gzip_members(data)
    else:
        chunks = iter((data,))
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            # skip inter-record CRLFs
            while chunk[pos:pos + 2] == CRLF:
                pos += 2
            if pos >= len(chunk):
                break
            hdr_end = chunk.index(CRLF + CRLF, pos)
            head = chunk[pos:hdr_end].decode("utf-8", "replace")
            lines = head.split("\r\n")
            if not lines[0].startswith("WARC/"):
                raise ValueError(f"bad WARC version line: {lines[0]!r}")
            rec = {"warc_version": lines[0]}
            for line in lines[1:]:
                k, _, v = line.partition(":")
                rec[k.strip().lower()] = v.strip()
            length = int(rec["content-length"])
            body_start = hdr_end + 4
            rec["payload"] = chunk[body_start:body_start + length]
            pos = body_start + length
            yield rec


def http_payload(record: dict) -> tuple[int, bytes]:
    """Split a ``response`` record's HTTP block → (status, body)."""
    raw = record["payload"]
    sep = raw.index(CRLF + CRLF)
    status_line = raw[:raw.index(CRLF)].decode("ascii", "replace")
    status = int(status_line.split()[1])
    return status, raw[sep + 4:]
