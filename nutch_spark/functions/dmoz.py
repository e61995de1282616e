"""DMOZ / Open Directory RDF codec (DmozParser analog).

Reference: tools/DmozParser.java — a SAX walk over the DMOZ
``content.rdf.u8`` dump: ``<Topic r:id=...>`` sets the current
section, ``<ExternalPage about=url>`` emits a page (with its
``<d:Title>`` / ``<d:Description>`` children) subject to three gates:

- adult filter: section starts with ``Top/Adult`` (DmozParser.java:135)
- topic filter: section must match the topic regex (line 139)
- subset filter: ``abs(MD5Hash(url).hashCode() ^ skew) % denom == 0``
  (lines 145-148) — a deterministic 1/denom sample

The reference tolerates the dump's broken XML with a char filter
(XMLCharFilter); this codec is a regex state machine over the element
stream for the same tolerance, since the four element shapes above are
all the tool reads.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator
from html import escape, unescape

_TOPIC_RE = re.compile(r'<Topic\s+r:id="([^"]*)"')
_PAGE_RE = re.compile(r'<ExternalPage\s+about="([^"]*)"')
_TITLE_RE = re.compile(r"<d:Title>(.*?)</d:Title>", re.S)
_DESC_RE = re.compile(r"<d:Description>(.*?)</d:Description>", re.S)
_ELEM_RE = re.compile(
    r'<Topic\s+r:id="[^"]*"|<ExternalPage\s+about="[^"]*"[^>]*>'
    r'(?:(?!</ExternalPage>).)*</ExternalPage>', re.S)


def md5_quarter_hash(url: str) -> int:
    """Hadoop ``MD5Hash.digest(url).hashCode()`` — the digest's first
    four bytes as a signed big-endian int32 (MD5Hash.quarterDigest)."""
    d = hashlib.md5(url.encode("utf-8")).digest()
    v = int.from_bytes(d[:4], "big")
    return v - (1 << 32) if v >= (1 << 31) else v


def subset_keep(url: str, denom: int, skew: int = 0) -> bool:
    """The 1/denom subset gate with Java semantics
    (DmozParser.java:145-148): ``Math.abs(hash ^ skew) % denom == 0``,
    including Java's ``abs(Integer.MIN_VALUE) < 0`` edge and
    sign-following ``%``."""
    if denom <= 1:
        return True
    h = md5_quarter_hash(url) ^ skew
    # wrap the xor back into int32
    h &= 0xFFFFFFFF
    h = h - (1 << 32) if h >= (1 << 31) else h
    a = h if h == -(1 << 31) else abs(h)  # Java abs(MIN_VALUE) = MIN_VALUE
    # Java % keeps the dividend's sign
    m = a - int(a / denom) * denom
    return m == 0


def iter_dmoz_pages(text: str) -> Iterator[tuple[str, str, str, str]]:
    """Walk the RDF element stream: yields
    (topic, url, title, description) per ExternalPage, carrying the
    most recent Topic section (empty string before the first)."""
    topic = ""
    for m in _ELEM_RE.finditer(text):
        frag = m.group(0)
        tm = _TOPIC_RE.match(frag)
        if tm:
            topic = unescape(tm.group(1))
            continue
        pm = _PAGE_RE.match(frag)
        if not pm:  # pragma: no cover - _ELEM_RE only matches the two
            continue
        title_m = _TITLE_RE.search(frag)
        desc_m = _DESC_RE.search(frag)
        yield (topic, unescape(pm.group(1)),
               unescape(title_m.group(1)) if title_m else "",
               unescape(desc_m.group(1)) if desc_m else "")


def encode_dmoz(pages: list[tuple[str, str, str, str]]) -> str:
    """Serialize (topic, url, title, description) rows as a DMOZ-style
    RDF fragment (one Topic element per topic change, ExternalPage with
    d:Title / d:Description children) — the test/fixture inverse of
    :func:`iter_dmoz_pages`."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<RDF xmlns:r="http://www.w3.org/TR/RDF/" '
           'xmlns:d="http://purl.org/dc/elements/1.0/">']
    last_topic = None
    for topic, url, title, desc in pages:
        if topic != last_topic:
            out.append(f'<Topic r:id="{escape(topic, quote=True)}">'
                       f'</Topic>')
            last_topic = topic
        out.append(
            f'<ExternalPage about="{escape(url, quote=True)}">\n'
            f'  <d:Title>{escape(title)}</d:Title>\n'
            f'  <d:Description>{escape(desc)}</d:Description>\n'
            f'</ExternalPage>')
    out.append("</RDF>")
    return "\n".join(out)
