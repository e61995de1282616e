"""RSS 2.0 / Atom 1.0 feed codec — pure stdlib, closed-form.

Reference: ``src/plugin/feed`` — FeedParser.java:105-150 (getParse:
build feed, normalize+filter feedLink at scope=outlink, one ParseResult
row per entry via addToMap plus one row for the feed URL itself),
FeedParser.java:220-300 (addToMap: entry link normalize+filter, title
stripTags, text = description else concatenated contents),
FeedParser.java:303-352 (addFields: author / tag / published / updated
parse-meta, epoch-ms strings), FeedParser.java:354-366 (stripTags).

The reference delegates XML to the ROME library; this module
implements the two public formats directly on
``xml.etree.ElementTree`` so the decode path is dependency-free and
Arrow-batchable. Only the fields the reference extracts are modeled:
feed link / title / description and per-entry link / title /
description / contents / author(s) / categories / published / updated.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime, timezone
from email.utils import format_datetime, parsedate_to_datetime
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

ATOM_NS = "http://www.w3.org/2005/Atom"
_TAG_RE = re.compile(r"<[^>]*>")

# attribute values additionally need the quote escaped and whitespace
# character-referenced (XML attribute-value normalization would fold
# raw \t/\n to spaces on parse)
_ATTR_ESC = {'"': "&quot;", "\t": "&#9;", "\n": "&#10;", "\r": "&#13;"}


def _attr(value: str) -> str:
    return escape(value, _ATTR_ESC)


def strip_tags(value: str | None) -> str:
    """FeedParser.stripTags (FeedParser.java:354-366): drop markup
    spans, concatenate the rest, trim."""
    if value is None:
        return ""
    return "".join(_TAG_RE.split(value)).strip()


@dataclass
class FeedEntry:
    link: str | None = None
    title: str | None = None
    text: str | None = None          # description else joined contents
    authors: list[str] = field(default_factory=list)
    tags: list[str] = field(default_factory=list)
    published_ms: int | None = None
    updated_ms: int | None = None


@dataclass
class Feed:
    link: str | None = None
    title: str | None = None
    description: str | None = None
    entries: list[FeedEntry] = field(default_factory=list)


def _epoch_ms(dt: datetime | None) -> int | None:
    if dt is None:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def _parse_rfc822(s: str | None) -> int | None:
    if not s:
        return None
    try:
        return _epoch_ms(parsedate_to_datetime(s))
    except (TypeError, ValueError):
        return None


def _parse_iso(s: str | None) -> int | None:
    if not s:
        return None
    try:
        return _epoch_ms(datetime.fromisoformat(s.replace("Z", "+00:00")))
    except ValueError:
        return None


def _text(el: ET.Element | None) -> str | None:
    if el is None:
        return None
    return el.text if el.text is not None else ""


# ---------------------------------------------------------------- decode

def parse_feed(data: bytes) -> Feed:
    """Decode one RSS 2.0 or Atom 1.0 document. Raises
    ``ValueError`` on XML that is neither (FeedParser.java:118-125
    returns an empty parse on builder failure — callers map the raise
    to that)."""
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        raise ValueError(f"not a feed: {e}") from e
    if root.tag == "rss":
        return _parse_rss(root)
    if root.tag == f"{{{ATOM_NS}}}feed":
        return _parse_atom(root)
    raise ValueError(f"not a feed: root element {root.tag!r}")


def _parse_rss(root: ET.Element) -> Feed:
    ch = root.find("channel")
    if ch is None:
        raise ValueError("rss without channel")
    feed = Feed(link=_text(ch.find("link")),
                title=_text(ch.find("title")),
                description=_text(ch.find("description")))
    for item in ch.findall("item"):
        e = FeedEntry(
            link=_text(item.find("link")),
            title=_text(item.find("title")),
            text=_text(item.find("description")),
            published_ms=_parse_rfc822(_text(item.find("pubDate"))))
        author = _text(item.find("author"))
        if author:
            e.authors.append(author)
        e.tags = [t for t in (_text(c) for c in item.findall("category"))
                  if t]
        feed.entries.append(e)
    return feed


def _parse_atom(root: ET.Element) -> Feed:
    def q(tag: str) -> str:
        return f"{{{ATOM_NS}}}{tag}"

    def alt_link(el: ET.Element) -> str | None:
        best = None
        for ln in el.findall(q("link")):
            rel = ln.get("rel", "alternate")
            if rel == "alternate":
                return ln.get("href")
            if best is None:
                best = ln.get("href")
        return best

    feed = Feed(link=alt_link(root),
                title=_text(root.find(q("title"))),
                description=_text(root.find(q("subtitle"))))
    for item in root.findall(q("entry")):
        summary = _text(item.find(q("summary")))
        if summary is None:
            # description == null → concatenated <content> values
            # (FeedParser.java:255-262)
            summary = "".join(_text(c) or ""
                              for c in item.findall(q("content"))) or None
        e = FeedEntry(
            link=alt_link(item),
            title=_text(item.find(q("title"))),
            text=summary,
            published_ms=_parse_iso(_text(item.find(q("published")))),
            updated_ms=_parse_iso(_text(item.find(q("updated")))))
        e.authors = [n for n in
                     (_text(a.find(q("name")))
                      for a in item.findall(q("author"))) if n]
        e.tags = [c.get("term") for c in item.findall(q("category"))
                  if c.get("term")]
        feed.entries.append(e)
    return feed


# ---------------------------------------------------------------- encode

def encode_rss(feed: Feed) -> bytes:
    """Feed → RSS 2.0 bytes (inverse of :func:`parse_feed`)."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           '<rss version="2.0"><channel>']
    if feed.title is not None:
        out.append(f"<title>{escape(feed.title)}</title>")
    if feed.link is not None:
        out.append(f"<link>{escape(feed.link)}</link>")
    if feed.description is not None:
        out.append(f"<description>{escape(feed.description)}"
                   f"</description>")
    for e in feed.entries:
        out.append("<item>")
        if e.title is not None:
            out.append(f"<title>{escape(e.title)}</title>")
        if e.link is not None:
            out.append(f"<link>{escape(e.link)}</link>")
        if e.text is not None:
            out.append(f"<description>{escape(e.text)}</description>")
        for a in e.authors:
            out.append(f"<author>{escape(a)}</author>")
        for t in e.tags:
            out.append(f"<category>{escape(t)}</category>")
        if e.published_ms is not None:
            dt = datetime.fromtimestamp(e.published_ms / 1000,
                                        tz=timezone.utc)
            out.append(f"<pubDate>{format_datetime(dt)}</pubDate>")
        out.append("</item>")
    out.append("</channel></rss>")
    return "".join(out).encode("utf-8")


def encode_atom(feed: Feed) -> bytes:
    """Feed → Atom 1.0 bytes (inverse of :func:`parse_feed`)."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           f'<feed xmlns="{ATOM_NS}">']
    if feed.title is not None:
        out.append(f"<title>{escape(feed.title)}</title>")
    if feed.link is not None:
        out.append(f'<link rel="alternate" href="{_attr(feed.link)}"/>')
    if feed.description is not None:
        out.append(f"<subtitle>{escape(feed.description)}</subtitle>")
    for e in feed.entries:
        out.append("<entry>")
        if e.title is not None:
            out.append(f"<title>{escape(e.title)}</title>")
        if e.link is not None:
            out.append(f'<link rel="alternate" '
                       f'href="{_attr(e.link)}"/>')
        if e.text is not None:
            out.append(f"<summary>{escape(e.text)}</summary>")
        for a in e.authors:
            out.append(f"<author><name>{escape(a)}</name></author>")
        for t in e.tags:
            out.append(f'<category term="{_attr(t)}"/>')
        for ms, tag in ((e.published_ms, "published"),
                        (e.updated_ms, "updated")):
            if ms is not None:
                dt = datetime.fromtimestamp(ms / 1000, tz=timezone.utc)
                out.append(f"<{tag}>"
                           f"{dt.strftime('%Y-%m-%dT%H:%M:%SZ')}"
                           f"</{tag}>")
        out.append("</entry>")
    out.append("</feed>")
    return "".join(out).encode("utf-8")
