"""parse-metatags + headings plugin analogs.

Reference:
- ``parse-metatags`` (MetaTagsParser.java:39-96): every ``<meta>``
  whose name (case-insensitive) is in ``metatags.names`` (default
  ``*`` = all) adds ``metatag.<lowercased-name> -> content`` to the
  parse metadata — a multimap (repeated tags append). http-equiv
  metas are collected the same way.
- ``headings`` (HeadingsParseFilter.java:43-103): for each configured
  heading tag (``headings`` property, e.g. h1/h2), collect the
  headings' text in document order; with ``headings.multivalued``
  false (default) only the FIRST non-empty heading per tag is kept.
  Text is the element's concatenated text content, whitespace
  collapsed.

Both run on the same stdlib HTMLParser walk used by the main
extractor; charset detection is shared (``detect_charset``).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .htmlparse import detect_charset

_WS = re.compile(r"\s+")
_HEADING_TAGS = frozenset(f"h{i}" for i in range(1, 7))


class _MetaHeadingWalker(HTMLParser):
    def __init__(self, heading_tags: frozenset[str]):
        super().__init__(convert_charrefs=True)
        self.heading_tags = heading_tags
        self.metas: list[tuple[str, str]] = []
        self.headings: dict[str, list[str]] = {}
        self.reltag_hrefs: list[str] = []
        self.anchors: list[tuple[str, str]] = []  # (rel, href)
        self.comments: list[str] = []
        self._open: str | None = None
        self._frags: list[str] = []

    def handle_comment(self, data):
        self.comments.append(data)

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "meta":
            name = (a.get("name") or a.get("http-equiv") or "").strip()
            content = a.get("content")
            if name and content is not None:
                self.metas.append((name.lower(), content))
            return
        if tag == "a":
            if a.get("href") is not None:
                self.anchors.append((a.get("rel") or "", a["href"]))
            # microformat rel-tag (RelTagParser.java:101-107):
            # rel="tag", case-insensitive exact match
            if (a.get("rel") or "").lower() == "tag" and a.get("href"):
                self.reltag_hrefs.append(a["href"])
            return
        if tag in self.heading_tags:
            self._open = tag
            self._frags = []

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if self._open and tag == self._open:
            text = _WS.sub(" ", " ".join(self._frags)).strip()
            if text:
                self.headings.setdefault(self._open, []).append(text)
            self._open = None
            self._frags = []

    def handle_data(self, data):
        if self._open is not None:
            self._frags.append(data)


def _walk(html: bytes,
          heading_tags: frozenset[str] = _HEADING_TAGS
          ) -> _MetaHeadingWalker:
    w = _MetaHeadingWalker(heading_tags)
    try:
        w.feed(html.decode(detect_charset(html), "replace"))
        w.close()
    except Exception:
        pass
    return w


def extract_metatags(html: bytes,
                     names: tuple[str, ...] = ("*",)) -> dict:
    """``metatag.<name> -> [values...]`` per MetaTagsParser.java:65-96
    (multimap: repeated tags append in document order)."""
    keep_all = "*" in names
    keep = {n.lower() for n in names}
    out: dict[str, list[str]] = {}
    for name, content in _walk(html).metas:
        if keep_all or name in keep:
            out.setdefault("metatag." + name, []).append(content)
    return out


def extract_headings(html: bytes, tags: tuple[str, ...] = ("h1", "h2"),
                     multivalued: bool = False) -> dict:
    """``<tag> -> [headings...]`` per HeadingsParseFilter.java:43-66;
    first non-empty heading only unless ``multivalued``."""
    wanted = frozenset(t.lower() for t in tags)
    got = _walk(html, wanted).headings
    return {t: (v if multivalued else v[:1])
            for t, v in got.items() if t in wanted}


# Schemes Java's `new URL(...)` accepts with a built-in handler —
# anything else (including relative hrefs, which have no scheme)
# throws MalformedURLException in the reference and is skipped.
_JAVA_URL_SCHEMES = frozenset({"http", "https", "ftp", "file", "jar",
                               "mailto"})
_NETLOC_SCHEMES = frozenset({"http", "https", "ftp"})


def extract_reltags(html: bytes) -> list[str]:
    """microformats-reltag (RelTagParser.java:95-135): for every
    ``<a rel="tag" href=...>``, the tag is the URL-decoded last path
    segment of the href. parseTag does ``new URL(href)``, so a
    relative href (no scheme) throws and is skipped; the tag set is a
    ``TreeSet``, so tags emit in sorted order."""
    from urllib.parse import unquote, urlparse

    out = set()
    for href in _walk(html).reltag_hrefs:
        try:
            p = urlparse(href)
        except ValueError:
            continue
        if p.scheme not in _JAVA_URL_SCHEMES:
            continue
        if p.scheme in _NETLOC_SCHEMES and not p.netloc:
            continue
        tag = unquote(p.path[p.path.rfind("/") + 1:])
        if tag:
            out.add(tag)
    return sorted(out)


_RDF_LICENSE = re.compile(
    r'<rdf:RDF\b.*?cc:license\s+rdf:resource\s*=\s*"([^"]+)"', re.S | re.I)


def extract_cc_license(html: bytes,
                       base_url: str = "") -> tuple[str, str] | None:
    """creativecommons plugin (CCParseFilter.java:56-150): the page's
    CC license url + where it was found, by the reference's
    precedence —

    1. ``rdf``: an RDF block (the CC-recommended HTML-comment
       embedding) carrying ``cc:license rdf:resource`` (simplified
       from the reference's namespace-aware cc:Work walk: the license
       resource is read with a regex over comment bodies);
    2. ``rel``: the first ``<a rel="license">`` whose base-resolved
       href is ``http://creativecommons.org/licenses/...``
       (rel must equal "license" exactly, lines 139-141);
    3. ``a``: the first plain anchor pointing at such a license URL.

    Returns (license_url, location) or None."""
    from urllib.parse import urljoin, urlparse

    w = _walk(html)
    for comment in w.comments:
        m = _RDF_LICENSE.search(comment)
        if m:
            return m.group(1), "rdf"

    rel_hit = anchor_hit = None
    for rel, href in w.anchors:
        try:
            u = urljoin(base_url, href.strip())
            p = urlparse(u)
        except ValueError:
            continue
        if (p.scheme.lower() != "http"
                or p.hostname != "creativecommons.org"
                or not p.path.startswith("/licenses/")
                or len(p.path) <= len("/licenses/")):
            continue
        if rel == "license" and rel_hit is None:
            rel_hit = u
        elif anchor_hit is None:
            anchor_hit = u
    if rel_hit:
        return rel_hit, "rel"
    if anchor_hit:
        return anchor_hit, "a"
    return None
