"""HTML parsing: text / title / outlinks extraction.

Reimplements the reference's parse-html semantics as a pure-Python
function suitable for use inside an Arrow/pandas UDF:

- ``DOMContentUtils.getText`` (DOMContentUtils.java:127-168): DFS over
  the DOM, skipping ``script``/``style`` subtrees and comments; every
  text node has runs of whitespace collapsed to a single space and is
  trimmed; non-empty fragments are joined by single spaces.
- ``DOMContentUtils.getTitle`` (DOMContentUtils.java:177-200): first
  ``<title>`` element's text.
- ``DOMContentUtils.getOutlinks`` (DOMContentUtils.java:313-398):
  links from ``a[href]``, ``area[href]``, ``frame[src]``,
  ``iframe[src]``, ``link[href]`` (``form[action]`` behind a flag);
  ``rel=nofollow`` anchors skipped; anchors resolved against
  ``<base href>`` else the page URL (URLUtil.resolveURL,
  URLUtil.java:41); anchor text from child text nodes with
  ``img[alt]`` fallback (DOMContentUtils.java:331-363).
- ``HTMLMetaProcessor`` robots directives (HtmlParser.java:195-222):
  ``<meta name=robots content=noindex>`` suppresses text+title,
  ``nofollow`` suppresses outlinks.
- meta-refresh redirects (HtmlParser.java:225-229): a
  ``<meta http-equiv=refresh content="N;url=...">`` yields
  ``redirect`` in the result.
- charset detection (HtmlParser.java:82-126): BOM sniff, then
  ``<meta charset>`` / ``http-equiv`` regex over the first 2000
  bytes, else utf-8 with replacement.

The driver's synthetic pages table carries a golden ``text`` column
produced by this same whitespace-collapse algorithm; byte-identity is
asserted per url in tests (the per-row invariant from BASELINE.json).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urljoin

_WS = re.compile(r"\s+")
_CHARSET_META = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([a-zA-Z0-9_\-]+)""", re.I)
_REFRESH = re.compile(r"^\s*\d+\s*;\s*url\s*=\s*(\S+)", re.I)

# tag → attribute carrying the link (DOMContentUtils.java:72-83)
LINK_ATTRS = {"a": "href", "area": "href", "frame": "src",
              "iframe": "src", "link": "href"}
_SKIP_SUBTREE = {"script", "style"}
_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
         "link", "meta", "param", "source", "track", "wbr"}


@dataclass
class ParseResult:
    text: str = ""
    title: str = ""
    outlinks: list = field(default_factory=list)  # [(to_url, anchor)]
    redirect: str | None = None
    noindex: bool = False
    nofollow: bool = False
    base: str | None = None


class _Extractor(HTMLParser):
    def __init__(self, base_url: str, use_form_action: bool = False):
        super().__init__(convert_charrefs=True)
        self.base_url = base_url
        self.use_form_action = use_form_action
        self.res = ParseResult()
        self._skip_depth = 0
        self._in_title = False
        self._title_done = False
        self._frags: list[str] = []
        # stack of anchor collectors: (resolved_url, [text frags])
        self._anchors: list[tuple[str | None, list[str]]] = []

    # -- helpers ---------------------------------------------------------
    def _resolve(self, target: str) -> str | None:
        base = self.res.base or self.base_url
        try:
            u = urljoin(base, target.strip())
        except ValueError:
            return None
        return u if u else None

    def _emit_link(self, url: str | None, anchor: str) -> None:
        if url:
            self.res.outlinks.append((url, anchor))

    # -- HTMLParser ------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "title" and not self._title_done:
            self._in_title = True
            return
        if tag == "base" and a.get("href") and self.res.base is None:
            self.res.base = a["href"].strip()
            return
        if tag == "meta":
            name = (a.get("name") or "").lower()
            if name == "robots":
                content = (a.get("content") or "").lower()
                if "noindex" in content or "none" in content:
                    self.res.noindex = True
                if "nofollow" in content or "none" in content:
                    self.res.nofollow = True
            he = (a.get("http-equiv") or "").lower()
            if he == "refresh":
                m = _REFRESH.match(a.get("content") or "")
                if m:
                    self.res.redirect = self._resolve(
                        m.group(1).strip("'\""))
            return
        if tag == "img":
            # img[alt] is anchor-text fallback (DOMContentUtils.java:344-358)
            alt = (a.get("alt") or "").strip()
            if alt and self._anchors:
                self._anchors[-1][1].append(alt)
            return
        # rel=nofollow skip (DOMContentUtils.java:374-378)
        rel = (a.get("rel") or "").lower()
        if tag == "a":
            href = a.get("href")
            url = None
            if href and "nofollow" not in rel:
                url = self._resolve(href)
            self._anchors.append((url, []))
            return
        if tag == "form":
            if self.use_form_action and a.get("action") \
                    and (a.get("method") or "get").lower() != "post":
                self._emit_link(self._resolve(a["action"]), "")
            return
        attr = LINK_ATTRS.get(tag)
        if attr and tag != "a" and a.get(attr) \
                and "nofollow" not in rel:
            self._emit_link(self._resolve(a[attr]), "")

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREE:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag == "title" and self._in_title:
            self._in_title = False
            self._title_done = True
            return
        if tag == "a" and self._anchors:
            url, frags = self._anchors.pop()
            anchor = " ".join(f for f in frags if f)
            self._emit_link(url, anchor)

    def handle_data(self, data):
        if self._skip_depth:
            return
        frag = _WS.sub(" ", data).strip()
        if not frag:
            return
        if self._in_title:
            self.res.title = (self.res.title + " " + frag).strip() \
                if self.res.title else frag
        if self._anchors:
            self._anchors[-1][1].append(frag)
        self._frags.append(frag)

    def close(self):
        super().close()
        # unclosed anchors still emit (NekoHTML fixup analog)
        while self._anchors:
            url, frags = self._anchors.pop()
            self._emit_link(url, " ".join(f for f in frags if f))
        self.res.text = " ".join(self._frags)


def detect_charset(html: bytes) -> str:
    """BOM sniff + meta-charset regex over the first 2000 bytes
    (HtmlParser.java:82-126, EncodingDetector fallback → utf-8)."""
    if html.startswith(b"\xef\xbb\xbf"):
        return "utf-8"
    if html.startswith(b"\xff\xfe") or html.startswith(b"\xfe\xff"):
        return "utf-16"
    m = _CHARSET_META.search(html[:2000])
    if m:
        try:
            cs = m.group(1).decode("ascii")
            b"".decode(cs)  # validate
            return cs
        except (LookupError, UnicodeDecodeError):
            pass
    return "utf-8"


# ---------------------------------------------------------------------------
# fast tokenizer path
# ---------------------------------------------------------------------------
# html.parser.HTMLParser is a pure-Python event loop and dominates the
# whole engine's CPU profile (the parse UDF is ~3× the JVM cost of a
# crawl cycle). This tokenizer generates the same start/end/data events
# with one compiled regex pass and drives the SAME _Extractor handler
# methods, so semantics are identical by construction; a differential
# test (tests/test_parse.py) asserts fast == stdlib on the fixture
# corpus and the extraction vectors.

_TOKEN = re.compile(
    r"<!--.*?(?:-->|$)"          # comment
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"  # cdata
    r"|<![^>]*>"                 # declaration
    r"|<\?[^>]*>"                # processing instruction
    r"|</\s*([a-zA-Z][a-zA-Z0-9:._-]*)\s*>"          # end tag
    r"|<([a-zA-Z][a-zA-Z0-9:._-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?)>"  # start tag
    r"|[^<]+",                   # text
    re.S)
_ATTR = re.compile(
    r"([a-zA-Z][a-zA-Z0-9:._-]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]*))?",
    re.S)
_HAS_ENTITY = re.compile(r"&[#a-zA-Z]")


def _unescape(s: str) -> str:
    if _HAS_ENTITY.search(s):
        import html as _html
        return _html.unescape(s)
    return s


def _fast_feed(p: _Extractor, doc: str) -> None:
    skip_until = None   # inside <script>/<style>: skip to this end tag
    for m in _TOKEN.finditer(doc):
        end_name, start_name, attrs_s, selfclose = \
            m.group(1), m.group(2), m.group(3), m.group(4)
        if skip_until is not None:
            if end_name and end_name.lower() == skip_until:
                p.handle_endtag(skip_until)
                skip_until = None
            continue
        if start_name:
            tag = start_name.lower()
            attrs = []
            if attrs_s:
                for am in _ATTR.finditer(attrs_s):
                    k = am.group(1).lower()
                    v = am.group(2)
                    if v is None:
                        v = None
                    else:
                        if v[:1] in "\"'":
                            v = v[1:-1]
                        v = _unescape(v)
                    attrs.append((k, v))
            if selfclose:
                p.handle_startendtag(tag, attrs)
            elif tag in _SKIP_SUBTREE:
                # raw-text elements: stdlib parser treats everything
                # up to the matching close tag as CDATA
                p.handle_starttag(tag, attrs)
                skip_until = tag
            else:
                p.handle_starttag(tag, attrs)
        elif end_name:
            p.handle_endtag(end_name.lower())
        else:
            tok = m.group(0)
            if tok.startswith("<!") or tok.startswith("<?"):
                continue
            p.handle_data(_unescape(tok))


def parse_html(html: bytes | str | None, base_url: str,
               use_form_action: bool = False,
               engine: str = "fast") -> ParseResult:
    """Full page parse → ParseResult. Robots meta directives applied
    (noindex clears text/title, nofollow clears outlinks).

    ``engine='fast'`` uses the regex tokenizer (default, ~5× the
    stdlib speed); ``engine='stdlib'`` drives html.parser.HTMLParser —
    kept as the differential-testing reference."""
    if html is None:
        return ParseResult()
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode(detect_charset(bytes(html)), "replace")
    p = _Extractor(base_url, use_form_action=use_form_action)
    try:
        if engine == "fast":
            _fast_feed(p, html)
            p.close()
        else:
            p.feed(html)
            p.close()
    except Exception:
        pass
    res = p.res
    if res.noindex:
        res.text, res.title = "", ""
    if res.nofollow:
        res.outlinks = []
    return res
