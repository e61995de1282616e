"""language-identifier plugin analog — metadata language detection.

Reference: ``src/plugin/language-identifier``
(HTMLLanguageParser.java): the "detect" half scans the page for
declared-language signals —

1. any element's ``lang`` attribute (first in document order,
   HTMLLanguageParser.java:221-225),
2. ``<meta name="dc.language" content=...>`` (:228-243),
3. ``<meta http-equiv="content-language" content=...>`` (:246-259),

with ctor precedence html-attribute > dublin-core > http-equiv
(:196-203); every captured value is normalized by ``parseLanguage``
(:272-296): split multi-valued strings on ``,| |;|.|(|)|=``, take the
primary subtag before ``-``/``_``, first token that resolves in the
ISO-639 map wins. A page with none of the three falls back to the
HTTP ``Content-Language`` header — returned RAW, un-normalized
(:131-134, the reference quirk). Parse-metadata values already set by
an earlier filter win over everything, also raw (:90-96, 157-170).

The "identify" half (statistical n-gram identification via Tika's
LanguageIdentifier) is substituted by this repo's stopword-hit
heuristic (``textops.lang_id``) at the operator layer; the
``lang.extraction.policy`` ordering ("detect,identify" default,
nutch-default.xml) is honored there.

The 44 ``parseLanguage`` vectors of TestHTMLLanguageParser.java:70-96
pass verbatim (tests/test_langid_meta.py).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from ._lang_codes import LANGUAGES_MAP

__all__ = ["parse_language", "detect_html_language"]

_SPLIT = re.compile(r"[,| ;.()=]")


def parse_language(lang: str | None) -> str | None:
    """ISO 639 primary code for a declared-language string, else
    None (HTMLLanguageParser.LanguageParser.parseLanguage:272-296)."""
    if lang is None:
        return None
    for tok in _SPLIT.split(lang):
        code = tok.split("-")[0].split("_")[0]
        hit = LANGUAGES_MAP.get(code.lower())
        if hit is not None:
            return hit
    return None


class _LangWalk(HTMLParser):
    """Document-order capture of the three declared-language signals;
    first resolvable occurrence per signal wins (the reference's
    ``if (x == null)`` guards, :221-259)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.html_attribute: str | None = None
        self.dublin_core: str | None = None
        self.http_equiv: str | None = None

    def handle_starttag(self, tag: str, attrs) -> None:
        d = {k.lower(): (v or "") for k, v in attrs}
        if self.html_attribute is None and "lang" in d:
            self.html_attribute = parse_language(d["lang"])
        if tag == "meta":
            if (self.dublin_core is None
                    and d.get("name", "").lower() == "dc.language"
                    and "content" in d):
                self.dublin_core = parse_language(d["content"])
            if (self.http_equiv is None
                    and d.get("http-equiv", "").lower()
                    == "content-language" and "content" in d):
                self.http_equiv = parse_language(d["content"])

    handle_startendtag = handle_starttag


def detect_html_language(html: bytes | str | None,
                         content_language_header: str | None = None,
                         parse_meta: dict | None = None) -> str | None:
    """The plugin's detect path (HTMLLanguageParser.java:122-136):
    parse-metadata (dc.language / content-language / lang, raw,
    :157-170), then the DOM walk with html-attr > dc > http-equiv
    precedence (:196-203), then the raw HTTP Content-Language
    header."""
    if parse_meta:
        for key in ("dc.language", "content-language", "lang"):
            v = parse_meta.get(key)
            if v is not None:
                return v
    if html is not None:
        if isinstance(html, (bytes, bytearray)):
            try:
                html = bytes(html).decode("utf-8")
            except UnicodeDecodeError:
                html = bytes(html).decode("latin-1")
        w = _LangWalk()
        try:
            w.feed(html)
            w.close()
        except Exception:
            pass
        lang = (w.html_attribute if w.html_attribute is not None
                else w.dublin_core if w.dublin_core is not None
                else w.http_equiv)
        if lang is not None:
            return lang
    return content_language_header
