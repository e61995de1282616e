"""parse-js plugin analog — outlink extraction from JavaScript.

Reference: ``parse-js`` (JSParseFilter.java:182-260): candidate links
are quoted strings without whitespace/quotes
(``(\\*(?:"|'))([^\\s"']+?)(?:\\1)``) that FULLY match the permissive
URI pattern ``(^|\\s*?)/?\\S+?[/.]\\S+($|\\s*)`` (i.e. two non-space
runs joined by ``/`` or ``.``); ``www.``-prefixed candidates get
``http://`` prepended, everything else resolves against the page url
(unresolvable → skipped); ``&amp;`` unescapes to ``&``.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

_STRING = re.compile(r"""(\\*(?:"|'))([^\s"']+?)(?:\1)""",
                     re.I | re.M)
_URI = re.compile(r"(^|\s*?)/?\S+?[/.]\S+($|\s*)", re.I | re.M)


def extract_js_links(script: str, base_url: str) -> list[str]:
    """Outlink candidates from one script body, in match order
    (JSParseFilter.getJSLinks)."""
    out: list[str] = []
    for m in _STRING.finditer(script or ""):
        cand = m.group(2)
        if not _URI.fullmatch(cand):
            continue
        if cand.startswith("www."):
            url = "http://" + cand
        else:
            try:
                url = urljoin(base_url, cand)
            except ValueError:
                continue
            if not url:
                continue
        out.append(url.replace("&amp;", "&"))
    return out
