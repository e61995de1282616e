"""parse-tika RTF-path analog: from-scratch RTF reader.

Reference: ``src/plugin/parse-tika`` routes ``application/rtf`` /
``text/rtf`` through Tika; the plugin test (TestRTFParser.java:58-80)
pins the whole contract on ``parse-tika/sample/test.rtf``:
``text.trim()`` == "The quick brown fox jumps over the lazy dog",
title == "test rft document", DC subject == "tests" (title/subject
from the ``{\\info ...}`` destination).

This is an original tokenizer over the public RTF 1.9 syntax:
``{``/``}`` groups with inherited state, ``\\word[-]N`` control
words, ``\\'hh`` code-page escapes (ANSI → cp1252), ``\\uN`` unicode
with the ``\\ucN`` skip-count protocol, ignorable ``{\\*\\...}``
destinations (the ``\\*`` is only a destination marker immediately
after ``{`` — mid-group it is inert, which test.rtf relies on), and
the non-text destinations (fonttbl/colortbl/stylesheet/pict/...)
dropped wholesale. Golden-tested against the reference sample in
``tests/test_rtfparse.py``.
"""

from __future__ import annotations

import re

__all__ = ["rtf_extract", "build_rtf"]

# destinations whose content never reaches the text stream
_SKIP_DESTS = {
    "fonttbl", "colortbl", "stylesheet", "listtable", "listoverridetable",
    "pgdsctbl", "pgdscno", "info", "pict", "object", "header", "footer",
    "headerl", "headerr", "headerf", "footerl", "footerr", "footerf",
    "ftnsep", "ftnsepc", "xe", "tc", "bkmkstart", "bkmkend", "field",
    "themedata", "colorschememapping", "datastore", "revtbl",
}
# control words that emit literal characters
_CHAR_WORDS = {
    "par": "\n", "line": "\n", "sect": "\n", "page": "\n",
    "tab": "\t", "cell": "\t", "row": "\n",
    "emdash": "—", "endash": "–", "bullet": "•",
    "lquote": "‘", "rquote": "’",
    "ldblquote": "“", "rdblquote": "”",
    "emspace": " ", "enspace": " ", "qmspace": " ", "~": " ",
    "-": "", "_": "-",
}

_CW = re.compile(rb"([a-zA-Z]+)(-?\d+)? ?")


def rtf_extract(blob: bytes) -> dict:
    """RTF bytes → ``{"title", "subject", "text"}``. Raises
    ``ValueError`` if the blob is not an RTF document."""
    if not blob.startswith(b"{\\rtf"):
        raise ValueError("not an RTF document")

    text: list[str] = []
    title: list[str] = []
    subject: list[str] = []
    # group state: (skip, dest, uc) — dest is 'title'/'subject'/None
    skip, dest, uc = False, None, 1
    stack: list[tuple[bool, str | None, int]] = []
    in_info = False
    info_depth = 0
    i, n = 0, len(blob)
    pending_skip = 0  # chars to swallow after \uN
    after_open = False  # just consumed '{' (for the \* rule)

    def sink() -> list[str] | None:
        if skip and dest is None:
            return None
        if dest == "title":
            return title
        if dest == "subject":
            return subject
        return None if skip or in_info else text

    def put(s: str) -> None:
        nonlocal pending_skip
        if pending_skip:
            drop = min(pending_skip, len(s))
            pending_skip -= drop
            s = s[drop:]
        if not s:
            return
        out = sink()
        if out is not None:
            out.append(s)

    while i < n:
        c = blob[i:i + 1]
        if c == b"{":
            stack.append((skip, dest, uc))
            if in_info:
                info_depth += 1
            after_open = True
            i += 1
            continue
        if c == b"}":
            if stack:
                skip, dest, uc = stack.pop()
            if in_info:
                info_depth -= 1
                if info_depth <= 0:
                    in_info = False
            after_open = False
            i += 1
            continue
        if c == b"\\":
            nxt = blob[i + 1:i + 2]
            if nxt == b"'":
                put(blob[i + 2:i + 4].decode("cp1252", "replace"))
                i += 4
                after_open = False
                continue
            if nxt in (b"\\", b"{", b"}"):
                put(nxt.decode("ascii"))
                i += 2
                after_open = False
                continue
            if nxt == b"*":
                if after_open:
                    # ignorable destination: unknown → skip the group
                    skip = True
                    dest = None
                i += 2
                # after_open persists so \* \word at group start still
                # sees the destination position for known words
                continue
            if nxt in (b"~", b"-", b"_"):
                put(_CHAR_WORDS[nxt.decode("ascii")])
                i += 2
                after_open = False
                continue
            m = _CW.match(blob, i + 1)
            if not m:
                i += 2
                continue
            word = m.group(1).decode("ascii")
            param = int(m.group(2)) if m.group(2) else None
            i = m.end()
            if word == "u" and param is not None:
                cp = param + 65536 if param < 0 else param
                out = sink()
                if out is not None:
                    out.append(chr(cp))
                pending_skip = uc
                after_open = False
                continue
            if word == "uc":
                uc = param if param is not None else 1
            elif word == "info":
                in_info = True
                info_depth = 1
            elif word in ("title", "subject") and in_info:
                dest = word
            elif word in _SKIP_DESTS:
                if after_open:
                    skip, dest = True, None
            elif word in _CHAR_WORDS:
                put(_CHAR_WORDS[word])
            after_open = False
            continue
        if c in (b"\r", b"\n"):
            i += 1
            continue
        # literal text run up to the next control char
        j = i
        while j < n and blob[j:j + 1] not in (b"\\", b"{", b"}",
                                              b"\r", b"\n"):
            j += 1
        put(blob[i:j].decode("cp1252", "replace"))
        after_open = False
        i = j

    return {"title": "".join(title).strip(),
            "subject": "".join(subject).strip(),
            "text": "".join(text)}


def _esc(s: str) -> str:
    out = []
    for ch in s:
        if ch in "\\{}":
            out.append("\\" + ch)
        elif ch == "\t":
            out.append("\\tab ")
        elif ch == "\n":
            out.append("\\line ")
        elif ord(ch) < 128:
            out.append(ch)
        else:
            out.append("\\u%d?" % (ord(ch) if ord(ch) < 32768
                                   else ord(ch) - 65536))
    return "".join(out)


def build_rtf(paragraphs: list[str], title: str = "",
              subject: str = "") -> bytes:
    """Minimal real RTF document whose extraction is closed-form:
    text == "\\n".join(paragraphs) + "\\n" (each paragraph ends with
    ``\\par``), with the info block carrying title/subject."""
    body = "".join("\\pard %s\\par\n" % _esc(p) for p in paragraphs)
    doc = ("{\\rtf1\\ansi\\deff0\n"
           "{\\fonttbl{\\f0\\froman Times;}}\n"
           "{\\info{\\title %s}{\\subject %s}}\n"
           "%s}" % (_esc(title), _esc(subject), body))
    return doc.encode("ascii")
