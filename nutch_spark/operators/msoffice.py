"""parse-tika document-path analogs, operator half: OO / RTF /
Word-97 / image blobs → parse rows.

Reference: ``src/plugin/parse-tika`` routes these mimes through Tika
(TikaParser.java:71-120); the codecs are this repo's from-scratch
readers — :mod:`nutch_spark.functions.ooparse` (TestOOParser.java),
:mod:`nutch_spark.functions.rtfparse` (TestRTFParser.java:58-80),
:mod:`nutch_spark.functions.docparse` (TestMSWordParser.java:73-89),
:mod:`nutch_spark.functions.imagemeta` (TestImageMetadata.java:53-66)
— each golden-verified against the plugin's own sample files. The
Content-Length truncation gate runs first when a length column is
given (ParseSegment.java:160-193 applies it to every parser family).
None of these formats yields outlinks on the Tika path; images yield
no text at all, only width/height parse metadata.

Spark shape: Arrow-batched ``mapInPandas`` over independent blob
rows, one output row per document, no shuffle. The ``make_*_blobs``
builders derive REAL containers closed-form from an id+text table
(the ``make_swf_blobs`` pattern) so every operator has a
SQL-predictable oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

from ..config import CrawlConfig


def _gated(run_one, out_cols, url_col, content_col, length_col,
           int_cols: tuple[str, ...] = ()):
    """Shared mapInPandas kernel: truncation gate → codec → row.
    ``int_cols`` are cast to pandas nullable Int32 so failure rows
    (None) don't degrade the column to float NaN before Arrow."""
    import pandas as pd

    has_len = length_col is not None

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            lens = pdf[length_col] if has_len else [None] * len(pdf)
            rows = []
            for url, blob, dlen in zip(pdf[url_col], pdf[content_col],
                                       lens):
                raw = bytes(blob or b"")
                if (dlen is not None and not pd.isna(dlen)
                        and len(raw) != int(dlen)):
                    rows.append({**dict.fromkeys(out_cols),
                                 "url": url,
                                 "status": "failed_truncated"})
                    continue
                try:
                    r = run_one(raw)
                except Exception:
                    rows.append({**dict.fromkeys(out_cols),
                                 "url": url, "status": "failed"})
                    continue
                rows.append({**dict.fromkeys(out_cols), "url": url,
                             "status": "success", **r})
            out = pd.DataFrame(rows, columns=out_cols)
            for c in int_cols:
                out[c] = out[c].astype("Int32")
            yield out

    return run


def parse_oo(blobs: DataFrame, cfg: CrawlConfig,
             url_col: str = "url", content_col: str = "content",
             length_col: str | None = "content_length") -> DataFrame:
    """ODT/SXW blobs → ``url, status, title, lang, text``."""
    from ..functions import ooparse as O

    cols = ["url", "status", "title", "lang", "text"]

    def one(raw: bytes) -> dict:
        r = O.oo_extract(raw)
        return {"title": r["title"], "lang": r["language"],
                "text": r["text"]}

    return blobs.mapInPandas(
        _gated(one, cols, url_col, content_col, length_col),
        "url string, status string, title string, lang string, "
        "text string")


def parse_rtf(blobs: DataFrame, cfg: CrawlConfig,
              url_col: str = "url", content_col: str = "content",
              length_col: str | None = "content_length") -> DataFrame:
    """RTF blobs → ``url, status, title, subject, text``."""
    from ..functions import rtfparse as R

    cols = ["url", "status", "title", "subject", "text"]

    def one(raw: bytes) -> dict:
        return R.rtf_extract(raw)

    return blobs.mapInPandas(
        _gated(one, cols, url_col, content_col, length_col),
        "url string, status string, title string, subject string, "
        "text string")


def parse_msword(blobs: DataFrame, cfg: CrawlConfig,
                 url_col: str = "url", content_col: str = "content",
                 length_col: str | None = "content_length") -> DataFrame:
    """Word-97 ``.doc`` blobs → ``url, status, text``."""
    from ..functions import docparse as D

    cols = ["url", "status", "text"]

    def one(raw: bytes) -> dict:
        return D.doc_extract(raw)

    return blobs.mapInPandas(
        _gated(one, cols, url_col, content_col, length_col),
        "url string, status string, text string")


def parse_images(blobs: DataFrame, cfg: CrawlConfig,
                 url_col: str = "url", content_col: str = "content",
                 length_col: str | None = "content_length") -> DataFrame:
    """Image blobs → ``url, status, mime, width, height`` (the
    TestImageMetadata contract: dimensions as parse metadata, no
    text)."""
    from ..functions import imagemeta as I

    cols = ["url", "status", "mime", "width", "height"]

    def one(raw: bytes) -> dict:
        mime, w, h = I.image_dims(raw)
        return {"mime": mime, "width": w, "height": h}

    return blobs.mapInPandas(
        _gated(one, cols, url_col, content_col, length_col,
               int_cols=("width", "height")),
        "url string, status string, mime string, width int, height int")


# --- closed-form blob builders (oracle round-trips) --------------------

_ASCII_RE = r"[^\x20-\x7e]"


def make_oo_blobs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per doc i: ``http://oo.test/d{i}.(odt|sxw)`` — even ids ODF,
    odd ids OpenOffice-1.0 namespace — carrying paragraphs
    ``OO doc {i}`` and the document text (ASCII-sanitized so the SQL
    oracle sees the identical string). Docs with ``i%13==0`` declare
    a Content-Length 5 bytes beyond the blob."""
    import pandas as pd

    from ..functions.ooparse import build_odt

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                i = int(i)
                flavor = "odt" if i % 2 == 0 else "sxw"
                blob = build_odt([f"OO doc {i}", text or ""],
                                 title=f"Title {i}", flavor=flavor)
                rows.append({
                    "url": f"http://oo.test/d{i}.{flavor}",
                    "content": blob,
                    "content_length": len(blob) + (5 if i % 13 == 0
                                                   else 0)})
            yield pd.DataFrame(
                rows, columns=["url", "content", "content_length"])

    out = docs.select(F.col(id_col).cast("long").alias(id_col),
                      F.regexp_replace(F.col(text_col), _ASCII_RE, "")
                       .alias(text_col))
    return out.mapInPandas(
        gen, "url string, content binary, content_length long")


def make_rtf_blobs(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per doc i: ``http://rtf.test/d{i}.rtf`` with paragraphs
    ``RTF doc {i}`` and the ASCII-sanitized text; info block title
    ``Title {i}``, subject ``subj{i%7}``. ``i%13==0`` truncated."""
    import pandas as pd

    from ..functions.rtfparse import build_rtf

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                i = int(i)
                blob = build_rtf([f"RTF doc {i}", text or ""],
                                 title=f"Title {i}",
                                 subject=f"subj{i % 7}")
                rows.append({
                    "url": f"http://rtf.test/d{i}.rtf",
                    "content": blob,
                    "content_length": len(blob) + (5 if i % 13 == 0
                                                   else 0)})
            yield pd.DataFrame(
                rows, columns=["url", "content", "content_length"])

    out = docs.select(F.col(id_col).cast("long").alias(id_col),
                      F.regexp_replace(F.col(text_col), _ASCII_RE, "")
                       .alias(text_col))
    return out.mapInPandas(
        gen, "url string, content binary, content_length long")


def make_doc_blobs(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per doc i: ``http://docs.test/d{i}.doc`` — a real compound
    file whose main text range is ``Word doc {i}\\n{text}\\n``
    (ASCII-sanitized). ``i%13==0`` truncated."""
    import pandas as pd

    from ..functions.docparse import build_doc

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                i = int(i)
                blob = build_doc([f"Word doc {i}", text or ""])
                rows.append({
                    "url": f"http://docs.test/d{i}.doc",
                    "content": blob,
                    "content_length": len(blob) + (5 if i % 13 == 0
                                                   else 0)})
            yield pd.DataFrame(
                rows, columns=["url", "content", "content_length"])

    out = docs.select(F.col(id_col).cast("long").alias(id_col),
                      F.regexp_replace(F.col(text_col), _ASCII_RE, "")
                       .alias(text_col))
    return out.mapInPandas(
        gen, "url string, content binary, content_length long")


def make_image_blobs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per doc i: ``http://img.test/d{i}`` — a real image header,
    format by ``i%3`` (GIF / PNG / BMP), dims ``(i%200+1, i%100+1)``;
    ``i%11==0`` gets a corrupted signature (status ``failed``)."""
    import struct
    import zlib

    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = i % 200 + 1, i % 100 + 1
                if i % 3 == 0:
                    blob = (b"GIF89a" + struct.pack("<HH", w, h)
                            + b"\xf7\x00\x00" + b"\x00" * 6 + b"\x3b")
                elif i % 3 == 1:
                    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
                    blob = (b"\x89PNG\r\n\x1a\n"
                            + struct.pack(">I", 13) + b"IHDR" + ihdr
                            + struct.pack(">I",
                                          zlib.crc32(b"IHDR" + ihdr)))
                else:
                    blob = (b"BM" + b"\x00" * 16
                            + struct.pack("<ii", w, h) + b"\x00" * 10)
                if i % 11 == 0:
                    blob = b"\x00\x00" + blob[2:]
                rows.append({"url": f"http://img.test/d{i}",
                             "content": blob,
                             "content_length": len(blob)})
            yield pd.DataFrame(
                rows, columns=["url", "content", "content_length"])

    out = docs.select(F.col(id_col).cast("long").alias(id_col))
    return out.mapInPandas(
        gen, "url string, content binary, content_length long")
