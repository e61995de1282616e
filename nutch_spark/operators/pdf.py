"""parse-tika PDF-path analog, operator half: PDF blobs → parse rows.

Reference: ``src/plugin/parse-tika`` routes application/pdf through
Tika/PDFBox (TikaParser.java:71-120); the codec subset those vectors
need is :mod:`nutch_spark.functions.pdfparse` (FlateDecode, Standard
RC4 security handler, BT/ET text ops — golden-verified against
``parse-tika/sample/pdftest.pdf`` AND ``encrypted.pdf``,
TestPdfParser.java:47-70). The Content-Length truncation gate runs
first (ParseSegment.java:160-193 applies it to every parser family);
PDF text yields no anchor nodes in the reference's SAX-to-DOM tree,
so outlinks are empty and the title is '' (the /Info title is not a
NutchDocument field on the PDF path).

Spark shape: Arrow-batched ``mapInPandas`` over independent blob
rows, one output row per document, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import CrawlConfig

_OUT_SCHEMA = "url string, status string, title string, text string"


def parse_pdfs(blobs: DataFrame, cfg: CrawlConfig,
               url_col: str = "url", content_col: str = "content",
               length_col: str | None = "content_length") -> DataFrame:
    """PDF blobs → one parse row per document:
    ``url, status, title, text``."""
    from collections.abc import Iterator

    import pandas as pd

    from ..functions import pdfparse as P

    has_len = length_col is not None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "status", "title", "text"]
        for pdf_ in batches:
            lens = pdf_[length_col] if has_len else [None] * len(pdf_)
            rows = []
            for url, blob, dlen in zip(pdf_[url_col],
                                       pdf_[content_col], lens):
                raw = bytes(blob or b"")
                if (dlen is not None and not pd.isna(dlen)
                        and len(raw) != int(dlen)):
                    rows.append({"url": url, "status": "failed_truncated",
                                 "title": "", "text": ""})
                    continue
                try:
                    r = P.pdf_extract(raw)
                except Exception:
                    rows.append({"url": url, "status": "failed",
                                 "title": "", "text": ""})
                    continue
                rows.append({"url": url, "status": "success",
                             "title": "", "text": r["text"]})
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(run, _OUT_SCHEMA)


def make_pdf_blobs(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Derive REAL PDFs from an id+text table, closed-form so the
    parse output is SQL-predictable (the ``make_swf_blobs`` pattern).

    Per doc i, ``http://pdfs.test/d{i}.pdf`` carries two text lines:
    ``Doc {i} alpha`` and the document text (ASCII corpus; the
    builder escapes parens/backslashes, the extractor unescapes — the
    round-trip is identity). Even ids use FlateDecode content
    streams, odd ids uncompressed. Docs with ``i%13==0`` declare a
    Content-Length 7 bytes beyond the blob (FAILED_TRUNCATED gate)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.pdfparse import build_pdf

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for i, text in zip(pdf_[id_col], pdf_[text_col]):
                i = int(i)
                blob = build_pdf([f"Doc {i} alpha", text or ""],
                                 compress=(i % 2 == 0))
                rows.append({
                    "url": f"http://pdfs.test/d{i}.pdf",
                    "content": blob,
                    "content_length": len(blob) + (7 if i % 13 == 0
                                                   else 0)})
            yield pd.DataFrame(
                rows, columns=["url", "content", "content_length"])

    out = docs.select(F.col(id_col).cast("long").alias(id_col),
                      F.col(text_col))
    return out.mapInPandas(
        gen, "url string, content binary, content_length long")
