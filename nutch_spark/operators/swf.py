"""parse-swf plugin analog, operator half: SWF blobs → parse rows.

Reference: ``src/plugin/parse-swf`` (SWFParser.java — codec semantics
in :mod:`nutch_spark.functions.swfparse`, golden-verified against the
reference's three sample movies). The plugin's contract
(SWFParser.java:63-125): a Content-Length mismatch fails the document
as truncated before any tag is read (:72-78, "Parser can't handle
incomplete files"); a successful parse yields the extracted text with
an empty title, the getURL action urls as outlinks (empty anchors)
followed by the free-text URL sweep of the text
(OutlinkExtractor.getOutlinks, :97-105); a codec error fails the
document (:106-112).

Spark shape: the tag walk is the only Python (Arrow-batched
``mapInPandas`` over blobs, one output row per movie — no explode, a
10^8-blob corpus stays a narrow map); movies are independent rows, so
the operator adds no shuffle of its own and parallelism is the
input's partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import CrawlConfig

_OUT_SCHEMA = ("url string, status string, title string, text string, "
               "outlinks array<struct<to_url:string, anchor:string>>")


def parse_swfs(blobs: DataFrame, cfg: CrawlConfig,
               url_col: str = "url", content_col: str = "content",
               length_col: str | None = "content_length") -> DataFrame:
    """SWF blobs (one movie per row) → one parse row per movie:
    ``url, status, title, text, outlinks``.

    ``length_col`` (optional) is the protocol Content-Length; rows
    whose blob length differs fail as ``failed_truncated`` with no
    tag read (SWFParser.java:72-78 — the reference compares ``!=``,
    not ``<``). ``title`` is always ``''`` (SWFParser.java:118)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..functions import swfparse as S

    has_len = length_col is not None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "status", "title", "text", "outlinks"]
        for pdf in batches:
            lens = pdf[length_col] if has_len else [None] * len(pdf)
            rows = []
            for url, blob, dlen in zip(pdf[url_col], pdf[content_col],
                                       lens):
                raw = bytes(blob or b"")
                if (dlen is not None and not pd.isna(dlen)
                        and len(raw) != int(dlen)):
                    rows.append({"url": url, "status": "failed_truncated",
                                 "title": "", "text": "", "outlinks": []})
                    continue
                try:
                    r = S.swf_extract(raw)
                except Exception:
                    rows.append({"url": url, "status": "failed",
                                 "title": "", "text": "", "outlinks": []})
                    continue
                rows.append({
                    "url": url, "status": "success", "title": "",
                    "text": r["text"],
                    "outlinks": [{"to_url": u, "anchor": ""}
                                 for u in r["urls"]]})
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(run, _OUT_SCHEMA)


def make_swf_blobs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive REAL SWF movies from an id table, closed-form so the
    parse output is SQL-predictable (the ``make_zip_blobs`` /
    ``make_feed_blobs`` pattern).

    Per doc i, movie ``http://swf.test/m{i}.swf`` carries two
    DefineEditText fields (``Doc {i} see http://t.test/d{i}`` and
    ``body {i%3}``), a DoAction whose ConstantPool holds two never-
    consumed strings (``kw{i%5}``, ``tag{i%7}`` — they survive as
    sorted free text behind the ``--------`` divider) and literal
    GetURL actions for ``http://l.test/{i}`` (plus
    ``mailto:x@y.test`` when ``i%11==0``); the free-text URL sweep
    then re-finds ``http://t.test/d{i}`` in the edit text. Even ids
    build compressed (CWS) movies, odd ids uncompressed (FWS).
    Movies with ``i%13==0`` declare a Content-Length 7 bytes beyond
    the actual blob, pinning the FAILED_TRUNCATED gate."""
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.swfparse import build_swf

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf[id_col]:
                i = int(i)
                urls = [f"http://l.test/{i}"]
                if i % 11 == 0:
                    urls.append("mailto:x@y.test")
                blob = build_swf(
                    edit_texts=[f"Doc {i} see http://t.test/d{i}",
                                f"body {i % 3}"],
                    pool_strings=[f"kw{i % 5}", f"tag{i % 7}"],
                    get_urls=urls,
                    compressed=(i % 2 == 0))
                rows.append({
                    "url": f"http://swf.test/m{i}.swf",
                    "content": blob,
                    "content_length": len(blob) + (7 if i % 13 == 0
                                                   else 0)})
            yield pd.DataFrame(
                rows, columns=["url", "content", "content_length"])

    out = docs.select(F.col(id_col).cast("long").alias(id_col))
    return out.mapInPandas(
        gen, "url string, content binary, content_length long")
