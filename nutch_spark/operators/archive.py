"""parse-zip plugin analog, operator half: ZIP blobs → parse rows.

Reference: ``src/plugin/parse-zip`` (ZipParser.java /
ZipTextExtractor.java — semantics in
:mod:`nutch_spark.functions.ziparse`). The reference hands the
accumulated outlinks to ParseOutputFormat unfiltered; this operator
does the same — outlink normalize/filter stays downstream where the
HTML parse's outlinks get it.

Spark shape: the container walk is the only Python (Arrow-batched
``mapInPandas`` over blobs, one output row per archive — no explode,
so a 10^8-blob corpus stays a narrow map); everything after is column
ops. Archives are independent rows, so the operator adds no shuffle of
its own and parallelism is the input's partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import CrawlConfig

_OUT_SCHEMA = ("url string, status string, title string, text string, "
               "outlinks array<struct<to_url:string, anchor:string>>")


def parse_zips(blobs: DataFrame, cfg: CrawlConfig,
               url_col: str = "url", content_col: str = "content",
               length_col: str | None = "content_length") -> DataFrame:
    """ZIP blobs (one archive per row) → one parse row per archive:
    ``url, status, title, text, outlinks``.

    ``length_col`` (optional) is the protocol Content-Length; rows
    whose blob is shorter fail as ``failed_truncated`` with no entry
    read (ZipParser.java:66-72). ``title`` is always ``''``
    (ZipParser.java:90-92)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..functions import ziparse as Z

    has_len = length_col is not None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "status", "title", "text", "outlinks"]
        for pdf in batches:
            lens = pdf[length_col] if has_len else [None] * len(pdf)
            rows = []
            for url, blob, dlen in zip(pdf[url_col], pdf[content_col],
                                       lens):
                r = Z.parse_zip(
                    bytes(blob or b""), url or "",
                    None if dlen is None or pd.isna(dlen) else int(dlen))
                rows.append({
                    "url": url, "status": r.status, "title": r.title,
                    "text": r.text,
                    "outlinks": [{"to_url": t, "anchor": a}
                                 for t, a in r.outlinks]})
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(run, _OUT_SCHEMA)


def make_zip_blobs(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", group: int = 8) -> DataFrame:
    """Derive REAL ZIP archives from an id+text table, closed-form so
    the parse output is SQL-predictable (the ``make_feed_blobs`` /
    ``make_warc_blobs`` pattern).

    Docs group into archives of ``group`` entries keyed ``g = id //
    group``, url ``http://zips.test/z{g}.zip``. Per doc i, in id
    order: entry ``p{i}.txt`` holding the doc text and entry
    ``p{i}.html`` holding ``<a href="http://l.test/{i}">w{i}</a>``
    (sub-parse text ``w{i}``, one outlink). Each archive also carries
    a ``notes`` entry (no extension → skipped, the lastIndexOf('.')
    gate), a ``data.bin`` entry (no parser → skipped), and a ``sub/``
    directory entry (isDirectory skip). Archives with ``g % 13 == 0``
    are truncated 7 bytes short of their declared ``content_length``,
    pinning the FAILED_TRUNCATED gate.
    """
    def build(key, pdf):
        import pandas as pd

        from ..functions import ziparse as Z

        g = int(key[0])
        items = sorted(zip(pdf[id_col], pdf[text_col]),
                       key=lambda r: int(r[0]))
        entries: list[tuple[str, bytes]] = [("sub/", b"")]
        for raw, text in items:
            i = int(raw)
            entries.append((f"p{i}.txt", (text or "").encode("utf-8")))
            entries.append(
                (f"p{i}.html",
                 f'<a href="http://l.test/{i}">w{i}</a>'.encode()))
        entries.append(("notes", b"no extension, never parsed"))
        entries.append(("data.bin", b"\x00\x01\x02"))
        blob = Z.encode_zip(entries)
        full = len(blob)
        if g % 13 == 0:
            blob = blob[:-7]
        return pd.DataFrame([{"url": f"http://zips.test/z{g}.zip",
                              "content": blob,
                              "content_length": full}])

    gcol = (F.col(id_col).cast("long") / group).cast("long").alias("_g")
    return (docs.select(gcol, id_col, text_col)
            .groupBy("_g")
            .applyInPandas(
                build,
                "url string, content binary, content_length long"))
