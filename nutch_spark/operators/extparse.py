"""parse-ext plugin analog: external-command parsing of blobs.

Reference: ``src/plugin/parse-ext`` (ExtParser.java:60-150): a
per-content-type registry of ``(command, timeout, encoding)``; the
document bytes are piped to the command's stdin with the content type
appended as a final argument, stdout decoded with the configured
encoding becomes the parse text; a non-zero exit fails the document;
the Content-Length truncation gate (``!=``, :94-101) runs first;
title is always ``''`` and outlinks are the free-text URL sweep of
the text (OutlinkExtractor, :135-138).

Spark shape: mapInPandas over Arrow batches; the exec is per document
— exactly the reference's per-Content CommandRunner contract — so
this is deliberately the slow path, for the rare formats where only
an external tool exists. Rows are independent: no shuffle, and the
subprocess cost parallelizes with the input partitioning (at 100 TB
you'd cap the per-executor fan-out with the usual
``spark.task.cpus`` sizing rather than anything in this operator).
"""

from __future__ import annotations

import subprocess

from pyspark.sql import DataFrame

from ..config import CrawlConfig

_OUT_SCHEMA = ("url string, status string, title string, text string, "
               "outlinks array<struct<to_url:string, anchor:string>>")


def parse_ext(blobs: DataFrame, cfg: CrawlConfig,
              commands: dict[str, tuple[list[str], int, str]],
              url_col: str = "url", content_col: str = "content",
              mime_col: str = "mime_type",
              length_col: str | None = "content_length") -> DataFrame:
    """Blobs → one parse row per document via the external command
    registered for its content type.

    ``commands`` maps content-type → ``(argv, timeout_s, encoding)``;
    like the reference's ``command + " " + contentType``
    (ExtParser.java:108-112), the content type is appended as the
    final argv element (use an ``sh -c 'script' --`` argv if the tool
    must not see it). Unregistered types fail with
    ``failed_no_command`` (:74-77); a declared-length mismatch fails
    as ``failed_truncated`` before the exec (:94-101); non-zero exit
    or timeout fails as ``failed`` (:118-121)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.swfparse import extract_free_text_urls

    has_len = length_col is not None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "status", "title", "text", "outlinks"]
        for pdf in batches:
            lens = pdf[length_col] if has_len else [None] * len(pdf)
            rows = []
            for url, blob, mime, dlen in zip(
                    pdf[url_col], pdf[content_col], pdf[mime_col], lens):
                params = commands.get(mime or "")
                if params is None:
                    rows.append({"url": url, "status": "failed_no_command",
                                 "title": "", "text": "", "outlinks": []})
                    continue
                argv, timeout_s, encoding = params
                raw = bytes(blob or b"")
                if (dlen is not None and not pd.isna(dlen)
                        and len(raw) != int(dlen)):
                    rows.append({"url": url, "status": "failed_truncated",
                                 "title": "", "text": "", "outlinks": []})
                    continue
                try:
                    proc = subprocess.run(
                        list(argv) + [mime], input=raw,
                        capture_output=True, timeout=timeout_s)
                except (subprocess.TimeoutExpired, OSError):
                    rows.append({"url": url, "status": "failed",
                                 "title": "", "text": "", "outlinks": []})
                    continue
                if proc.returncode != 0:
                    rows.append({"url": url, "status": "failed",
                                 "title": "", "text": "", "outlinks": []})
                    continue
                text = proc.stdout.decode(encoding, errors="replace")
                rows.append({
                    "url": url, "status": "success", "title": "",
                    "text": text,
                    "outlinks": [{"to_url": u, "anchor": ""}
                                 for u in extract_free_text_urls(text)]})
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(run, _OUT_SCHEMA)
