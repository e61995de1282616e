"""Sources & sinks beyond parquet/Iceberg round-tripping.

Reference mappings (SURVEY.md §2.1):
- seed text source (Injector.java:95-141) → ``read_seeds``;
- CommonCrawlDataDumper (tools/CommonCrawlDataDumper.java) →
  ``dump_commoncrawl`` (segments → CC-format JSON lines);
- ArcSegmentCreator (tools/arc/ArcSegmentCreator.java) →
  ``pages_to_segment`` (a CC-style pages table IS the native archive
  substitute — this shapes it into fetch-ready ``content`` rows);
- readers for the pages table with explicit schema enforcement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schema as S


def read_seeds(spark: SparkSession, path: str) -> DataFrame:
    """Seed text file: one URL per line, ``#`` comments, optional
    tab-separated metadata (Injector.java:95-141). Returns the
    ``line`` column the injector consumes."""
    return spark.read.text(path).withColumnRenamed("value", "line")


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """CC-style pages table with the authoritative input schema
    (BASELINE.json input_hint); column pruning means frontier-only
    stages never touch the html bytes."""
    df = spark.read.parquet(path)
    missing = {f.name for f in S.PAGES.fields} - set(df.columns)
    if missing:
        raise ValueError(f"pages table missing columns: {missing}")
    return df.select(*[f.name for f in S.PAGES.fields])


def pages_to_segment(pages: DataFrame, now_ms: int,
                     score: float = 1.0,
                     fetch_interval: int = 2592000) -> DataFrame:
    """ArcSegmentCreator analog: archive pages → fetch-ready
    ``content`` rows (url, html, text, lang, fetch_time, score,
    fetch_interval, metadata) so parse/updatedb can ingest an archive
    without a fetch round."""
    return pages.select(
        "url", "html", "text", "lang",
        F.coalesce((F.unix_timestamp("warc_ts") * 1000).cast("long"),
                   F.lit(now_ms)).alias("fetch_time"),
        F.lit(score).alias("score"),
        F.lit(fetch_interval).cast("int").alias("fetch_interval"),
        F.lit(None).cast("map<string,string>").alias("metadata"))


def dump_commoncrawl(parse_text: DataFrame, parse_data: DataFrame,
                     crawl_fetch: DataFrame, path: str) -> None:
    """CommonCrawlDataDumper analog: merged segment view → JSON lines
    with CC-ish envelope fields."""
    doc = (crawl_fetch.select("url",
                              F.col("status").alias("fetch_status"),
                              F.col("fetch_time"))
           .join(parse_data.select("url", "title", "signature"), "url",
                 "left")
           .join(parse_text, "url", "left")
           .select(
               "url",
               F.struct(
                   F.col("fetch_status"), F.col("fetch_time"),
                   F.col("signature").alias("digest")).alias("envelope"),
               "title", "text"))
    doc.write.mode("overwrite").json(path)


def dump_crawldb(crawldb: DataFrame, path: str, fmt: str = "json",
                 **filters) -> None:
    """readdb -dump sink (CrawlDbReader.java): csv/json/parquet."""
    from .readers import crawldb_dump
    df = crawldb_dump(crawldb, **filters)
    if fmt == "csv":
        df.drop("metadata").write.mode("overwrite") \
            .option("header", True).csv(path)
    elif fmt == "json":
        df.write.mode("overwrite").json(path)
    else:
        df.write.mode("overwrite").parquet(path)


# --------------------------------------------------------------- WARC

WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, http_status int, html binary")


def warc_to_pages(blobs: DataFrame,
                  content_col: str = "content") -> DataFrame:
    """REAL WARC ingestion (the Common-Crawl container): each input
    row carries one ``.warc`` / ``.warc.gz`` blob (e.g. from
    ``spark.read.format("binaryFile")``); response records become
    pages rows (url, warc_ts from WARC-Date, http status, body
    bytes). Record parsing is Content-Length-driven
    (:mod:`nutch_spark.functions.warc`), pure stdlib, Arrow-batched —
    bytes never transit the driver. Parallelism is per-blob: CC
    publishes ~1 GB warc.gz files, so a 100 TB crawl is ~10^5 blobs
    spread across executors; text/lang derive downstream in parse.

    Reference analog: ArcSegmentCreator.java (ARC → segments).
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..functions import warc as W

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[content_col]:
                b = bytes(blob) if blob is not None else b""
                for rec in W.iter_warc_records(b):
                    if rec.get("warc-type") != "response":
                        continue
                    status, body = W.http_payload(rec)
                    rows.append({
                        "url": rec.get("warc-target-uri"),
                        "warc_ts": pd.Timestamp(rec.get("warc-date")),
                        "http_status": status,
                        "html": body,
                    })
            yield pd.DataFrame(rows, columns=[
                "url", "warc_ts", "http_status", "html"])

    return blobs.mapInPandas(run, WARC_PAGES_SCHEMA)


def pages_to_warc(pages: DataFrame, n_blobs: int = 64,
                  gzip_members: bool = True) -> DataFrame:
    """Inverse sink: pages rows → ``n_blobs`` WARC blobs (one row per
    blob, per-record gzip members — the CC ``.warc.gz`` layout). Blob
    assignment is a deterministic hash of url so re-runs produce
    identical archives (size n_blobs to ~1 GB of pages each, CC's own
    file granularity); ``applyInPandas`` per blob keeps each
    archive's bytes on one worker."""
    from ..functions import warc as W

    def build(key, pdf):
        import pandas as pd
        recs = [(u, (pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
                     if ts is not None else "1970-01-01T00:00:00Z"),
                 bytes(h) if h is not None else b"")
                for u, ts, h in zip(pdf["url"], pdf["warc_ts"],
                                    pdf["html"])]
        recs.sort(key=lambda r: r[0])
        return pd.DataFrame(
            [{"blob_id": int(key[0]),
              "n_records": len(recs),
              "content": W.encode_warc(recs, gzip_members)}])

    blob = (F.abs(F.xxhash64("url")) % F.lit(n_blobs)).alias("blob_id")
    return (pages.select(blob, "url", "warc_ts", "html")
            .groupBy("blob_id")
            .applyInPandas(build, "blob_id long, n_records long, "
                                  "content binary"))


def make_warc_blobs(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    group: int = 16) -> DataFrame:
    """Derive REAL WARC blobs from an id+text table — every record's
    url / WARC-Date / status / body is a closed-form function of the
    id (url = the standard host{id%40}/p{id}; date = 2024-01-01 +
    id%86400 s; status 404 when id%13==0 else 200; body = UTF-8
    text), so :func:`warc_to_pages` output is SQL-predictable. Docs
    group into blobs of ``group`` records, alternating plain /
    gzip-member encoding — both decode paths exercised."""
    from collections.abc import Iterator
    from datetime import datetime, timedelta

    import pandas as pd

    from ..functions import warc as W

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = datetime(2024, 1, 1)
        for pdf in batches:
            groups: dict[int, list] = {}
            for raw, text in zip(pdf[id_col], pdf[text_col]):
                i = int(raw)
                url = f"http://host{i % 40}.test/p{i}"
                date = (base + timedelta(seconds=i % 86400)) \
                    .strftime("%Y-%m-%dT%H:%M:%SZ")
                status = 404 if i % 13 == 0 else 200
                groups.setdefault(i // group, []).append(
                    (url, date, (text or "").encode("utf-8"), status))
            rows = [{"blob_id": g,
                     "content": W.encode_warc(recs,
                                              gzip_members=g % 2 == 0)}
                    for g, recs in groups.items()]
            yield pd.DataFrame(rows, columns=["blob_id", "content"])

    return docs.select(id_col, text_col).mapInPandas(
        run, "blob_id long, content binary")
