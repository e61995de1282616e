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


def dmoz_to_seeds(blobs: DataFrame, subset_denom: int = 1,
                  hash_skew: int = 0, include_adult: bool = False,
                  topic_pattern: str | None = None,
                  content_col: str = "content") -> DataFrame:
    """DmozParser analog (tools/DmozParser.java): each input row
    carries one DMOZ ``content.rdf.u8``-style RDF blob; ExternalPage
    elements become seed rows gated by the reference's three filters —
    adult section prefix (line 135), topic regex (line 139), and the
    deterministic ``abs(MD5Hash(url).hashCode() ^ skew) % denom == 0``
    subset sample (lines 145-148, Hadoop hash parity in
    :func:`nutch_spark.functions.dmoz.md5_quarter_hash`).

    The reference streams one multi-GB dump through a single SAX
    parser; here parallelism is per-blob (split the dump into element-
    aligned chunks upstream), and the element walk runs Arrow-batched
    on executors. Returns (url, topic, title, description) — feed the
    url column to the injector as a seed list.
    """
    import re as _re
    from collections.abc import Iterator

    import pandas as pd

    from ..functions import dmoz as D

    pat = _re.compile(topic_pattern) if topic_pattern else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[content_col]:
                if blob is None:
                    continue
                text = (bytes(blob).decode("utf-8", "replace")
                        if not isinstance(blob, str) else blob)
                for topic, url, title, desc in D.iter_dmoz_pages(text):
                    if not include_adult and topic.startswith("Top/Adult"):
                        continue
                    if pat is not None and not pat.fullmatch(topic):
                        continue
                    if not D.subset_keep(url, subset_denom, hash_skew):
                        continue
                    rows.append({"url": url, "topic": topic,
                                 "title": title, "description": desc})
            yield pd.DataFrame(rows, columns=[
                "url", "topic", "title", "description"])

    return blobs.mapInPandas(
        run, "url string, topic string, title string, description string")


def make_dmoz_blobs(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    group: int = 32) -> DataFrame:
    """Derive DMOZ RDF blobs from an id+text table — topic / url /
    title / description are closed-form functions of the id (topic =
    Top/Cat{id%7}, except id%11==0 which lands under Top/Adult/X and
    must be gated; url = the standard host{id%40}/p{id}; title =
    T{id}; description = first 5 words of text), so
    :func:`dmoz_to_seeds` output is SQL-predictable. Docs group into
    blobs of ``group`` pages."""
    from collections.abc import Iterator

    import pandas as pd

    from ..functions import dmoz as D

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            groups: dict[int, list] = {}
            for raw, text in zip(pdf[id_col], pdf[text_col]):
                i = int(raw)
                topic = (f"Top/Adult/X" if i % 11 == 0
                         else f"Top/Cat{i % 7}")
                url = f"http://host{i % 40}.test/p{i}"
                desc = " ".join(str(text).split()[:5])
                groups.setdefault(i // group, []).append(
                    (topic, url, f"T{i}", desc))
            rows = [{"content": D.encode_dmoz(
                        sorted(pages)).encode("utf-8")}
                    for pages in groups.values()]
            yield pd.DataFrame(rows, columns=["content"])

    return docs.repartition(8, id_col).mapInPandas(run, "content binary")


def detect_mime(col: "F.Column") -> "F.Column":
    """Magic-byte mime sniffer as a JVM column program (FileDumper
    uses Tika detection — Tika is not in this sandbox, so the sniffer
    covers the magic numbers of the formats the media/codec modules
    handle plus the html/plain split; everything else is
    application/octet-stream)."""
    h = F.hex(F.substring(col, 1, 4))
    return (F.when(h.startswith("89504E47"), "image/png")
             .when(h.startswith("25504446"), "application/pdf")
             .when(h.startswith("47494638"), "image/gif")
             .when(h.startswith("FFD8"), "image/jpeg")
             .when(h.startswith("504B0304"), "application/zip")
             .when(h.startswith("424D"), "image/bmp")
             .when(h.startswith("52494646"), "audio/x-wav")
             .when(h.startswith("3C"), "text/html")
             .when(F.length(col) > 0, "text/plain")
             .otherwise("application/octet-stream"))


def file_dumper(content: DataFrame, mime_types: list[str] | None = None,
                mime_stats: bool = False) -> DataFrame:
    """FileDumper analog (tools/FileDumper.java:134-240): dump segment
    content as files named by DumpFileUtil's md5 scheme, optionally
    filtered to a mime-type list.

    - ``mime_stats=True``: the ``-mimeStats`` mode — (mime_type,
      count) over the (filtered) content, nothing written.
    - otherwise: one row per kept record with the exact reference path
      — dir1 = md5[0]+md5[8], dir2 = md5[16]+md5[24], filename =
      ``{md5}_{basename≤32}.{extension≤5}`` (DumpFileUtil.java:51-85),
      extension defaulting to ``html`` when the url has none
      (FileDumper.java:180-185). Returns (url, mime_type, path,
      n_bytes); the actual byte write is the caller's sink (a
      DataFrame writer partitioned by dir1/dir2 reproduces the layout
      without a driver loop).

    Everything is JVM column work (md5, regexes, hex sniffing) — no
    Python in the path, safe at any scale."""
    df = content.withColumn("mime_type", detect_mime(F.col("html")))
    if mime_types is not None:
        df = df.where(F.col("mime_type").isin(*mime_types))
    if mime_stats:
        return df.groupBy("mime_type").agg(F.count("*").alias("count"))
    leaf = F.element_at(F.split(F.col("url"), "/"), -1)
    base = F.regexp_replace(leaf, r"\.[^.]*$", "")
    ext0 = F.regexp_extract(leaf, r"\.([^.]*)$", 1)
    ext = F.when(ext0 == "", "html").otherwise(ext0)
    md5 = F.md5(F.col("url").cast("binary"))
    fname = F.concat(md5, F.lit("_"), F.substring(base, 1, 32),
                     F.lit("."), F.substring(ext, 1, 5))
    path = F.concat(
        F.substring(md5, 1, 1), F.substring(md5, 9, 1), F.lit("/"),
        F.substring(md5, 17, 1), F.substring(md5, 25, 1), F.lit("/"),
        fname)
    return df.select("url", "mime_type", path.alias("path"),
                     F.length("html").cast("long").alias("n_bytes"))
