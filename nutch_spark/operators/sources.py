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
