"""Reader / reporting operators — the crawl's query surface.

Reference: CrawlDbReader.java (-stats -dump -topN -url),
LinkDbReader.java, SegmentReader.java, DomainStatistics.java,
IndexerMapReduce.java (the indexable-document join).

All pure DataFrame ops; stats reproduce the reference's exact
score-quantization so printed numbers are comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import CrawlConfig
from ..functions.urls import spark_udfs
from ..schema import (
    DB_DUPLICATE, DB_FETCHED, DB_GONE, DB_NOTMODIFIED, DB_REDIR_PERM,
    DB_REDIR_TEMP, FETCH_GONE, FETCH_NOTMODIFIED, FETCH_REDIR_PERM,
    FETCH_REDIR_TEMP,
)


def crawldb_stats(crawldb: DataFrame) -> DataFrame:
    """readdb -stats (CrawlDbReader.java:177-303): per-status counts +
    retry histogram + score min/max/avg. The reference quantizes scores
    by ×1000 long truncation in the combiner (lines 417-456); we
    reproduce that quantization for printed-stat parity."""
    q = (F.col("score") * 1000).cast("long")
    return (crawldb
            .groupBy("status")
            .agg(F.count("*").alias("n"),
                 (F.min(q) / 1000.0).alias("score_min"),
                 (F.max(q) / 1000.0).alias("score_max"),
                 (F.sum(q) / 1000.0 / F.count("*")).alias("score_avg"),
                 F.max("retries").alias("max_retries")))


def retry_histogram(crawldb: DataFrame) -> DataFrame:
    return crawldb.groupBy("retries").agg(F.count("*").alias("n"))


def crawldb_top_n(crawldb: DataFrame, n: int,
                  min_score: float | None = None) -> DataFrame:
    """readdb -topN (CrawlDbReader.java:305-353)."""
    df = crawldb
    if min_score is not None:
        df = df.where(F.col("score") >= min_score)
    return (df.orderBy(F.desc("score"), F.asc("url")).limit(n)
            .select("url", "score"))


def crawldb_get(crawldb: DataFrame, url: str) -> DataFrame:
    """readdb -url point lookup (CrawlDbReader.java:458-476); with a
    url-hash-bucketed table this is a single-bucket pruned scan."""
    return crawldb.where(F.col("url") == url)


def crawldb_dump(crawldb: DataFrame, regex: str | None = None,
                 status: str | None = None,
                 retry_min: int | None = None,
                 expr: str | None = None) -> DataFrame:
    """readdb -dump with filters (CrawlDbReader.java; JEXL expressions
    become Spark SQL expr strings — CrawlDatum.java:528-589)."""
    df = crawldb
    if regex:
        df = df.where(F.col("url").rlike(regex))
    if status:
        df = df.where(F.col("status") == status)
    if retry_min is not None:
        df = df.where(F.col("retries") >= retry_min)
    if expr:
        df = df.where(F.expr(expr))
    return df


def domain_statistics(crawldb: DataFrame, mode: str = "host") -> DataFrame:
    """DomainStatistics.java: counts per host / registered domain /
    suffix. Fetched-state filter matches the reference (MODE counts
    fetched rows: status db_fetched or db_notmodified)."""
    udfs = spark_udfs()
    key = udfs[mode if mode in ("host", "suffix") else "domain"](
        F.col("url"))
    return (crawldb
            .withColumn("_key", key)
            .where(F.col("_key").isNotNull())
            .groupBy(F.col("_key").alias(mode))
            .agg(F.count("*").alias("n"),
                 F.sum(F.when(F.col("status").isin(
                     DB_FETCHED, DB_NOTMODIFIED), 1).otherwise(0))
                 .alias("fetched")))


def linkdb_lookup(linkdb: DataFrame, url: str) -> DataFrame:
    """readlinkdb -url (LinkDbReader.java)."""
    return linkdb.where(F.col("url") == url)


def segment_reader(url: str, **tables: DataFrame) -> DataFrame:
    """SegmentReader -get: merged view of all segment sub-tables for
    one url (SegmentReader.java)."""
    out = None
    for name, df in tables.items():
        if df is None:
            continue
        row = df.where(F.col("url") == url)
        row = row.select("url", *[
            F.col(c).alias(f"{name}_{c}") for c in row.columns
            if c != "url"])
        out = row if out is None else out.join(row, "url", "full_outer")
    return out


def indexer_deletes(crawldb: DataFrame, parse_data: DataFrame | None,
                    crawl_fetch: DataFrame | None,
                    cfg: CrawlConfig) -> DataFrame:
    """Delete actions the indexer sink must issue
    (IndexerMapReduce.java:195-268, ``indexer.delete`` /
    ``indexer.delete.robots.noindex``): returns (url, reason) with
    the reducer's precedence —

    1. ``robots_noindex``: parseData's robots meta contains
       ``noindex`` (checked first, fires even without fetch/db rows;
       NUTCH-1434). ``parse_data`` may carry the meta as a
       ``meta_robots`` string column; absent column ⇒ rule inert.
    2. ``gone``: fetch AND db rows present, either status gone.
    3. ``redirect``: fetch AND db rows present, either status a
       temp/perm redirect.
    4. ``duplicate``: db status db_duplicate (the reference requires
       all four segment parts present; here db+fetch+parseData — the
       parseText requirement adds nothing to the delete decision).

    One row per url, first matching reason wins (the reference's
    early-return)."""
    db = crawldb.select("url", F.col("status").alias("db_status"))
    # a notmodified fetch row never becomes the fetchDatum — dropped
    # BEFORE the delete checks (IndexerMapReduce.java:198-201), so a
    # url whose only fetch row is notmodified has no fetch side here
    # and cannot trigger the gone/redirect both-present rules
    cf = (crawl_fetch
          .where(F.col("status") != FETCH_NOTMODIFIED)
          .select("url", F.col("status").alias("fetch_status"))
          if crawl_fetch is not None else None)
    if parse_data is not None and "meta_robots" in parse_data.columns:
        pd_ = parse_data.select(
            "url", F.lower(F.coalesce(F.col("meta_robots"), F.lit("")))
            .alias("_robots"), F.lit(True).alias("_has_pd"))
    elif parse_data is not None:
        pd_ = parse_data.select("url", F.lit("").alias("_robots"),
                                F.lit(True).alias("_has_pd"))
    else:
        pd_ = None

    df = db
    if cf is not None:
        df = df.join(cf, "url", "full_outer")
    else:
        df = df.withColumn("fetch_status", F.lit(None).cast("string"))
    if pd_ is not None:
        df = df.join(pd_, "url", "full_outer")
    else:
        df = (df.withColumn("_robots", F.lit(""))
                .withColumn("_has_pd", F.lit(False)))

    both = (F.col("fetch_status").isNotNull()
            & F.col("db_status").isNotNull())
    robots_del = (F.lit(cfg.indexer_delete_robots_noindex)
                  & F.col("_has_pd").isNotNull() & F.col("_has_pd")
                  & F.col("_robots").contains("noindex"))
    gone_del = (F.lit(cfg.indexer_delete) & both
                & ((F.col("fetch_status") == FETCH_GONE)
                   | (F.col("db_status") == DB_GONE)))
    redir_del = (F.lit(cfg.indexer_delete) & both
                 & (F.col("fetch_status").isin(FETCH_REDIR_PERM,
                                               FETCH_REDIR_TEMP)
                    | F.col("db_status").isin(DB_REDIR_PERM,
                                              DB_REDIR_TEMP)))
    dup_del = (F.lit(cfg.indexer_delete) & both
               & F.coalesce(F.col("_has_pd"), F.lit(False))
               & (F.col("db_status") == DB_DUPLICATE))
    reason = (F.when(robots_del, "robots_noindex")
               .when(gone_del, "gone")
               .when(redir_del, "redirect")
               .when(dup_del, "duplicate"))
    return (df.withColumn("reason", reason)
              .where(F.col("reason").isNotNull())
              .select("url", "reason"))


def indexer_docs(crawldb: DataFrame, linkdb: DataFrame | None,
                 parse_text: DataFrame, parse_data: DataFrame,
                 crawl_fetch: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """IndexerMapReduce.java:165-319 — co-group crawldb ∪ linkdb ∪
    segment tables by url; a document requires dbDatum + fetchDatum +
    parseData + parseText; gone/redirect/duplicate rows are deleted
    (skipped); boost = score^0.5 (OPIC indexer boost,
    OPICScoringFilter.java:168-172); fields follow index-basic.

    Spark: multi-way join on url + filters → the indexable-document
    DataFrame (the engine's equivalent of the Solr/ES sink).
    """
    db = crawldb.select("url", F.col("status").alias("db_status"),
                        "score", "signature")
    # "don't index unmodified (empty) pages" — a notmodified fetch row
    # never becomes the fetchDatum (IndexerMapReduce.java:198-201)
    cf_cols = ["url", F.col("status").alias("fetch_status"),
               F.col("fetch_time").alias("fetched_at")]
    # response headers ride along for the indexing-filter plugins
    # (index-more reads Content-Type/Length/Last-Modified from the
    # fetch datum's metadata — MoreIndexingFilter.java:186-196)
    has_meta = "metadata" in crawl_fetch.columns
    if has_meta:
        cf_cols.append("metadata")
    cf = (crawl_fetch
          .where(F.col("status") != FETCH_NOTMODIFIED)
          .select(*cf_cols))
    pt = parse_text.select("url", "text")
    pd_ = parse_data.select("url", "title")
    doc = (db.join(cf, "url")
             .join(pd_, "url")
             .join(pt, "url")
             .where(~F.col("db_status").isin(
                 DB_GONE, DB_REDIR_PERM, DB_REDIR_TEMP, DB_DUPLICATE)))
    # indexer.skip.notmodified (IndexerMapReduce.java:266-269)
    if cfg.indexer_skip_notmodified:
        doc = doc.where(F.col("db_status") != DB_NOTMODIFIED)
    if linkdb is not None:
        anchors = linkdb.select(
            "url",
            F.transform("inlinks", lambda i: i["anchor"]).alias("anchors"))
        doc = doc.join(anchors, "url", "left")
    else:
        doc = doc.withColumn("anchors",
                             F.lit(None).cast("array<string>"))
    udfs = spark_udfs()
    return doc.select(
        "url",
        udfs["host"](F.col("url")).alias("host"),
        "title", "text", "anchors",
        *(["metadata"] if has_meta else []),
        F.col("signature").alias("digest"),
        # OPIC boost = score^0.5 (OPICScoringFilter.java:168-172);
        # scoring-link boost = normalize × score
        # (LinkAnalysisScoringFilter.indexerScore)
        (F.lit(cfg.link_analyze_normalize_score) * F.col("score")
         if cfg.scoring_filter == "link"
         else F.pow(F.greatest(F.col("score"), F.lit(0.0)), 0.5))
        .alias("boost"),
        "fetched_at")


def cleaning_job(crawldb: DataFrame) -> DataFrame:
    """CleaningJob (CleaningJob.java:66-88): scan the crawldb for
    entries with status db_gone (404) or db_duplicate and emit one
    delete request per url for the index sink.

    The reference's single-reducer delete stream exists only to batch
    requests toward one Solr endpoint; the scan itself is
    embarrassingly parallel, so here it stays a distributed filter —
    a 100 TB crawldb prunes to the two status values at the scan
    (predicate pushdown) and no collect happens engine-side.

    Returns (url, reason) with reason ∈ {gone, duplicate}."""
    return (crawldb
            .where(F.col("status").isin(DB_GONE, DB_DUPLICATE))
            .select("url",
                    F.when(F.col("status") == DB_GONE, "gone")
                     .otherwise("duplicate").alias("reason")))
