"""CrawlDbMerger / SegmentMerger — latest-record-wins unions.

Reference: CrawlDbMerger.java:62-112 — merge N crawldbs keeping, per
url, the record with the latest ``calculateLastFetchTime()`` =
``fetchTime − fetchInterval·1000`` (AbstractFetchSchedule.java:156-158);
metadata maps are unioned with the newer record's entries winning.
SegmentMerger.java — union segment sub-tables keeping the latest
version per url (by segment/fetch time), with status precedence for
crawl_fetch rows.

Spark shape: ``unionByName`` + one window per url ordered by the merge
key desc — a single shuffle; the metadata union is a map_concat fold in
merge order.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from ..schema import (
    FETCH_SUCCESS, FETCH_NOTMODIFIED, FETCH_REDIR_PERM, FETCH_REDIR_TEMP,
    FETCH_RETRY, FETCH_GONE,
)


def last_fetch_time_col() -> F.Column:
    """calculateLastFetchTime (AbstractFetchSchedule.java:156-158):
    fetch_time (next-due, ms) − fetch_interval (s) × 1000."""
    return (F.col("fetch_time")
            - F.col("fetch_interval").cast("long") * 1000)


def merge_crawldbs(dbs: list[DataFrame]) -> DataFrame:
    """CrawlDbMerger: latest last-fetch-time wins per url; metadata
    union with newer precedence (CrawlDbMerger.java:75-111)."""
    assert dbs
    tagged = [db.withColumn("_src", F.lit(i)) for i, db in enumerate(dbs)]
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    u = u.withColumn("_lft", last_fetch_time_col())
    w = Window.partitionBy("url").orderBy(F.desc("_lft"), F.desc("_src"))
    empty_map = F.create_map().cast("map<string,string>")
    # newest-first rank; metadata unioned per key with newest winning
    ranked = u.withColumn("_rn", F.row_number().over(w))
    winner = ranked.where(F.col("_rn") == 1).drop("_rn", "_lft", "_src")
    entries = (u.select(
        "url", "_lft", "_src",
        F.explode(F.coalesce("metadata", empty_map)).alias("k", "v")))
    meta = (entries
            .groupBy("url", "k")
            .agg(F.max_by("v", F.struct("_lft", "_src")).alias("v"))
            .groupBy("url")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("k", "v"))).alias("_meta")))
    return (winner.join(meta, "url", "left")
            .withColumn("metadata", F.coalesce("_meta", "metadata"))
            .drop("_meta"))


# status precedence for merging crawl_fetch rows of the same url
# (SegmentMergeFilter semantics: a success beats a retry/gone)
_FETCH_RANK = {FETCH_SUCCESS: 6, FETCH_NOTMODIFIED: 5, FETCH_REDIR_PERM: 4,
               FETCH_REDIR_TEMP: 3, FETCH_RETRY: 2, FETCH_GONE: 1}


def merge_segments(segments: list[DataFrame],
                   key: str = "url",
                   time_col: str = "fetch_time",
                   status_col: str | None = None) -> DataFrame:
    """SegmentMerger: keep the latest version per url across segments;
    ties broken by fetch-status precedence when a status column exists
    (SegmentMerger.java:556-620)."""
    assert segments
    u = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True),
               segments)
    order = [F.desc(time_col)]
    if status_col and status_col in u.columns:
        rank = F.lit(0)
        for s, r in _FETCH_RANK.items():
            rank = F.when(F.col(status_col) == s, F.lit(r)).otherwise(rank)
        u = u.withColumn("_srank", rank)
        order.append(F.desc("_srank"))
    w = Window.partitionBy(key).orderBy(*order)
    out = (u.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))
    return out.drop("_srank") if "_srank" in out.columns else out
