"""Streaming frontier maintenance (optional extension).

The reference is strictly batch — rounds of MR jobs (SURVEY.md §1.4);
nothing here is parity-relevant. This module shows the engine's
operators running under Structured Streaming for deployments that want
continuous discovery instead of round boundaries:

- ``stream_discovered``: ``readStream`` over a segments directory
  (each fetch round drops crawl_parse parquet there), watermarked
  dedup of discovered URLs, then ``foreachBatch`` merges each
  micro-batch into the crawldb with the SAME batch updatedb operator —
  one code path for both execution modes.
- ``stream_fetch_metrics``: windowed per-status counts with a
  watermark for late fetch records (the streaming analog of
  ``fetch_metrics``).

Micro-batch + foreachBatch is the right shape here because the
updatedb merge is a full-outer co-group keyed by url — exactly what
Spark's streaming joins can't express incrementally without keeping
the whole frontier in state; delegating to the batch operator per
micro-batch keeps the state in the table (Iceberg snapshot / parquet
round dir), not the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import CrawlConfig
from ..operators import updatedb as update_op
from .. import schema as S


def stream_discovered(spark: SparkSession, segments_dir: str,
                      watermark: str = "10 minutes") -> DataFrame:
    """Stream of crawl_parse message rows from a segments directory,
    deduped per url within the watermark."""
    stream = (spark.readStream
              .schema(S.CRAWLDB)
              .parquet(segments_dir))
    return (stream
            .withColumn("_event_ts",
                        F.timestamp_millis(F.col("fetch_time")))
            .withWatermark("_event_ts", watermark)
            .dropDuplicates(["url", "status", "_event_ts"])
            .drop("_event_ts"))


def run_frontier_stream(spark: SparkSession, segments_dir: str,
                        crawldb_path: str, cfg: CrawlConfig,
                        checkpoint_dir: str,
                        trigger_once: bool = True):
    """Continuously merge discovered rows into the crawldb.

    Each micro-batch applies the batch updatedb (state machine +
    OPIC accumulation) against the current crawldb snapshot and
    atomically replaces it — same semantics as a batch round, driven
    by file arrival instead of the cycle driver."""
    import os

    discovered = stream_discovered(spark, segments_dir)

    def merge(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        db = None
        if os.path.isdir(crawldb_path) and any(
                f.endswith(".parquet")
                for _, _, fs in os.walk(crawldb_path) for f in fs):
            db = sp.read.parquet(crawldb_path)
        import time as _t
        new_db = update_op.updatedb(db, batch, cfg,
                                    int(_t.time() * 1000))
        tmp = crawldb_path + f".batch{batch_id}"
        new_db.write.mode("overwrite").parquet(tmp)
        final = sp.read.parquet(tmp)
        final.write.mode("overwrite").parquet(crawldb_path)

    writer = (discovered.writeStream
              .outputMode("append")
              .option("checkpointLocation", checkpoint_dir)
              .foreachBatch(merge))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_fetch_metrics(crawl_fetch_stream: DataFrame,
                         window: str = "1 minute",
                         watermark: str = "5 minutes") -> DataFrame:
    """Windowed per-status fetch counters with late-data handling —
    the streaming analog of Fetcher's live pages/sec reporting
    (Fetcher.java:135-154)."""
    return (crawl_fetch_stream
            .withColumn("_ts", F.timestamp_millis(F.col("fetch_time")))
            .withWatermark("_ts", watermark)
            .groupBy(F.window("_ts", window).alias("w"),
                     F.col("status"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"), "status",
                    "n"))
