"""DeduplicationJob — signature-based duplicate marking.

Reference: DeduplicationJob.java — map keeps only db_fetched /
db_notmodified rows with a signature, keyed by signature (lines 82-98);
reduce keeps ONE url per signature — highest score, tie → latest
fetchTime, tie → shortest URL (lines 101-165; an optional
``dedup.compare.order`` permutes these, we expose the default order) —
losers become ``db_duplicate``; a second job merges the duplicate marks
back into the crawldb (lines 178-214).

Spark shape: a single window ``partitionBy(signature)`` ranked by the
comparison order; ``row_number() > 1 → db_duplicate``; then a left
join-update back onto the crawldb. One shuffle on signature, one on
url. Signature skew (giant duplicate clusters) is bounded because only
the winner ordering matters — AQE skew handling splits oversized
signature partitions safely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..schema import DB_DUPLICATE, DB_FETCHED, DB_NOTMODIFIED


def find_duplicates(crawldb: DataFrame,
                    compare_order: str = "score,fetchTime,urlLength"
                    ) -> DataFrame:
    """Rows that lose their signature group → urls to mark duplicate."""
    cand = crawldb.where(
        F.col("status").isin(DB_FETCHED, DB_NOTMODIFIED)
        & F.col("signature").isNotNull())
    order_cols = []
    for key in compare_order.split(","):
        key = key.strip()
        if key == "score":
            order_cols.append(F.desc("score"))
        elif key == "fetchTime":
            order_cols.append(F.desc("fetch_time"))
        elif key == "urlLength":
            order_cols.append(F.asc(F.length("url")))
        else:
            raise ValueError(f"unknown dedup compare key: {key}")
    order_cols.append(F.asc("url"))  # deterministic final tiebreak
    w = Window.partitionBy("signature").orderBy(*order_cols)
    return (cand
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") > 1)
            .select("url"))


def dedup(crawldb: DataFrame,
          compare_order: str = "score,fetchTime,urlLength") -> DataFrame:
    """Full dedup: mark losers as db_duplicate in the returned crawldb
    (StatusUpdateReducer, DeduplicationJob.java:178-214)."""
    dups = find_duplicates(crawldb, compare_order) \
        .withColumn("_dup", F.lit(True))
    return (crawldb.join(dups, "url", "left")
            .withColumn(
                "status",
                F.when(F.col("_dup") & (F.col("status") == DB_FETCHED)
                       | F.col("_dup") & (F.col("status") == DB_NOTMODIFIED),
                       F.lit(DB_DUPLICATE))
                .otherwise(F.col("status")))
            .drop("_dup"))
