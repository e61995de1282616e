"""Row builders shared by operator tests (CrawlDBTestUtil analog)."""

from nutch_spark.schema import CRAWLDB

NOW = 1_700_000_000_000  # fixed "current time" for deterministic tests


def datum(url, status="db_unfetched", fetch_time=0, retries=0,
          fetch_interval=2592000, score=1.0, signature=None,
          modified_time=0, metadata=None):
    return (url, status, fetch_time, retries, fetch_interval,
            float(score), signature, modified_time, metadata or {})


def crawldb_df(spark, rows):
    return spark.createDataFrame(rows, CRAWLDB)


def by_url(df):
    return {r["url"]: r.asDict() for r in df.collect()}
