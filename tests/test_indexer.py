"""Indexer sink rules: delete actions (IndexerMapReduce.java:195-268),
robots-noindex deletes (NUTCH-1434), notmodified handling
(IndexerMapReduce.java:198-201,266-269)."""

import pyspark.sql.functions as F

from nutch_spark.config import CrawlConfig
from nutch_spark.operators.readers import indexer_deletes, indexer_docs

CFG = CrawlConfig(indexer_delete=True, indexer_delete_robots_noindex=True)


def _db(spark, rows):
    return spark.createDataFrame(rows, "url string, status string")


def _cf(spark, rows):
    return spark.createDataFrame(rows, "url string, status string")


def _pd(spark, rows):
    return spark.createDataFrame(
        rows, "url string, meta_robots string")


def test_delete_reasons_and_precedence(spark):
    db = _db(spark, [
        ("http://a/", "db_gone"),          # gone via db status
        ("http://b/", "db_fetched"),       # gone via fetch status
        ("http://c/", "db_redir_temp"),    # redirect via db
        ("http://d/", "db_fetched"),       # redirect via fetch
        ("http://e/", "db_duplicate"),     # duplicate (needs parse row)
        ("http://f/", "db_fetched"),       # robots noindex
        ("http://g/", "db_gone"),          # robots wins over gone
        ("http://h/", "db_fetched"),       # clean -> no delete
        ("http://i/", "db_gone"),          # no fetch row -> no delete
    ])
    cf = _cf(spark, [
        ("http://a/", "fetch_success"),
        ("http://b/", "fetch_gone"),
        ("http://c/", "fetch_success"),
        ("http://d/", "fetch_redir_perm"),
        ("http://e/", "fetch_success"),
        ("http://f/", "fetch_success"),
        ("http://g/", "fetch_gone"),
        ("http://h/", "fetch_success"),
    ])
    pd_ = _pd(spark, [
        ("http://e/", ""),
        ("http://f/", "NOINDEX,nofollow"),
        ("http://g/", "noindex"),
        ("http://h/", "index,follow"),
    ])
    got = {r.url: r.reason
           for r in indexer_deletes(db, pd_, cf, CFG).collect()}
    assert got == {
        "http://a/": "gone",
        "http://b/": "gone",
        "http://c/": "redirect",
        "http://d/": "redirect",
        "http://e/": "duplicate",
        "http://f/": "robots_noindex",
        "http://g/": "robots_noindex",
    }


def test_delete_flags_off(spark):
    db = _db(spark, [("http://a/", "db_gone")])
    cf = _cf(spark, [("http://a/", "fetch_gone")])
    pd_ = _pd(spark, [("http://a/", "noindex")])
    off = CrawlConfig()  # both delete flags default False
    assert indexer_deletes(db, pd_, cf, off).count() == 0


def test_duplicate_needs_parse_row(spark):
    """The reference's duplicate delete fires only when all segment
    parts are present (IndexerMapReduce.java:236-246)."""
    db = _db(spark, [("http://a/", "db_duplicate")])
    cf = _cf(spark, [("http://a/", "fetch_success")])
    with_pd = indexer_deletes(db, _pd(spark, [("http://a/", "")]),
                              cf, CFG)
    without_pd = indexer_deletes(db, None, cf, CFG)
    assert [r.reason for r in with_pd.collect()] == ["duplicate"]
    assert without_pd.count() == 0


def test_indexer_docs_skips_notmodified(spark):
    db = spark.createDataFrame(
        [("http://a/", "db_fetched", 1.0, "s1"),
         ("http://b/", "db_notmodified", 1.0, "s2"),
         ("http://c/", "db_fetched", 1.0, "s3")],
        "url string, status string, score double, signature string")
    cf = spark.createDataFrame(
        [("http://a/", "fetch_success", 100),
         ("http://b/", "fetch_success", 100),
         ("http://c/", "fetch_notmodified", 100)],
        "url string, status string, fetch_time long")
    pt = spark.createDataFrame(
        [("http://a/", "ta"), ("http://b/", "tb"), ("http://c/", "tc")],
        "url string, text string")
    pd_ = spark.createDataFrame(
        [("http://a/", "A"), ("http://b/", "B"), ("http://c/", "C")],
        "url string, title string")
    # notmodified FETCH row never becomes the fetchDatum -> c drops
    base = indexer_docs(db, None, pt, pd_, cf, CrawlConfig())
    assert {r.url for r in base.select("url").collect()} == {
        "http://a/", "http://b/"}
    # indexer.skip.notmodified additionally drops db_notmodified rows
    skip = indexer_docs(db, None, pt, pd_, cf,
                        CrawlConfig(indexer_skip_notmodified=True))
    assert {r.url for r in skip.select("url").collect()} == {"http://a/"}


def test_deletes_ignore_notmodified_fetch_row(spark):
    """A notmodified fetch row is dropped before the delete checks
    (IndexerMapReduce.java:198-201): a url with only a notmodified
    fetch row plus a gone/redirect db status gets NO gone/redirect
    delete — the both-present rule loses its fetch side."""
    db = _db(spark, [("http://a/", "db_gone"),
                     ("http://b/", "db_redir_perm"),
                     ("http://c/", "db_gone")])
    cf = _cf(spark, [("http://a/", "fetch_notmodified"),
                     ("http://b/", "fetch_notmodified"),
                     ("http://c/", "fetch_gone")])
    got = {r.url: r.reason
           for r in indexer_deletes(db, None, cf, CFG).collect()}
    assert got == {"http://c/": "gone"}
