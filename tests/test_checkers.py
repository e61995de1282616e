"""Checker tools (URLNormalizerChecker / URLFilterChecker /
ParserChecker / IndexingFiltersChecker analogs)."""

from pyspark.sql import functions as F

from nutch_spark.config import CrawlConfig
from nutch_spark.operators import checkers


def test_filter_checker_verdicts(spark):
    """+ / - per the default regex-urlfilter chain
    (URLFilterChecker.java:50-71)."""
    urls = spark.createDataFrame(
        [("http://a.ex/page",),
         ("ftp://a.ex/page",),
         ("http://a.ex/x.png",),
         ("http://a.ex/p?q=1",),
         ("http://a.ex/x/y/x/y/x/",)], "url string")
    got = {r.url: r.verdict
           for r in checkers.filter_checker(urls, CrawlConfig()).collect()}
    assert got == {"http://a.ex/page": "+",
                   "ftp://a.ex/page": "-",
                   "http://a.ex/x.png": "-",
                   "http://a.ex/p?q=1": "-",
                   "http://a.ex/x/y/x/y/x/": "-"}


def test_normalizer_checker(spark):
    """Scheme/host lowercase, default port strip, dot-segment resolve
    (URLNormalizerChecker.java:49-68 over the basic+regex chain)."""
    urls = spark.createDataFrame(
        [("HTTP://A.EX:80/a/../p",), ("http://a.ex/p",)], "url string")
    got = {r.url: r.normalized
           for r in checkers.normalizer_checker(
               urls, CrawlConfig()).collect()}
    assert got["HTTP://A.EX:80/a/../p"] == "http://a.ex/p"
    assert got["http://a.ex/p"] == "http://a.ex/p"


def test_parser_checker(spark):
    """Parse dump per url: title, text, outlink count, signature
    (ParserChecker.java:90-140)."""
    html = (b"<html><head><title>T1</title></head>"
            b"<body>hello world <a href=\"http://b.ex/x\">x</a>"
            b"</body></html>")
    content = spark.createDataFrame(
        [("http://a.ex/", bytearray(html), "hello world x", "en",
          1000, 1.0, 3600, None)],
        "url string, html binary, text string, lang string, "
        "fetch_time long, score double, fetch_interval int, "
        "metadata map<string,string>")
    rows = checkers.parser_checker(content, CrawlConfig(), 0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.title == "T1"
    assert "hello world" in r.text
    assert r.n_outlinks == 1
    assert r.signature is not None


def test_indexing_filters_checker(spark):
    """One (url, field, value) row per set field, arrays exploded
    (IndexingFiltersChecker.java:87-143)."""
    docs = spark.createDataFrame(
        [("http://a.ex/", "T", ["anchor1", "anchor2"], None)],
        "url string, title string, anchor array<string>, tld string")
    rows = checkers.indexing_filters_checker(docs).collect()
    got = {(r.field, r.value) for r in rows}
    assert ("title", "T") in got
    assert ("anchor", "anchor1") in got and ("anchor", "anchor2") in got
    # null fields are dropped like fields the chain never set
    assert not any(r.field == "tld" for r in rows)
