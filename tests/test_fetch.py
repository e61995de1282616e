"""Fetcher tests: virtual-time politeness, robots, status mapping,
redirects. Ports the assertions of TestFetcher.java:81-205 with the
wall-clock politeness bound replaced by the virtual-time contract
(SURVEY.md §5.5, FIXTURES.md)."""

import pyspark.sql.functions as F
import pytest

from nutch_spark.config import CrawlConfig
from nutch_spark.functions.urls import url_hash31
from nutch_spark.operators.fetch import fetch
from nutch_spark.schema import (
    FETCH_GONE, FETCH_NOTMODIFIED, FETCH_REDIR_PERM, FETCH_REDIR_TEMP,
    FETCH_RETRY, FETCH_SUCCESS,
)

START = 1_700_000_000_000


def _fetchlist(spark, urls):
    rows = [(u, "db_unfetched", 0, 0, 3600, 1.0, None, 0, None, 1, 0)
            for u in urls]
    return spark.createDataFrame(
        rows,
        "url string, status string, fetch_time long, retries int, "
        "fetch_interval int, score double, signature string, "
        "modified_time long, metadata map<string,string>, "
        "segnum int, fetch_partition int")


def _pages(spark, urls):
    rows = [(u, None, f"<html><body>{u}</body></html>".encode(), u, "en")
            for u in urls]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")


def _robots(spark, rows=()):
    return spark.createDataFrame(
        list(rows), "authority string, robots_txt string, fetch_code int")


@pytest.fixture()
def cfg():
    return CrawlConfig(num_fetch_partitions=2)


def test_politeness_virtual_time(spark, cfg):
    """K urls on one host: k-th attempted fetch at start + k×delay
    (FetchItemQueue.java:128-138); FIFO = url-hash order
    (Generator.java:386-416)."""
    urls = [f"http://one.test/p{i}" for i in range(5)]
    out = fetch(_fetchlist(spark, urls), _pages(spark, urls),
                _robots(spark), None, cfg, START)["crawl_fetch"] \
        .orderBy("virtual_time").collect()
    assert [r.virtual_time for r in out] == [
        START + k * cfg.fetcher_server_delay_ms for k in range(5)]
    expect = sorted(urls, key=lambda u: (url_hash31(u), u))
    assert [r.url for r in out] == expect
    assert all(r.status == FETCH_SUCCESS for r in out)


def test_queues_independent(spark, cfg):
    """Separate hosts schedule independently from round start."""
    urls = ["http://a.test/x", "http://b.test/x", "http://c.test/x"]
    out = fetch(_fetchlist(spark, urls), _pages(spark, urls),
                _robots(spark), None, cfg, START)["crawl_fetch"].collect()
    assert all(r.virtual_time == START for r in out)


def test_robots_disallow_and_delay(spark, cfg):
    urls = ["http://r.test/allowed", "http://r.test/private/x",
            "http://slow.test/a", "http://slow.test/b"]
    robots = _robots(spark, [
        ("http://r.test", "User-agent: *\nDisallow: /private/\n", 200),
        ("http://slow.test", "User-agent: *\nCrawl-delay: 2\n", 200),
    ])
    out = {r.url: r for r in fetch(
        _fetchlist(spark, urls), _pages(spark, urls), robots, None,
        cfg, START)["crawl_fetch"].collect()}
    assert out["http://r.test/private/x"].status == FETCH_GONE
    assert out["http://r.test/allowed"].status == FETCH_SUCCESS
    # robots crawl-delay (2 s) overrides server delay (5 s)
    times = sorted(v.virtual_time for k, v in out.items()
                   if k.startswith("http://slow.test"))
    assert times[1] - times[0] == 2000


def test_crawl_delay_over_max_skips(spark, cfg):
    """Crawl-delay > fetcher.max.crawl.delay → fetch_gone
    (FetcherThread.java:267-289)."""
    urls = ["http://huge.test/a"]
    robots = _robots(spark, [
        ("http://huge.test", "User-agent: *\nCrawl-delay: 45\n", 200)])
    out = fetch(_fetchlist(spark, urls), _pages(spark, urls), robots,
                None, cfg, START)["crawl_fetch"].collect()
    assert out[0].status == FETCH_GONE


def test_status_mapping_and_redirect(spark, cfg):
    urls = ["http://s.test/ok", "http://s.test/moved",
            "http://s.test/temp", "http://s.test/gone",
            "http://s.test/err", "http://s.test/cached",
            "http://s.test/missing"]
    status = spark.createDataFrame(
        [("http://s.test/ok", 200, None, None),
         ("http://s.test/moved", 301, "http://t.test/new", None),
         ("http://s.test/temp", 302, "http://s.test/other", None),
         ("http://s.test/gone", 404, None, None),
         ("http://s.test/err", 500, None, None),
         ("http://s.test/cached", 304, None, None)],
        "url string, status_code int, redirect_to string, "
        "content_length long")
    res = fetch(_fetchlist(spark, urls), _pages(spark, urls[:1]),
                _robots(spark), status, cfg, START)
    out = {r.url: r.status for r in res["crawl_fetch"].collect()}
    assert out["http://s.test/ok"] == FETCH_SUCCESS
    assert out["http://s.test/moved"] == FETCH_REDIR_PERM
    assert out["http://s.test/temp"] == FETCH_REDIR_TEMP
    assert out["http://s.test/gone"] == FETCH_GONE
    assert out["http://s.test/err"] == FETCH_RETRY
    assert out["http://s.test/cached"] == FETCH_NOTMODIFIED
    assert out["http://s.test/missing"] == FETCH_GONE  # not in pages
    linked = {r.url: r for r in res["linked"].collect()}
    assert set(linked) == {"http://t.test/new", "http://s.test/other"}
    # chooseRepr: cross-domain perm redirect → destination
    assert linked["http://t.test/new"].metadata["_repr_"] \
        == "http://t.test/new"


def test_timelimit_drops_tail(spark):
    cfg = CrawlConfig(num_fetch_partitions=1,
                      fetcher_timelimit_ms=11_000)
    urls = [f"http://one.test/p{i}" for i in range(10)]
    out = fetch(_fetchlist(spark, urls), _pages(spark, urls),
                _robots(spark), None, cfg, START)["crawl_fetch"].collect()
    # 5 s delay → items at 0,5,10 s fit an 11 s budget
    assert len(out) == 3


def test_content_only_for_success(spark, cfg):
    urls = ["http://c.test/ok", "http://c.test/miss"]
    res = fetch(_fetchlist(spark, urls), _pages(spark, urls[:1]),
                _robots(spark), None, cfg, START)
    content = res["content"].collect()
    assert [c.url for c in content] == ["http://c.test/ok"]
    assert b"c.test" in bytes(content[0].html)


def test_threads_per_queue_wave_spacing(spark):
    """fetcher.threads.per.queue > 1 (FetchItemQueue.java:95-138):
    waves of `threads` items dispatch together, spaced by
    fetcher.server.min.delay; queue delay and robots crawl-delay are
    ignored for spacing (setEndTime picks minCrawlDelay unconditionally
    when maxThreads > 1, FetchItemQueue.java:133-136)."""
    cfg = CrawlConfig(num_fetch_partitions=2,
                      fetcher_threads_per_queue=3,
                      fetcher_server_min_delay_ms=1000)
    urls = [f"http://one.test/p{i}" for i in range(7)]
    robots = _robots(spark, [
        ("http://one.test", "User-agent: *\nCrawl-delay: 9\n", 200)])
    out = fetch(_fetchlist(spark, urls), _pages(spark, urls),
                robots, None, cfg, START)["crawl_fetch"] \
        .orderBy("virtual_time", "url").collect()
    # 7 items, 3 per wave -> waves of size 3,3,1 at +0s/+1s/+2s;
    # the robots Crawl-delay: 9 must NOT stretch the spacing
    assert sorted(r.virtual_time - START for r in out) == \
        [0, 0, 0, 1000, 1000, 1000, 2000]
    # FIFO within queue still url-hash order: wave k holds ranks 3k..3k+2
    expect = sorted(urls, key=lambda u: (url_hash31(u), u))
    by_url = {r.url: (r.virtual_time - START) // 1000 for r in out}
    assert [by_url[u] for u in expect] == [0, 0, 0, 1, 1, 1, 2]
    assert all(r.status == FETCH_SUCCESS for r in out)


def test_threads_per_queue_one_keeps_robots_delay(spark):
    """threads=1 path unchanged: robots crawl-delay still governs."""
    cfg = CrawlConfig(num_fetch_partitions=2, fetcher_threads_per_queue=1)
    urls = ["http://slow.test/a", "http://slow.test/b"]
    robots = _robots(spark, [
        ("http://slow.test", "User-agent: *\nCrawl-delay: 2\n", 200)])
    out = fetch(_fetchlist(spark, urls), _pages(spark, urls),
                robots, None, cfg, START)["crawl_fetch"].collect()
    assert sorted(r.virtual_time - START for r in out) == [0, 2000]


def test_queue_mode_by_domain(spark):
    """fetcher.queue.mode=byDomain (FetchItemQueues.java:54-74): two
    hosts of one registered domain share a politeness queue; byHost
    schedules them independently."""
    cfg_d = CrawlConfig(num_fetch_partitions=2,
                        fetcher_queue_mode="byDomain")
    # example.com is in the reference suffix table's registered-domain
    # walk (com is a TLD), so a.example.com/b.example.com -> example.com
    urls = ["http://a.example.com/x", "http://b.example.com/y"]
    out = fetch(_fetchlist(spark, urls), _pages(spark, urls),
                _robots(spark), None, cfg_d, START)["crawl_fetch"].collect()
    qids = {r.queue_id for r in out}
    assert qids == {"http://example.com"}
    assert sorted(r.virtual_time - START for r in out) == [0, 5000]

    cfg_h = CrawlConfig(num_fetch_partitions=2)
    out_h = fetch(_fetchlist(spark, urls), _pages(spark, urls),
                  _robots(spark), None, cfg_h, START)["crawl_fetch"].collect()
    assert {r.queue_id for r in out_h} == {"http://a.example.com",
                                           "http://b.example.com"}
    assert [r.virtual_time - START for r in out_h] == [0, 0]
