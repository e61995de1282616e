"""Generator multi-segment spill (Generator.java:242-347) and the
fetcher per-queue exception cap (FetchItemQueues.java:181-201)."""

import pyspark.sql.functions as F
import pytest

from nutch_spark.config import CrawlConfig
from nutch_spark.functions.urls import url_hash31
from nutch_spark.operators.fetch import fetch
from nutch_spark.operators.generate import generate

START = 1_700_000_000_000


def _crawldb(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, status string, fetch_time long, retries int, "
        "fetch_interval int, score double, signature string, "
        "modified_time long, metadata map<string,string>")


def _db_rows(host, n, score0=100.0):
    # score descending with the page index so host-rank == page index
    return [(f"http://{host}/p{i:03d}", "db_unfetched", 0, 0, 3600,
             score0 - i, None, 0, None) for i in range(n)]


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


def _robots(spark):
    return spark.createDataFrame(
        [], "authority string, robots_txt string, fetch_code int")


def test_segment_spill_host_cap(spark):
    """maxCount=3, maxNumSegments=3: seg1 holds maxCount-1=2 rows per
    host (the reference's pre-increment quirk, Generator.java:293-304),
    seg2/seg3 hold maxCount each, the rest is dropped."""
    cfg = CrawlConfig(generate_filter=False, generate_max_count=3,
                      generate_max_num_segments=3,
                      num_fetch_partitions=2)
    db = _crawldb(spark, _db_rows("a.test", 12) + _db_rows("b.test", 4))
    out = generate(db, cfg, cur_time_ms=START, gen_time_ms=START)
    got = {(r.url, r.segnum) for r in out.collect()}
    by_seg = {}
    for u, s in got:
        by_seg.setdefault(s, set()).add(u)
    # host a: 12 candidates -> capacity 2 + 3 + 3 = 8
    a = sorted(u for u, _ in got if "a.test" in u)
    assert len(a) == 8
    # score-descending host rank: p000,p001 -> seg1; p002-004 -> seg2;
    # p005-007 -> seg3
    assert {u for u in by_seg[1] if "a.test" in u} == {
        "http://a.test/p000", "http://a.test/p001"}
    assert {u for u in by_seg[2] if "a.test" in u} == {
        "http://a.test/p002", "http://a.test/p003", "http://a.test/p004"}
    assert {u for u in by_seg[3] if "a.test" in u} == {
        "http://a.test/p005", "http://a.test/p006", "http://a.test/p007"}
    # host b: 4 candidates -> 2 in seg1, 2 in seg2
    assert {u for u in by_seg[1] if "b.test" in u} == {
        "http://b.test/p000", "http://b.test/p001"}
    assert {u for u in by_seg[2] if "b.test" in u} == {
        "http://b.test/p002", "http://b.test/p003"}


def test_segment_spill_topn_per_segment(spark):
    """topN budgets each segment separately when spilling."""
    cfg = CrawlConfig(generate_filter=False, generate_max_count=3,
                      generate_max_num_segments=2, generate_top_n=3,
                      num_fetch_partitions=2)
    # 4 hosts × 6 pages: seg1 capacity 2/host = 8 candidates, topN trims
    # to 3; seg2 capacity 3/host = 12 candidates -> 3.
    rows = []
    for h in ("a", "b", "c", "d"):
        rows += _db_rows(f"{h}.test", 6)
    out = generate(_crawldb(spark, rows), cfg,
                   cur_time_ms=START, gen_time_ms=START)
    seg_counts = {r["segnum"]: r["n"] for r in
                  out.groupBy("segnum").agg(F.count("*").alias("n"))
                  .collect()}
    assert seg_counts == {1: 3, 2: 3}


def test_segment_spill_no_cap_global_order(spark):
    """No host cap: segments fill in global score order, topN each
    (Generator.java:248-255 count/limit walk)."""
    cfg = CrawlConfig(generate_filter=False, generate_top_n=4,
                      generate_max_num_segments=2,
                      num_fetch_partitions=2)
    db = _crawldb(spark, _db_rows("a.test", 10))
    out = generate(db, cfg, cur_time_ms=START, gen_time_ms=START)
    by_seg = {}
    for r in out.collect():
        by_seg.setdefault(r.segnum, set()).add(r.url)
    assert by_seg[1] == {f"http://a.test/p{i:03d}" for i in range(4)}
    assert by_seg[2] == {f"http://a.test/p{i:03d}" for i in range(4, 8)}


def test_exception_cap_purges_queue(spark):
    """After max exceptions in one queue, its remaining items vanish
    from the round; the item that reaches the cap still emits its own
    retry row (FetchItemQueues.checkExceptionThreshold)."""
    cfg = CrawlConfig(num_fetch_partitions=1,
                      fetcher_max_exceptions_per_queue=2)
    urls = [f"http://one.test/p{i}" for i in range(6)]
    fifo = sorted(urls, key=lambda u: (url_hash31(u), u))
    # first two attempted items 5xx -> later items purged
    status = spark.createDataFrame(
        [(u, 503, None, None) for u in fifo[:2]],
        "url string, status_code int, redirect_to string, "
        "content_length long")
    out = fetch(_fetchlist(spark, urls), _pages(spark, urls),
                _robots(spark), status, cfg, START)["crawl_fetch"] \
        .collect()
    got = {r.url for r in out}
    assert got == set(fifo[:2])          # the two exception rows remain
    from nutch_spark.schema import FETCH_RETRY
    assert all(r.status == FETCH_RETRY for r in out)


def test_exception_cap_below_threshold_keeps_queue(spark):
    """One exception under a cap of 2 purges nothing."""
    cfg = CrawlConfig(num_fetch_partitions=1,
                      fetcher_max_exceptions_per_queue=2)
    urls = [f"http://one.test/p{i}" for i in range(4)]
    fifo = sorted(urls, key=lambda u: (url_hash31(u), u))
    status = spark.createDataFrame(
        [(fifo[0], 500, None, None)],
        "url string, status_code int, redirect_to string, "
        "content_length long")
    out = fetch(_fetchlist(spark, urls), _pages(spark, urls),
                _robots(spark), status, cfg, START)["crawl_fetch"]
    assert out.count() == 4


def test_exception_cap_scoped_per_queue(spark):
    """Exceptions on one host must not purge another host's queue."""
    cfg = CrawlConfig(num_fetch_partitions=1,
                      fetcher_max_exceptions_per_queue=1)
    bad = [f"http://bad.test/p{i}" for i in range(3)]
    good = [f"http://good.test/p{i}" for i in range(3)]
    fifo_bad = sorted(bad, key=lambda u: (url_hash31(u), u))
    status = spark.createDataFrame(
        [(fifo_bad[0], 502, None, None)],
        "url string, status_code int, redirect_to string, "
        "content_length long")
    out = fetch(_fetchlist(spark, bad + good), _pages(spark, bad + good),
                _robots(spark), status, cfg, START)["crawl_fetch"]
    got = {r.url for r in out.collect()}
    assert set(good) <= got
    assert got & set(bad) == {fifo_bad[0]}
