"""Dedup winner rules (DeduplicationJob.java:101-165), LinkDb invert
(LinkDb.java:85-155), CrawlDbMerger (TestCrawlDbMerger.java:112-141
port), SegmentMerger latest-wins."""

import pyspark.sql.functions as F

from nutch_spark.config import CrawlConfig
from nutch_spark.operators.dedup import dedup, find_duplicates
from nutch_spark.operators.linkdb import (invert_links, linkrank,
                                          node_dumper, webgraph)
from nutch_spark.operators.merge import merge_crawldbs, merge_segments

DB_SCHEMA = ("url string, status string, fetch_time long, retries int, "
             "fetch_interval int, score double, signature string, "
             "modified_time long, metadata map<string,string>")


def _db(spark, rows):
    return spark.createDataFrame(rows, DB_SCHEMA)


def test_dedup_winner_rules(spark):
    """Highest score wins; tie → latest fetch time; tie → shortest
    url; only db_fetched/db_notmodified considered."""
    rows = [
        ("http://a/1", "db_fetched", 100, 0, 1, 2.0, "sig1", 0, None),
        ("http://a/2-long", "db_fetched", 200, 0, 1, 1.0, "sig1", 0, None),
        ("http://b/1", "db_fetched", 100, 0, 1, 1.0, "sig2", 0, None),
        ("http://b/2", "db_fetched", 200, 0, 1, 1.0, "sig2", 0, None),
        ("http://c/longer", "db_fetched", 100, 0, 1, 1.0, "sig3", 0, None),
        ("http://c/x", "db_fetched", 100, 0, 1, 1.0, "sig3", 0, None),
        ("http://d/unfetched", "db_unfetched", 0, 0, 1, 9.0, "sig1", 0,
         None),
    ]
    dups = {r.url for r in find_duplicates(_db(spark, rows)).collect()}
    assert dups == {"http://a/2-long", "http://b/1", "http://c/longer"}
    out = {r.url: r.status for r in dedup(_db(spark, rows)).collect()}
    assert out["http://a/2-long"] == "db_duplicate"
    assert out["http://a/1"] == "db_fetched"
    assert out["http://d/unfetched"] == "db_unfetched"


def test_invert_links_and_cap(spark):
    cfg = CrawlConfig(db_max_inlinks=2, db_ignore_internal_links=True)
    edges = spark.createDataFrame(
        [("http://a.test/1", "http://b.test/x", "one"),
         ("http://a.test/2", "http://b.test/x", "two"),
         ("http://c.test/1", "http://b.test/x", "three"),
         ("http://b.test/1", "http://b.test/x", "internal"),
         ("http://a.test/1", "http://d.test/y", "solo")],
        "from_url string, to_url string, anchor string")
    out = {r.url: r.inlinks for r in invert_links(edges, cfg).collect()}
    assert len(out["http://b.test/x"]) == 2  # cap, internal dropped
    assert [i.from_url for i in out["http://d.test/y"]] \
        == ["http://a.test/1"]


def test_invert_links_single_exchange(spark):
    """The dedup key contains url, so one url repartition must carry
    the dropDuplicates aggregate, the cap window, and the final
    groupBy — exactly ONE Exchange in the whole invert plan (the edge
    table is the widest table in the system; a second full-width
    shuffle of it was the old plan's cost)."""
    cfg = CrawlConfig(db_ignore_internal_links=False)
    edges = spark.createDataFrame(
        [(f"http://h{i % 7}.test/{i}", f"http://t{i % 11}.test/x", "a")
         for i in range(100)],
        "from_url string, to_url string, anchor string")
    out = invert_links(edges, cfg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    rows = {r.url: len(r.inlinks) for r in out.collect()}
    assert len(rows) == 11  # t0..t10
    assert sum(rows.values()) == 100  # every edge distinct, none lost


def test_anchor_truncation(spark):
    cfg = CrawlConfig(db_max_anchor_length=5,
                      db_ignore_internal_links=False)
    edges = spark.createDataFrame(
        [("http://a/1", "http://b/x", "a very long anchor")],
        "from_url string, to_url string, anchor string")
    out = invert_links(edges, cfg).collect()
    assert out[0].inlinks[0].anchor == "a ver"


def test_crawldb_merger_latest_wins(spark):
    """TestCrawlDbMerger: record with latest lastFetchTime
    (fetch_time − interval·1000) wins; metadata union, newer wins."""
    db1 = _db(spark, [("http://u/", "db_fetched", 10_000_000, 0, 100,
                       1.0, None, 0, {"k1": "old", "shared": "old"})])
    db2 = _db(spark, [("http://u/", "db_unfetched", 10_500_000, 0, 1000,
                       2.0, None, 0, {"k2": "new", "shared": "new"})])
    # lastFetch: db1 = 10M−100k = 9.9M; db2 = 10.5M−1M = 9.5M → db1 wins
    out = merge_crawldbs([db1, db2]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.status == "db_fetched" and r.score == 1.0
    assert r.metadata == {"k1": "old", "k2": "new", "shared": "old"}


def test_merge_disjoint_urls(spark):
    db1 = _db(spark, [("http://a/", "db_fetched", 1000, 0, 1, 1.0,
                       None, 0, None)])
    db2 = _db(spark, [("http://b/", "db_unfetched", 2000, 0, 1, 2.0,
                       None, 0, None)])
    out = {r.url for r in merge_crawldbs([db1, db2]).collect()}
    assert out == {"http://a/", "http://b/"}


def test_segment_merger_status_precedence(spark):
    s1 = spark.createDataFrame(
        [("http://u/", "fetch_retry", 100)],
        "url string, status string, fetch_time long")
    s2 = spark.createDataFrame(
        [("http://u/", "fetch_success", 100)],
        "url string, status string, fetch_time long")
    out = merge_segments([s1, s2], status_col="status").collect()
    assert out[0].status == "fetch_success"
    s3 = spark.createDataFrame(
        [("http://u/", "fetch_gone", 200)],
        "url string, status string, fetch_time long")
    out2 = merge_segments([s1, s3], status_col="status").collect()
    assert out2[0].status == "fetch_gone"  # later time wins first


def test_webgraph_and_nodedumper(spark):
    cfg = CrawlConfig()
    edges = spark.createDataFrame(
        [("a", "b", ""), ("a", "c", ""), ("b", "c", ""),
         ("a", "b", "dup")],
        "from_url string, to_url string, anchor string")
    wg = webgraph(edges, None, cfg)
    node = {r.url: (r.in_degree, r.out_degree)
            for r in wg["nodedb"].collect()}
    assert node["a"] == (0, 2)
    assert node["b"] == (1, 1)
    assert node["c"] == (2, 0)
    top = node_dumper(wg["nodedb"], by="inlinks", n=1).collect()
    assert top[0].url == "c"


def test_linkrank_converges_shape(spark):
    edges = spark.createDataFrame(
        [("a", "b", ""), ("b", "c", ""), ("c", "a", ""), ("a", "c", "")],
        "from_url string, to_url string, anchor string")
    ranks = {r.url: r.score for r in linkrank(edges, iterations=5)
             .collect()}
    assert set(ranks) == {"a", "b", "c"}
    # c has two inlinks (a, b) → highest score
    assert ranks["c"] > ranks["b"]
    assert all(s > 0 for s in ranks.values())
