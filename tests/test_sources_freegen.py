"""FreeGenerator, source/sink helpers, depth-scoring outlink budget."""

import pyspark.sql.functions as F

from nutch_spark.config import CrawlConfig
from nutch_spark.operators.generate import free_generate
from nutch_spark.operators.parse import parse_segment
from nutch_spark.operators.sources import (dump_commoncrawl,
                                           pages_to_segment, read_pages,
                                           read_seeds)
from nutch_spark.testdata import fixture_dfs


def test_free_generate(spark):
    urls = spark.createDataFrame(
        [("http://A.test/page",), ("# comment",), ("",),
         ("http://b.test/x",), ("http://b.test/x",),
         ("ftp://skip.me/f",)], "line string")
    cfg = CrawlConfig(num_fetch_partitions=2)
    out = free_generate(urls, cfg, now_ms=1000).collect()
    got = {r.url for r in out}
    # normalized (host lowercased), filtered (ftp dropped), deduped
    assert got == {"http://a.test/page", "http://b.test/x"}
    assert all(r.status == "db_unfetched" and r.score == 1.0
               for r in out)


def test_pages_roundtrip_and_segment(spark, tmp_path):
    fx = fixture_dfs(spark, n_hosts=4, pages_per_host=3,
                     hot_host_pages=4)
    path = str(tmp_path / "pages")
    fx["pages"].write.parquet(path)
    pages = read_pages(spark, path)
    assert [f.name for f in pages.schema.fields] \
        == ["url", "warc_ts", "html", "text", "lang"]
    content = pages_to_segment(pages, now_ms=123)
    row = content.first()
    assert row.fetch_time > 0 and row.score == 1.0
    # archive ingest → parse works without a fetch round
    pr = parse_segment(content, CrawlConfig(), now_ms=123)
    assert pr["parse_text"].count() == pages.count()


def test_seed_file_and_cc_dump(spark, tmp_path):
    seeds = tmp_path / "seeds.txt"
    seeds.write_text("http://a.test/\n# c\nhttp://b.test/\n")
    df = read_seeds(spark, str(seeds))
    assert df.columns == ["line"] and df.count() == 3

    fx = fixture_dfs(spark, n_hosts=3, pages_per_host=3,
                     hot_host_pages=3)
    content = pages_to_segment(fx["pages"], now_ms=1)
    pr = parse_segment(content, CrawlConfig(), now_ms=1)
    cf = content.select(
        "url", F.lit("fetch_success").alias("status"), "fetch_time")
    out = tmp_path / "ccdump"
    dump_commoncrawl(pr["parse_text"], pr["parse_data"], cf, str(out))
    back = spark.read.json(str(out))
    assert back.count() == content.count()
    assert "envelope" in back.columns


def test_depth_scoring_budget(spark):
    cfg = CrawlConfig(scoring_depth_enabled=True, scoring_depth_max=2)
    html = b'<html><body><a href="/next.html">n</a></body></html>'

    def content_at(depth):
        meta = {"_depth_": str(depth)} if depth is not None else None
        return spark.createDataFrame(
            [("http://d.test/p", bytearray(html), "", "en",
              1000, 1.0, 3600, meta)],
            "url string, html binary, text string, lang string, "
            "fetch_time long, score double, fetch_interval int, "
            "metadata map<string,string>")

    linked0 = parse_segment(content_at(None), cfg, 0)["crawl_parse"] \
        .where(F.col("status") == "linked").collect()
    assert len(linked0) == 1
    assert linked0[0].metadata["_depth_"] == "1"

    linked2 = parse_segment(content_at(2), cfg, 0)["crawl_parse"] \
        .where(F.col("status") == "linked").collect()
    assert linked2 == []  # depth 3 > max 2 → dropped


def test_dump_crawldb_writer_parity(spark, tmp_path):
    """readdb -dump sink parity (CrawlDbReader.java): the csv/json
    writers must round-trip exactly the rows crawldb_dump selects —
    same filters, same values — so the file output and the DataFrame
    API never disagree."""
    from nutch_spark.operators.readers import crawldb_dump
    from nutch_spark.operators.sources import dump_crawldb

    db = spark.createDataFrame(
        [("http://a.test/x", "db_fetched", 1000, 0, 3600, 1.5,
          "sigA", 0, {"k": "v"}),
         ("http://b.test/y", "db_unfetched", 2000, 2, 3600, 0.5,
          None, 0, None),
         ("http://a.test/z", "db_gone", 3000, 3, 3600, 0.0,
          None, 0, None)],
        "url string, status string, fetch_time long, retries int, "
        "fetch_interval int, score double, signature string, "
        "modified_time long, metadata map<string,string>")
    expect = sorted(
        (r.url, r.status, r.retries)
        for r in crawldb_dump(db, regex=r"^http://a\.test/").collect())

    jd = str(tmp_path / "dump_json")
    dump_crawldb(db, jd, fmt="json", regex=r"^http://a\.test/")
    got_j = sorted((r.url, r.status, r.retries)
                   for r in spark.read.json(jd).collect())
    assert got_j == expect

    cd = str(tmp_path / "dump_csv")
    dump_crawldb(db, cd, fmt="csv", regex=r"^http://a\.test/")
    got_c = sorted(
        (r.url, r.status, int(r.retries))
        for r in spark.read.option("header", True).csv(cd).collect())
    assert got_c == expect
