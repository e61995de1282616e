"""parse-swf analog: golden parity against the reference's sample
movies, builder round-trips, and the Spark operator contract."""

import os
import re

import pytest
from pyspark.sql import functions as F

from nutch_spark.config import CrawlConfig
from nutch_spark.functions.swfparse import (SwfError, build_swf,
                                            extract_free_text_urls,
                                            swf_extract)

SAMPLES = "/root/reference/src/plugin/parse-swf/sample"


def _norm(s: str) -> str:
    # TestSWFParser.java:68-70 whitespace normalization
    return re.sub(r"[ \t\r\n]+", " ", s).strip()


@pytest.mark.parametrize("name", ["test1", "test2", "test3"])
def test_golden_sample_parity(name):
    """Extracted text equals the reference plugin's published expected
    output for its own sample movies (TestSWFParser.java:52-71)."""
    if not os.path.isdir(SAMPLES):
        pytest.skip("reference samples not available")
    with open(f"{SAMPLES}/{name}.swf", "rb") as f:
        data = f.read()
    with open(f"{SAMPLES}/{name}.txt", encoding="utf-8") as f:
        expected = _norm(f.read())
    assert _norm(swf_extract(data)["text"]) == expected


def test_builder_roundtrip_uncompressed():
    b = build_swf(edit_texts=["Hello World", "second"],
                  pool_strings=["beta", "alpha"],
                  get_urls=["http://ex.test/a"])
    r = swf_extract(b)
    # edit texts in order, then sorted surviving pool strings
    assert r["text"] == "Hello World second\n--------\nalpha\nbeta"
    assert r["urls"] == ["http://ex.test/a"]


def test_builder_roundtrip_compressed():
    b = build_swf(edit_texts=["zipped body"], compressed=True)
    assert b[:3] == b"CWS"
    assert swf_extract(b)["text"] == "zipped body"


def test_free_text_url_sweep():
    b = build_swf(edit_texts=["see http://t.test/page now"])
    r = swf_extract(b)
    assert r["urls"] == ["http://t.test/page"]
    # OutlinkExtractor pattern: scheme required, mailto matches too
    assert extract_free_text_urls("a mailto:x@y.test b") == \
        ["mailto:x@y.test"]
    assert extract_free_text_urls("no urls here") == []


def test_geturl_before_sweep_order():
    b = build_swf(edit_texts=["at http://s.test/x"],
                  get_urls=["http://g.test/1", "http://g.test/2"])
    assert swf_extract(b)["urls"] == [
        "http://g.test/1", "http://g.test/2", "http://s.test/x"]


def test_malformed_raises():
    with pytest.raises(SwfError):
        swf_extract(b"GIF89a not a flash movie")
    with pytest.raises(SwfError):
        swf_extract(b"CWS\x06\x00\x00\x00\x00corrupt-zlib")


def test_parse_swfs_operator(spark):
    from nutch_spark.operators.swf import make_swf_blobs, parse_swfs

    docs = spark.range(26).select(F.col("id").alias("doc_id"))
    blobs = make_swf_blobs(docs)
    out = parse_swfs(blobs, CrawlConfig()).orderBy("url").collect()
    assert len(out) == 26
    by_url = {r["url"]: r for r in out}

    r1 = by_url["http://swf.test/m1.swf"]
    assert r1["status"] == "success" and r1["title"] == ""
    assert r1["text"] == ("Doc 1 see http://t.test/d1 body 1"
                          "\n--------\nkw1\ntag1")
    assert [o["to_url"] for o in r1["outlinks"]] == [
        "http://l.test/1", "http://t.test/d1"]
    assert all(o["anchor"] == "" for o in r1["outlinks"])

    # i % 13 == 0 -> declared length mismatch -> truncated, no parse
    for i in (0, 13):
        r = by_url[f"http://swf.test/m{i}.swf"]
        assert r["status"] == "failed_truncated"
        assert r["text"] == "" and r["outlinks"] == []

    # i % 11 == 0 and not truncated -> mailto getURL included
    r22 = by_url["http://swf.test/m22.swf"]
    assert [o["to_url"] for o in r22["outlinks"]] == [
        "http://l.test/22", "mailto:x@y.test", "http://t.test/d22"]


def test_dispatch_routes_swf(spark):
    from nutch_spark.operators.parse import parse_dispatch

    blob = build_swf(edit_texts=["flash text"])
    content = spark.createDataFrame(
        [("http://a.test/m.swf", bytearray(blob),
          "application/x-shockwave-flash"),
         ("http://a.test/p.html", bytearray(b"<html><title>T</title>"
                                            b"<body>hi</body></html>"),
          "text/html")],
        "url string, html binary, mime_type string")
    rows = {r["url"]: r
            for r in parse_dispatch(content, CrawlConfig(), 0).collect()}
    assert rows["http://a.test/m.swf"]["parser"] == "parse-swf"
    assert rows["http://a.test/m.swf"]["text"] == "flash text"
    assert rows["http://a.test/p.html"]["parser"] == "parse-html"
