"""parse-ext analog: external-command parsing (ExtParser.java), the
reference's own cat/md5sum test scenario (TestExtParser.java:42-129)
plus the plugin's gate semantics."""

import hashlib

from pyspark.sql import functions as F

from nutch_spark.config import CrawlConfig
from nutch_spark.operators.extparse import parse_ext

TEXT = "nutch rocks nutch rocks nutch rocks"

# sh -c 'script' -- form so the appended content type lands in $0 /
# the -- sentinel and the tool never sees it
CMDS = {
    "application/vnd.nutch.example.cat":
        (["sh", "-c", "cat"], 10, "utf-8"),
    "application/vnd.nutch.example.md5sum":
        (["sh", "-c", "md5sum"], 10, "utf-8"),
}


def _blobs(spark, rows):
    return spark.createDataFrame(
        rows, "url string, content binary, mime_type string, "
              "content_length long")


def test_cat_and_md5sum_alternately(spark):
    """TestExtParser.java:112-127: the same content through 'cat'
    yields the text verbatim, through 'md5sum' a text starting with
    the hex digest."""
    raw = TEXT.encode()
    rows = []
    for i in range(4):
        mime = ("application/vnd.nutch.example.cat" if i % 2 == 0
                else "application/vnd.nutch.example.md5sum")
        rows.append((f"http://e.test/{i}", bytearray(raw), mime,
                     len(raw)))
    out = {r["url"]: r for r in
           parse_ext(_blobs(spark, rows), CrawlConfig(), CMDS).collect()}
    digest = hashlib.md5(raw).hexdigest()
    for i in range(4):
        r = out[f"http://e.test/{i}"]
        assert r["status"] == "success" and r["title"] == ""
        if i % 2 == 0:
            assert r["text"] == TEXT
        else:
            assert r["text"].startswith(digest)


def test_gates(spark):
    raw = b"see http://l.test/x here"
    rows = [
        # truncated: declared length != actual (ExtParser.java:94-101)
        ("http://e.test/t", bytearray(raw),
         "application/vnd.nutch.example.cat", len(raw) + 5),
        # no command registered (ExtParser.java:74-77)
        ("http://e.test/n", bytearray(raw), "application/unknown",
         len(raw)),
        # non-zero exit (ExtParser.java:118-121)
        ("http://e.test/f", bytearray(raw), "application/fails",
         len(raw)),
        # success with the free-text URL sweep (ExtParser.java:135-138)
        ("http://e.test/s", bytearray(raw),
         "application/vnd.nutch.example.cat", len(raw)),
    ]
    cmds = dict(CMDS)
    cmds["application/fails"] = (["sh", "-c", "exit 3"], 10, "utf-8")
    out = {r["url"]: r for r in
           parse_ext(_blobs(spark, rows), CrawlConfig(), cmds).collect()}
    assert out["http://e.test/t"]["status"] == "failed_truncated"
    assert out["http://e.test/n"]["status"] == "failed_no_command"
    assert out["http://e.test/f"]["status"] == "failed"
    s = out["http://e.test/s"]
    assert s["status"] == "success"
    assert [o["to_url"] for o in s["outlinks"]] == ["http://l.test/x"]
    assert all(o["anchor"] == "" for o in s["outlinks"])


def test_timeout_fails(spark):
    rows = [("http://e.test/slow", bytearray(b"x"),
             "application/slow", 1)]
    cmds = {"application/slow": (["sh", "-c", "sleep 5"], 1, "utf-8")}
    out = parse_ext(_blobs(spark, rows), CrawlConfig(), cmds).collect()
    assert out[0]["status"] == "failed"
