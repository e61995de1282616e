"""Tool analogs: CleaningJob, DmozParser, FileDumper."""

from pyspark.sql import functions as F

from nutch_spark.functions import dmoz as D
from nutch_spark.operators import readers, sources


def test_cleaning_job(spark):
    """db_gone + db_duplicate rows become delete requests
    (CleaningJob.java:66-88)."""
    db = spark.createDataFrame(
        [("http://a.ex/", "db_fetched"),
         ("http://b.ex/", "db_gone"),
         ("http://c.ex/", "db_duplicate"),
         ("http://d.ex/", "db_unfetched")], "url string, status string")
    got = {r.url: r.reason for r in readers.cleaning_job(db).collect()}
    assert got == {"http://b.ex/": "gone", "http://c.ex/": "duplicate"}


def test_dmoz_codec_roundtrip():
    pages = [("Top/Arts", "http://a.ex/1", "T1", "D1"),
             ("Top/Arts", "http://a.ex/2", "T<2>", "D&2"),
             ("Top/Science", "http://c.ex/", "T4", "")]
    assert list(D.iter_dmoz_pages(D.encode_dmoz(pages))) == pages


def test_dmoz_subset_gate_matches_hadoop_hash():
    """abs(int32-BE of md5[0:4] ^ skew) % denom == 0
    (DmozParser.java:145-148, Hadoop MD5Hash.quarterDigest)."""
    import hashlib
    url = "http://a.ex/1"
    v = int.from_bytes(hashlib.md5(url.encode()).digest()[:4],
                       "big", signed=True)
    assert D.md5_quarter_hash(url) == v
    assert D.subset_keep(url, 1) is True
    assert D.subset_keep(url, 2) == (abs(v) % 2 == 0)
    # sampling rate ~ 1/denom
    n = sum(D.subset_keep(f"http://h{i}.ex/", 5) for i in range(5000))
    assert 700 < n < 1300


def test_dmoz_to_seeds_gates(spark):
    """Adult sections are dropped, topic regex filters, subset
    samples (DmozParser.java:129-151)."""
    pages = [("Top/Arts", "http://a.ex/1", "T1", "D1"),
             ("Top/Adult/X", "http://bad.ex/", "T2", "D2"),
             ("Top/Science/Bio", "http://c.ex/", "T3", "D3")]
    blob = D.encode_dmoz(pages).encode()
    blobs = spark.createDataFrame([(bytearray(blob),)], "content binary")
    got = {r.url: r.topic
           for r in sources.dmoz_to_seeds(blobs).collect()}
    assert got == {"http://a.ex/1": "Top/Arts",
                   "http://c.ex/": "Top/Science/Bio"}
    only_sci = sources.dmoz_to_seeds(
        blobs, topic_pattern=r"Top/Science.*").collect()
    assert [r.url for r in only_sci] == ["http://c.ex/"]
    adult = sources.dmoz_to_seeds(blobs, include_adult=True).count()
    assert adult == 3


def test_file_dumper_paths_and_stats(spark):
    """DumpFileUtil md5 naming (dir1=md5[0]+[8], dir2=md5[16]+[24],
    {md5}_{base}.{ext}, ext default html) + mime filter + -mimeStats
    (FileDumper.java:134-240, DumpFileUtil.java:40-85)."""
    import hashlib
    rows = [("http://a.ex/page", bytearray(b"<html>x</html>")),
            ("http://a.ex/img.png",
             bytearray(b"\x89PNG\r\n\x1a\nxxxx")),
            ("http://a.ex/note", bytearray(b"plain words"))]
    content = spark.createDataFrame(rows, "url string, html binary")
    out = {r.url: r for r in sources.file_dumper(content).collect()}
    md5 = hashlib.md5(b"http://a.ex/page").hexdigest()
    assert out["http://a.ex/page"].path == (
        f"{md5[0]}{md5[8]}/{md5[16]}{md5[24]}/{md5}_page.html")
    assert out["http://a.ex/page"].mime_type == "text/html"
    assert out["http://a.ex/img.png"].mime_type == "image/png"
    assert out["http://a.ex/img.png"].path.endswith("_img.png")
    assert out["http://a.ex/note"].mime_type == "text/plain"
    stats = {r.mime_type: r["count"] for r in sources.file_dumper(
        content, mime_stats=True).collect()}
    assert stats == {"text/html": 1, "image/png": 1, "text/plain": 1}
    filtered = sources.file_dumper(
        content, mime_types=["image/png"]).collect()
    assert [r.url for r in filtered] == ["http://a.ex/img.png"]
