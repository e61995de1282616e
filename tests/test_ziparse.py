"""parse-zip analog tests (ZipParser.java / ZipTextExtractor.java).

Codec tests are pure Python; the operator test drives the Arrow
mapInPandas path end-to-end on a grouped fixture.
"""

import pytest

from nutch_spark.functions import ziparse as Z


def test_encode_deterministic_and_roundtrip():
    entries = [("a.txt", b"hello"), ("sub/", b""),
               ("b.html", b'<a href="http://x.test/1">one</a>'),
               ("readme", b"skipped"), ("c.bin", b"\xff")]
    blob1 = Z.encode_zip(entries)
    blob2 = Z.encode_zip(entries)
    assert blob1 == blob2
    r = Z.parse_zip(blob1, "http://h.test/a.zip")
    assert r.status == "success"
    # entry order preserved; name + " " + text + " " concatenation
    # (ZipTextExtractor.java:106); readme (no '.'), sub/ (dir) and
    # c.bin (no parser) all skipped
    assert r.text == "a.txt hello b.html one "
    assert r.outlinks == [("http://x.test/1", "one")]
    assert r.title == ""


def test_truncation_gate():
    blob = Z.encode_zip([("a.txt", b"hello")])
    ok = Z.parse_zip(blob, "u", declared_len=len(blob))
    assert ok.status == "success"
    cut = Z.parse_zip(blob[:-3], "u", declared_len=len(blob))
    assert cut.status == "failed_truncated" and cut.text is None
    # without a declared length a short blob is a plain parse failure
    assert Z.parse_zip(blob[:-3], "u").status == "failed"
    assert Z.parse_zip(b"not a zip at all", "u").status == "failed"


def test_empty_archive_and_text_only():
    assert Z.parse_zip(Z.encode_zip([]), "u").text == ""
    r = Z.parse_zip(Z.encode_zip([("x.txt", b"a b"), ("y.txt", b"c")]),
                    "u")
    assert r.text == "x.txt a b y.txt c " and r.outlinks == []


def test_parse_zips_operator(spark):
    from nutch_spark.config import DEFAULT
    from nutch_spark.operators import archive

    ids = list(range(0, 24)) + list(range(104, 112))  # g 0,1,2 and 13
    docs = spark.createDataFrame([(i, f"text {i}") for i in ids],
                                 "doc_id long, text string")
    blobs = archive.make_zip_blobs(docs, group=8)
    rows = {r.url: r for r in archive.parse_zips(blobs, DEFAULT).collect()}
    assert len(rows) == 4  # g = 0, 1, 2, 13
    # g=0 and g=13 truncated (g % 13 == 0)
    assert rows["http://zips.test/z0.zip"].status == "failed_truncated"
    assert rows["http://zips.test/z13.zip"].status == "failed_truncated"
    assert rows["http://zips.test/z0.zip"].text is None
    g1 = rows["http://zips.test/z1.zip"]
    assert g1.status == "success"
    expect = "".join(f"p{i}.txt text {i} p{i}.html w{i} "
                     for i in range(8, 16))
    assert g1.text == expect
    assert [o.to_url for o in g1.outlinks] \
        == [f"http://l.test/{i}" for i in range(8, 16)]
    assert [o.anchor for o in g1.outlinks] \
        == [f"w{i}" for i in range(8, 16)]
    assert g1.title == ""
