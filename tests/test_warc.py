"""WARC codec + Spark ingester/sink round trips."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nutch_spark.functions import warc as W
from nutch_spark.operators import sources


RECS = [
    ("http://a.test/1", "2024-01-01T00:00:00Z", b"<html>one</html>"),
    ("http://b.test/2", "2024-02-03T04:05:06Z", b"\x00binary\xff body"),
    ("http://c.test/3", "2024-12-31T23:59:59Z", b""),
]


def test_warc_roundtrip_plain_and_gzip():
    for gz in (False, True):
        data = W.encode_warc(RECS, gzip_members=gz)
        got = list(W.iter_warc_records(data))
        assert len(got) == 3
        for rec, (url, date, body) in zip(got, RECS):
            assert rec["warc-target-uri"] == url
            assert rec["warc-date"] == date
            assert rec["warc-type"] == "response"
            status, payload = W.http_payload(rec)
            assert status == 200
            assert payload == body


def test_warc_golden_layout():
    raw = W.encode_warc_record("http://x.test/", "2024-01-01T00:00:00Z",
                               b"hi", http_status=404)
    assert raw.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    assert b"WARC-Target-URI: http://x.test/\r\n" in raw
    assert raw.endswith(b"hi\r\n\r\n")
    rec = next(W.iter_warc_records(raw))
    status, body = W.http_payload(rec)
    assert (status, body) == (404, b"hi")


def test_warc_binary_payload_with_fake_markers():
    # a payload containing WARC-like bytes must not confuse the
    # Content-Length-driven walk
    tricky = b"WARC/1.0\r\n\r\n fake " + b"\r\n\r\n" + b"x" * 10
    data = W.encode_warc([("http://t.test/", "2024-01-01T00:00:00Z",
                           tricky)] + RECS[:1])
    got = list(W.iter_warc_records(data))
    assert len(got) == 2
    assert W.http_payload(got[0])[1] == tricky


def test_split_gzip_members():
    import zlib
    members = []
    for chunk in (b"alpha", b"beta", b"gamma"):
        co = zlib.compressobj(wbits=31)
        members.append(co.compress(chunk) + co.flush())
    assert list(W.split_gzip_members(b"".join(members))) == \
        [b"alpha", b"beta", b"gamma"]


def test_warc_to_pages_spark(spark):
    blob1 = W.encode_warc(RECS[:2], gzip_members=True)
    blob2 = W.encode_warc(RECS[2:], gzip_members=False)
    df = spark.createDataFrame(
        [(0, bytearray(blob1)), (1, bytearray(blob2))],
        "blob_id long, content binary")
    out = {r.url: r for r in sources.warc_to_pages(df).collect()}
    assert len(out) == 3
    assert bytes(out["http://b.test/2"].html) == RECS[1][2]
    assert out["http://a.test/1"].http_status == 200
    assert str(out["http://b.test/2"].warc_ts).startswith("2024-02-03")


def test_pages_warc_roundtrip_spark(spark):
    from datetime import datetime
    pages = spark.createDataFrame(
        [(u, datetime.fromisoformat(d.replace("Z", "")), bytearray(b),
          "t", "en") for u, d, b in RECS],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    blobs = sources.pages_to_warc(pages, n_blobs=2)
    back = sources.warc_to_pages(blobs)
    got = {r.url: bytes(r.html) for r in back.collect()}
    assert got == {u: b for u, _, b in RECS}


def test_warc_non_ascii_url_roundtrip():
    # ISO 28500: WARC headers are UTF-8 — IRI target URIs must not
    # blow up the encoder (one bad URL used to fail the whole task)
    recs = [("http://bücher.test/straße?q=日本語",
             "2024-01-01T00:00:00Z", b"<html>x</html>")]
    for gz in (False, True):
        data = W.encode_warc(recs, gzip_members=gz)
        got = list(W.iter_warc_records(data))
        assert len(got) == 1
        assert got[0]["warc-target-uri"] == recs[0][0]
        status, payload = W.http_payload(got[0])
        assert status == 200 and payload == recs[0][2]
