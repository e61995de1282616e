"""Indexing-filter plugin chain (src/plugin/index-* analogs)."""

import pytest
from pyspark.sql import Row, functions as F

from nutch_spark.config import DEFAULT
from nutch_spark.operators.indexing_filters import (
    apply_indexing_filters, index_anchor, index_basic, index_more,
    index_metadata, index_static, index_tld, mimetype_filter,
    subcollection,
)


def _doc(spark, rows):
    return spark.createDataFrame(
        rows, "url string, title string, text string, "
              "anchors array<string>, fetched_at long, "
              "metadata map<string,string>")


@pytest.fixture()
def doc(spark):
    return _doc(spark, [
        ("http://a.example.com/x", "T" * 150, "body " * 50, ["Home", "home", "Docs", None],
         1_700_000_000_000,
         {"Content-Type": "Text/HTML; charset=utf-8",
          "Content-Length": " 1234 ",
          "Last-Modified": "1600000000000"}),
        ("http://b.example.co.uk/y", None, "short", None,
         1_700_000_100_000,
         {"Content-Type": "application/pdf",
          "Content-Disposition": 'inline; filename="report.pdf"'}),
        ("http://c.other.org/z", "t", "zz", [], 1_700_000_200_000, None),
    ])


def test_index_basic_truncation(doc):
    cfg = DEFAULT.with_(indexer_max_title_length=100,
                        indexer_max_content_length=10)
    out = {r.url: r for r in index_basic(doc, cfg).collect()}
    assert len(out["http://a.example.com/x"].title) == 100
    assert out["http://a.example.com/x"].text == "body body "
    assert out["http://b.example.co.uk/y"].title is None


def test_index_anchor_dedup_keeps_first_original_case(doc):
    cfg = DEFAULT.with_(anchor_deduplicate=True)
    out = {r.url: r for r in index_anchor(doc, cfg).collect()}
    # "home" dropped (lowercase dup of "Home"), None dropped, order kept
    assert out["http://a.example.com/x"].anchors == ["Home", "Docs"]
    assert out["http://b.example.co.uk/y"].anchors is None
    assert out["http://c.other.org/z"].anchors == []


def test_index_more_fields(doc):
    out = {r.url: r for r in index_more(doc, DEFAULT).collect()}
    a = out["http://a.example.com/x"]
    # mime cleaned: params stripped, lowercased; parts split
    assert a.type == "text/html"
    assert (a.primary_type, a.sub_type) == ("text", "html")
    assert a.content_length == 1234  # NUTCH-1010 trim
    assert a.last_modified is not None
    assert a.date == a.last_modified  # last-modified wins
    b = out["http://b.example.co.uk/y"]
    # no Last-Modified -> date falls back to fetch time
    assert b.last_modified is None and b.date is not None
    # Content-Disposition resets a missing title
    assert b.title == "report.pdf"
    c = out["http://c.other.org/z"]
    assert c.type is None and c.content_length is None
    assert c.title == "t"  # existing title never reset


def test_index_more_no_parts(doc):
    cfg = DEFAULT.with_(more_index_mime_parts=False)
    cols = index_more(doc, cfg).columns
    assert "primary_type" not in cols and "sub_type" not in cols


def test_index_metadata_and_static(doc):
    cfg = DEFAULT.with_(
        index_parse_md=("Content-Type",),
        index_static=(("source", "webcrawl"),
                      ("tags", ("a", "b"))))
    out = index_static(index_metadata(doc, cfg), cfg)
    r = {x.url: x for x in out.collect()}
    assert r["http://a.example.com/x"]["content-type"] \
        == "Text/HTML; charset=utf-8"
    assert r["http://c.other.org/z"]["content-type"] is None
    assert r["http://a.example.com/x"].source == "webcrawl"
    assert r["http://a.example.com/x"].tags == ["a", "b"]


def test_index_tld(doc):
    out = {r.url: r.tld for r in index_tld(doc, DEFAULT).collect()}
    assert out["http://a.example.com/x"] == "com"
    assert out["http://b.example.co.uk/y"] == "co.uk"  # multi-label
    assert out["http://c.other.org/z"] == "org"


def test_mimetype_filter_accept_and_reject(doc):
    typed = index_more(doc, DEFAULT)
    acc = DEFAULT.with_(mimetype_filter_prefixes=("text/",),
                        mimetype_filter_mode="accept")
    kept = [r.url for r in mimetype_filter(typed, acc).collect()]
    # null-type doc matches nothing -> dropped in accept mode
    assert kept == ["http://a.example.com/x"]
    rej = acc.with_(mimetype_filter_mode="reject")
    kept = sorted(r.url for r in mimetype_filter(typed, rej).collect())
    assert kept == ["http://b.example.co.uk/y", "http://c.other.org/z"]


def test_subcollection_blacklist_wins(doc):
    cfg = DEFAULT.with_(subcollections=(
        ("examples", ("example",), ("co.uk",)),
        ("all", ("http://",), ()),
    ))
    out = {r.url: r.subcollection
           for r in subcollection(doc, cfg).collect()}
    assert out["http://a.example.com/x"] == ["examples", "all"]
    assert out["http://b.example.co.uk/y"] == ["all"]  # blacklisted
    assert out["http://c.other.org/z"] == ["all"]


def test_apply_chain_order_and_unknown(doc):
    cfg = DEFAULT.with_(
        indexing_filters=("more", "mimetype", "tld"),
        mimetype_filter_prefixes=("application/",))
    out = apply_indexing_filters(doc, cfg)
    rows = out.collect()
    assert [r.url for r in rows] == ["http://b.example.co.uk/y"]
    assert rows[0].tld == "co.uk"
    with pytest.raises(ValueError, match="unknown indexing filter"):
        apply_indexing_filters(doc, cfg.with_(indexing_filters=("nope",)))


def test_chain_is_single_codegen_stage(doc):
    """The whole non-UDF plugin chain must stay one projection — no
    exchanges, no extra stages (scale: this runs over every indexed
    document)."""
    cfg = DEFAULT.with_(
        indexing_filters=("basic", "anchor", "more", "metadata",
                          "static", "mimetype", "subcollection"),
        anchor_deduplicate=True,
        index_parse_md=("Content-Type",),
        index_static=(("source", "webcrawl"),),
        mimetype_filter_prefixes=("text/", "application/"),
        subcollections=(("e", ("example",), ()),))
    plan = apply_indexing_filters(doc, cfg)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_index_geoip_range_lookup(spark):
    from nutch_spark.operators.indexing_filters import index_geoip
    ranges = (
        # spans two /16 buckets — the explode must cover both
        ("10.0.0.0", "10.1.255.255", "Alpha", "AA", "Alphaland",
         1.5, -2.25, "UTC", "11111", "EU"),
        ("192.168.5.0", "192.168.5.255", "Beta", "BB", "Betania",
         None, None, "America/Beta", None, "NA"),
    )
    doc = spark.createDataFrame(
        [("http://a.test/", {"_ip_": "10.0.3.7"}),
         ("http://b.test/", {"_ip_": "10.1.200.1"}),
         ("http://c.test/", {"_ip_": "192.168.5.77"}),
         ("http://d.test/", {"_ip_": "172.16.0.1"}),   # uncovered
         ("http://e.test/", {"_ip_": "999.1.2.3"}),    # malformed
         ("http://f.test/", None)],                    # no metadata
        "url string, metadata map<string,string>")
    cfg = DEFAULT.with_(indexing_filters=("geoip",),
                        store_ip_address=True, geoip_ranges=ranges)
    out = {r.url: r for r in
           apply_indexing_filters(doc, cfg).collect()}
    assert out["http://a.test/"].city_name == "Alpha"
    assert out["http://a.test/"].lat_lon == "1.5,-2.25"
    assert out["http://b.test/"].city_name == "Alpha"  # 2nd bucket
    assert out["http://c.test/"].country_iso == "BB"
    assert out["http://c.test/"].lat_lon is None
    assert out["http://c.test/"].time_zone == "America/Beta"
    for u in ("http://d.test/", "http://e.test/", "http://f.test/"):
        assert out[u].city_name is None
    assert out["http://d.test/"].ip == "172.16.0.1"
    assert out["http://f.test/"].ip is None
    # store.ip.address off -> a no-op, like the reference's gate
    off = apply_indexing_filters(doc, cfg.with_(store_ip_address=False))
    assert "ip" not in off.columns


def test_index_geoip_is_broadcast_hash_join(spark):
    from nutch_spark.operators.indexing_filters import index_geoip
    cfg = DEFAULT.with_(store_ip_address=True, geoip_ranges=(
        ("10.0.0.0", "10.0.0.255", "X", "XX", "Xland",
         0.0, 0.0, "UTC", "1", "EU"),))
    doc = spark.createDataFrame(
        [("u", {"_ip_": "10.0.0.1"})],
        "url string, metadata map<string,string>")
    plan = index_geoip(doc, cfg)._jdf.queryExecution() \
        .executedPlan().toString()
    # equi-join on the /16 bucket, never a nested-loop range scan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_index_replace_scoped_ordered(spark):
    """index-replace (ReplaceIndexer.java): hostmatch/urlmatch scope
    the following replacements; rules apply in order; missing fields
    and null values are skipped."""
    from nutch_spark.operators.indexing_filters import index_replace

    docs = spark.createDataFrame(
        [("http://a.com/x", "Hello World", None),
         ("http://b.org/y", "Hello Blob", "k")],
        "url string, title string, keywords string")
    out = {r.url: r for r in index_replace(docs, [
        ("hostmatch", r".*\.com", [("title", "Hello", "Howdy")]),
        (None, None, [("title", "o", "0")]),
        ("urlmatch", r".*zzz", [("keywords", ".*", "never")]),
        (None, None, [("missing_field", "x", "y")]),
    ]).collect()}
    assert out["http://a.com/x"].title == "H0wdy W0rld"
    assert out["http://b.org/y"].title == "Hell0 Bl0b"
    assert out["http://a.com/x"].keywords is None
    assert out["http://b.org/y"].keywords == "k"
