"""parse-feed analog: codec round-trips + operator semantics.

Reference: src/plugin/feed — FeedParser.java (getParse/addToMap/
addFields/stripTags), TestFeedParser.java (asserts one parse row per
entry plus the feed row)."""

import pytest
from hypothesis import given, settings, strategies as st

from nutch_spark.functions import feedparse as FP


def _sample_feed():
    return FP.Feed(
        link="http://example.test/",
        title="Feed <i>0</i>",
        description="A feed & more",
        entries=[
            FP.FeedEntry(link="http://example.test/a",
                         title="Entry <b>1</b>", text="body <em>one</em>",
                         authors=["alice"], tags=["t1", "s2"],
                         published_ms=1704067200000,
                         updated_ms=1704070800000),
            FP.FeedEntry(link="http://example.test/b", title="two",
                         text="x & y < z", authors=[], tags=[],
                         published_ms=None, updated_ms=None),
        ])


def test_strip_tags_reference_semantics():
    # FeedParser.java:354-366: split on <[^>]*>, concatenate, trim
    assert FP.strip_tags("Entry <b>5</b>") == "Entry 5"
    assert FP.strip_tags("  plain  ") == "plain"
    assert FP.strip_tags(None) == ""
    assert FP.strip_tags("<p>a</p><p>b</p>") == "ab"


def test_rss_round_trip():
    f = _sample_feed()
    out = FP.parse_feed(FP.encode_rss(f))
    assert (out.link, out.title, out.description) == \
        (f.link, f.title, f.description)
    assert len(out.entries) == 2
    e = out.entries[0]
    assert (e.link, e.title, e.text) == \
        ("http://example.test/a", "Entry <b>1</b>", "body <em>one</em>")
    assert e.authors == ["alice"] and e.tags == ["t1", "s2"]
    assert e.published_ms == 1704067200000
    assert e.updated_ms is None  # RSS 2.0 items carry no updated date
    assert out.entries[1].text == "x & y < z"


def test_atom_round_trip():
    f = _sample_feed()
    out = FP.parse_feed(FP.encode_atom(f))
    assert (out.link, out.title, out.description) == \
        (f.link, f.title, f.description)
    e = out.entries[0]
    assert e.authors == ["alice"] and e.tags == ["t1", "s2"]
    assert e.published_ms == 1704067200000
    assert e.updated_ms == 1704070800000


def test_reference_rss_sample_parity():
    """The parse-tika feed sample (rsstest.rss, RSS 0.91 / ISO-8859-1):
    TestFeedParser.java:96-116 pins exactly two outlinks — the two item
    links (Tika ignores the channel URL/description)."""
    raw = open("/root/reference/src/plugin/parse-tika/sample/"
               "rsstest.rss", "rb").read()
    f = FP.parse_feed(raw)
    assert f.title == "TestChannel"
    assert [e.link for e in f.entries] == \
        ["http://www-scf.usc.edu/~mattmann/", "http://www.nutch.org/"]


def test_not_a_feed_raises():
    with pytest.raises(ValueError):
        FP.parse_feed(b"<html><body>nope</body></html>")
    with pytest.raises(ValueError):
        FP.parse_feed(b"\x00\x01 not xml")


_safe_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"),
                           blacklist_characters="\r"),
    max_size=80)


@settings(max_examples=60, deadline=None)
@given(title=_safe_text, text=_safe_text,
       author=_safe_text.filter(lambda s: s.strip()),
       tag=_safe_text.filter(lambda s: s.strip()),
       ms=st.integers(min_value=0, max_value=4102444800) .map(
           lambda s: s * 1000))
def test_codec_property_round_trip(title, text, author, tag, ms):
    """Any XML-legal field survives encode→parse in both formats
    (second-precision timestamps — both wire formats carry seconds)."""
    f = FP.Feed(link="http://h.test/", title=title, description=text,
                entries=[FP.FeedEntry(link="http://h.test/p", title=title,
                                      text=text, authors=[author],
                                      tags=[tag], published_ms=ms,
                                      updated_ms=ms)])
    for enc, has_updated in ((FP.encode_rss, False),
                             (FP.encode_atom, True)):
        out = FP.parse_feed(enc(f))
        assert out.title == title and out.description == text
        e = out.entries[0]
        assert e.text == text and e.authors == [author] \
            and e.tags == [tag]
        assert e.published_ms == ms
        assert e.updated_ms == (ms if has_updated else None)


# ---------------------------------------------------------------- operator

def test_parse_feeds_operator(spark):
    from nutch_spark.config import CrawlConfig
    from nutch_spark.operators import feed as feed_op

    cfg = CrawlConfig()
    # ids hitting every link branch: 11|0 (mailto drop), 13|0
    # (PHPSESSID strip), 17|0 (#frag strip), plain; two feed groups
    ids = [0, 11, 13, 17, 20, 21, 22, 23]
    docs = spark.createDataFrame([(i, f"text {i}") for i in ids],
                                 "doc_id long, text string")
    blobs = feed_op.make_feed_blobs(docs, group=16)
    fmts = {r.feed_url: r.fmt for r in blobs.collect()}
    assert fmts == {"http://feeds.test/feed0": "rss",
                    "http://feeds.test/feed1": "atom"}

    rows = feed_op.parse_feeds(blobs, cfg).collect()
    by_url = {(r.url, r.kind): r for r in rows}

    # 0, 11, 22 dropped (mailto → url-filter drop; %11 == 0)
    assert ("http://host11.test/p11", "entry") not in by_url
    assert not any(u.startswith("mailto:") for u, _ in by_url)
    # 13 → session id stripped; 17 → fragment stripped
    e13 = by_url[("http://host13.test/p13", "entry")]
    e17 = by_url[("http://host17.test/p17", "entry")]
    assert e13.title == "Entry 13" and e13.text == "text 13"
    # plain entry carries full addFields meta
    e20 = by_url[("http://host20.test/p20", "entry")]
    assert e20.feed == "http://host1.test/"  # g=1 → host1, normalized
    assert e20.authors == ["author6"]        # 20 % 7
    assert e20.tags == ["t0", "s2"]          # 20%5, 20%3
    assert e20.published == 1704067200000 + 20 * 1000
    assert e20.updated == e20.published + 3600000  # g=1 → atom
    # RSS group (g=0, even) has no updated date; atom group (g=1) does
    assert e13.updated is None
    assert e17.updated == e17.published + 3600000
    # one feed-level row per feed, url NOT normalized, stripTags'd
    f0 = by_url[("http://feeds.test/feed0", "feed")]
    f1 = by_url[("http://feeds.test/feed1", "feed")]
    assert f0.title == "Feed 0" and f0.text == "Syndication feed 0"
    assert f1.title == "Feed 1"
    assert f0.feed is None and f0.published is None
    # entry count: ids minus {0, 11, 22} (%11==0 -> mailto
    # drops), plus 2 feed rows
    assert len(rows) == (len(ids) - 3) + 2


def test_feed_index_docs(spark):
    from nutch_spark.config import CrawlConfig
    from nutch_spark.operators import feed as feed_op

    docs = spark.createDataFrame([(20, "t")], "doc_id long, text string")
    parsed = feed_op.parse_feeds(feed_op.make_feed_blobs(docs),
                                 CrawlConfig())
    idx = feed_op.feed_index_docs(
        parsed.where("kind = 'entry'")).collect()
    assert len(idx) == 1
    r = idx[0]
    assert r.author == ["author6"] and r.tag == ["t0", "s2"]
    assert r.publishedDate is not None and r.updatedDate is not None


def test_undecodable_blob_yields_no_rows(spark):
    from nutch_spark.config import CrawlConfig
    from nutch_spark.operators import feed as feed_op

    blobs = spark.createDataFrame(
        [("http://feeds.test/bad", "rss", b"<html>not a feed</html>")],
        "feed_url string, fmt string, content binary")
    assert feed_op.parse_feeds(blobs, CrawlConfig()).count() == 0
