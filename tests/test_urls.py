"""URL canonicalization parity tests.

Vectors ported from the reference:
  * TestBasicURLNormalizer.java:38-98 (exact list)
  * regex-normalize.xml.template rules
  * Generator.HashComparator (Generator.java:407-415)
  * URLUtil.chooseRepr cases (URLUtil.java:349-373 comment table)
"""

import pytest

from nutch_spark.functions.urls import (
    canonicalize,
    choose_repr,
    get_domain,
    get_host,
    normalize_basic,
    normalize_regex,
    queue_id,
    url_hash31,
)

BASIC_VECTORS = [
    (" http://foo.com/ ", "http://foo.com/"),
    ("HTTP://foo.com/", "http://foo.com/"),
    ("http://Foo.Com/index.html", "http://foo.com/index.html"),
    ("http://foo.com:80/index.html", "http://foo.com/index.html"),
    ("http://foo.com:81/", "http://foo.com:81/"),
    ("http://foo.com", "http://foo.com/"),
    ("http://foo.com/foo.html#ref", "http://foo.com/foo.html"),
    ("http://foo.com/aa/./foo.html", "http://foo.com/aa/foo.html"),
    ("http://foo.com/aa/../", "http://foo.com/"),
    ("http://foo.com/aa/bb/../", "http://foo.com/aa/"),
    ("http://foo.com/aa/..", "http://foo.com/"),
    ("http://foo.com/aa/bb/cc/../../foo.html", "http://foo.com/aa/foo.html"),
    ("http://foo.com/aa/bb/../cc/dd/../ee/foo.html",
     "http://foo.com/aa/cc/ee/foo.html"),
    ("http://foo.com/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/../../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/../aa/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/aa/../../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/aa/../bb/../foo.html/../../", "http://foo.com/"),
    ("http://foo.com/../aa/foo.html", "http://foo.com/aa/foo.html"),
    ("http://foo.com/../aa/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/a..a/foo.html", "http://foo.com/a..a/foo.html"),
    ("http://foo.com/a..a/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com/foo.foo/../foo.html", "http://foo.com/foo.html"),
    ("http://foo.com//aa/bb/foo.html", "http://foo.com/aa/bb/foo.html"),
    ("http://foo.com/aa//bb/foo.html", "http://foo.com/aa/bb/foo.html"),
    ("http://foo.com/aa/bb//foo.html", "http://foo.com/aa/bb/foo.html"),
    ("http://foo.com//aa//bb//foo.html", "http://foo.com/aa/bb/foo.html"),
    ("http://foo.com////aa////bb////foo.html",
     "http://foo.com/aa/bb/foo.html"),
    ("http://foo.com/aa?referer=http://bar.com",
     "http://foo.com/aa?referer=http://bar.com"),
]


@pytest.mark.parametrize("weird,normal", BASIC_VECTORS)
def test_basic_normalizer(weird, normal):
    assert normalize_basic(weird) == normal


REGEX_VECTORS = [
    # session id stripping
    ("http://foo.com/foo.php?PHPSESSID=cdc993a493e899bed04f4d0c8a462a03",
     "http://foo.com/foo.php"),
    ("http://foo.com/foo.php?id=2&PHPSESSID=cdc993a&q=3",
     "http://foo.com/foo.php?id=2&q=3"),
    # interpage anchors
    ("http://foo.com/foo.html#anchor", "http://foo.com/foo.html"),
    # ?& cleanup
    ("http://foo.com/foo.php?&q=3", "http://foo.com/foo.php?q=3"),
    # multiple ampersands
    ("http://foo.com/foo.php?a=1&&&b=2", "http://foo.com/foo.php?a=1&b=2"),
    # trailing ?
    ("http://foo.com/foo.php?", "http://foo.com/foo.php"),
    # duplicate slashes, protocol preserved
    ("http://foo.com//path//page.html", "http://foo.com/path/page.html"),
]


@pytest.mark.parametrize("weird,normal", REGEX_VECTORS)
def test_regex_normalizer(weird, normal):
    assert normalize_regex(weird) == normal


def test_canonicalize_chain():
    assert canonicalize(" HTTP://Foo.Com:80//a/./b.html#x ") == \
        "http://foo.com/a/b.html"
    assert canonicalize("not a url") is None


def test_url_hash31_matches_java():
    # reference algorithm computed by hand for "ab":
    # bytes a=97 b=98; from last: h=1*31+98=129; h=129*31+97=4096
    assert url_hash31("ab") == 4096
    # int32 wraparound on a long URL must stay in int32 range
    h = url_hash31("http://example.com/" + "x" * 500)
    assert -(2 ** 31) <= h < 2 ** 31


def test_host_domain_queue():
    assert get_host("http://WWW.Example.COM/a") == "www.example.com"
    assert get_domain("http://lucene.apache.org/") == "apache.org"
    assert get_domain("http://www.example.co.uk/x") == "example.co.uk"
    assert get_domain("http://127.0.0.1/x") == "127.0.0.1"
    assert queue_id("https://A.B.com:8080/x") == "https://a.b.com"
    assert queue_id("http://a.news.example.com/x", "byDomain") == \
        "http://example.com"


# the reference's own getDomainName vectors (TestURLUtil.java:28-76),
# full domain-suffixes table loaded
GET_DOMAIN_VECTORS = [
    ("http://lucene.apache.org/nutch", "apache.org"),
    ("http://en.wikipedia.org/wiki/Java_coffee", "wikipedia.org"),
    ("http://140.211.11.130/foundation/contributing.html",
     "140.211.11.130"),
    ("http://www.example.co.uk:8080/index.html", "example.co.uk"),
    ("http://com", "com"),
    ("http://www.example.co.uk.com", "uk.com"),
    ("http://example.com.nn", "nn"),           # nn is not a tld
    ("http://www.edu.tr.xyz", "xyz"),
    ("http://www.example.c.se", "example.c.se"),
    ("http://www.example.plc.co.im", "example.plc.co.im"),
    ("http://www.example.2000.hu", "example.2000.hu"),
    ("http://www.example.商業.tw", "example.商業.tw"),
]

# getDomainSuffix vectors (TestURLUtil.java:78-120)
GET_SUFFIX_VECTORS = [
    ("http://lucene.apache.org/nutch", "org"),
    ("http://140.211.11.130/foundation/contributing.html", None),
    ("http://www.example.co.uk:8080/index.html", "co.uk"),
    ("http://com", "com"),
    ("http://www.example.co.uk.com", "com"),
    ("http://example.com.nn", None),
    ("http://www.edu.tr.xyz", None),
    ("http://subdomain.example.edu.tr", "edu.tr"),
    ("http://subdomain.example.presse.fr", "presse.fr"),
    ("http://subdomain.example.presse.tr", "tr"),
    ("http://www.example.plc.co.im", "plc.co.im"),
    ("http://www.example.2000.hu", "2000.hu"),
]


@pytest.mark.parametrize("url,expected", GET_DOMAIN_VECTORS)
def test_get_domain_reference_vectors(url, expected):
    assert get_domain(url) == expected


@pytest.mark.parametrize("url,expected", GET_SUFFIX_VECTORS)
def test_get_domain_suffix_reference_vectors(url, expected):
    from nutch_spark.functions.urls import get_domain_suffix
    assert get_domain_suffix(url) == expected


# chooseRepr cases from the URLUtil.java:349-373 comment table
CHOOSE_REPR_CASES = [
    # 1) different domain -> dst (temp or perm)
    ("http://a.com/", "http://b.com/page.html", False, "dst"),
    ("http://a.com/", "http://b.com/page.html", True, "dst"),
    # 2) permanent and root -> src
    ("http://a.com/", "http://a.com/xyz/index.html", False, "src"),
    # 3) permanent, src not root, dst root -> dst
    ("http://a.com/xyz/index.html", "http://a.com/", False, "dst"),
    # 4) permanent, neither root -> dst
    ("http://a.com/xyz/index.html", "http://a.com/abc/page.html", False,
     "dst"),
    # 5) temp, src root, dst not root -> src
    ("http://a.com/", "http://a.com/xyz/index.html", True, "src"),
    # 7) temp, src not root, dst root -> dst
    ("http://a.com/xyz/index.html", "http://a.com/", True, "dst"),
    # 8) temp, neither root, same host -> shortest path
    ("http://a.com/xyz/deep/index.html", "http://a.com/abc.html", True,
     "dst"),
    # 9) temp, both root, different subdomains -> shortest host
    ("http://www.news.a.com/", "http://www.a.com/", True, "dst"),
    ("http://www.a.com/", "http://www.news.a.com/", True, "src"),
]


@pytest.mark.parametrize("src,dst,temp,winner", CHOOSE_REPR_CASES)
def test_choose_repr(src, dst, temp, winner):
    expected = src if winner == "src" else dst
    assert choose_repr(src, dst, temp) == expected
