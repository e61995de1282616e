"""Optional URL-normalizer plugins — the reference plugins' own test
vectors (TestQuerystringURLNormalizer.java, TestSlashURLNormalizer.java
+ data/slashes.txt, TestHostURLNormalizer.java + data/hosts.txt,
TestAjaxURLNormalizer.java), plus scope-chain composition
(URLNormalizers.java:96-170)."""

import pytest

from nutch_spark.functions.normalizers import (
    make_normalizer, normalize_ajax, normalize_host,
    normalize_querystring, normalize_slash,
)

# data/slashes.txt: prefer slashes on .org, none on .net
SLASH_RULES = {"www.example.org": True, "www.example.net": False}

# data/hosts.txt
HOST_RULES = {"*.example.com": "example.com",
              "www.example.net": "example.net",
              "example.org": "www.example.org"}


QS_VECTORS = [
    ("http://example.com/?c=d&a=b", "http://example.com/?a=b&c=d"),
    ("http://example.com/a/b/c", "http://example.com/a/b/c"),
    ("http://example.com:1234/a/b/c", "http://example.com:1234/a/b/c"),
    ("http://example.com:1234/a/b/c#ref",
     "http://example.com:1234/a/b/c#ref"),
    ("http://example.com:1234/a/b/c?c=d&a=b#ref",
     "http://example.com:1234/a/b/c?a=b&c=d#ref"),
    ("http://example.com/?c=d&a=b&a=c", "http://example.com/?a=b&a=c&c=d"),
]


@pytest.mark.parametrize("url,expected", QS_VECTORS)
def test_querystring(url, expected):
    assert normalize_querystring(url) == expected


SLASH_VECTORS = [
    ("http://example.org/", "http://example.org/"),
    ("http://example.net/", "http://example.net/"),
    ("http://example.org", "http://example.org"),      # base untouched
    ("http://www.example.org/page", "http://www.example.org/page/"),
    ("http://www.example.net/path/to/something/",
     "http://www.example.net/path/to/something"),
    ("http://example.org/buh/", "http://example.org/buh/"),
    ("http://example.net/blaat", "http://example.net/blaat"),
    ("http://example.nl/buh/", "http://example.nl/buh/"),
    ("http://example.de/blaat", "http://example.de/blaat"),
    ("http://www.example.org/page?a=b&c=d",
     "http://www.example.org/page/?a=b&c=d"),
    ("http://www.example.net/path/to/something/?a=b&c=d",
     "http://www.example.net/path/to/something?a=b&c=d"),
    ("http://www.example.org/noise.mp3",
     "http://www.example.org/noise.mp3"),
    ("http://www.example.org/page.html",
     "http://www.example.org/page.html"),
    ("http://www.example.org/page.shtml",
     "http://www.example.org/page.shtml"),
    ("http://www.example.org/this.is.not.an_extension",
     "http://www.example.org/this.is.not.an_extension/"),
]


@pytest.mark.parametrize("url,expected", SLASH_VECTORS)
def test_slash(url, expected):
    assert normalize_slash(url, SLASH_RULES) == expected


HOST_VECTORS = [
    ("http://example.org/page.html", "http://www.example.org/page.html"),
    ("http://www.example.net/path/to/something.html",
     "http://example.net/path/to/something.html"),
    ("http://example.com/?does=it&still=work",
     "http://example.com/?does=it&still=work"),
    ("http://http.www.example.com/buh", "http://example.com/buh"),
    ("http://whatever.example.com/blaat", "http://example.com/blaat"),
]


@pytest.mark.parametrize("url,expected", HOST_VECTORS)
def test_host(url, expected):
    assert normalize_host(url, HOST_RULES) == expected


AJAX_VECTORS_DEFAULT = [
    ("http://example.org/#!k=v", "http://example.org/?_escaped_fragment_=k=v"),
    ("http://example.org/#!k=v&something=is wrong",
     "http://example.org/?_escaped_fragment_=k=v%26something=is%20wrong"),
    ("http://example.org/path.html?queryparam=queryvalue"
     "#!key1=value1&key2=value2",
     "http://example.org/path.html?queryparam=queryvalue"
     "&_escaped_fragment_=key1=value1%26key2=value2"),
]

AJAX_VECTORS_INDEXER = [
    ("http://example.org/?_escaped_fragment_=key=value",
     "http://example.org/#!key=value"),
    ("http://example.org/?key=value&_escaped_fragment_=key=value",
     "http://example.org/?key=value#!key=value"),
    ("http://example.org/page.html?key=value&_escaped_fragment_="
     "key=value%26something=is%20wrong",
     "http://example.org/page.html?key=value#!key=value&something=is wrong"),
]


@pytest.mark.parametrize("url,expected", AJAX_VECTORS_DEFAULT)
def test_ajax_default_scope(url, expected):
    assert normalize_ajax(url) == expected


@pytest.mark.parametrize("url,expected", AJAX_VECTORS_INDEXER)
def test_ajax_indexer_scope(url, expected):
    assert normalize_ajax(url, scope="indexer") == expected


def test_scope_chain_composition():
    """urlnormalizer.order per scope: an outlink-scope chain with
    querystring+slash behaves differently from the default chain."""
    default = make_normalizer()
    assert default("http://A.ex:80/p") == "http://a.ex/p"
    outlink = make_normalizer(
        ("basic", "regex", "querystring", "slash"),
        scope="outlink", slash_rules=SLASH_RULES)
    assert outlink("http://www.Example.org/page?c=d&a=b") == \
        "http://www.example.org/page/?a=b&c=d"


def test_scope_regex_rules_override():
    """RegexURLNormalizer per-scope rule files: the crawldb scope gets
    its own rule set while default keeps the template rules."""
    scope_rules = {"crawldb": ((r"[?].*$", ""),)}  # strip whole query
    crawldb = make_normalizer(("basic", "regex"), scope="crawldb",
                              scope_regex_rules=scope_rules)
    assert crawldb("http://a.ex/p?x=1&sid=2") == "http://a.ex/p"
    default = make_normalizer(("basic", "regex"),
                              scope_regex_rules=scope_rules)
    assert default("http://a.ex/p?x=1") == "http://a.ex/p?x=1"


def test_unknown_normalizer_rejected():
    with pytest.raises(ValueError):
        make_normalizer(("nope",))
