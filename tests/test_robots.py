"""robots.txt evaluation tests (RobotRulesParser.java:101-129,
HttpRobotRulesParser.java:137-147, FetchItemQueue politeness inputs)."""

from nutch_spark.functions.robots import parse_robots


BODY = """
User-agent: *
Disallow: /private/
Allow: /private/open/
Crawl-delay: 2

User-agent: nutch-spark
Disallow: /nutch-only/
"""


def test_wildcard_group():
    r = parse_robots(BODY, agent="otherbot")
    assert r.is_allowed("/public/page.html")
    assert not r.is_allowed("/private/x")
    # longest match wins: Allow /private/open/ beats Disallow /private/
    assert r.is_allowed("/private/open/y")
    assert r.crawl_delay_ms == 2000


def test_agent_specific_group_preferred():
    r = parse_robots(BODY, agent="nutch-spark")
    assert not r.is_allowed("/nutch-only/z")
    # the * group's rules don't apply to the specific agent
    assert r.is_allowed("/private/x")
    assert r.crawl_delay_ms is None


def test_missing_body_allows_all():
    r = parse_robots(None, agent="x")
    assert r.is_allowed("/anything")


def test_403_semantics():
    # 403 -> allow-all iff http.robots.403.allow
    # (HttpRobotRulesParser.java:141-147)
    assert parse_robots(BODY, "x", fetch_code=403,
                        allow_403=True).is_allowed("/private/x")
    assert not parse_robots(BODY, "x", fetch_code=403,
                            allow_403=False).is_allowed("/ok")


def test_5xx_allows_all():
    assert parse_robots(BODY, "x", fetch_code=500).is_allowed("/private/x")


def test_empty_disallow_allows_all():
    r = parse_robots("User-agent: *\nDisallow:\n", agent="x")
    assert r.is_allowed("/anything")


def test_wildcard_and_anchor_paths():
    r = parse_robots(
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*\n", agent="x")
    assert not r.is_allowed("/docs/file.pdf")
    assert r.is_allowed("/docs/file.pdf.html")
    assert not r.is_allowed("/tmp/x")
    assert not r.is_allowed("/tmpfoo")


def test_multi_agent_group():
    body = "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
    assert not parse_robots(body, "a").is_allowed("/x/1")
    assert not parse_robots(body, "b").is_allowed("/x/1")
    assert parse_robots(body, "c").is_allowed("/x/1")
