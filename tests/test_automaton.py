"""urlfilter-automaton analog: brics-syntax DFA filter.

Reference: AutomatonURLFilter.java:80-105 (full-string RunAutomaton
acceptance per ±rule, first match wins), TestAutomatonURLFilter.java
(sample rule files + url/verdict vectors under
src/plugin/urlfilter-automaton/sample/ — embedded below, Apache-2.0
test data, attributed)."""

import random
import re

import numpy as np
import pytest

from nutch_spark.functions.automaton import (
    AutomatonURLFilter,
    RuleSetAutomaton,
    _interval_ast,  # noqa: F401 — exercised via <n-m> patterns
)

# --- reference sample vectors (urlfilter-automaton/sample/*.rules/.urls) ---

WHOLE_WEB_RULES = [
    "-(file|ftp|mailto):.*",
    "-.*\\.(gif|GIF|jpg|JPG|ico|ICO|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm"
    "|tgz|mov|MOV|exe)",
    "-.*[?*!@=].*",
    "+.*",
]
WHOLE_WEB_VECTORS = [
    ("-", "file://home/jc/nutch/index.html"),
    ("-", "ftp://ftp.apache.org/nutch.html"),
    ("-", "mailto:jerome.charron@gmail.com"),
    ("+", "news://any.news.server/comp.lang.java"),
    ("+", "whois:/nutch.org"),
    ("-", "http://www.nutch.org/nutch.gif"),
    ("-", "http://www.nutch.org/nutch.eps"),
    ("-", "http://www.nutch.org/nutch?q=nutch"),
    ("+", "http://www.nutch.org/"),
    ("+", "http://www.nutch.org/abcd/foo/bar/foo/bar/foo/"),
    ("+", "http://www.nutch.org/abcd/foo/bar/xyz/foo/bar/foo/"),
]
INTRANET_RULES = [
    "-(file|ftp|mailto):.*",
    "-.*\\.(gif|GIF|jpg|JPG|ico|ICO|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm"
    "|tgz|mov|MOV|exe|png)",
    "-.*[?*!@=].*",
    "+http://([a-z0-9]*\\.)*MY.DOMAIN.NAME/.*",
    "-.*",
]
INTRANET_VECTORS = [
    ("-", "file://home/jc/nutch/index.html"),
    ("-", "ftp://ftp.apache.org/nutch.html"),
    ("-", "mailto:jerome.charron@gmail.com"),
    ("-", "news://any.news.server/comp.lang.java"),
    ("-", "whois:/nutch.org"),
    ("+", "http://MY.DOMAIN.NAME/"),
    ("+", "http://MY.DOMAIN.NAME/nutch"),
    ("+", "http://www.MY.DOMAIN.NAME/"),
]


@pytest.mark.parametrize("rules,vectors", [
    (WHOLE_WEB_RULES, WHOLE_WEB_VECTORS),
    (INTRANET_RULES, INTRANET_VECTORS),
])
def test_reference_sample_vectors(rules, vectors):
    f = AutomatonURLFilter.from_lines(rules)
    for want, url in vectors:
        got = "+" if f.accepts(url) else "-"
        assert got == want, url
    # vectorized verdicts agree with scalar accepts
    urls = [u for _, u in vectors]
    assert f.verdicts(urls).tolist() == [w for w, _ in vectors]


def test_full_match_vs_substring_contrast():
    """The defining difference to urlfilter-regex: `nutch` as a rule
    matches ONLY the exact string, not any url containing it."""
    f = AutomatonURLFilter([("+", "nutch")])
    assert f.accepts("nutch")
    assert not f.accepts("http://nutch.org/")


def test_first_match_wins_priority():
    f = AutomatonURLFilter([("-", "http://bad\\.test/.*"),
                            ("+", "http://.*"),
                            ("-", ".*")])
    assert not f.accepts("http://bad.test/x")
    assert f.accepts("http://good.test/x")
    assert not f.accepts("ftp://other/x")


def test_brics_extensions():
    # intersection
    a = RuleSetAutomaton(["[ab]*&.*a.*"])
    assert a.match_first(["aab", "bbb", "aac"]).tolist() == [0, -1, -1]
    # complement: everything except strings containing 'x'
    a = RuleSetAutomaton(["~(.*x.*)"])
    assert a.match_first(["abc", "axc", ""]).tolist() == [0, -1, 0]
    # any-string / empty language / quoted literal
    assert RuleSetAutomaton(["@"]).match_first(["", "q"]).tolist() == [0, 0]
    assert RuleSetAutomaton(["#"]).match_first(["", "q"]).tolist() == [-1, -1]
    a = RuleSetAutomaton(['"a+b"'])
    assert a.match_first(["a+b", "aab"]).tolist() == [0, -1]


def test_numeric_intervals_brute_force():
    # differing widths → canonical representation, no leading zeros
    a = RuleSetAutomaton(["<7-123>"])
    for n in range(0, 200):
        assert (a.match_first([str(n)])[0] == 0) == (7 <= n <= 123), n
    assert a.match_first(["07"])[0] == -1
    assert a.match_first(["012"])[0] == -1
    # equal widths → fixed-width match, leading zeros significant
    a = RuleSetAutomaton(["<05-20>"])
    for n in range(0, 40):
        s = str(n).zfill(2)
        assert (a.match_first([s])[0] == 0) == (5 <= n <= 20), s
    assert a.match_first(["5"])[0] == -1


def test_repetitions():
    a = RuleSetAutomaton(["a{3}", "a{2,4}b", "a{2,}c"])
    assert a.match_first(["aaa"])[0] == 0
    assert a.match_first(["aa", "aaaa"]).tolist() == [-1, -1]
    assert a.match_first(["aab", "aaaab", "ab", "aaaaab"]).tolist() == \
        [1, 1, -1, -1]
    assert a.match_first(["aac", "a" * 9 + "c", "ac"]).tolist() == [2, 2, -1]


def test_randomized_cross_check_vs_re_fullmatch():
    """For the brics/Python-re common subset, the DFA must agree with
    re.fullmatch + first-match-wins on random strings."""
    pats = [
        "(http|https)://[a-z0-9.]+/.*",
        "[a-z]+\\.(png|gif)",
        "a(b|c)*d?e{1,2}",
        "x[^0-9]*y",
        "[a-p]{2,5}9",
    ]
    rs = RuleSetAutomaton(pats)
    rng = random.Random(42)
    alphabet = "abcdexy019./:hpst"
    strings = ["".join(rng.choice(alphabet)
                       for _ in range(rng.randint(0, 14)))
               for _ in range(2000)]
    got = rs.match_first(strings)
    for s, g in zip(strings, got):
        exp = -1
        for i, p in enumerate(pats):
            if re.fullmatch(p, s):
                exp = i
                break
        assert g == exp, (s, int(g), exp)


def test_single_product_dfa_not_per_rule_scan():
    """All rules live in ONE automaton: state count is bounded and the
    batch runner returns rule indices in one pass."""
    rs = RuleSetAutomaton(WHOLE_WEB_RULES_PATTERNS)
    assert rs.n_states < 1000
    idx = rs.match_first(["ftp://a/b", "http://a/b.gif", "http://a/b?x",
                          "http://a/b", None])
    assert idx.tolist() == [0, 1, 2, 3, -1]
    assert idx.dtype == np.int32


WHOLE_WEB_RULES_PATTERNS = [r[1:] for r in WHOLE_WEB_RULES]


def test_malformed_rules_rejected():
    with pytest.raises(ValueError):
        AutomatonURLFilter.from_lines(["*nosign"])
    with pytest.raises(ValueError):
        RuleSetAutomaton(["(unclosed"])
    with pytest.raises(ValueError):
        RuleSetAutomaton(["<named>"])  # named automata unsupported


def test_checker_operator(spark):
    from pyspark.sql import functions as F  # noqa: F401
    from nutch_spark.operators.checkers import automaton_filter_checker

    rules = [(r[0], r[1:]) for r in WHOLE_WEB_RULES]
    urls = spark.createDataFrame(
        [("http://a.test/p",), ("ftp://a.test/p",),
         ("http://a.test/x.gif",), ("http://a.test/p?q=1",)],
        "url string")
    out = {r["url"]: r["verdict"]
           for r in automaton_filter_checker(urls, rules).collect()}
    assert out == {"http://a.test/p": "+", "ftp://a.test/p": "-",
                   "http://a.test/x.gif": "-", "http://a.test/p?q=1": "-"}
