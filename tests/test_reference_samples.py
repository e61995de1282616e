"""Data-driven parity tests over the reference's own sample suites
(TestRegexURLFilter / TestRegexURLNormalizer equivalents) — both the
scalar kernels and the vectorized Spark path must agree with every
expected verdict.

Vector data: tests/reference_sample_vectors.py (attributed there).
"""

import pytest
from pyspark.sql import functions as F

from nutch_spark.functions.filters import RegexURLFilter, accepts_udf
from nutch_spark.functions.urls import (DEFAULT_REGEX_RULES,
                                        normalize_regex)
from tests.reference_sample_vectors import (FILTER_SUITES,
                                            NORMALIZE_SUITES)

# conf/regex-normalize.xml.template's commented-out default-page rule,
# uncommented exactly as regex-normalize-default.xml does for testing.
# Java's mid-pattern (?i) global flag becomes Python scoped (?i:...)
# groups (group numbering preserved).
DEFAULT_PAGE_RULE = (
    r"/((?i:index|default))\.((?i:js[pf]{1}?[afx]?|cgi|cfm|asp[x]?|"
    r"[psx]?htm[l]?|php[3456]?))(\?|&|#|$)",
    r"/\3")

# regex-normalize-scope1.xml: collapse host to registered domain and
# drop the path (host-count / fetchlist-splitting use case)
SCOPE1_RULES = ((r"(^[a-z]{3,5}://)([\w]+\.)*?(\w+\.\w+)[/$].*",
                 r"\1\3/"),)


def _norm_rules(scope: str):
    if scope == "default":
        rules = list(DEFAULT_REGEX_RULES)
        rules.insert(1, DEFAULT_PAGE_RULE)
        return tuple(rules)
    return SCOPE1_RULES


def _filter_cases(name):
    rules_txt, urls_txt = FILTER_SUITES[name]
    rules = rules_txt.splitlines()
    cases = []
    for line in urls_txt.splitlines():
        line = line.strip()
        if line and not line.startswith("#"):
            cases.append((line[1:], line[0] == "+"))
    return rules, cases


def _norm_cases(scope):
    cases = []
    for line in NORMALIZE_SUITES[scope].splitlines():
        line = line.strip()
        if line and not line.startswith("#"):
            src, want = line.split()
            cases.append((src, want))
    return cases


@pytest.mark.parametrize("suite", sorted(FILTER_SUITES))
def test_regex_filter_suite_scalar(suite):
    rules, cases = _filter_cases(suite)
    f = RegexURLFilter.from_lines(rules)
    assert cases, suite
    for url, want in cases:
        assert f.accepts(url) == want, f"{suite}: {url}"


@pytest.mark.parametrize("scope", sorted(NORMALIZE_SUITES))
def test_regex_normalize_suite_scalar(scope):
    cases = _norm_cases(scope)
    rules = _norm_rules(scope)
    assert cases, scope
    for src, want in cases:
        assert normalize_regex(src, rules) == want, f"{scope}: {src}"


def test_regex_filter_suites_vectorized(spark):
    """The Arrow-batched UDF path classifies every sample URL exactly
    as the scalar kernel does (all three suites in one job)."""
    rows, rule_lines = [], {}
    for suite in FILTER_SUITES:
        rules, cases = _filter_cases(suite)
        rule_lines[suite] = rules
        rows += [(suite, url, want) for url, want in cases]
    df = spark.createDataFrame(rows, "suite string, url string, "
                                     "want boolean")
    for suite, rules in rule_lines.items():
        parsed = tuple((ln[0], ln[1:]) for ln in rules
                       if ln.strip() and not ln.startswith("#"))
        part = df.where(F.col("suite") == suite).withColumn(
            "got", accepts_udf(parsed)(F.col("url")))
        bad = part.where(F.col("got") != F.col("want")).count()
        assert bad == 0, suite
