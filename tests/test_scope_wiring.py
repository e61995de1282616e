"""Scope-aware normalizer chains wired INTO the stages
(URLNormalizers.java:96-170): a scoped rule set must affect exactly the
stage that owns the scope — outlink rules change parse emissions but
not inject; inject rules change seeds but not outlinks; the default
config takes the cached fast-path UDF."""

import pyspark.sql.functions as F

from nutch_spark.config import CrawlConfig
from nutch_spark.functions.normalizers import normalizer_udf
from nutch_spark.functions.urls import spark_udfs
from nutch_spark.operators.inject import parse_seeds
from nutch_spark.operators.parse import parse_segment
from nutch_spark.schema import STATUS_LINKED

START = 1_700_000_000_000

# outlink-scope regex rule: strip a tracking param only on outlinks
SCOPED = CrawlConfig(
    normalizer_scope_regex_rules=(
        ("outlink", ((r"[?&]utm_[a-z]+=[^&#]*", ""),)),
    ),
    # keep '?' urls through the filter chain so the param is observable
    url_filter_rules=(("+", r"."),),
)


def _content(spark, html):
    return spark.createDataFrame(
        [("http://h.test/", html.encode(), "t", "en", START, 1.0, 3600,
          None)],
        "url string, html binary, text string, lang string, "
        "fetch_time long, score double, fetch_interval int, "
        "metadata map<string,string>")


def _seeds(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "line string")


def test_outlink_scope_affects_parse_not_inject(spark):
    html = ('<html><body>'
            '<a href="http://o.test/p?id=1&utm_source=x">x</a>'
            '</body></html>')
    out = parse_segment(_content(spark, html), SCOPED, START)
    linked = (out["crawl_parse"]
              .where(F.col("status") == STATUS_LINKED)
              .select("url").collect())
    assert [r.url for r in linked] == ["http://o.test/p?id=1"]

    # the same url as a seed keeps its utm param: inject scope has no
    # such rule
    seeds = parse_seeds(
        _seeds(spark, ["http://o.test/p?id=1&utm_source=x"]),
        SCOPED, START).collect()
    assert [r.url for r in seeds] == ["http://o.test/p?id=1&utm_source=x"]


def test_inject_scope_rule_affects_seeds_only(spark):
    cfg = CrawlConfig(
        normalizer_scope_regex_rules=(
            ("inject", ((r"[?&]ref=[^&#]*", ""),)),
        ),
        url_filter_rules=(("+", r"."),),
    )
    seeds = parse_seeds(
        _seeds(spark, ["http://o.test/p?ref=abc"]), cfg, START).collect()
    assert [r.url for r in seeds] == ["http://o.test/p"]

    html = '<html><body><a href="http://o.test/q?ref=abc">x</a></body></html>'
    linked = (parse_segment(_content(spark, html), cfg, START)["crawl_parse"]
              .where(F.col("status") == STATUS_LINKED)
              .select("url").collect())
    assert [r.url for r in linked] == ["http://o.test/q?ref=abc"]


def test_scope_chain_order_override(spark):
    """urlnormalizer.order.<scope>: outlink chain adds querystring
    sorting; inject keeps the stock chain."""
    cfg = CrawlConfig(
        normalizer_scope_orders=(
            ("outlink", ("basic", "regex", "querystring")),
        ),
        url_filter_rules=(("+", r"."),),
    )
    html = '<html><body><a href="http://o.test/p?b=2&a=1">x</a></body></html>'
    linked = (parse_segment(_content(spark, html), cfg, START)["crawl_parse"]
              .where(F.col("status") == STATUS_LINKED)
              .select("url").collect())
    assert [r.url for r in linked] == ["http://o.test/p?a=1&b=2"]
    seeds = parse_seeds(
        _seeds(spark, ["http://o.test/p?b=2&a=1"]), cfg, START).collect()
    assert [r.url for r in seeds] == ["http://o.test/p?b=2&a=1"]


def test_default_config_uses_cached_fast_path():
    cfg = CrawlConfig()
    assert normalizer_udf(cfg, "outlink") is spark_udfs()["canonicalize"]
    assert normalizer_udf(cfg, "inject") is spark_udfs()["canonicalize"]
    # a scoped rule only un-caches its own scope
    assert normalizer_udf(SCOPED, "inject") is spark_udfs()["canonicalize"]
    assert normalizer_udf(SCOPED, "outlink") \
        is not spark_udfs()["canonicalize"]


def test_linkdb_normalize_and_filter(spark):
    """linkdb.url.normalizers / linkdb.url.filters (LinkDb.java:93,129,
    100-112): scope=linkdb normalization re-keys both endpoints;
    the filter chain drops rejected targets."""
    from nutch_spark.operators.linkdb import invert_links
    cfg = CrawlConfig(
        linkdb_url_normalizers=True,
        linkdb_url_filters=True,
        normalizer_scope_regex_rules=(
            ("linkdb", ((r"[?&]sid=[^&#]*", ""),)),
        ),
        url_filter_rules=(("-", r"\.gif$"), ("+", r".")),
        db_ignore_internal_links=False,
    )
    edges = spark.createDataFrame(
        [("http://a.test/x", "http://b.test/p?sid=1", "t"),
         ("http://a.test/x", "http://b.test/img.gif", "t")],
        "from_url string, to_url string, anchor string")
    rows = invert_links(edges, cfg).collect()
    assert [r.url for r in rows] == ["http://b.test/p"]


def test_generate_host_count_scope(spark):
    """scope=generate_host_count (Generator.java:148,267): a scoped
    rule collapsing mirror hosts makes the per-host cap count them as
    one; without the rule they cap independently."""
    from nutch_spark.operators.generate import generate
    rows = [(f"http://m{i}.pool.test/p{j}", "db_unfetched", 0, 0, 3600,
             1.0, None, 0, None)
            for i in range(2) for j in range(4)]
    db = spark.createDataFrame(
        rows,
        "url string, status string, fetch_time long, retries int, "
        "fetch_interval int, score double, signature string, "
        "modified_time long, metadata map<string,string>")
    base = dict(generate_max_count=3, generate_filter=False,
                num_fetch_partitions=2)
    plain = generate(db, CrawlConfig(**base), cur_time_ms=1, gen_time_ms=1)
    # maxCount-1 = 2 per host, two hosts -> 4
    assert plain.count() == 4
    scoped = CrawlConfig(
        **base,
        normalizer_scope_regex_rules=(
            ("generate_host_count", ((r"//m\d+\.pool\.", "//pool."),)),
        ))
    merged = generate(db, scoped, cur_time_ms=1, gen_time_ms=1)
    # both mirrors now share one cap key -> 2 urls total, and the
    # emitted urls themselves are NOT rewritten (cap key only)
    out = [r.url for r in merged.select("url").collect()]
    assert len(out) == 2
    assert all("//m" in u for u in out)


def test_scoring_link_plugin(spark):
    """scoring-link (LinkAnalysisScoringFilter): outlink distribution
    and updatedb accumulation are no-ops; indexer boost is linear."""
    from nutch_spark.operators.parse import parse_segment
    from nutch_spark.operators.updatedb import updatedb
    from nutch_spark.operators.readers import indexer_docs

    cfg = CrawlConfig(scoring_filter="link",
                      link_analyze_normalize_score=2.0,
                      url_filter_rules=(("+", r"."),))
    html = '<html><body><a href="http://o.test/q">x</a></body></html>'
    content = spark.createDataFrame(
        [("http://h.test/", html.encode(), "t", "en", START, 4.0, 3600,
          None)],
        "url string, html binary, text string, lang string, "
        "fetch_time long, score double, fetch_interval int, "
        "metadata map<string,string>")
    linked = (parse_segment(content, cfg, START)["crawl_parse"]
              .where(F.col("status") == STATUS_LINKED).collect())
    assert [r.score for r in linked] == [0.0]  # no distribution

    # updatedb: linked rows do NOT accumulate into the db score
    db = spark.createDataFrame(
        [("http://o.test/q", "db_fetched", 0, 0, 3600, 4.0, None, 0,
          None)],
        "url string, status string, fetch_time long, retries int, "
        "fetch_interval int, score double, signature string, "
        "modified_time long, metadata map<string,string>")
    msgs = spark.createDataFrame(
        [("http://o.test/q", "linked", 0, 0, 3600, 9.9, None, 0, None)],
        db.schema)
    out = updatedb(db, msgs, cfg, START).collect()
    assert [r.score for r in out] == [4.0]

    # indexer boost = normalize × score (not sqrt)
    d = db.withColumn("signature", F.lit("sig"))
    cf = spark.createDataFrame(
        [("http://o.test/q", "fetch_success", 1)],
        "url string, status string, fetch_time long")
    pt = spark.createDataFrame([("http://o.test/q", "t")],
                               "url string, text string")
    pd_ = spark.createDataFrame(
        [("http://o.test/q", "T")], "url string, title string")
    docs = indexer_docs(d, None, pt, pd_, cf, cfg).collect()
    assert [r.boost for r in docs] == [8.0]
