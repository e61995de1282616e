"""Injector parity tests (port of TestInjector.java and the inject
state-transition part of TestCrawlDbStates.java:194-239)."""

import pytest
from pyspark.sql import functions as F

from nutch_spark.config import DEFAULT
from nutch_spark.operators.inject import inject, parse_seeds
from tests.helpers import NOW, by_url, crawldb_df, datum


def seeds_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], ["line"])


def test_parse_seeds_basics(spark):
    out = parse_seeds(seeds_df(spark, [
        "http://Example.COM/a",
        "# a comment",
        "",
        "   ",
        "http://example.com/b\tnutch.score=2.5\tkey=val",
        "http://example.com/c\tnutch.fetchInterval=1000",
        "http://example.com/d\tnutch.fetchInterval.fixed=700\tjunknoequals",
        "bogus url",
    ]), DEFAULT, NOW)
    rows = by_url(out)
    assert set(rows) == {"http://example.com/a", "http://example.com/b",
                         "http://example.com/c", "http://example.com/d"}
    a = rows["http://example.com/a"]
    assert a["status"] == "injected"
    assert a["score"] == 1.0
    assert a["fetch_interval"] == DEFAULT.db_fetch_interval_default
    assert a["fetch_time"] == NOW
    b = rows["http://example.com/b"]
    assert b["score"] == 2.5
    assert b["metadata"] == {"key": "val"}
    c = rows["http://example.com/c"]
    assert c["fetch_interval"] == 1000
    d = rows["http://example.com/d"]
    assert d["fetch_interval"] == 700
    assert d["metadata"] == {"fixedInterval": "700"}


def test_inject_fresh_db(spark):
    out = inject(None, seeds_df(spark, ["http://a.com/", "http://b.com/"]),
                 DEFAULT, NOW)
    rows = by_url(out)
    assert set(rows) == {"http://a.com/", "http://b.com/"}
    assert all(r["status"] == "db_unfetched" for r in rows.values())


def test_inject_existing_wins(spark):
    """Inject must not modify CrawlDatums already in the db
    (TestCrawlDbStates.testCrawlDbStatTransitionInject)."""
    db = crawldb_df(spark, [
        datum("http://a.com/", "db_fetched", fetch_time=123, score=7.0,
              metadata={"x": "1"}),
    ])
    out = inject(db, seeds_df(spark, ["http://a.com/", "http://new.com/"]),
                 DEFAULT, NOW)
    rows = by_url(out)
    assert rows["http://a.com/"]["status"] == "db_fetched"
    assert rows["http://a.com/"]["score"] == 7.0
    assert rows["http://a.com/"]["fetch_time"] == 123
    assert rows["http://a.com/"]["metadata"] == {"x": "1"}
    assert rows["http://new.com/"]["status"] == "db_unfetched"


@pytest.mark.parametrize("status", [
    "db_unfetched", "db_fetched", "db_gone", "db_redir_temp",
    "db_redir_perm", "db_notmodified", "db_duplicate"])
def test_inject_preserves_every_db_status(spark, status):
    db = crawldb_df(spark, [datum("http://a.com/", status)])
    out = inject(db, seeds_df(spark, ["http://a.com/"]), DEFAULT, NOW)
    assert by_url(out)["http://a.com/"]["status"] == status


def test_inject_update_mode(spark):
    """db.injector.update: keep old but overlay metadata, take
    non-default score/interval (Injector.java:253-260)."""
    cfg = DEFAULT.with_(db_injector_update=True)
    db = crawldb_df(spark, [
        datum("http://a.com/", "db_fetched", fetch_time=123, score=7.0,
              metadata={"x": "1"}),
    ])
    out = inject(db, seeds_df(
        spark, ["http://a.com/\tnutch.score=3.0\ty=2"]), cfg, NOW)
    row = by_url(out)["http://a.com/"]
    assert row["status"] == "db_fetched"       # old status kept
    assert row["fetch_time"] == 123            # old time kept
    assert row["score"] == 3.0                 # non-default score taken
    assert row["metadata"] == {"x": "1", "y": "2"}


def test_inject_overwrite_mode(spark):
    cfg = DEFAULT.with_(db_injector_overwrite=True)
    db = crawldb_df(spark, [
        datum("http://a.com/", "db_fetched", fetch_time=123, score=7.0),
    ])
    out = inject(db, seeds_df(spark, ["http://a.com/"]), cfg, NOW)
    row = by_url(out)["http://a.com/"]
    assert row["status"] == "db_unfetched"
    assert row["score"] == 1.0
    assert row["fetch_time"] == NOW
