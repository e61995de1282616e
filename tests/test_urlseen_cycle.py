"""The URL-seen bloom layer wired into the shipped cycle driver
(round-2 VERDICT finding: 'built per round, consumed never').

Contract: linked discoveries are pre-split by the previous round's
bloom — definitely-new urls bypass the frontier merge entirely, only
bloom hits reach the db join — and the final crawldb is IDENTICAL to
the unsplit run (blooms have no false negatives, so the split is a
pure pruning)."""

import pyspark.sql.functions as F

from nutch_spark.config import CrawlConfig
from nutch_spark.crawl import CrawlRun
from nutch_spark.testdata import fixture_dfs

START = 1_700_000_000_000


def _run(spark, tmp, fixture, use_bloom, rounds=2):
    cfg = CrawlConfig(generate_top_n=100, num_fetch_partitions=4)
    run = CrawlRun(spark, str(tmp), cfg, fixture["pages"],
                   fixture["robots"], fixture["http_status"],
                   use_bloom=use_bloom, bloom_buckets=4, db_buckets=4)
    db = run.crawl(fixture["seeds"], rounds=rounds, start_ms=START)
    return run, db


def test_bloom_split_preserves_crawldb(spark, tmp_path):
    fx = fixture_dfs(spark, n_hosts=8, pages_per_host=5,
                     hot_host_pages=12)
    run_b, db_b = _run(spark, tmp_path / "bloom", fx, use_bloom=True)
    run_n, db_n = _run(spark, tmp_path / "nobloom", fx, use_bloom=False)
    rows_b = sorted((r.url, r.status, r.fetch_time, r.score, r.signature)
                    for r in db_b.collect())
    rows_n = sorted((r.url, r.status, r.fetch_time, r.score, r.signature)
                    for r in db_n.collect())
    assert rows_b == rows_n
    # the split actually ran (a bloom for the prior round existed)
    assert hasattr(run_b, "debug_split")
    assert not hasattr(run_n, "debug_split")


def test_frontier_merge_sees_only_bloom_hits(spark, tmp_path):
    """The db-side merge input is exactly the bloom-hit subset; the
    definitely-new side is provably absent from the prior frontier
    (bloom no-false-negative contract applied to real cycle data)."""
    fx = fixture_dfs(spark, n_hosts=8, pages_per_host=5,
                     hot_host_pages=12)
    run, _ = _run(spark, tmp_path, fx, use_bloom=True)
    new = run.debug_split["new"]
    maybe = run.debug_split["maybe"]
    prev_db = run.load_crawldb(run.resume_round() - 1)

    # definitely-new: zero overlap with the prior frontier
    overlap = new.select("url").distinct() \
        .join(prev_db.select("url"), "url", "left_semi").count()
    assert overlap == 0
    # every discovered url is routed exactly once
    n_new, n_maybe = new.count(), maybe.count()
    assert n_new + n_maybe > 0
    both = new.select("url").intersect(maybe.select("url")).count()
    assert both == 0
    # the split prunes something real on this fixture: the frontier
    # join's linked input shrank versus the full discovery stream
    assert n_new > 0


def test_bloom_split_skipped_in_normalize_mode(spark, tmp_path):
    """crawldb.url.normalizers re-keys message urls AFTER the split
    decision would have been made — the cycle must fall back to the
    unsplit merge (correctness over pruning)."""
    fx = fixture_dfs(spark, n_hosts=8, pages_per_host=5,
                     hot_host_pages=12)
    cfg = CrawlConfig(generate_top_n=100, num_fetch_partitions=4,
                      db_update_normalize=True)
    run = CrawlRun(spark, str(tmp_path), cfg, fx["pages"],
                   fx["robots"], fx["http_status"],
                   use_bloom=True, bloom_buckets=4, db_buckets=4)
    run.crawl(fx["seeds"], rounds=2, start_ms=START)
    assert not hasattr(run, "debug_split")
