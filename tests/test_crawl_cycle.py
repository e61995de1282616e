"""End-to-end crawl-cycle tests over the deterministic fixture site
(TestFetcher.java:81-180 analog, wall-clock politeness replaced by the
virtual-time contract; URL-seen-set parity per BASELINE.json)."""

import pyspark.sql.functions as F
import pytest

from nutch_spark.config import CrawlConfig
from nutch_spark.crawl import CrawlRun
from nutch_spark.testdata import build_fixture, fixture_dfs

START = 1_700_000_000_000


@pytest.fixture(scope="module")
def fixture(spark):
    return fixture_dfs(spark, n_hosts=8, pages_per_host=5,
                       hot_host_pages=12)


def _run(spark, tmp, fixture, rounds=2, **cfg_kw):
    cfg = CrawlConfig(generate_top_n=100, num_fetch_partitions=4,
                      **cfg_kw)
    run = CrawlRun(spark, str(tmp), cfg, fixture["pages"],
                   fixture["robots"], fixture["http_status"],
                   bloom_buckets=4)
    db = run.crawl(fixture["seeds"], rounds=rounds, start_ms=START)
    return run, db


def test_cycle_discovers_and_fetches(spark, tmp_path, fixture):
    run, db = _run(spark, tmp_path, fixture)
    statuses = {r.status: r.n for r in
                db.groupBy("status").agg(F.count("*").alias("n"))
                .collect()}
    assert statuses.get("db_fetched", 0) > 8
    assert statuses.get("db_unfetched", 0) > 0   # discovered frontier
    # seeds all resolved beyond unfetched
    seeds = {r.line.split("\t")[0] for r in fixture["seeds"].collect()
             if r.line and not r.line.startswith("#")}
    seed_rows = db.where(F.col("url").isin(*seeds)).collect()
    assert len(seed_rows) == len(seeds)


def test_cycle_deterministic(spark, tmp_path, fixture):
    """Same seeds + budget → identical URL-seen set and statuses
    (the crawl-ordering/URL-seen parity contract)."""
    _, db1 = _run(spark, tmp_path / "a", fixture)
    _, db2 = _run(spark, tmp_path / "b", fixture)
    rows1 = sorted((r.url, r.status, r.fetch_time)
                   for r in db1.collect())
    rows2 = sorted((r.url, r.status, r.fetch_time)
                   for r in db2.collect())
    assert rows1 == rows2


def test_resume_from_checkpoint(spark, tmp_path, fixture):
    run, _ = _run(spark, tmp_path, fixture, rounds=1)
    assert run.resume_round() == 1
    # a new CrawlRun over the same dir picks up the snapshot
    cfg = CrawlConfig(generate_top_n=100, num_fetch_partitions=4)
    run2 = CrawlRun(spark, str(tmp_path), cfg, fixture["pages"],
                    fixture["robots"], fixture["http_status"])
    assert run2.resume_round() == 1
    stats = run2.run_round(2, START + 2 * 86_400_000)
    assert stats["crawldb_rows"] >= stats["fetchlist_rows"]


def test_crash_mid_write_resumes_from_last_snapshot(spark, tmp_path,
                                                    fixture):
    """Atomic install contract (CrawlDb.java:155-173): a half-written
    crawldb snapshot (no _snapshot.json commit record) is invisible to
    resume; the crawl restarts its round from the last committed one
    and converges to the same final state as an uninterrupted run."""
    import os
    import shutil

    run, db_ok = _run(spark, tmp_path / "clean", fixture, rounds=2)

    # crashed run: round 1 completes, then simulate dying mid-install
    # of round 2 — a .tmp dir with data but no commit record
    run2, _ = _run(spark, tmp_path / "crash", fixture, rounds=1)
    base = str(tmp_path / "crash" / "crawldb")
    src = os.path.join(base, "round=1")
    tmp2 = os.path.join(base, "round=2.tmp")
    shutil.copytree(src, tmp2)
    os.remove(os.path.join(tmp2, "_snapshot.json"))
    assert run2.resume_round() == 1   # the torn write is ignored

    # also a torn COMMITTED-looking dir without the record
    part = os.path.join(base, "round=3")
    os.makedirs(part)
    assert run2.resume_round() == 1

    shutil.rmtree(part)
    # resume re-runs round 2 only and matches the clean run
    cfg = CrawlConfig(generate_top_n=100, num_fetch_partitions=4)
    run3 = CrawlRun(spark, str(tmp_path / "crash"), cfg,
                    fixture["pages"], fixture["robots"],
                    fixture["http_status"], bloom_buckets=4)
    db_resumed = run3.crawl(fixture["seeds"], rounds=2, start_ms=START)
    rows_ok = sorted((r.url, r.status) for r in db_ok.collect())
    rows_re = sorted((r.url, r.status) for r in db_resumed.collect())
    assert rows_ok == rows_re


def test_duplicate_content_marked(spark, tmp_path, fixture):
    """Hosts ≥2 share page p0001 bytes (fixture dup page) → one winner
    per signature, losers db_duplicate (DeduplicationJob)."""
    run, db = _run(spark, tmp_path, fixture, rounds=3)
    dups = db.where(F.col("status") == "db_duplicate").count()
    fetched_sigs = (db.where(F.col("status").isin("db_fetched",
                                                  "db_notmodified"))
                    .where(F.col("signature").isNotNull())
                    .groupBy("signature").count()
                    .where(F.col("count") > 1).count())
    assert fetched_sigs == 0  # every surviving signature is unique
    assert dups > 0


def test_robots_disallowed_never_fetched(spark, tmp_path):
    fx = fixture_dfs(spark, n_hosts=8, pages_per_host=5,
                     hot_host_pages=12)
    pdfs = build_fixture(n_hosts=8, pages_per_host=5, hot_host_pages=12)
    blocked_hosts = [
        r.authority for r in fx["robots"].collect()
        if r.robots_txt and "Disallow: /p0001.html" in r.robots_txt]
    _, db = _run(spark, tmp_path, fx, rounds=3)
    rows = db.where(F.col("url").isin(
        [f"{h}/p0001.html" for h in blocked_hosts])).collect()
    assert rows, "disallowed urls should still be discovered via links"
    assert all(r.status in ("db_unfetched", "db_gone") for r in rows)


def test_metrics_written(spark, tmp_path, fixture):
    run, _ = _run(spark, tmp_path, fixture, rounds=1)
    stages = {m["stage"] for m in run.metrics}
    assert {"inject", "generate", "fetch", "parse", "updatedb",
            "invertlinks"} <= stages
    assert (tmp_path / "_metrics.jsonl").exists()
