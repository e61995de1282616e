"""Generator parity tests (port of TestGenerator.java).

G1 topN-highest (lines 79-107), G2 per-host limit (139-186) with the
reference's documented off-by-one (maxCount=k admits k−1), G3
per-domain limit (195-245), filter toggle (254-283), plus ordering
checks for the politeness hash sort and the _ngt_ in-flight guard.
"""

from pyspark.sql import functions as F

from nutch_spark.config import DEFAULT
from nutch_spark.functions.urls import url_hash31
from nutch_spark.operators.generate import generate, update_generated
from tests.helpers import NOW, by_url, crawldb_df, datum

CFG = DEFAULT.with_(num_fetch_partitions=2, generate_filter=False)


def db_unfetched(spark, urls_scores):
    return crawldb_df(spark, [
        datum(u, "db_unfetched", fetch_time=NOW - 1000, fetch_interval=1,
              score=s) for u, s in urls_scores])


def test_generate_highest(spark):
    """topN must select the highest-scoring urls
    (TestGenerator.java:79-107)."""
    db = db_unfetched(spark, [
        (f"http://aaa/{i:03d}", float(i)) for i in range(101)])
    out = generate(db, CFG.with_(generate_top_n=2), NOW)
    urls = {r["url"] for r in out.select("url").collect()}
    assert urls == {"http://aaa/100", "http://aaa/099"}


def test_generate_host_limit(spark):
    """generate.max.count per host admits maxCount−1
    (TestGenerator.java:139-186 + Generator.java:293-304)."""
    db = db_unfetched(spark, [
        ("http://www.example.com/index1.html", 1.0),
        ("http://www.example.com/index2.html", 1.0),
        ("http://www.example.com/index3.html", 1.0),
    ])
    for max_count, expected in [(2, 1), (3, 2), (4, 3)]:
        out = generate(db, CFG.with_(generate_max_count=max_count), NOW)
        assert out.count() == expected, f"maxCount={max_count}"


def test_generate_domain_limit(spark):
    """Same with generate.count.mode=domain
    (TestGenerator.java:195-245)."""
    db = db_unfetched(spark, [
        ("http://a.example.com/index.html", 1.0),
        ("http://b.example.com/index.html", 1.0),
        ("http://c.example.com/index.html", 1.0),
    ])
    for max_count, expected in [(2, 1), (3, 2), (4, 3)]:
        out = generate(db, CFG.with_(generate_max_count=max_count,
                                     generate_count_mode="domain"), NOW)
        assert out.count() == expected, f"maxCount={max_count}"


def test_generate_filter_toggle(spark):
    """Filter on: everything rejected → empty; filter off: all pass
    (TestGenerator.java:254-283)."""
    db = db_unfetched(spark, [
        ("http://www.example.com/index.html", 1.0),
        ("http://www.example.net/index.html", 1.0),
        ("http://www.example.org/index.html", 1.0),
    ])
    reject_all = CFG.with_(generate_filter=True,
                           url_filter_rules=(("-", r"."),))
    assert generate(db, reject_all, NOW).count() == 0
    assert generate(db, CFG, NOW).count() == 3


def test_generate_due_filter(spark):
    """Only entries with fetchTime ≤ curTime are selected
    (AbstractFetchSchedule.shouldFetch)."""
    db = crawldb_df(spark, [
        datum("http://due.ex/", "db_unfetched", fetch_time=NOW - 1),
        datum("http://future.ex/", "db_unfetched", fetch_time=NOW + 10_000),
    ])
    urls = {r["url"] for r in generate(db, CFG, NOW).collect()}
    assert urls == {"http://due.ex/"}


def test_generate_ngt_guard(spark):
    """URLs generated within crawl.gen.delay are skipped
    (Generator.java:194-200)."""
    db = crawldb_df(spark, [
        datum("http://inflight.ex/", "db_unfetched", fetch_time=NOW - 1000,
              metadata={"_ngt_": str(NOW - 1000)}),
        datum("http://stale.ex/", "db_unfetched", fetch_time=NOW - 1000,
              metadata={"_ngt_": str(NOW - 8 * 86400_000)}),
    ])
    urls = {r["url"] for r in generate(db, CFG, NOW).collect()}
    assert urls == {"http://stale.ex/"}


def test_fetchlist_partitioning_and_order(spark):
    """All urls of one host land in one partition; within a partition
    rows are sorted by the HashComparator url hash
    (Generator.java:386-416, URLPartitioner.java:66-94)."""
    db = db_unfetched(spark, [
        (f"http://host{h}.ex/page{i}", 1.0)
        for h in range(4) for i in range(5)])
    out = generate(db, CFG.with_(num_fetch_partitions=3), NOW)
    rows = out.select("url", "fetch_partition",
                      F.spark_partition_id().alias("pid")).collect()
    host_pids = {}
    by_pid = {}
    for r in rows:
        host = r["url"].split("/")[2]
        host_pids.setdefault(host, set()).add(r["pid"])
        by_pid.setdefault(r["pid"], []).append(r["url"])
    # politeness invariant: one partition per host
    assert all(len(p) == 1 for p in host_pids.values())
    # HashComparator order within each partition
    for urls in by_pid.values():
        hashes = [url_hash31(u) for u in urls]
        assert hashes == sorted(hashes)


def test_update_generated_stamps_ngt(spark):
    db = crawldb_df(spark, [
        datum("http://a.ex/", "db_unfetched", fetch_time=NOW - 1000),
        datum("http://b.ex/", "db_unfetched", fetch_time=NOW + 99000),
    ])
    fl = generate(db, CFG, NOW)
    updated = by_url(update_generated(db, fl, CFG, NOW))
    assert updated["http://a.ex/"]["metadata"].get("_ngt_") == str(NOW)
    assert "_ngt_" not in (updated["http://b.ex/"]["metadata"] or {})
