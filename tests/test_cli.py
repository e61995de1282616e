"""bin/nutch CLI surface (nutch_spark/cli.py) — every reference
subcommand (src/bin/nutch:211-282) either runs against a committed
fixture crawl or fails with the documented single-declarative-plan
message. Driven through cli.main(argv) in-process so the commands use
the session-scoped SparkSession fixture."""

import json
import os

import pytest

from nutch_spark import cli

START_ARGS = ["--cores", "4"]


@pytest.fixture(scope="module")
def crawl_dir(spark, tmp_path_factory, monkeypatch_session=None):
    """A 2-round fixture crawl the reader commands inspect."""
    tmp = tmp_path_factory.mktemp("cli_crawl")
    from nutch_spark.config import CrawlConfig
    from nutch_spark.crawl import CrawlRun
    from nutch_spark.testdata import fixture_dfs
    fx = fixture_dfs(spark, n_hosts=6, pages_per_host=4,
                     hot_host_pages=8)
    cfg = CrawlConfig(generate_top_n=60, num_fetch_partitions=4)
    run = CrawlRun(spark, str(tmp), cfg, fx["pages"], fx["robots"],
                   fx["http_status"], bloom_buckets=4, db_buckets=4)
    run.crawl(fx["seeds"], rounds=2, start_ms=1_700_000_000_000)
    return str(tmp)


def _main(monkeypatch, spark, argv):
    # the CLI builds its own session; reuse the test one
    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    cli.main(START_ARGS + argv)


def _out(capsys):
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.strip()]
    return lines


def test_readdb_stats_and_dump(monkeypatch, capsys, spark, crawl_dir,
                               tmp_path):
    _main(monkeypatch, spark, ["readdb", crawl_dir, "--stats"])
    assert any("db_fetched" in ln or "status" in ln
               for ln in _out(capsys))
    dump = str(tmp_path / "dump")
    _main(monkeypatch, spark, ["readdb", crawl_dir, "--dump", dump])
    assert json.loads(_out(capsys)[-1])["dumped"] == dump


def test_round_stages_not_submittable(monkeypatch, spark):
    for stage in cli.ROUND_STAGES:
        with pytest.raises(SystemExit, match="declarative"):
            _main(monkeypatch, spark, [stage])


def test_freegen(monkeypatch, capsys, spark, tmp_path):
    urls = tmp_path / "urls.txt"
    urls.write_text("http://host1.test/a\n# comment\n"
                    "http://host2.test/b\n")
    dest = str(tmp_path / "fl")
    _main(monkeypatch, spark, ["freegen", str(urls), dest])
    res = json.loads(_out(capsys)[-1])
    assert res["fetchlist"] == 2


def test_readlinkdb_and_readseg(monkeypatch, capsys, spark, crawl_dir):
    # pick a url present in any round's linkdb (the latest round can
    # legitimately be empty when no new outlinks were discovered)
    ldb = spark.read.option("basePath", os.path.join(crawl_dir,
                                                     "linkdb")) \
        .parquet(os.path.join(crawl_dir, "linkdb", "round=*"))
    url = ldb.select("url").first().url
    _main(monkeypatch, spark, ["readlinkdb", crawl_dir, "--url", url])
    assert any(url in ln for ln in _out(capsys))
    _main(monkeypatch, spark, ["readseg", crawl_dir, "--get", url])
    capsys.readouterr()  # vertical show; just assert it didn't raise


def test_mergesegs(monkeypatch, capsys, spark, crawl_dir, tmp_path):
    dest = str(tmp_path / "merged")
    _main(monkeypatch, spark, ["mergesegs", crawl_dir, dest])
    res = json.loads(_out(capsys)[-1])
    assert res["urls"] > 0 and len(res["rounds"]) >= 1
    # latest-per-url: no url appears twice
    m = spark.read.parquet(dest)
    assert m.count() == m.select("url").distinct().count()


def test_invertlinks_and_mergelinkdb(monkeypatch, capsys, spark,
                                     crawl_dir, tmp_path):
    """Standalone LinkDb inversion over committed parse_data matches
    the in-round linkdb union; LinkDbMerger self-merge keeps the url
    set."""
    dest = str(tmp_path / "ldb")
    _main(monkeypatch, spark, ["invertlinks", crawl_dir, dest])
    res = json.loads(_out(capsys)[-1])
    assert res["urls"] > 0
    merged = str(tmp_path / "ldb2")
    _main(monkeypatch, spark, ["mergelinkdb", merged, dest, dest])
    res2 = json.loads(_out(capsys)[-1])
    assert res2["urls"] == res["urls"]


def test_mergedb(monkeypatch, capsys, spark, crawl_dir, tmp_path):
    dest = str(tmp_path / "mdb")
    _main(monkeypatch, spark, ["mergedb", dest, crawl_dir, crawl_dir])
    res = json.loads(_out(capsys)[-1])
    from nutch_spark.storage import SnapshotTable
    n = SnapshotTable(spark, crawl_dir, "crawldb", sort=False) \
        .read().count()
    assert res["urls"] == n  # self-merge keeps the url set


def test_dedup_and_purge_commit_next_round(monkeypatch, capsys, spark,
                                           crawl_dir):
    _main(monkeypatch, spark, ["dedup", crawl_dir, "--fixture"])
    res = json.loads(_out(capsys)[-1])
    assert res["crawldb_rows"] > 0
    _main(monkeypatch, spark, ["purge", crawl_dir, "--fixture"])
    res2 = json.loads(_out(capsys)[-1])
    assert res2["round"] == res["round"] + 1


def test_index_and_domainstats(monkeypatch, capsys, spark, crawl_dir):
    # explicit round: dedup/purge above committed crawldb-only rounds
    # past the last round that has segments
    _main(monkeypatch, spark, ["index", crawl_dir, "--round", "1"])
    res = json.loads(_out(capsys)[-1])
    assert "docs_rows" in res
    _main(monkeypatch, spark, ["domainstats", crawl_dir,
                               "--mode", "host"])
    assert _out(capsys)


def test_webgraph_linkrank_nodedumper(monkeypatch, capsys, spark,
                                      crawl_dir):
    _main(monkeypatch, spark, ["webgraph", crawl_dir])
    assert json.loads(_out(capsys)[-1])["nodes"] > 0
    _main(monkeypatch, spark, ["linkrank", crawl_dir])
    assert json.loads(_out(capsys)[-1])["ranked"] > 0
    _main(monkeypatch, spark, ["nodedumper", crawl_dir,
                               "--by", "inlinks", "--topn", "5"])
    assert _out(capsys)
    _main(monkeypatch, spark, ["scoreupdater", crawl_dir, "--fixture"])
    assert json.loads(_out(capsys)[-1])["crawldb_rows"] > 0


def test_checkers_on_local_file(monkeypatch, capsys, spark, tmp_path):
    page = tmp_path / "p.html"
    page.write_text("<html><head><title>T</title></head><body>"
                    "<p>hello world</p>"
                    "<a href='http://x.test/y'>link</a></body></html>")
    _main(monkeypatch, spark, ["parsechecker",
                               "--url", "http://x.test/p",
                               "--html", str(page)])
    out = "\n".join(_out(capsys))
    assert "hello world" in out
    _main(monkeypatch, spark, ["indexchecker",
                               "--url", "http://x.test/p",
                               "--html", str(page)])
    out = "\n".join(_out(capsys))
    assert "title" in out


def test_dump_and_commoncrawldump(monkeypatch, capsys, spark,
                                  crawl_dir, tmp_path):
    dest = str(tmp_path / "files")
    _main(monkeypatch, spark, ["dump", crawl_dir, dest, "--fixture"])
    assert json.loads(_out(capsys)[-1])["files"] > 0
    cc = str(tmp_path / "cc")
    _main(monkeypatch, spark, ["commoncrawldump", crawl_dir, cc])
    assert json.loads(_out(capsys)[-1])["dest"] == cc
    assert os.path.isdir(cc)
