"""Command-line crawl driver — the ``bin/crawl`` / ``bin/nutch``
equivalent, launched with ``spark-submit --py-files nutch_spark.zip
-m nutch_spark.cli`` (or plain ``python -m nutch_spark.cli`` locally).

Commands mirror the reference CLI dispatch (src/bin/nutch:211-282):

  crawl         seeds.txt out_dir --rounds N    (bin/crawl:18-27)
  inject        out_dir seeds.txt
  freegen       out_dir urls.txt dest           (FreeGenerator)
  readdb        out_dir --stats | --topN N | --url U | --dump d
  mergedb       dest out_dir [out_dir ...]      (CrawlDbMerger)
  readlinkdb    out_dir --url U | --dump d      (LinkDbReader)
  readseg       out_dir --get URL [--round N]   (SegmentReader)
  mergesegs     out_dir dest --rounds a,b,...   (SegmentMerger)
  invertlinks   out_dir dest [--round N]        (LinkDb)
  mergelinkdb   dest linkdb [linkdb ...]        (LinkDbMerger)
  dedup         out_dir                         (DeduplicationJob)
  index         out_dir [--round N]             (IndexingJob)
  clean         out_dir                         (CleaningJob)
  purge         out_dir                         (frontier purge of
                db_gone urls; cuckoo layers drop fingerprints)
  dump          out_dir dest                    (FileDumper)
  commoncrawldump out_dir dest                  (CommonCrawlDataDumper)
  parsechecker  --url U --html FILE             (ParserChecker)
  indexchecker  --url U --html FILE             (IndexingFiltersChecker)
  domainstats   out_dir --mode host|domain      (DomainStatistics)
  webgraph      out_dir                         (WebGraph)
  linkrank      out_dir [--iterations N]        (LinkRank)
  scoreupdater  out_dir                         (ScoreUpdater)
  nodedumper    out_dir [--by score|inlinks|outlinks] [--topn N]
  startserver   out_dir --port P                (NutchServer analog)
  bench         (delegates to bench.py)

``generate``/``fetch``/``parse``/``updatedb`` are NOT separately
submittable, matching the service layer (service.py ROUND_STAGES):
the round is one declarative Spark plan — run ``crawl --rounds 1``.
Catalyst pipelines the four stages with no intermediate barriers;
splitting them back into four jobs would only materialize segment
state between stages the optimizer otherwise fuses. ``invertlinks``
IS standalone (the reference job re-inverts arbitrary committed
segments), as are all the reader/merger/indexer jobs.

The pages/robots/http_status tables come from ``--pages-dir`` (parquet
dirs named pages/, robots/, http_status/) or, with ``--fixture``, from
the deterministic synthesizer (testdata.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROUND_STAGES = ("generate", "fetch", "parse", "updatedb")


def _spark(args):
    from .session import get_spark
    return get_spark(app_name="nutch-spark-cli", cores=args.cores,
                     shuffle_partitions=args.cores * 2)


def _tables(spark, args):
    if getattr(args, "fixture", False):
        from .testdata import fixture_dfs
        return fixture_dfs(spark)
    base = getattr(args, "pages_dir", None)
    if not base:
        return _empty_tables(spark)
    pages = spark.read.parquet(os.path.join(base, "pages"))
    robots_p = os.path.join(base, "robots")
    http_p = os.path.join(base, "http_status")
    robots = (spark.read.parquet(robots_p)
              if os.path.isdir(robots_p) else spark.createDataFrame(
                  [], "authority string, robots_txt string, "
                      "fetch_code int"))
    http = (spark.read.parquet(http_p)
            if os.path.isdir(http_p) else None)
    return {"pages": pages, "robots": robots, "http_status": http,
            "seeds": None}


def _empty_tables(spark):
    """Placeholder pages/robots for jobs that never touch them
    (index/clean/purge/readers run over committed round tables)."""
    pages = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, "
            "text string, lang string")
    robots = spark.createDataFrame(
        [], "authority string, robots_txt string, fetch_code int")
    return {"pages": pages, "robots": robots, "http_status": None,
            "seeds": None}


def _run_for(spark, args, out_dir=None):
    from .config import CrawlConfig
    from .crawl import CrawlRun
    t = _tables(spark, args)
    cfg = CrawlConfig(num_fetch_partitions=args.cores * 2)
    return CrawlRun(spark, out_dir or args.out_dir, cfg, t["pages"],
                    t["robots"], t["http_status"],
                    seen_filter=getattr(args, "seen_filter", None))


def _rounds_of(out_dir: str, name: str) -> list[int]:
    base = os.path.join(out_dir, name)
    if not os.path.isdir(base):
        return []
    return sorted(int(d.split("=")[1]) for d in os.listdir(base)
                  if d.startswith("round=") and not d.endswith(".tmp"))


def _load_crawldb(spark, out_dir: str, rnd: int | None = None):
    """Latest (or given) committed crawldb snapshot, for either
    storage layout: bucketed SnapshotTable (_table.json present) or
    plain parquet round dirs."""
    meta = os.path.join(out_dir, "crawldb", "_table.json")
    if os.path.exists(meta):
        from .storage import SnapshotTable
        return SnapshotTable(spark, out_dir, "crawldb",
                             sort=False).read(rnd)
    rounds = _rounds_of(out_dir, "crawldb")
    if not rounds:
        raise SystemExit(f"no committed crawldb under {out_dir}")
    use = max(rounds) if rnd is None else rnd
    return spark.read.parquet(
        os.path.join(out_dir, "crawldb", f"round={use}"))


def _load_seg(spark, out_dir: str, name: str, rnd: int | None = None):
    """One per-round segment/linkdb table (parquet layout), or None."""
    rounds = _rounds_of(out_dir, name)
    if not rounds:
        return None
    use = max(rounds) if rnd is None else rnd
    if use not in rounds:
        return None
    return spark.read.parquet(
        os.path.join(out_dir, name, f"round={use}"))


def _emit(obj) -> None:
    print(json.dumps(obj))


# --- crawl lifecycle -----------------------------------------------------

def cmd_crawl(args):
    spark = _spark(args)
    t = _tables(spark, args)
    from .config import CrawlConfig
    from .crawl import CrawlRun
    cfg = CrawlConfig(generate_top_n=args.top_n,
                      generate_max_count=args.max_count,
                      num_fetch_partitions=args.cores * 2)
    run = CrawlRun(spark, args.out_dir, cfg, t["pages"], t["robots"],
                   t["http_status"], seen_filter=args.seen_filter)
    if args.seeds:
        seeds = spark.read.text(args.seeds) \
            .withColumnRenamed("value", "line")
    else:
        seeds = t["seeds"]
    db = run.crawl(seeds, rounds=args.rounds,
                   start_ms=int(time.time() * 1000))
    stats = {r["status"]: r["count"]
             for r in db.groupBy("status").count().collect()}
    _emit({"rounds": run.resume_round(), "crawldb": stats})


def cmd_inject(args):
    spark = _spark(args)
    run = _run_for(spark, args)
    seeds = spark.read.text(args.seeds).withColumnRenamed("value", "line")
    db = run.inject(seeds, int(time.time() * 1000))
    _emit({"urls": db.count()})


def cmd_freegen(args):
    """FreeGenerator (tools/FreeGenerator.java): fetchlist straight
    from a url list, no crawldb."""
    from .config import CrawlConfig
    from .operators import generate as gen_op
    spark = _spark(args)
    urls = spark.read.text(args.urls).withColumnRenamed("value", "line")
    fl = gen_op.free_generate(urls, CrawlConfig(),
                              int(time.time() * 1000),
                              normalize=args.normalize,
                              filter_urls=args.filter)
    fl.write.mode("overwrite").parquet(args.dest)
    _emit({"fetchlist": spark.read.parquet(args.dest).count(),
           "dest": args.dest})


def cmd_round_stage(args):
    raise SystemExit(
        f"'{args.cmd}' is not separately submittable: the round is one "
        f"declarative Spark plan (run `crawl --rounds 1`; the service "
        f"layer rejects {args.cmd.upper()} for the same reason)")


def cmd_purge(args):
    spark = _spark(args)
    run = _run_for(spark, args)
    _emit(run.purge_gone(run.resume_round()))


# --- crawldb readers / maintenance ---------------------------------------

def cmd_readdb(args):
    from .operators import readers
    spark = _spark(args)
    db = _load_crawldb(spark, args.out_dir)
    if args.stats:
        readers.crawldb_stats(db).show(truncate=False)
    elif args.top_n:
        readers.crawldb_top_n(db, args.top_n).show(args.top_n,
                                                   truncate=False)
    elif args.url:
        readers.crawldb_get(db, args.url).show(truncate=False)
    elif args.dump:
        from .operators.sources import dump_crawldb
        dump_crawldb(db, args.dump, fmt=args.format)
        _emit({"dumped": args.dump})


def cmd_mergedb(args):
    """CrawlDbMerger (crawl/CrawlDbMerger.java): newest datum per url
    across dbs, metadata merged."""
    from .operators import merge as merge_op
    spark = _spark(args)
    dbs = [_load_crawldb(spark, d) for d in args.dbs]
    out = merge_op.merge_crawldbs(dbs)
    out.write.mode("overwrite").parquet(
        os.path.join(args.dest, "crawldb", "round=0"))
    _emit({"urls": spark.read.parquet(
        os.path.join(args.dest, "crawldb", "round=0")).count()})


def cmd_dedup(args):
    """DeduplicationJob: mark signature-duplicates db_duplicate in the
    latest snapshot and commit it as the next round."""
    from .operators import dedup as dedup_op
    spark = _spark(args)
    run = _run_for(spark, args)
    rnd = run.resume_round()
    db = run.load_crawldb(rnd)
    marked = dedup_op.dedup(db)
    staged = run._stage_crawldb(marked, rnd + 1)
    n = run._rows_or_count(staged)
    if run.use_bloom:
        run._write_bloom(staged, rnd + 1)
    run._commit_crawldb(rnd + 1)
    dupes = run.load_crawldb(rnd + 1) \
        .where("status = 'db_duplicate'").count()
    _emit({"round": rnd + 1, "crawldb_rows": n, "duplicates": dupes})


# --- linkdb / segments ---------------------------------------------------

def cmd_readlinkdb(args):
    from .config import CrawlConfig
    from .operators import linkdb as linkdb_op, readers
    spark = _spark(args)
    # the reference LinkDb is cumulative; per-round inversions are
    # merged on read (LinkDbMerger semantics)
    rounds = _rounds_of(args.out_dir, "linkdb")
    if not rounds:
        raise SystemExit(f"no linkdb under {args.out_dir}")
    dbs = [_load_seg(spark, args.out_dir, "linkdb", r) for r in rounds]
    ldb = dbs[0] if len(dbs) == 1 else \
        linkdb_op.merge_linkdbs(dbs, CrawlConfig())
    if args.url:
        readers.linkdb_lookup(ldb, args.url).show(truncate=False)
    elif args.dump:
        ldb.selectExpr("to_json(struct(*)) AS line") \
            .write.mode("overwrite").text(args.dump)
        _emit({"dumped": args.dump})


def cmd_readseg(args):
    from .operators import readers
    spark = _spark(args)
    rnd = args.round
    tables = {n.split("/")[-1]: _load_seg(spark, args.out_dir,
                                          f"segments/{n}", rnd)
              for n in ("crawl_generate", "crawl_fetch", "parse_text",
                        "parse_data")}
    out = readers.segment_reader(args.get, **tables)
    if out is None:
        raise SystemExit(f"no segments under {args.out_dir}")
    out.show(truncate=60, vertical=True)


def cmd_mergesegs(args):
    from .operators import merge as merge_op
    spark = _spark(args)
    rounds = [int(r) for r in args.rounds.split(",")] if args.rounds \
        else _rounds_of(args.out_dir, "segments/crawl_fetch")
    segs = [s for s in (_load_seg(spark, args.out_dir,
                                  "segments/crawl_fetch", r)
                        for r in rounds) if s is not None]
    if not segs:
        raise SystemExit("no crawl_fetch segments to merge")
    out = merge_op.merge_segments(segs, status_col="status")
    out.write.mode("overwrite").parquet(args.dest)
    _emit({"urls": spark.read.parquet(args.dest).count(),
           "rounds": rounds})


def cmd_invertlinks(args):
    """LinkDb (crawl/LinkDb.java): standalone link inversion over a
    committed round's parse_data — the round driver also does this
    inline, but the reference job re-runs it over arbitrary segments
    (e.g. after changing ignore-internal settings)."""
    from .config import CrawlConfig
    from .operators import linkdb as linkdb_op, parse as parse_op
    spark = _spark(args)
    rounds = [args.round] if args.round is not None else \
        _rounds_of(args.out_dir, "segments/parse_data")
    edges = None
    for r in rounds:
        pd_ = _load_seg(spark, args.out_dir, "segments/parse_data", r)
        if pd_ is None:
            continue
        e = parse_op.outlink_edges(pd_)
        edges = e if edges is None else edges.unionByName(e)
    if edges is None:
        raise SystemExit(f"no parse_data under {args.out_dir}")
    ldb = linkdb_op.invert_links(edges, CrawlConfig())
    ldb.write.mode("overwrite").parquet(args.dest)
    _emit({"urls": spark.read.parquet(args.dest).count(),
           "rounds": rounds})


def cmd_mergelinkdb(args):
    """LinkDbMerger: inlink-set union across linkdbs, cap re-applied."""
    from .config import CrawlConfig
    from .operators import linkdb as linkdb_op
    spark = _spark(args)
    dbs = [spark.read.parquet(d) for d in args.dbs]
    out = linkdb_op.merge_linkdbs(dbs, CrawlConfig())
    out.write.mode("overwrite").parquet(args.dest)
    _emit({"urls": spark.read.parquet(args.dest).count()})


# --- index / dumps -------------------------------------------------------

def cmd_index(args):
    spark = _spark(args)
    run = _run_for(spark, args)
    _emit(run.index_round(args.round))


def cmd_clean(args):
    from .operators import readers
    spark = _spark(args)
    db = _load_crawldb(spark, args.out_dir)
    readers.cleaning_job(db).show(truncate=False)


def cmd_dump(args):
    """FileDumper (tools/FileDumper.java) over the fetched content of
    the latest round (pages-side html, md5 two-level paths)."""
    from .operators.sources import file_dumper
    from pyspark.sql import functions as F
    spark = _spark(args)
    t = _tables(spark, args)
    cf = _load_seg(spark, args.out_dir, "segments/crawl_fetch")
    if cf is None:
        raise SystemExit(f"no crawl_fetch under {args.out_dir}")
    content = (cf.where(F.col("status") == "fetch_success")
               .select("url").join(t["pages"], "url")
               .select("url", "html"))
    if args.mime_stats:
        file_dumper(content, mime_types=args.mime_types,
                    mime_stats=True).show(truncate=False)
    else:
        out = file_dumper(content, mime_types=args.mime_types)
        out.write.mode("overwrite").parquet(args.dest)
        _emit({"files": spark.read.parquet(args.dest).count(),
               "dest": args.dest})


def cmd_commoncrawldump(args):
    from .operators.sources import dump_commoncrawl
    spark = _spark(args)
    pt = _load_seg(spark, args.out_dir, "segments/parse_text")
    pd_ = _load_seg(spark, args.out_dir, "segments/parse_data")
    cf = _load_seg(spark, args.out_dir, "segments/crawl_fetch")
    if None in (pt, pd_, cf):
        raise SystemExit(f"missing segment tables under {args.out_dir}")
    dump_commoncrawl(pt, pd_, cf, args.dest)
    _emit({"dest": args.dest})


# --- checkers ------------------------------------------------------------

def _checker_content(spark, args, now_ms):
    """One-row fetch-content frame (the shape fetch() hands to
    parse_segment) for a local html file — no live network in this
    substitution, so the checker parses a file the caller fetched."""
    with open(args.html, "rb") as f:
        blob = f.read()
    return spark.createDataFrame(
        [(args.url, blob, None, None, now_ms, 1.0, 3600, None)],
        "url string, html binary, text string, lang string, "
        "fetch_time long, score double, fetch_interval int, "
        "metadata map<string,string>")


def cmd_parsechecker(args):
    """ParserChecker over a local html file (no live network in this
    substitution — the reference fetches the url first)."""
    from .config import CrawlConfig
    from .operators import checkers
    spark = _spark(args)
    now = int(time.time() * 1000)
    checkers.parser_checker(_checker_content(spark, args, now),
                            CrawlConfig(), now) \
        .show(truncate=80, vertical=True)


def cmd_indexchecker(args):
    """IndexingFiltersChecker: run the full IndexerMapReduce doc
    emission + indexing-filter chain over one locally-parsed page and
    dump the resulting (url, field, value) rows."""
    from pyspark.sql import functions as F
    from .config import CrawlConfig
    from .operators import (checkers, indexing_filters, readers,
                            parse as parse_op)
    spark = _spark(args)
    cfg = CrawlConfig()
    now = int(time.time() * 1000)
    content = _checker_content(spark, args, now)
    pr = parse_op.parse_segment(content, cfg, now)
    db = content.select(
        "url", F.lit("db_fetched").alias("status"), "score",
        F.lit(None).cast("binary").alias("signature"))
    cf = content.select(
        "url", F.lit("fetch_success").alias("status"), "fetch_time",
        "metadata")
    doc = readers.indexer_docs(db, None, pr["parse_text"],
                               pr["parse_data"], cf, cfg)
    docs = indexing_filters.apply_indexing_filters(doc, cfg)
    checkers.indexing_filters_checker(docs).show(100, truncate=80)


def cmd_domainstats(args):
    from .operators import readers
    spark = _spark(args)
    db = _load_crawldb(spark, args.out_dir)
    readers.domain_statistics(db, mode=args.mode) \
        .show(args.topn, truncate=False)


# --- webgraph family -----------------------------------------------------

def _graph_edges(spark, args):
    from .operators import parse as parse_op
    pd_ = _load_seg(spark, args.out_dir, "segments/parse_data")
    if pd_ is None:
        raise SystemExit(f"no parse_data under {args.out_dir}")
    return parse_op.outlink_edges(pd_)


def cmd_webgraph(args):
    from .config import CrawlConfig
    from .operators import linkdb as linkdb_op
    spark = _spark(args)
    db = _load_crawldb(spark, args.out_dir)
    wg = linkdb_op.webgraph(_graph_edges(spark, args),
                            db.select("url", "score"), CrawlConfig())
    base = os.path.join(args.out_dir, "webgraph")
    wg["outlinkdb"].write.mode("overwrite") \
        .parquet(os.path.join(base, "outlinkdb"))
    wg["nodedb"].write.mode("overwrite") \
        .parquet(os.path.join(base, "nodedb"))
    _emit({"nodes": spark.read.parquet(
        os.path.join(base, "nodedb")).count()})


def cmd_linkrank(args):
    from .operators import linkdb as linkdb_op
    spark = _spark(args)
    edges = _graph_edges(spark, args).select("from_url", "to_url")
    loops = linkdb_op.find_loops(edges, depth=2)
    ranks = linkdb_op.linkrank(edges, iterations=args.iterations,
                               loops=loops)
    path = os.path.join(args.out_dir, "webgraph", "linkrank")
    ranks.write.mode("overwrite").parquet(path)
    _emit({"ranked": spark.read.parquet(path).count()})


def cmd_scoreupdater(args):
    from .operators import linkdb as linkdb_op
    spark = _spark(args)
    run = _run_for(spark, args)
    rnd = run.resume_round()
    ranks = spark.read.parquet(
        os.path.join(args.out_dir, "webgraph", "linkrank"))
    db = linkdb_op.score_updater(run.load_crawldb(rnd), ranks)
    staged = run._stage_crawldb(db, rnd + 1)
    n = run._rows_or_count(staged)
    if run.use_bloom:
        run._write_bloom(staged, rnd + 1)
    run._commit_crawldb(rnd + 1)
    _emit({"round": rnd + 1, "crawldb_rows": n})


def cmd_nodedumper(args):
    from .operators import linkdb as linkdb_op
    spark = _spark(args)
    nodedb = spark.read.parquet(
        os.path.join(args.out_dir, "webgraph", "nodedb"))
    linkdb_op.node_dumper(nodedb, by=args.by, n=args.topn) \
        .show(args.topn, truncate=False)


# --- server --------------------------------------------------------------

def cmd_startserver(args):
    from .service import NutchService, make_server
    spark = _spark(args)
    t = _tables(spark, args)
    svc = NutchService(spark, args.out_dir, t["pages"], t["robots"],
                       t["http_status"])
    server = make_server(svc, port=args.port)
    print(f"NutchServer analog on :{server.server_address[1]} "
          f"(Ctrl-C stops)", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


def main(argv=None):
    p = argparse.ArgumentParser(prog="nutch_spark")
    p.add_argument("--cores", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, fn, *, out_dir=True, tables=False):
        sp = sub.add_parser(name)
        if out_dir:
            sp.add_argument("out_dir")
        if tables:
            sp.add_argument("--pages-dir")
            sp.add_argument("--fixture", action="store_true")
        sp.set_defaults(fn=fn)
        return sp

    c = add("crawl", cmd_crawl, tables=True)
    c.add_argument("--seeds")
    c.add_argument("--rounds", type=int, default=3)
    c.add_argument("--top-n", type=int, default=50000)
    c.add_argument("--max-count", type=int, default=-1)
    c.add_argument("--seen-filter",
                   choices=["bloom", "cuckoo", "none"], default=None)

    i = add("inject", cmd_inject, tables=True)
    i.add_argument("seeds")

    fg = add("freegen", cmd_freegen, out_dir=False)
    fg.add_argument("urls")
    fg.add_argument("dest")
    fg.add_argument("--no-normalize", dest="normalize",
                    action="store_false")
    fg.add_argument("--no-filter", dest="filter", action="store_false")

    for stage in ROUND_STAGES:
        add(stage, cmd_round_stage, out_dir=False)

    r = add("readdb", cmd_readdb)
    r.add_argument("--stats", action="store_true")
    r.add_argument("--topN", dest="top_n", type=int)
    r.add_argument("--url")
    r.add_argument("--dump")
    r.add_argument("--format", default="json")

    m = sub.add_parser("mergedb")
    m.add_argument("dest")
    m.add_argument("dbs", nargs="+")
    m.set_defaults(fn=cmd_mergedb)

    add("dedup", cmd_dedup, tables=True)
    pg = add("purge", cmd_purge, tables=True)
    pg.add_argument("--seen-filter",
                    choices=["bloom", "cuckoo", "none"], default=None)

    rl = add("readlinkdb", cmd_readlinkdb)
    rl.add_argument("--url")
    rl.add_argument("--dump")

    rs = add("readseg", cmd_readseg)
    rs.add_argument("--get", required=True)
    rs.add_argument("--round", type=int)

    ms = add("mergesegs", cmd_mergesegs)
    ms.add_argument("dest")
    ms.add_argument("--rounds")

    il = add("invertlinks", cmd_invertlinks)
    il.add_argument("dest")
    il.add_argument("--round", type=int)

    ml = sub.add_parser("mergelinkdb")
    ml.add_argument("dest")
    ml.add_argument("dbs", nargs="+")
    ml.set_defaults(fn=cmd_mergelinkdb)

    ix = add("index", cmd_index, tables=True)
    ix.add_argument("--round", type=int)

    add("clean", cmd_clean)

    dp = add("dump", cmd_dump, tables=True)
    dp.add_argument("dest")
    dp.add_argument("--mime-types", nargs="*")
    dp.add_argument("--mime-stats", action="store_true")

    cc = add("commoncrawldump", cmd_commoncrawldump)
    cc.add_argument("dest")

    for name, fn in (("parsechecker", cmd_parsechecker),
                     ("indexchecker", cmd_indexchecker)):
        ch = add(name, fn, out_dir=False)
        ch.add_argument("--url", required=True)
        ch.add_argument("--html", required=True)

    ds = add("domainstats", cmd_domainstats)
    ds.add_argument("--mode", choices=["host", "domain"],
                    default="host")
    ds.add_argument("--topn", type=int, default=20)

    add("webgraph", cmd_webgraph)
    lr = add("linkrank", cmd_linkrank)
    lr.add_argument("--iterations", type=int, default=10)
    add("scoreupdater", cmd_scoreupdater, tables=True)
    nd = add("nodedumper", cmd_nodedumper)
    nd.add_argument("--by", choices=["score", "inlinks", "outlinks"],
                    default="score")
    nd.add_argument("--topn", type=int, default=20)

    sv = add("startserver", cmd_startserver, tables=True)
    sv.add_argument("--port", type=int, default=8081)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
