"""Command-line crawl driver — the ``bin/crawl`` / ``bin/nutch``
equivalent, launched with ``spark-submit --py-files nutch_spark.zip
-m nutch_spark.cli`` (or plain ``python -m nutch_spark.cli`` locally).

Commands mirror the reference CLI dispatch (src/bin/nutch:211-282):

  crawl     seeds.txt out_dir --rounds N      (bin/crawl:18-27)
  inject    out_dir seeds.txt
  readdb    out_dir --stats | --topN N | --url U | --dump d
  bench     (delegates to bench.py)

The pages/robots/http_status tables come from ``--pages-dir`` (parquet
dirs named pages/, robots/, http_status/) or, with ``--fixture``, from
the deterministic synthesizer (testdata.py).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _spark(args):
    from .session import get_spark
    return get_spark(app_name="nutch-spark-cli", cores=args.cores,
                     shuffle_partitions=args.cores * 2)


def _tables(spark, args):
    if args.fixture:
        from .testdata import fixture_dfs
        return fixture_dfs(spark)
    base = args.pages_dir
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


def cmd_crawl(args):
    from .config import CrawlConfig
    from .crawl import CrawlRun

    spark = _spark(args)
    t = _tables(spark, args)
    cfg = CrawlConfig(generate_top_n=args.top_n,
                      generate_max_count=args.max_count,
                      num_fetch_partitions=args.cores * 2)
    run = CrawlRun(spark, args.out_dir, cfg, t["pages"], t["robots"],
                   t["http_status"])
    if args.seeds:
        seeds = spark.read.text(args.seeds) \
            .withColumnRenamed("value", "line")
    else:
        seeds = t["seeds"]
    db = run.crawl(seeds, rounds=args.rounds,
                   start_ms=int(time.time() * 1000))
    stats = {r["status"]: r["count"]
             for r in db.groupBy("status").count().collect()}
    print(json.dumps({"rounds": run.resume_round(),
                      "crawldb": stats}))


def cmd_inject(args):
    from .config import CrawlConfig
    from .crawl import CrawlRun

    spark = _spark(args)
    t = _tables(spark, args)
    run = CrawlRun(spark, args.out_dir, CrawlConfig(), t["pages"],
                   t["robots"], t["http_status"])
    seeds = spark.read.text(args.seeds).withColumnRenamed("value", "line")
    db = run.inject(seeds, int(time.time() * 1000))
    print(json.dumps({"urls": db.count()}))


def cmd_readdb(args):
    from . import operators
    from .operators import readers

    spark = _spark(args)
    rnd_base = os.path.join(args.out_dir, "crawldb")
    rounds = [int(d.split("=")[1]) for d in os.listdir(rnd_base)
              if d.startswith("round=")]
    db = spark.read.parquet(
        os.path.join(rnd_base, f"round={max(rounds)}"))
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
        print(f"dumped to {args.dump}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="nutch_spark")
    p.add_argument("--cores", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("out_dir")
    c.add_argument("--seeds")
    c.add_argument("--rounds", type=int, default=3)
    c.add_argument("--top-n", type=int, default=50000)
    c.add_argument("--max-count", type=int, default=-1)
    c.add_argument("--pages-dir")
    c.add_argument("--fixture", action="store_true")
    c.set_defaults(fn=cmd_crawl)

    i = sub.add_parser("inject")
    i.add_argument("out_dir")
    i.add_argument("seeds")
    i.add_argument("--pages-dir")
    i.add_argument("--fixture", action="store_true")
    i.set_defaults(fn=cmd_inject)

    r = sub.add_parser("readdb")
    r.add_argument("out_dir")
    r.add_argument("--stats", action="store_true")
    r.add_argument("--topN", dest="top_n", type=int)
    r.add_argument("--url")
    r.add_argument("--dump")
    r.add_argument("--format", default="json")
    r.set_defaults(fn=cmd_readdb)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
