"""A/B: the updatedb inlink-cap plan shapes (VERDICT r04 task #3).

Hot-split (count pass finds over-cap urls, window sorts only those)
vs plain window-sort of the whole linked stream, on a linked-heavy
updatedb at ~10x the bench workload: lineitem at sf0.1 replicated
REPL x, joined against a crawldb built from the distinct targets, so
the merge's groupBy + full-outer join — the consumer that decides
whether the window's exchange+sort is reusable — is in the plan
exactly as in production (in updatedb the union with db/fetch rows
precedes the groupBy, so reuse should be impossible; find_loops'
window feeds a sort-merge join directly, which is why ITS split
measured neutral and was reverted, 639ed16).

Interleaved min-of-N (BENCH.md noise protocol): A B A B A B.

Usage: python scripts/ab_inlink_cap.py [repl] [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from nutch_spark.operators import updatedb as update_op
    from nutch_spark.session import get_spark

    spark = get_spark(app_name="ab-inlink-cap", cores=CPUS,
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    r = spark.range(repl).select(F.col("id").alias("r"))
    li = li.crossJoin(r)
    msgs = li.select(
        e._url(F.col("l_partkey")).alias("url"),
        F.lit("linked").alias("status"),
        (F.lit(1000) + F.col("r")).cast("long").alias("fetch_time"),
        F.lit(0).cast("int").alias("retries"),
        F.lit(e.CFG.db_fetch_interval_default).cast("int")
         .alias("fetch_interval"),
        (F.col("l_quantity") / 100.0 + F.col("r") / 1e6)
        .cast("double").alias("score"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(0).cast("long").alias("modified_time"),
        F.lit(None).cast("map<string,string>").alias("metadata"))
    db = spark.read.parquet(f"{SF}/part.parquet").select(
        e._url(F.col("p_partkey")).alias("url"),
        F.lit("db_unfetched").alias("status"),
        F.lit(0).cast("long").alias("fetch_time"),
        F.lit(0).cast("int").alias("retries"),
        F.lit(3600).cast("int").alias("fetch_interval"),
        F.lit(0.5).cast("double").alias("score"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(0).cast("long").alias("modified_time"),
        F.lit(None).cast("map<string,string>").alias("metadata"))
    n_msgs = msgs.count()

    def run(hot_split: bool) -> float:
        cfg = e.CFG.with_(inlink_cap_hot_split=hot_split)
        t0 = time.time()
        out = update_op.updatedb(db, msgs, cfg, e.LINK_NOW_MS)
        out.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # also A/B with a BINDING cap so both regimes are on record
    def run_binding(hot_split: bool) -> float:
        cfg = e.CFG.with_(inlink_cap_hot_split=hot_split,
                          db_update_max_inlinks=max(repl // 2, 1))
        t0 = time.time()
        out = update_op.updatedb(db, msgs, cfg, e.LINK_NOW_MS)
        out.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for fn in (run, run_binding):   # warm codegen paths once
        fn(True)

    res = {"hot_split": [], "window_all": [],
           "hot_split_binding": [], "window_all_binding": []}
    for _ in range(rounds):
        spark.catalog.clearCache()
        res["hot_split"].append(run(True))
        res["window_all"].append(run(False))
        res["hot_split_binding"].append(run_binding(True))
        res["window_all_binding"].append(run_binding(False))

    print(json.dumps({
        "sf_dir": SF, "repl": repl, "rows": n_msgs, "cores": CPUS,
        "min_sec": {k: round(min(v), 3) for k, v in res.items()},
        "all_sec": {k: [round(x, 3) for x in v] for k, v in res.items()},
    }))


if __name__ == "__main__":
    main()
