"""Per-stage wall-clock profile of the scaling-cycle workload.

Diagnoses the N->4N scaling gap: runs the identical fetch-cycle used by
scripts/scaling.py but times each blocking stage boundary separately,
so the non-scaling term (driver planning, Python-worker startup,
single-partition stages, memory-bandwidth-bound shuffles) is visible.

Usage:  taskset -c 0-7  python scripts/profile_cycle.py --cores 8
        taskset -c 0-31 python scripts/profile_cycle.py --cores 32
Env:    SPARK_GRAFT_SCALING_REPL (default 400 -> 8M URLs at sf0.1)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import os

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = int(os.environ.get("SPARK_GRAFT_SCALING_REPL", "400"))
CYCLES = int(os.environ.get("SPARK_GRAFT_PROFILE_CYCLES", "6"))


def timed_cycle(spark, crawldb, pages, cores: int) -> dict:
    import __spark_entry__ as e
    from nutch_spark.operators import (fetch as fetch_op,
                                       generate as gen_op,
                                       parse as parse_op,
                                       updatedb as update_op)

    t = {}

    def mark(name, t0):
        t[name] = round(time.time() - t0, 2)
        return time.time()

    cfg = e.CFG.with_(generate_top_n=-1, generate_filter=False,
                      num_fetch_partitions=cores * 2,
                      page_cache_storage="NONE")
    t0 = time.time()
    robots = spark.createDataFrame(
        [], "authority string, robots_txt string, fetch_code int")
    # two-phase fetch, mirroring scripts/scaling.one_cycle: generate
    # flows into the politeness schedule, which is the cycle's single
    # materialization point for the frontier side
    fl = gen_op.generate(crawldb, cfg, cur_time_ms=e.CUR_TIME_MS,
                         gen_time_ms=e.CUR_TIME_MS,
                         partition_output=False)
    sched = fetch_op.schedule_fetchlist(
        fl, pages, robots, None, cfg, e.CUR_TIME_MS) \
        .localCheckpoint(eager=True)
    t0 = mark("generate_schedule", t0)
    fr = fetch_op.outputs_from_schedule(sched, pages, cfg)
    pr = parse_op.parse_segment(fr["content"], cfg, e.CUR_TIME_MS)
    crawl_parse = pr["crawl_parse"].localCheckpoint(eager=True)
    t0 = mark("parse", t0)
    msgs = (fr["crawl_fetch"].drop("queue_id", "virtual_time")
            .unionByName(crawl_parse)
            .unionByName(fr["linked"]))
    out = update_op.updatedb(crawldb, msgs, cfg, e.CUR_TIME_MS)
    n = fr["crawl_fetch"].count()
    t0 = mark("count", t0)
    out.write.format("noop").mode("overwrite").save()
    mark("updatedb_write", t0)
    t["total"] = round(sum(t.values()), 2)
    t["urls"] = n
    return t


def main() -> None:
    cores = int(sys.argv[sys.argv.index("--cores") + 1])
    from scripts.scaling import scaled_inputs
    from nutch_spark.session import get_spark

    import shutil

    base = f"/dev/shm/profile-inputs-{cores}"
    shutil.rmtree(base, ignore_errors=True)
    spark = get_spark(app_name=f"profile-{cores}", cores=cores,
                      shuffle_partitions=cores * 2,
                      extra_conf={"spark.sql.warehouse.dir": base})
    spark.sparkContext.setLogLevel("ERROR")
    # bucketed input tables — the Iceberg bucket(url, N) stand-in; see
    # scripts/scaling.run_level
    crawldb0, pages0 = scaled_inputs(spark, SF_DIR, REPL)
    crawldb0.write.mode("overwrite").bucketBy(cores * 2, "url") \
        .sortBy("url").saveAsTable("crawldb_t")
    pages0.write.mode("overwrite").bucketBy(cores * 2, "url") \
        .sortBy("url").saveAsTable("pages_t")
    crawldb = spark.table("crawldb_t")
    pages = spark.table("pages_t")
    jvm_gc = spark.sparkContext._jvm.System.gc
    for i in range(CYCLES):
        t = timed_cycle(spark, crawldb, pages, cores)
        print(json.dumps({"cores": cores, "cycle": i, **t}), flush=True)
        spark.catalog.clearCache()
        jvm_gc()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
