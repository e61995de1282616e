"""Scaling-efficiency evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the two-cluster-size
criterion is evidenced by running the identical fetch-cycle workload at
two parallelism levels — local[8] vs local[32] (N and 4N cores) — on
the same input, with shuffle partitions scaled with cores, and
reporting URLs/sec at both plus efficiency
    eff = (T_low × cores_low) / (T_high × cores_high)
(≥ 0.8 required). Each level runs in its own subprocess (one JVM per
measurement; startup excluded via an in-process warmup round).

Workload: the derived Common-Crawl-style frontier scaled ×REPL by
replicating the documents table with perturbed ids/text, then one full
generate → fetch(politeness) → parse → updatedb cycle.

Writes BENCH.md. Usage: python scripts/scaling.py [--cores N --json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = int(os.environ.get("SPARK_GRAFT_SCALING_REPL", "40"))
LOW, HIGH = 8, 32


def scaled_inputs(spark, sf: str, repl: int):
    """documents ×repl with distinct ids/urls → frontier + pages."""
    from pyspark.sql import functions as F
    import __spark_entry__ as e

    d = e._docs(spark, sf)
    r = spark.range(repl).select(F.col("id").alias("r"))
    big = (d.crossJoin(r)
           .select((F.col("doc_id") * repl + F.col("r"))
                   .alias("doc_id"),
                   F.concat(F.col("text"), F.lit(" v"),
                            F.col("r").cast("string")).alias("text"),
                   "lang"))
    i = F.col("doc_id")
    crawldb = big.select(
        e._url(i).alias("url"),
        F.lit("db_unfetched").alias("status"),
        ((i % 100) * 1000).cast("long").alias("fetch_time"),
        F.lit(0).cast("int").alias("retries"),
        F.lit(3600).cast("int").alias("fetch_interval"),
        ((i % 97) / 10.0).cast("double").alias("score"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(0).cast("long").alias("modified_time"),
        F.lit(None).cast("map<string,string>").alias("metadata"))
    pages = big.select(
        e._url(i).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        "text", "lang")
    return crawldb, pages


def one_cycle(spark, crawldb, pages, cores: int) -> int:
    from pyspark.sql import functions as F
    import __spark_entry__ as e
    from nutch_spark.operators import (fetch as fetch_op,
                                       generate as gen_op,
                                       parse as parse_op,
                                       updatedb as update_op)

    cfg = e.CFG.with_(generate_top_n=-1, generate_filter=False,
                      num_fetch_partitions=cores * 2)
    fl = gen_op.generate(crawldb, cfg, cur_time_ms=e.CUR_TIME_MS,
                         gen_time_ms=e.CUR_TIME_MS)
    robots = spark.createDataFrame(
        [], "authority string, robots_txt string, fetch_code int")
    fr = fetch_op.fetch(fl, pages, robots, None, cfg, e.CUR_TIME_MS)
    pr = parse_op.parse_segment(fr["content"], cfg, e.CUR_TIME_MS)
    msgs = (fr["crawl_fetch"].drop("queue_id", "virtual_time")
            .unionByName(pr["crawl_parse"])
            .unionByName(fr["linked"]))
    out = update_op.updatedb(crawldb, msgs, cfg, e.CUR_TIME_MS)
    n = fr["crawl_fetch"].count()
    out.write.format("noop").mode("overwrite").save()
    return n


def run_level(cores: int) -> dict:
    from nutch_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-{cores}", cores=cores,
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    crawldb, pages = scaled_inputs(spark, SF_DIR, REPL)
    # a 100 TB input arrives as thousands of parquet splits; the tiny
    # derived table arrives as ONE — spread it so the measurement
    # exercises the operators, not a serial scan
    crawldb = crawldb.repartition(cores * 2).cache()
    pages = pages.repartition(cores * 2).cache()
    crawldb.count(), pages.count()
    one_cycle(spark, crawldb, pages, cores)      # warmup (codegen, UDF
    t0 = time.time()                             # workers, broadcast)
    urls = one_cycle(spark, crawldb, pages, cores)
    sec = time.time() - t0
    return {"cores": cores, "sec": round(sec, 2), "urls": urls,
            "urls_per_sec": round(urls / sec, 1)}


def main() -> None:
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
        print(json.dumps(run_level(cores)))
        return

    results = {}
    for cores in (LOW, HIGH):
        out = subprocess.run(
            [sys.executable, __file__, "--cores", str(cores)],
            capture_output=True, text=True, cwd="/root/repo",
            timeout=3600)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(results[cores])

    t_low, t_high = results[LOW]["sec"], results[HIGH]["sec"]
    eff = (t_low * LOW) / (t_high * HIGH)
    summary = {
        "low": results[LOW], "high": results[HIGH],
        "scaling_efficiency": round(eff, 3),
        "meets_north_rule": eff >= 0.8,
    }
    print(json.dumps(summary))

    with open("/root/repo/BENCH.md", "w") as f:
        f.write(f"""# BENCH — scaling evidence (north rule)

Protocol (SURVEY.md §6): identical fetch-cycle workload (generate →
fetch w/ virtual-time politeness → parse → updatedb) over a derived
CC-style frontier of {results[LOW]['urls']:,} URLs
(documents ×{REPL} at {SF_DIR}), run at two parallelism levels in
separate JVMs, shuffle partitions = 2×cores, warmup cycle excluded.

| cores | wall (s) | URLs/s | URLs/s/core |
|---|---|---|---|
| {LOW} (N) | {t_low} | {results[LOW]['urls_per_sec']} | {round(results[LOW]['urls_per_sec']/LOW,1)} |
| {HIGH} (4N) | {t_high} | {results[HIGH]['urls_per_sec']} | {round(results[HIGH]['urls_per_sec']/HIGH,1)} |

**Scaling efficiency (N→4N) = (T_N·N)/(T_4N·4N) = {round(eff,3)}**
(north rule requires ≥ 0.8: {"MET" if eff >= 0.8 else "NOT MET"}).

Why it scales: every stage is shuffle-parallel with keys that grow
with the data (url, salted host, queue_id); politeness partitioning is
an explicit `repartition(4×cores, fetch_partition)`; the only
broadcast is the robots table; no collect/driver loops anywhere in the
cycle.
""")


if __name__ == "__main__":
    main()
