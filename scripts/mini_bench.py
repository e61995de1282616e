"""Quick A/B harness: time a handful of representative driver queries
under the current session settings. Usage: python scripts/mini_bench.py
(env SPARK_DRIVER_MEMORY / SPARK_GRAFT_CPUS respected)."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QUERIES = ["inject_merge", "updatedb_fetch", "generate_topn",
           "linkdb_invert", "fetch_politeness"]


def main():
    from nutch_spark.session import get_spark
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    spark = get_spark(app_name="mini-bench", cores=CPUS,
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    from nutch_spark.functions.urls import spark_udfs
    udfs = spark_udfs()
    warm = (spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(2000)
            .select(F.concat(F.lit("http://w.test/"),
                             F.col("doc_id").cast("string")).alias("u"))
            .select("u", udfs["canonicalize"](F.col("u")).alias("c"),
                    udfs["url_hash"](F.col("u")).alias("h"))
            .repartition(CPUS, "u").groupBy("h").agg(F.count("*").alias("n")))
    warm.write.format("noop").mode("overwrite").save()

    qs = e.queries()
    t = {}
    for name in QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t[name] = round(time.time() - t0, 2)
    print(json.dumps(t))


if __name__ == "__main__":
    main()
