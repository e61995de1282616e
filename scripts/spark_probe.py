"""Isolate which Spark substrate scales with cores on this host.

Three probes per parallelism level, all JVM-only except the last:
  codegen  — whole-stage-codegen sum over range() (pure CPU, no shuffle)
  shuffle  — hash repartition + groupBy count (shuffle write+read)
  arrow    — identity pandas UDF over a generated frame (Arrow + Python)

Usage: python scripts/spark_probe.py --cores N   (pin with taskset!)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    cores = int(sys.argv[sys.argv.index("--cores") + 1])
    from nutch_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name=f"probe-{cores}", cores=cores,
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    out = {"cores": cores}

    def timed(name, fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 2)

    # warmup: codegen + python workers
    spark.range(10_000_000).selectExpr("sum(xxhash64(id) % 1000)").collect()

    N_CODEGEN = 4_000_000_000
    timed("codegen", lambda: spark.range(N_CODEGEN, numPartitions=cores * 2)
          .selectExpr("sum(xxhash64(id) % 1000)").collect())

    N_SHUFFLE = 100_000_000
    timed("shuffle", lambda: spark.range(N_SHUFFLE, numPartitions=cores * 2)
          .repartition(cores * 2, F.col("id"))
          .groupBy((F.col("id") % 1_000_000).alias("k"))
          .agg(F.count("*").alias("n"))
          .write.format("noop").mode("overwrite").save())

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def ident(s: pd.Series) -> pd.Series:
        return s * 2 + 1

    N_ARROW = 50_000_000
    timed("arrow", lambda: spark.range(N_ARROW, numPartitions=cores * 2)
          .select(ident(F.col("id")).alias("v"))
          .selectExpr("sum(v % 1000)").collect())

    # window over synthetic queue ids — the politeness-schedule shape
    N_WIN = 20_000_000
    from pyspark.sql import Window
    w = Window.partitionBy("q").orderBy("id")
    timed("window", lambda: spark.range(N_WIN, numPartitions=cores * 2)
          .withColumn("q", F.col("id") % 2000)
          .withColumn("rn", F.row_number().over(w))
          .selectExpr("sum(rn % 1000)").collect())

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
