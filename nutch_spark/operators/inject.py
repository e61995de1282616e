"""Injector: seed list → CrawlDb merge.

Reference: Injector.java — InjectMapper (lines 95-192) parses one URL
per line with optional tab-separated ``k=v`` metadata (reserved keys
``nutch.score``, ``nutch.fetchInterval``, ``nutch.fetchInterval.fixed``),
normalizes (scope=inject) and filters; InjectReducer (lines 195-268)
merges with the existing db — existing rows win unless
``db.injector.update`` (overlay metadata, take non-default
score/interval) or ``db.injector.overwrite``.

Spark shape: seeds → select + canonicalize UDF + filter predicate →
full-outer join with crawldb on url → when/otherwise merge. The join is
url-equi and benefits from both sides being bucketed by url hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import CrawlConfig
from ..functions.filters import filter_accepts_col
from ..schema import DB_UNFETCHED, META_FIXED_INTERVAL

NUTCH_SCORE = "nutch.score"
NUTCH_INTERVAL = "nutch.fetchInterval"
NUTCH_FIXED_INTERVAL = "nutch.fetchInterval.fixed"
_RESERVED = (NUTCH_SCORE, NUTCH_INTERVAL, NUTCH_FIXED_INTERVAL)


def parse_seeds(seeds: DataFrame, cfg: CrawlConfig,
                now_ms: int) -> DataFrame:
    """Seed lines (column ``line``) → injected CRAWLDB rows.

    Vectorized: tab-split, metadata map from k=v pairs, reserved keys
    pulled out, canonicalization via the Arrow UDF, filter chain as
    JVM rlike when-chain (InjectMapper, Injector.java:95-192)."""
    df = (seeds
          .select(F.trim(F.col("line")).alias("line"))
          .where((F.length("line") > 0) & ~F.col("line").startswith("#"))
          .withColumn("parts", F.split("line", "\t"))
          .withColumn("raw_url", F.col("parts")[0])
          # k=v pairs after the first tab; anything without '=' skipped
          .withColumn(
              "kv",
              F.filter(F.slice(F.col("parts"), 2, 1_000_000),
                       lambda s: F.instr(s, "=") > 0))
          .withColumn(
              "meta_all",
              F.map_from_arrays(
                  F.transform("kv", lambda s: F.substring_index(s, "=", 1)),
                  F.transform("kv", lambda s: F.substr(
                      s, F.instr(s, "=") + 1, F.length(s))))))

    meta = F.coalesce(F.col("meta_all"), F.create_map())
    custom_score = F.element_at(meta, NUTCH_SCORE).cast("double")
    custom_interval = F.element_at(meta, NUTCH_INTERVAL).cast("int")
    fixed_interval = F.element_at(meta, NUTCH_FIXED_INTERVAL).cast("int")

    user_meta = F.map_filter(meta, lambda k, v: ~k.isin(*_RESERVED))
    user_meta = F.when(fixed_interval.isNotNull(),
                       F.map_concat(
                           user_meta,
                           F.create_map(F.lit(META_FIXED_INTERVAL),
                                        fixed_interval.cast("string")))) \
        .otherwise(user_meta)

    # scope=inject chain (Injector.java:143, URLNormalizers.SCOPE_INJECT)
    from ..functions.normalizers import normalizer_udf
    df = (df
          .withColumn("url", normalizer_udf(cfg, "inject")(F.col("raw_url")))
          .where(F.col("url").isNotNull())
          .transform(lambda d: filter_accepts_col(
              d, cfg.url_filter_rules, "url"))
          .where(F.col("accepted"))
          .select(
              "url",
              F.lit("injected").alias("status"),
              F.lit(now_ms).cast("long").alias("fetch_time"),
              F.lit(0).cast("int").alias("retries"),
              F.coalesce(fixed_interval, custom_interval,
                         F.lit(cfg.db_fetch_interval_default))
               .cast("int").alias("fetch_interval"),
              F.coalesce(custom_score, F.lit(cfg.db_score_injected))
               .cast("double").alias("score"),
              F.lit(None).cast("string").alias("signature"),
              F.lit(0).cast("long").alias("modified_time"),
              user_meta.alias("metadata"),
          ))
    # one injected row per url (reference reduce keeps an arbitrary one;
    # we keep the max-by-(score, interval) row for determinism —
    # metadata is excluded from the ordering key since maps are not
    # orderable)
    value_cols = [c for c in df.columns if c != "url"]
    order_key = F.struct("score", "fetch_interval", "fetch_time")
    return (df.groupBy("url")
              .agg(F.max_by(F.struct(*value_cols), order_key).alias("s"))
              .select("url", "s.*"))


def inject(crawldb: DataFrame | None, seeds: DataFrame, cfg: CrawlConfig,
           now_ms: int) -> DataFrame:
    """Full inject: parse seeds, merge with existing crawldb
    (InjectReducer, Injector.java:218-268)."""
    injected = parse_seeds(seeds, cfg, now_ms) \
        .withColumn("status", F.lit(DB_UNFETCHED))
    if crawldb is None:
        return injected

    inj = injected.select(
        "url", *[F.col(c).alias(f"inj_{c}")
                 for c in injected.columns if c != "url"])
    merged = crawldb.join(inj, "url", "full_outer")

    has_old = F.col("status").isNotNull()
    has_inj = F.col("inj_status").isNotNull()

    def pick(col: str) -> F.Column:
        take_injected = ~has_old | F.lit(cfg.db_injector_overwrite)
        base = F.when(take_injected, F.col(f"inj_{col}")) \
            .otherwise(F.col(col))
        if not cfg.db_injector_update or cfg.db_injector_overwrite:
            return base
        # update mode (Injector.java:253-260): keep old, overlay
        # metadata, take injected score/interval when non-default
        both = has_old & has_inj
        if col == "metadata":
            return F.when(both, F.map_concat(
                F.coalesce(F.col(col), F.create_map()),
                F.coalesce(F.col(f"inj_{col}"), F.create_map()))) \
                .otherwise(base)
        if col == "score":
            return F.when(
                both & (F.col(f"inj_{col}") != cfg.db_score_injected),
                F.col(f"inj_{col}")).otherwise(base)
        if col == "fetch_interval":
            return F.when(
                both & (F.col(f"inj_{col}") != cfg.db_fetch_interval_default),
                F.col(f"inj_{col}")).otherwise(base)
        return base

    value_cols = [c for c in crawldb.columns if c != "url"]
    return merged.select("url", *[pick(c).alias(c) for c in value_cols])
