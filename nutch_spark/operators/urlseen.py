"""Distributed URL-seen set: partitioned bloom filters + exact anti-join.

The reference's URL-seen set is the CrawlDb itself — every updatedb
round reduces discovered outlinks against the full db by url key
(CrawlDbReducer co-group). At 10^10 frontier URLs, shuffling every
discovered outlink against the whole frontier is the dominant cost, so
the north rule adds a **partitioned bloom layer keyed by
canonicalized-URL hash**:

- ``build_bloom``: frontier urls → ``xxhash64(url)`` → bucket =
  ``pmod(hash, n_buckets)``; per bucket a bloom bitset is built in one
  Arrow batch (``applyInPandas``, vectorized numpy double-hashing:
  index_i = (h1 + i·h2) mod m). One row per bucket:
  ``(bucket, bits binary, n_items, n_hashes, m_bits)``.
- ``split_seen``: discovered urls are bucketed the same way, joined
  against the bloom table **on bucket** (co-partitioned shuffle join —
  never a broadcast of the full frontier), membership-tested in a
  vectorized UDF. Bloom misses are *definitely new* and skip the exact
  join entirely; bloom hits (incl. false positives at ~fpp) go through
  the exact ``left_anti`` join against the frontier. Correctness stays
  exact — the bloom only prunes.

Blooms are rebuilt (or incrementally OR-ed) per round and persisted
alongside the crawldb snapshot; at 10^10 urls with 10 bits/url the
layer is ~12 GB total, spread over n_buckets rows that co-partition
with the url-hash-bucketed Iceberg table.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StructField, StructType,
)

BLOOM_SCHEMA = StructType([
    StructField("bucket", IntegerType(), False),
    StructField("bits", BinaryType(), False),
    StructField("n_items", LongType(), False),
    StructField("n_hashes", IntegerType(), False),
    StructField("m_bits", LongType(), False),
])

_MASK = (1 << 64) - 1


def _hash_cols(df: DataFrame, url_col: str, n_buckets: int) -> DataFrame:
    h = F.xxhash64(F.col(url_col))
    return (df.withColumn("_h64", h)
              .withColumn("_bucket",
                          F.pmod(h, F.lit(n_buckets)).cast("int")))


def _indices(h64: np.ndarray, k: int, m: int) -> np.ndarray:
    """Double hashing: k probe positions per item, shape (k, n)."""
    h = h64.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = ((h >> np.uint64(33)) << np.uint64(1)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).astype(np.int64)


def build_bloom(urls: DataFrame, url_col: str = "url",
                n_buckets: int = 64, bits_per_item: int = 10,
                min_bits: int = 1 << 12) -> DataFrame:
    """Per-bucket bloom filters over the url set. Returns BLOOM_SCHEMA
    rows (one per non-empty bucket)."""
    k = max(1, int(round(bits_per_item * math.log(2))))  # optimal k
    hashed = _hash_cols(urls.select(url_col), url_col, n_buckets) \
        .select("_bucket", "_h64")

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["_h64"].to_numpy(dtype=np.int64)
        n = len(h)
        m = max(min_bits, 1 << int(math.ceil(math.log2(
            max(1, n * bits_per_item)))))
        bits = np.zeros(m // 8, dtype=np.uint8)
        idx = _indices(h, k, m).ravel()
        np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        return pd.DataFrame({
            "bucket": [int(pdf["_bucket"].iloc[0])],
            "bits": [bits.tobytes()],
            "n_items": [n], "n_hashes": [k], "m_bits": [m]})

    return hashed.groupBy("_bucket").applyInPandas(make, BLOOM_SCHEMA)


def split_seen(discovered: DataFrame, bloom: DataFrame,
               url_col: str = "url",
               n_buckets: int = 64) -> tuple[DataFrame, DataFrame]:
    """Partition discovered urls into (definitely_new, maybe_seen) via
    the bloom layer. ``maybe_seen`` still needs the exact anti-join;
    ``definitely_new`` does not."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def member(h64: pd.Series, bits: pd.Series, n_hashes: pd.Series,
               m_bits: pd.Series) -> pd.Series:
        out = np.zeros(len(h64), dtype=bool)
        if len(h64) == 0:
            return pd.Series(out)
        harr = h64.to_numpy(dtype=np.int64)
        df = pd.DataFrame({"i": np.arange(len(h64)), "bits": bits,
                           "k": n_hashes, "m": m_bits})
        df = df[df["bits"].notna() & df["k"].notna()]
        # group per distinct bitset (one per bucket; bytes are
        # hashable so the groupby is value-based)
        for _, grp in df.groupby(df["bits"].map(bytes), dropna=False):
            rows = grp["i"].to_numpy()
            b0 = grp["bits"].iloc[0]
            arr = np.frombuffer(b0, dtype=np.uint8)
            k_, m_ = int(grp["k"].iloc[0]), int(grp["m"].iloc[0])
            idx = _indices(harr[rows], k_, m_)
            hit = np.ones(len(rows), dtype=bool)
            for j in range(k_):
                hit &= (arr[idx[j] >> 3] >> (idx[j] & 7) & 1).astype(bool)
            out[rows] = hit
        return pd.Series(out)

    hashed = _hash_cols(discovered, url_col, n_buckets)
    joined = hashed.join(bloom, hashed["_bucket"] == bloom["bucket"],
                         "left")
    tested = joined.withColumn(
        "_maybe",
        F.when(F.col("bits").isNull(), F.lit(False))
         .otherwise(member(F.col("_h64"), F.col("bits"),
                           F.col("n_hashes"), F.col("m_bits"))))
    keep = [c for c in discovered.columns]
    new = tested.where(~F.col("_maybe")).select(*keep)
    maybe = tested.where(F.col("_maybe")).select(*keep)
    return new, maybe


def filter_unseen(discovered: DataFrame, frontier_urls: DataFrame,
                  bloom: DataFrame | None, url_col: str = "url",
                  n_buckets: int = 64) -> DataFrame:
    """Exact unseen-filter with bloom pre-pruning: rows of
    ``discovered`` whose url is NOT in the frontier. The exact
    ``left_anti`` join runs only over bloom hits."""
    if bloom is None:
        return discovered.join(frontier_urls.select(url_col), url_col,
                               "left_anti")
    new, maybe = split_seen(discovered, bloom, url_col, n_buckets)
    checked = maybe.join(frontier_urls.select(url_col), url_col,
                         "left_anti")
    return new.unionByName(checked)
