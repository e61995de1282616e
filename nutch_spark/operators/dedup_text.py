"""Document-level deduplication for training-data pipelines.

Five strategies over the ``documents`` table, each a first-class
operator (the crawl-side analog is signature dedup,
DeduplicationJob.java — these extend it to *near*-duplicate text):

- ``exact_dedup``: hash-groupBy on the normalized-text fingerprint.
- ``minhash_lsh``: word-shingle → 64-bit hash → P permutation
  minhashes → banded LSH bucket join → candidate pairs (optionally
  verified with exact shingle Jaccard).
- ``simhash``: 64-bit charge-sum simhash + chunk-blocked Hamming join.
- ``ngram_jaccard``: exact n-gram Jaccard over candidate pairs.
- ``embedding_neardup`` lives in operators/ann.py (cosine threshold).

Everything is JVM-side (arrays + ``transform``/``aggregate`` +
``xxhash64``): no Python in any hot path. Scale shape: shingling is a
per-row map; the only shuffles are the LSH band groupBys, whose keys
are uniform by construction (hash buckets), so no skew; candidate
verification joins touch only colliding pairs, never the full cross
product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_PRIME = (1 << 31) - 1  # Mersenne prime; 31-bit keeps a·h+b in int64
                        # under ANSI overflow checking


def _norm_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles as an array<string>."""
    words = F.split(_norm_text(text), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))
    return F.when(n >= k, F.array_distinct(sh)) \
        .otherwise(F.array(_norm_text(text)))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicates by normalized-text MD5: returns
    (doc_id, keep_id, fingerprint) for every doc in a >1 group,
    keeper = min id (deterministic)."""
    fp = F.md5(F.encode(_norm_text(F.col(text_col)), "UTF-8"))
    df = docs.select(F.col(id_col), fp.alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return (df
            .withColumn("keep_id", F.min(id_col).over(w))
            .withColumn("_n", F.count("*").over(w))
            .where(F.col("_n") > 1)
            .drop("_n"))


def minhash_signature(text: Column, num_hashes: int = 64,
                      k: int = 3) -> Column:
    """Array of ``num_hashes`` minhash values via the standard
    (a·h + b) mod p permutation family over xxhash64 shingle hashes."""
    hashes = F.transform(word_shingles(text, k), lambda s: F.xxhash64(s))

    def perm(a, b):
        # closure factory: Spark infers lambda arity from the Python
        # signature, so captured constants must not be default args
        return lambda h: F.pmod(
            F.pmod(h, F.lit(_PRIME)) * a + b, F.lit(_PRIME))

    sigs = []
    for i in range(num_hashes):
        sigs.append(F.array_min(F.transform(
            hashes, perm(2 * i + 1, i * 0x9E3779B9))))
    return F.array(*sigs)


def minhash_lsh(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", num_hashes: int = 64,
                bands: int = 16, k: int = 3,
                verify_threshold: float | None = 0.7) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH.

    Returns (id_a, id_b[, jaccard]) with id_a < id_b. With
    ``verify_threshold`` set, candidates are verified against exact
    shingle Jaccard (correctness exact; LSH only prunes candidates)."""
    r = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes, k)
    with_sig = docs.select(F.col(id_col).alias("id"),
                           F.col(text_col).alias("text"),
                           sig.alias("sig"))
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.array_join(
                F.transform(F.slice("sig", b * r + 1, r),
                            lambda x: x.cast("string")), ","))
            .alias("key")))
    banded = (with_sig
              .select("id", F.explode(band_arr).alias("bk"))
              .select("id", F.col("bk.band").alias("band"),
                      F.col("bk.key").alias("key")))
    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (left.join(right, ["band", "key"])
             .where(F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
             .distinct())
    if verify_threshold is None:
        return pairs
    sh = docs.select(F.col(id_col).alias("id"),
                     word_shingles(F.col(text_col), k).alias("sh"))
    jac = (pairs
           .join(sh.select(F.col("id").alias("id_a"),
                           F.col("sh").alias("sh_a")), "id_a")
           .join(sh.select(F.col("id").alias("id_b"),
                           F.col("sh").alias("sh_b")), "id_b")
           .withColumn(
               "jaccard",
               F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
               / F.size(F.array_union("sh_a", "sh_b")))
           .where(F.col("jaccard") >= verify_threshold)
           .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))
    return jac


def simhash64(text: Column) -> Column:
    """64-bit SimHash over word tokens: per-bit charge sum of token
    xxhash64 values, sign → bit."""
    tokens = F.split(_norm_text(text), " ")
    hashes = F.transform(F.array_distinct(tokens), lambda t: F.xxhash64(t))
    def charge_fn(bit):
        return lambda a, h: a + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1,
            F.lit(1)).otherwise(F.lit(-1))

    acc = F.lit(0).cast("long")
    for bit in range(64):
        charge = F.aggregate(hashes, F.lit(0).cast("long"),
                             charge_fn(bit))
        acc = acc + F.when(charge > 0,
                           F.lit(1 << bit if bit < 63 else -(1 << 63))
                           .cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def simhash_neardup(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming. Blocking:
    split the 64-bit hash into 4 16-bit chunks — any pair within
    Hamming 3 shares at least one chunk (pigeonhole), so the join is
    per-chunk equi, never a cross product."""
    df = docs.select(F.col(id_col).alias("id"),
                     simhash64(F.col(text_col)).alias("sh"))
    chunks = F.array(*[
        F.struct(F.lit(c).alias("chunk"),
                 F.shiftrightunsigned("sh", 16 * c)
                  .bitwiseAND(F.lit(0xFFFF)).alias("key"))
        for c in range(4)])
    blocked = (df.select("id", "sh", F.explode(chunks).alias("ck"))
               .select("id", "sh", F.col("ck.chunk").alias("chunk"),
                       F.col("ck.key").alias("key")))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (a.join(b, ["chunk", "key"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
                    .alias("hamming"))
            .distinct()
            .where(F.col("hamming") <= max_hamming))


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5,
                        block_minhashes: int = 8) -> DataFrame:
    """Exact word n-gram Jaccard ≥ threshold, candidate-blocked by a
    small minhash band so the pair join stays sparse."""
    cands = minhash_lsh(docs, id_col, text_col,
                        num_hashes=block_minhashes, bands=block_minhashes,
                        k=n, verify_threshold=None)
    sh = docs.select(F.col(id_col).alias("id"),
                     word_shingles(F.col(text_col), n).alias("sh"))
    return (cands
            .join(sh.select(F.col("id").alias("id_a"),
                            F.col("sh").alias("sh_a")), "id_a")
            .join(sh.select(F.col("id").alias("id_b"),
                            F.col("sh").alias("sh_b")), "id_b")
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))
