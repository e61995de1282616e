"""Similarity search over embedding columns (array<float>).

Two paths over ``embeddings(vec_id, embedding, label)``:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query side is broadcast (queries ≪ corpus); dot products are pure
  JVM (``zip_with`` + ``aggregate``), ranking is a per-query window.
  At 100 TB the corpus side streams partition-parallel; cost is
  O(|corpus|·|queries|·d) FLOPs but zero shuffle of the corpus.
- ``lsh_topk``: random-hyperplane LSH — the scale path. Deterministic
  hash-derived ±1 projections bucket vectors by sign pattern; probing
  joins queries to matching buckets only. Recall < 1 by construction;
  ``n_tables`` multiplies probes for higher recall.
- ``embedding_neardup``: near-duplicate pairs with cosine ≥ threshold,
  LSH-blocked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: (x * x).cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                include_self: bool = False) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    Returns (query_id, neighbor_id, cos_sim, rank). Ties broken by
    neighbor_id ascending (deterministic)."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"),
                      _norm(F.col(vec_col)).alias("cnorm"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"),
                       _norm(F.col(vec_col)).alias("qnorm"))
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    sim = (_dot(F.col("cvec"), F.col("qvec"))
           / (F.col("cnorm") * F.col("qnorm")))
    w = Window.partitionBy("query_id") \
        .orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (joined
            .withColumn("cos_sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cos_sim", 6).alias("cos_sim"), "rank"))


def hyperplane_bucket(vec: Column, n_planes: int = 12,
                      table: int = 0) -> Column:
    """Sign-pattern bucket id from deterministic hash-derived ±1
    hyperplanes: plane p's j-th weight = parity of xxhash64(table,p,j).
    Pure JVM (transform with index + aggregate)."""
    def sign_fn(p):
        return lambda x, i: F.pmod(
            F.xxhash64(F.lit(table), F.lit(p), i), 2)

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec, F.transform(vec, sign_fn(p)),
                lambda x, s: (x * (s.cast("double") * 2 - 1))
                .cast("double")),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)) \
            .otherwise(F.lit(0)).cast("long")
    return bucket


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 10, n_tables: int = 4) -> DataFrame:
    """Approximate top-k: union of per-table bucket-join probes, exact
    rerank within candidates. One equi-join per table on (table,
    bucket) — no cross product, bucket keys are hash-uniform."""
    def bucketed(df, prefix):
        rows = []
        for t in range(n_tables):
            rows.append(df.select(
                F.col(id_col).alias(f"{prefix}_id"),
                F.col(vec_col).alias(f"{prefix}vec"),
                F.lit(t).alias("table"),
                hyperplane_bucket(F.col(vec_col), n_planes, t)
                .alias("bucket")))
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    c = bucketed(corpus, "n")
    q = bucketed(queries, "q")
    cand = (c.join(q, ["table", "bucket"])
            .where(F.col("n_id") != F.col("q_id"))
            .select(F.col("q_id").alias("query_id"),
                    F.col("n_id").alias("neighbor_id"),
                    "nvec", "qvec")
            .dropDuplicates(["query_id", "neighbor_id"]))
    sim = cosine(F.col("nvec"), F.col("qvec"))
    w = Window.partitionBy("query_id") \
        .orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (cand.withColumn("cos_sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cos_sim", 6).alias("cos_sim"), "rank"))


def cosine_neardup_exact(embeddings: DataFrame,
                         threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """EXACT near-duplicate vector pairs: every (id_a < id_b) with
    cosine ≥ threshold — the correctness baseline for
    ``embedding_neardup`` (same relationship as ``cosine_topk`` to
    ``lsh_topk``). All arithmetic is double-precision end to end
    (floats widened before the multiply), so any engine computing
    the same formula reproduces the values bit-for-bit.

    Cost is the O(n²/2) pair join — partition-parallel but quadratic;
    use the LSH-blocked ``embedding_neardup`` beyond ~10⁵ vectors."""
    def dot64(a, b):
        return F.aggregate(
            F.zip_with(a, b,
                       lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v)

    def norm64(a):
        return F.sqrt(F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v))

    b = embeddings.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("v"),
                          norm64(F.col(vec_col)).alias("nrm"))
    a, c = b.alias("a"), b.alias("b")
    sim = dot64(F.col("a.v"), F.col("b.v")) \
        / (F.col("a.nrm") * F.col("b.nrm"))
    return (a.join(c, F.col("a.id") < F.col("b.id"))
            .withColumn("cos_sim", sim)
            .where(F.col("cos_sim") >= threshold)
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    F.round("cos_sim", 6).alias("cos_sim")))


def embedding_neardup(embeddings: DataFrame, threshold: float = 0.95,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      n_planes: int = 8, n_tables: int = 6) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), LSH-blocked;
    returns (id_a, id_b, cos_sim) with id_a < id_b."""
    rows = []
    for t in range(n_tables):
        rows.append(embeddings.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
            F.lit(t).alias("table"),
            hyperplane_bucket(F.col(vec_col), n_planes, t).alias("bucket")))
    b = rows[0]
    for r in rows[1:]:
        b = b.unionByName(r)
    a, c = b.alias("a"), b.alias("b")
    pairs = (a.join(c, ["table", "bucket"])
             .where(F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"),
                     F.col("a.v").alias("va"), F.col("b.v").alias("vb"))
             .dropDuplicates(["id_a", "id_b"]))
    return (pairs
            .withColumn("cos_sim", cosine(F.col("va"), F.col("vb")))
            .where(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b",
                    F.round("cos_sim", 6).alias("cos_sim")))
