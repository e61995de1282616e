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


def auto_lsh_params(threshold: float, n_rows: int,
                    target_recall: float = 0.9,
                    bucket_target: int = 1024,
                    min_planes: int = 4, max_planes: int = 18,
                    max_tables: int = 48) -> tuple[int, int]:
    """(n_planes, n_tables) sized from the math instead of guessed.

    Random-hyperplane LSH: a pair at cosine ``threshold`` agrees on one
    plane with p = 1 − acos(threshold)/π, survives a table of ``b``
    planes with p^b, and is recalled by ``L`` tables with
    1 − (1−p^b)^L. Planes grow with log₂(n/bucket_target) so expected
    bucket occupancy — and with it the per-bucket self-join cost —
    stays bounded as n scales; tables then follow from the recall
    target. When the required tables exceed ``max_tables`` the plane
    count steps down (bigger buckets, fewer tables) until the budget
    fits — the join gets denser but recall holds, which is the right
    trade for a *verified* near-dup pass where precision is exact
    anyway.
    """
    import math
    p = 1 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    planes = max(min_planes,
                 min(max_planes,
                     math.ceil(math.log2(max(2.0, n_rows / bucket_target)))))
    target_recall = min(target_recall, 0.999)

    def tables_for(b: int) -> int:
        pt = p ** b
        if pt >= 1.0:
            return 1
        return max(1, math.ceil(math.log(1 - target_recall)
                                / math.log(1 - pt)))

    while planes > min_planes and tables_for(planes) > max_tables:
        planes -= 1
    return planes, min(tables_for(planes), max_tables)


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
                      n_planes: int | None = None,
                      n_tables: int | None = None,
                      target_recall: float = 0.9) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), LSH-blocked;
    returns (id_a, id_b, cos_sim) with id_a < id_b.

    With ``n_planes``/``n_tables`` unset they are derived by
    :func:`auto_lsh_params` from the threshold, the row count (one
    count() of the id column — negligible against the join), and
    ``target_recall`` — low thresholds genuinely need many tables
    (at cosine 0.4 a 4-plane table catches only ~16% of qualifying
    pairs), and a hand-guessed (8, 6) silently delivered ~zero recall
    there. Precision is exact either way: every candidate is
    re-verified against the true cosine before emission."""
    if n_planes is None or n_tables is None:
        n = embeddings.select(id_col).count()
        auto_planes, auto_tables = auto_lsh_params(
            threshold, n, target_recall=target_recall)
        n_planes = n_planes if n_planes is not None else auto_planes
        n_tables = n_tables if n_tables is not None else auto_tables
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


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)).cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def ivf_assign(df: DataFrame, centroids: list[tuple[int, list[float]]],
               vec_col: str, n_probe: int = 1) -> DataFrame:
    """Assign each row to its ``n_probe`` nearest centroids (one output
    row per (vector, probed centroid)). Centroids are a driver-side
    list (tiny — n_centroids × dim floats) folded into the plan as a
    literal array, so assignment is a narrow map over the corpus: no
    join, no shuffle, whole rows never leave their partitions."""
    cent = F.array(*[
        F.struct(F.lit(cid).alias("cid"),
                 F.array(*[F.lit(float(x)) for x in vec]).alias("cv"))
        for cid, vec in centroids])
    scored = F.transform(
        cent, lambda c: F.struct(
            c["cid"].alias("cid"),
            _sq_dist(F.col(vec_col), c["cv"]).alias("d")))
    probed = F.slice(F.array_sort(
        scored, lambda a, b: F.when(a["d"] < b["d"], -1)
        .when(a["d"] > b["d"], 1)
        .otherwise(F.when(a["cid"] < b["cid"], -1).otherwise(1))),
        1, n_probe)
    return (df.withColumn("_probe", F.explode(probed))
              .withColumn("centroid_id", F.col("_probe.cid"))
              .drop("_probe"))


def ivf_centroids(corpus: DataFrame, n_centroids: int = 16,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  lloyd_iters: int = 2) -> list[tuple[int, list[float]]]:
    """Deterministic IVF codebook: seeds are the ``n_centroids``
    vectors with the smallest xxhash64(id) (a uniform, reproducible
    sample — no RNG), refined by ``lloyd_iters`` Lloyd steps where
    each step is one narrow assignment pass + one groupBy average.
    The only driver-side data is the codebook itself (n_centroids ×
    dim floats — bytes, not data); every pass over the corpus is
    distributed."""
    dim = len(corpus.select(vec_col).first()[0])
    seeds = (corpus
             .select(id_col, vec_col,
                     F.xxhash64(F.col(id_col).cast("string")).alias("_h"))
             .orderBy("_h", id_col).limit(n_centroids)
             .select(vec_col).collect())
    centroids = [(i, [float(x) for x in r[0]])
                 for i, r in enumerate(seeds)]
    for _ in range(lloyd_iters):
        assigned = ivf_assign(corpus.select(id_col, vec_col),
                              centroids, vec_col, n_probe=1)
        means = (assigned
                 .groupBy("centroid_id")
                 .agg(*[F.avg(F.col(vec_col)[i]).alias(f"m{i}")
                        for i in range(dim)])
                 .collect())
        new = {r["centroid_id"]: [float(r[f"m{i}"]) for i in range(dim)]
               for r in means}
        # empty cells keep their previous position (standard Lloyd)
        centroids = [(cid, new.get(cid, vec)) for cid, vec in centroids]
    return centroids


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_centroids: int = 16, n_probe: int = 4,
             lloyd_iters: int = 2,
             centroids: list[tuple[int, list[float]]] | None = None
             ) -> DataFrame:
    """IVF approximate top-k: corpus is bucketed by nearest centroid
    (the inverted file), each query probes its ``n_probe`` nearest
    cells, candidates rerank by exact cosine. Returns
    (query_id, neighbor_id, cos_sim, rank).

    The scale path: at 10^9+ vectors the cell assignment is a narrow
    map (the codebook is a plan literal), the probe is a cell-id
    equi-join — no cross product, cell populations ~n/n_centroids —
    and the codebook is the ONLY thing that ever reaches the driver.
    Grow n_centroids with sqrt(n) to keep cells bounded. Recall is
    tracked against cosine_topk in tests/test_approx_recall.py."""
    if centroids is None:
        centroids = ivf_centroids(corpus, n_centroids, id_col, vec_col,
                                  lloyd_iters)
    c = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("nvec")),
        centroids, "nvec", n_probe=1)
    q = ivf_assign(
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec")),
        centroids, "qvec", n_probe=n_probe)
    cand = (c.join(q, "centroid_id")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .dropDuplicates(["query_id", "neighbor_id"]))
    w = Window.partitionBy("query_id") \
        .orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (cand
            .withColumn("cos_sim", cosine(F.col("nvec"), F.col("qvec")))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cos_sim", 6).alias("cos_sim"), "rank"))
