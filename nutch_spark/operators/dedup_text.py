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

from itertools import combinations
from math import comb

from pyspark.sql import Column, DataFrame, Window, functions as F

_PRIME = (1 << 31) - 1  # Mersenne prime; 31-bit keeps a·h+b in int64
                        # under ANSI overflow checking


def _norm_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def shingles_of(words: Column, k: int = 3) -> Column:
    """Distinct word k-shingles over an already-PROJECTED token array
    (pass an attribute: the slice lambda references ``words`` once per
    shingle index, so an inlined split() would re-tokenize per index —
    the HOF-lambda trap, see :func:`minhash_from`). Multiple outer
    references to ``words`` keep the projection barrier against
    CollapseProject."""
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, k), " "))
    return F.when(n >= k, F.array_distinct(sh)) \
        .otherwise(F.array(F.array_join(words, " ")))


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles as an array<string> — one-expression
    convenience form; hot paths should project the split first and
    call :func:`shingles_of`."""
    return shingles_of(F.split(_norm_text(text), " "), k)


def shingle_hashes(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingle hashes as array<long> — no string
    concatenation: per-word xxhash64 values are combined across a
    k-wide sliding window with polynomial accumulation mod 2^31−1
    (zip_with over shifted copies). This is the hot-path shingle
    representation; collisions at ~2^-31 only affect near-dup
    *candidates*, which the exact verify step re-checks."""
    p = F.lit(_PRIME)
    words = F.split(_norm_text(text), " ")
    h = F.transform(words, lambda w: F.xxhash64(w))
    n = F.size(h)
    combined = h
    for j in range(1, k):
        shifted = F.slice(h, j + 1, n)
        combined = F.zip_with(
            combined, shifted,
            lambda a, b: F.pmod(F.pmod(a, p) * 8191 + F.pmod(b, p), p))
    sh = F.array_distinct(F.filter(combined,
                                   lambda x: x.isNotNull()))
    return F.when(n >= k, sh) \
        .otherwise(F.array(F.xxhash64(_norm_text(text))))


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


def minhash_from(hashes: Column, num_hashes: int = 64) -> Column:
    """Array of ``num_hashes`` minhash values via the standard
    (a·h + b) mod p permutation family over an already-PROJECTED
    shingle-hash array column.

    The outer ``transform`` re-evaluates its lambda body once per
    permutation, so if ``hashes`` is an inlined expression it is
    recomputed ``num_hashes`` times per row. Worse, CollapseProject
    re-inlines a single-referenced alias (it assumes one textual
    reference = one evaluation — untrue inside HOF lambdas), so the
    ``F.size`` guard below deliberately references ``hashes`` a
    second time OUTSIDE the lambda: two references to a non-cheap
    alias keep the projection barrier, and the lambda then reads a
    per-row attribute. (Guard is semantically free —
    :func:`shingle_hashes` always yields ≥1 element.)"""
    p = F.lit(_PRIME)
    return F.when(
        F.size(hashes) > 0,
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(F.transform(
                hashes,
                lambda h: F.pmod(
                    F.pmod(h, p) * (i * 2 + 1) + i * 0x9E3779B9, p)))))


def minhash_signature(text: Column, num_hashes: int = 64,
                      k: int = 3) -> Column:
    """One-expression convenience form — fine for tests/small inputs;
    hot paths must project :func:`shingle_hashes` first and call
    :func:`minhash_from` (see its docstring)."""
    return minhash_from(shingle_hashes(text, k), num_hashes)


def minhash_lsh(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", num_hashes: int = 64,
                bands: int = 16, k: int = 3,
                verify_threshold: float | None = 0.7,
                n_partitions: int | None = None,
                max_bucket_size: int | None = None) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH.

    Returns (id_a, id_b[, jaccard]) with id_a < id_b. With
    ``verify_threshold`` set, candidates are verified against exact
    shingle Jaccard (correctness exact; LSH only prunes candidates).

    ``max_bucket_size`` (scale knob): boilerplate docs that share a
    band key make the per-bucket self-join quadratic; buckets larger
    than the cap are dropped (their members still pair up through
    their other bands unless they are near-identical across all bands,
    i.e. an exact-dup-sized cluster). Default None = exact recall."""
    if n_partitions:
        # per-row shingling/hashing is the dominant cost; spread it
        # before the narrow pipeline (small parquet inputs otherwise
        # arrive as a single partition)
        docs = docs.repartition(n_partitions)
    r = num_hashes // bands
    # stage shingle hashes as a real column BEFORE the permutation
    # transform — inlined, they would recompute once per permutation
    with_sig = (docs.select(F.col(id_col).alias("id"),
                            F.col(text_col).alias("text"),
                            shingle_hashes(F.col(text_col), k)
                            .alias("_sh"))
                .select("id", "text",
                        minhash_from(F.col("_sh"), num_hashes)
                        .alias("sig")))
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
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "key")
        banded = (banded.withColumn("_bn", F.count("*").over(wb))
                  .where(F.col("_bn") <= max_bucket_size).drop("_bn"))
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
                     shingle_hashes(F.col(text_col), k).alias("sh"))
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


def simhash_df(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", n_bits: int = 64,
               token_hash: str = "xxhash64") -> DataFrame:
    """(id, sh): ``n_bits``-bit SimHash over word tokens — per-bit
    charge sum of token hash values, sign → bit.

    Shaped as explode + one hash aggregate with ``n_bits`` sum columns:
    map-side partial aggregation does the per-bit charge sums, so the
    shuffle carries one n_bits-long row per doc and there is no
    n_bits×|tokens| nested expression per row.

    ``token_hash``: ``xxhash64`` (default, fastest) or ``md5`` — the
    top 60 bits of md5, reproducible in any engine with an md5
    function (used by the driver's cross-engine oracle; cap
    ``n_bits`` at 60 with this family)."""
    if token_hash == "md5":
        if n_bits > 60:
            raise ValueError("md5 token family carries 60 usable bits")
        h = F.conv(F.substring(F.md5(F.encode(F.col("t"), "UTF-8")),
                               1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64("t")
    # parallelize narrow inputs: a small-SF table arrives as one scan
    # partition, and the explode+64-sum map side would run single-task;
    # at production widths (partitions ≥ cores) this is a no-op
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    tok = (docs
           .select(F.col(id_col).alias("id"),
                   F.explode(F.array_distinct(
                       F.split(_norm_text(F.col(text_col)), " ")))
                   .alias("t"))
           .withColumn("h", h))
    # charge sign via 2·ones > count (same predicate as sum(±1) > 0,
    # but each per-bit aggregate is a branch-free bit extraction)
    aggs = [F.count("*").alias("_n")] + [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)))
        .alias(f"c{b}")
        for b in range(n_bits)]
    g = tok.groupBy("id").agg(*aggs)
    sh = F.lit(0).cast("long")
    for b in range(n_bits):
        sh = sh + F.when(2 * F.col(f"c{b}") > F.col("_n"),
                         F.lit(1 << b if b < 63 else -(1 << 63))
                         .cast("long")).otherwise(F.lit(0).cast("long"))
    return g.select("id", sh.alias("sh"))


def _simhash_plan(max_hamming: int,
                  max_tables: int = 64,
                  n_bits: int = 64) -> tuple[int, int]:
    """Pick (c, m) for generalized multi-index blocking: split the
    64-bit hash into ``c`` blocks and key each of the C(c, m) tables on
    an m-block combination. Pigeonhole: a pair within Hamming
    ``max_hamming`` agrees on ≥ c−max_hamming blocks, so with
    m ≤ c−max_hamming every such pair shares at least one table key —
    recall is exact for any radius (the round-1 fixed 4×16-bit split
    silently lost recall for max_hamming > 3).

    Wider keys (more bits per table key) bound per-bucket population at
    scale — the round-1 16-bit key space (65k buckets) puts ~15k docs
    per bucket at 10⁹ docs. Preference: smallest table count whose key
    reaches ≥24 bits; if the radius is too large for that, the widest
    key within the table budget."""
    best = None        # (reaches_24, key_bits or -tables, c, m)
    for c in range(max_hamming + 1, 17):
        m = c - max_hamming
        t = comb(c, m)
        if t > max_tables:
            continue
        key_bits = (n_bits // c) * m
        cand = ((1, -t, key_bits) if key_bits >= 24
                else (0, key_bits, -t), c, m)
        if best is None or cand[0] > best[0]:
            best = cand
    if best is None:                       # radius ≥ 16: block-per-bit
        return max_hamming + 1, 1
    return best[1], best[2]


def simhash_neardup(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    max_hamming: int = 3,
                    max_bucket_size: int | None = None,
                    n_bits: int = 64,
                    token_hash: str = "xxhash64") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Blocking is generalized multi-index (see ``_simhash_plan``): the
    hash is split into c blocks and each of C(c, m) tables is keyed by
    the hash-combined value of m blocks, guaranteeing every qualifying
    pair collides in ≥1 table while keeping per-bucket population
    bounded (key width ≥24 bits where the radius permits). The join is
    per-(table, key) equi — never a cross product — and the exact
    ``bit_count`` filter re-checks every candidate, so blocking affects
    only cost, not precision.

    Pairing runs over DISTINCT fingerprints (round-3): identical-hash
    clusters — the skew source, since a k-member boilerplate cluster
    is k²·C(c,m) candidates — are collapsed before the bucket join and
    re-expanded afterwards with output-proportional equi-joins, so the
    quadratic stage sees each fingerprint once.

    ``max_bucket_size`` (scale knob): drop buckets with more DISTINCT
    HASHES than the cap (the join-cost unit), and identical-hash
    clusters larger than the cap from the hamming-0 expansion; capping
    trades recall on >cap-sized near-dup families (which exact-dedup
    or a shorter radius should own) for bounded work. Default None
    preserves exact recall.

    Dedup across tables is CANONICAL EMISSION, not ``distinct()``: a
    near-identical pair agrees on almost every block and therefore
    meets in up to C(c, m) tables (45 at radius 8) — shuffling that
    multiplicity into a distinct dominated the round-2 runtime. Instead
    each pair is emitted only from the lexicographically FIRST
    m-combination of its agreeing blocks: within indices 0..max(combo)
    the agreeing set must equal the combo exactly, a single bitwise
    compare of the pair's block-agreement mask against two per-table
    literals — evaluated inside the join output, so duplicate
    candidates are dropped before any shuffle. With ``max_bucket_size``
    the capped buckets may include the first-combo bucket, so emission
    falls back to ``distinct()`` over the surviving tables (recall
    under a cap is already approximate)."""
    c, m = _simhash_plan(max_hamming, n_bits=n_bits)
    widths = [n_bits // c + (1 if i < n_bits % c else 0)
              for i in range(c)]
    offs = [sum(widths[:i]) for i in range(c)]
    # signed-64 wrap: the top block's mask has bit 63 set
    masks = [(m if m < 1 << 63 else m - (1 << 64))
             for m in (((1 << widths[i]) - 1) << offs[i]
                       for i in range(c))]

    def block(i: int) -> Column:
        masked = F.shiftrightunsigned("sh", offs[i]) \
            .bitwiseAND(F.lit((1 << widths[i]) - 1))
        return masked

    # key = hash-combine of the table's m block values (no overflow,
    # uniform; collisions only add candidates, which the exact filter
    # removes). Each table entry carries its first-combo test literals:
    # emit iff (agree_mask & lowmask) == combobits, i.e. the agreeing
    # blocks below (and at) the combo's top index are exactly the combo.
    def _combo_lits(combo: tuple[int, ...]) -> tuple[int, int]:
        lowmask = (1 << (max(combo) + 1)) - 1
        combobits = sum(1 << i for i in combo)
        return lowmask, combobits

    tables = F.array(*[
        F.struct(F.lit(t).alias("table"),
                 F.xxhash64(F.lit(t), *[block(i) for i in combo])
                  .alias("key"),
                 F.lit(_combo_lits(combo)[0]).alias("lowmask"),
                 F.lit(_combo_lits(combo)[1]).alias("combobits"))
        for t, combo in enumerate(combinations(range(c), m))])

    df = simhash_df(docs, id_col, text_col, n_bits, token_hash)
    par = docs.sparkSession.sparkContext.defaultParallelism

    # --- collapse identical fingerprints BEFORE the quadratic stage ---
    # Exact-duplicate clusters are THE skew source: one k-member
    # boilerplate cluster puts k×C(c,m) rows into the same buckets and
    # k²·C(c,m) candidates into the join. Pairing runs over DISTINCT
    # hashes only; member pairs re-expand afterwards with two slim
    # equi-joins (output-proportional, no duplication factor). All
    # consumers below derive from the same `df` lineage, so Spark's
    # exchange reuse computes the simhash aggregation once.
    hashes = df.select("sh").distinct()
    blocked = (hashes.select("sh", F.explode(tables).alias("tk"))
               .select("sh", F.col("tk.table").alias("table"),
                       F.col("tk.key").alias("key"),
                       F.col("tk.lowmask").alias("lowmask"),
                       F.col("tk.combobits").alias("combobits")))
    # pin the join parallelism on the bucket key: the JOIN OUTPUT is
    # pairs-quadratic in bucket population even when the input is tiny
    # by bytes, so AQE's byte-based coalescing must not collapse it to
    # one task (repartition-by-num is AQE-stable); keys are uniform
    # hashes, so the spread is even
    blocked = blocked.repartition(par, "table", "key")
    if max_bucket_size is not None:
        # cap counts DISTINCT HASHES per bucket (the join-cost unit);
        # identical-hash clusters larger than the cap are likewise
        # dropped from the same-hash expansion below
        w = Window.partitionBy("table", "key")
        blocked = (blocked.withColumn("_bn", F.count("*").over(w))
                   .where(F.col("_bn") <= max_bucket_size).drop("_bn"))
    a, b = blocked.alias("a"), blocked.alias("b")
    xor = F.col("a.sh").bitwiseXOR(F.col("b.sh"))
    hp = (a.join(b, ["table", "key"])
          .where(F.col("a.sh") < F.col("b.sh")))
    if max_bucket_size is None:
        # per-pair block-agreement mask: bit i set iff block i agrees
        amask = None
        for i in range(c):
            bit = F.when(xor.bitwiseAND(F.lit(masks[i])) == 0,
                         F.lit(1 << i)).otherwise(F.lit(0))
            amask = bit if amask is None else amask + bit
        hp = hp.where(
            amask.bitwiseAND(F.col("a.lowmask")) == F.col("a.combobits"))
        hp = hp.select(F.col("a.sh").alias("sh_a"),
                       F.col("b.sh").alias("sh_b"),
                       F.bit_count(xor).alias("hamming"))
    else:
        hp = hp.select(F.col("a.sh").alias("sh_a"),
                       F.col("b.sh").alias("sh_b"),
                       F.bit_count(xor).alias("hamming")).distinct()
    hp = hp.where(F.col("hamming") <= max_hamming)

    # --- expand hash pairs back to member pairs -----------------------
    cross = (hp
             .join(df.select(F.col("id").alias("_ida"),
                             F.col("sh").alias("sh_a")), "sh_a")
             .join(df.select(F.col("id").alias("_idb"),
                             F.col("sh").alias("sh_b")), "sh_b")
             .select(F.least("_ida", "_idb").alias("id_a"),
                     F.greatest("_ida", "_idb").alias("id_b"),
                     "hamming"))
    # hamming-0 pairs: members sharing one fingerprint
    same_groups = df
    if max_bucket_size is not None:
        wg = Window.partitionBy("sh")
        same_groups = (df.withColumn("_gn", F.count("*").over(wg))
                       .where(F.col("_gn") <= max_bucket_size)
                       .drop("_gn"))
    x, y = same_groups.alias("x"), same_groups.alias("y")
    same = (x.join(y, "sh")
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"),
                    F.col("y.id").alias("id_b"),
                    F.lit(0).cast("int").alias("hamming")))
    return cross.unionByName(same)


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5,
                        block_minhashes: int = 8,
                        n_partitions: int | None = None) -> DataFrame:
    """Word n-gram Jaccard ≥ threshold over hashed shingles,
    candidate-blocked by a small minhash band so the pair join stays
    sparse."""
    cands = minhash_lsh(docs, id_col, text_col,
                        num_hashes=block_minhashes, bands=block_minhashes,
                        k=n, verify_threshold=None,
                        n_partitions=n_partitions)
    sh = docs.select(F.col(id_col).alias("id"),
                     shingle_hashes(F.col(text_col), n).alias("sh"))
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


def ngram_jaccard_exact(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """EXACT n-gram Jaccard similarity self-join: every pair with
    Jaccard ≥ threshold, no sampling, no LSH recall loss.

    Candidate generation is a prefix-filtered inverted index (the
    AllPairs/PPJoin principle): shingles get a global total order by
    (document frequency asc, shingle asc); a doc with |d| distinct
    shingles indexes only its first |d| − ⌈t·|d|⌉ + 1 shingles in that
    order. Any pair with J ≥ t has overlap ≥ ⌈t·|d|⌉ on each side, so
    the prefixes must intersect — recall is exact, yet hot shingles
    (high document frequency) sort last and rarely enter any prefix,
    which keeps the inverted-index buckets small at scale. The exact
    intersection/union verify then removes false candidates.

    Returns (id_a, id_b, jaccard) with id_a < id_b."""
    sh = (docs.select(F.col(id_col).alias("id"),
                      F.split(_norm_text(F.col(text_col)), " ")
                      .alias("_w"))
          .select("id", shingles_of(F.col("_w"), n).alias("sh")))
    ex = sh.select("id", F.explode("sh").alias("g"))
    freq = ex.groupBy("g").agg(F.count("*").alias("df"))
    wdoc = Window.partitionBy("id")
    prefix = (ex.join(freq, "g")
              .withColumn("_r", F.row_number().over(
                  wdoc.orderBy(F.asc("df"), F.asc("g"))))
              .withColumn("_sz", F.count("*").over(wdoc))
              .where(F.col("_r")
                     <= F.col("_sz")
                     - F.ceil(F.lit(threshold) * F.col("_sz")) + 1)
              .select("id", "g"))
    cand = (prefix.alias("a").join(prefix.alias("b"), "g")
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())
    return (cand
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


def connected_components(edges: DataFrame, nodes: DataFrame | None = None,
                         id_a: str = "id_a", id_b: str = "id_b",
                         max_iter: int = 50) -> DataFrame:
    """Connected components over a pair list — the clustering step of
    near-duplicate deduplication (pairs from minhash_lsh /
    simhash_neardup / ngram_jaccard become dup *clusters*; one
    canonical document survives per cluster, see
    :func:`dedup_clusters`).

    Algorithm: alternating **large-star / small-star** (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — each
    round is two shuffles (a groupBy for per-node minima and a join to
    rewrite edges) and converges in O(log n) rounds even on
    path-shaped components, unlike naive min-label propagation whose
    round count is the component diameter. This is the 100 TB shape:
    no driver-side graph, keys are node ids (uniform after the first
    round collapses hubs), and per-round ``localCheckpoint`` truncates
    the lineage so plan size stays constant across iterations.

    Returns (id, cluster_id) with cluster_id = MIN node id of the
    component; every node from ``edges`` (and from ``nodes``, if
    given — isolated docs label themselves) appears exactly once.

    Ids may be any orderable type. Integral ids are used directly;
    anything else (URLs — the reference DeduplicationJob's keys) is
    keyed internally on ``xxhash64(id)`` with a join back to the
    original values at the end, so the star-forest arithmetic stays
    on uniform longs. With hashed keys ``cluster_id`` is the member
    whose hash is minimal — still one deterministic canonical id per
    component. (64-bit collision odds at 10^10 nodes are ~0.3%
    birthday-bound for ANY colliding pair corpus-wide; a collision
    merges two clusters, the standard accepted tradeoff for hashed
    CC at scale.)

    Raises ``RuntimeError`` if the star contraction has not reached
    its fixpoint within ``max_iter`` rounds (returning labels from a
    non-star edge set would silently duplicate nodes downstream).
    """
    u, v = F.col("u"), F.col("v")
    integral = {"tinyint", "smallint", "int", "bigint", "long"}
    id_type = dict(edges.dtypes)[id_a]
    hashed = id_type not in integral
    if hashed:
        # key on xxhash64; remember hash -> original for the join back
        ea = F.xxhash64(F.col(id_a)).alias("u")
        eb = F.xxhash64(F.col(id_b)).alias("v")
        id_map = edges.select(F.col(id_a).alias("_oid")).unionByName(
            edges.select(F.col(id_b).alias("_oid")))
        if nodes is not None:
            id_map = id_map.unionByName(
                nodes.select(F.col(nodes.columns[0]).alias("_oid")))
        id_map = id_map.distinct().select(
            F.xxhash64("_oid").alias("_hid"), "_oid")
        e = edges.select(ea, eb)
    else:
        e = edges.select(F.col(id_a).cast("long").alias("u"),
                         F.col(id_b).cast("long").alias("v"))
    e = (e.where(u != v)
         .select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
         .distinct())
    e = e.localCheckpoint(eager=True)
    all_nodes = e.select(u.alias("id")).unionByName(
        e.select(v.alias("id"))).distinct()
    if nodes is not None:
        extra = (id_map.select(F.col("_hid").alias("id")) if hashed
                 else nodes.select(F.col(nodes.columns[0]).cast("long")
                                   .alias("id")))
        all_nodes = all_nodes.unionByName(extra).distinct()

    def _sig(df):
        # one action per round: (count, checksum) — equality across
        # rounds is the fixpoint test (the edge set only changes by
        # rewrites, so an unchanged multiset signature means e_new==e
        # up to a 64-bit checksum collision; far cheaper than the old
        # count()+exceptAll full-width shuffle pair)
        r = df.agg(F.count("*").alias("n"),
                   F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))
                    .alias("s")).first()
        return (r["n"], r["s"])

    prev_sig = _sig(e)
    converged = False
    for _ in range(max_iter):
        # large-star: each node u links every LARGER neighbor to the
        # minimum of its neighborhood (incl. itself)
        und = e.unionByName(e.select(v.alias("u"), u.alias("v")))
        mins = und.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"))
        large = (und.join(mins, "u")
                 .where(v > u)
                 .select(v.alias("u"), F.col("m").alias("v"))
                 .where(F.col("u") != F.col("v"))
                 .distinct())
        # small-star: on larger->smaller edges, each node links its
        # smaller-or-equal neighbors (and itself) to their minimum
        dir_ = large.select(F.greatest(u, v).alias("u"),
                            F.least(u, v).alias("v"))
        mins2 = dir_.groupBy("u").agg(F.min("v").alias("m"))
        small = (dir_.join(mins2, "u")
                 .select(v.alias("u"), F.col("m").alias("v"))
                 .unionByName(mins2.select(u, F.col("m").alias("v")))
                 .where(F.col("u") != F.col("v"))
                 .select(F.greatest(u, v).alias("u"),
                         F.least(u, v).alias("v"))
                 .distinct())
        e_new = small.localCheckpoint(eager=True)
        new_sig = _sig(e_new)
        converged = new_sig == prev_sig
        e, prev_sig = e_new, new_sig
        if converged:
            break
    if not converged:
        raise RuntimeError(
            f"connected_components: star contraction did not reach a "
            f"fixpoint within max_iter={max_iter} rounds; labels "
            f"would be unsound (duplicate ids downstream)")
    # converged edge set is a star forest: (non-root, root)
    labels = e.select(u.alias("id"), v.alias("cluster_id"))
    roots = all_nodes.join(labels, "id", "left_anti") \
        .select("id", F.col("id").alias("cluster_id"))
    out = labels.unionByName(roots)
    if hashed:
        # join back to original id values: once for the node, once
        # for the canonical label (both joins on the hash key)
        cmap = id_map.select(F.col("_hid").alias("cluster_id"),
                             F.col("_oid").alias("_coid"))
        out = (out.join(id_map, out["id"] == id_map["_hid"])
               .join(cmap, "cluster_id")
               .select(F.col("_oid").alias("id"),
                       F.col("_coid").alias("cluster_id")))
    return out


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Near-dup clustering + canonical-document selection: pairs (from
    any of the near-dup operators above) -> connected components ->
    keep the longest text per cluster (ties: smallest id) — the
    training-data analog of DeduplicationJob.java:114-165's
    highest-score/longest-content winner.

    Returns (id, cluster_id, keep)."""
    comp = connected_components(pairs, nodes=docs.select(id_col),
                                id_a=id_a, id_b=id_b)
    integral = {"tinyint", "smallint", "int", "bigint", "long"}
    idc = F.col(id_col)
    if dict(pairs.dtypes)[id_a] in integral:
        idc = idc.cast("long")  # match comp's long keys
    d = docs.select(idc.alias("id"),
                    F.length(F.col(text_col)).alias("_len"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("_len"), F.asc("id"))
    return (comp.join(d, "id")
            .withColumn("keep", F.row_number().over(w) == 1)
            .select("id", "cluster_id", "keep"))


def paragraph_dedup(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    delim: str = r"\n+") -> DataFrame:
    """Corpus-level paragraph deduplication (the CCNet/RefinedWeb
    pass): split every document on ``delim``, fingerprint each
    non-blank paragraph (MD5 of lowercased/trimmed text), and keep
    only the globally FIRST occurrence of each fingerprint — first =
    smallest (doc id, position). Surviving paragraphs reassemble in
    original order; documents whose every paragraph was seen earlier
    come back empty (a downstream length filter drops them).

    Scale shape: the first-occurrence winner is a min-of-struct
    aggregation on the fingerprint — map-side partial aggregation
    absorbs hot boilerplate paragraphs (a window over fingerprint
    would funnel each hot key through one task). The rebuild is a
    per-document groupBy with an array sort on (position, text) —
    bounded by document size.

    Returns (id, text, n_paragraphs, n_removed) for every input doc.
    """
    paras = (docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(F.split(F.col(text_col), delim))
         .alias("pos", "para"))
        .where(F.length(F.trim("para")) > 0)
        .withColumn("fp", F.md5(F.encode(
            F.lower(F.trim(F.col("para"))), "UTF-8"))))
    firsts = paras.groupBy("fp").agg(
        F.min(F.struct("id", "pos")).alias("_first"))
    marked = (paras.join(firsts, "fp")
              .withColumn("keep",
                          (F.col("id") == F.col("_first.id"))
                          & (F.col("pos") == F.col("_first.pos"))))
    agg = (marked.groupBy("id").agg(
        F.count("*").alias("n_paragraphs"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0))
         .cast("long").alias("n_removed"),
        F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(
                F.when(F.col("keep"), F.struct("pos", "para")))),
            lambda x: x["para"])).alias("text")))
    base = docs.select(F.col(id_col).cast("long").alias("id"))
    return (base.join(agg, "id", "left")
            .select("id",
                    F.coalesce("text", F.lit("")).alias("text"),
                    F.coalesce("n_paragraphs", F.lit(0).cast("long"))
                     .alias("n_paragraphs"),
                    F.coalesce("n_removed", F.lit(0).cast("long"))
                     .alias("n_removed")))
