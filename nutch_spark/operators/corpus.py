"""Corpus-curation operators for training-data pipelines.

Beyond the reference's crawl operators: the stages a web-text corpus
pass runs between crawling and training. All three are deliberately
shaped for 100 TB inputs:

- :func:`pii_scrub` — pure JVM ``regexp_replace`` chain, one
  whole-stage-codegen projection, no shuffle, no Python;
- :func:`stratified_sample` — deterministic per-row keep/drop filter
  (no shuffle, no sort, no sampleBy() RNG nondeterminism), so the
  sample is reproducible across retries/speculative tasks — a
  requirement for resumable pipelines;
- :func:`decontaminate` — doc-side n-grams equi-joined against a
  BROADCAST benchmark n-gram set (benchmarks are tiny next to the
  corpus), so the 100 TB side never shuffles.

Reference analog: none (Nutch stops at indexing); semantics follow the
public corpus pipelines (CCNet, Gopher/Rae et al. 2021, Dolma).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------- PII

# Patterns kept to syntax shared by Java regex (Spark codegen) and RE2
# (DuckDB oracle): character classes, bounded repeats, \b anchors.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d() -]{7,14}\d",
}
PII_TOKENS = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def pii_scrub(text: Column) -> dict[str, Column]:
    """Redact emails / IPv4s / international-format phone numbers and
    count what was removed. Returns ``{"text": scrubbed, "n_email":
    ..., "n_ipv4": ..., "n_phone": ...}`` — all JVM column
    expressions (Dolma-style PII pass)."""
    out = {}
    scrubbed = text
    # replacement order matters: emails contain dots that would
    # otherwise half-match the ipv4 pattern's digit runs
    for kind in ("email", "ipv4", "phone"):
        out[f"n_{kind}"] = F.regexp_count(
            scrubbed, F.lit(PII_PATTERNS[kind])).cast("long")
        scrubbed = F.regexp_replace(
            scrubbed, PII_PATTERNS[kind], PII_TOKENS[kind])
    out["text"] = scrubbed
    return out


# ----------------------------------------------------------- sampling

# Knuth multiplicative constant — a portable deterministic mixer both
# Spark and any SQL oracle can evaluate with plain BIGINT arithmetic.
_MIX = 2654435761
_MOD = 2**32
_IN_MOD = 2**31


def sample_key(id_col: Column, salt: int = 0) -> Column:
    """Deterministic uniform key in [0, 1): ``((((id + salt) pmod
    2^31) * 2654435761) pmod 2^32) / 2^32`` — salt perturbs the input
    BEFORE the multiplicative mix so it reshuffles the whole keyspace.

    Overflow-safe by construction: the input is first reduced to
    [0, 2^31) with ``pmod`` (negative ids land in range too), so the
    product is < 2^31 * 2654435761 ≈ 5.7e18 < int64 max — no wrap in
    Spark, and no overflow ERROR in engines like DuckDB that refuse
    to wrap BIGINT. The outer ``pmod`` keeps the key non-negative, so
    ``key < rate`` can never admit a row into a rate-0 stratum.
    Production pipelines may swap in ``xxhash64`` (stronger mixing);
    this closed form is reproducible in ANY engine, which is what
    makes the sample auditable."""
    mixed = F.pmod(id_col.cast("long") + F.lit(salt), F.lit(_IN_MOD)) \
        * F.lit(_MIX)
    return F.pmod(mixed, F.lit(_MOD)) / F.lit(float(_MOD))


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      id_col: str = "doc_id",
                      stratum_col: str = "lang",
                      default_rate: float = 0.0,
                      salt: int = 0) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its
    :func:`sample_key` falls below the stratum's rate. A pure filter —
    no shuffle, no RNG state, the same rows survive on every re-run
    and at any parallelism (unlike ``df.sampleBy`` whose output
    depends on partitioning). The 100 TB scan prunes nothing extra:
    one projection + filter fused into the parquet scan stage."""
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum,
                      F.lit(float(r))).otherwise(rate)
    return docs.where(sample_key(F.col(id_col), salt) < rate)


# ----------------------------------------- benchmark decontamination


def words_col(text: Column) -> Column:
    """Lowercased whitespace tokens. Project this into its OWN column
    before building n-grams over it: the n-gram lambda references the
    words array once per element, and an inlined split() would be
    re-evaluated per reference (10 copies in the optimized plan for
    n=8 — measured), while a materialized projection computes it once
    per row. CollapseProject keeps the barrier because the alias is
    non-cheap and multiply-referenced."""
    t = F.lower(F.trim(text))
    return F.when(F.length(t) > 0, F.split(t, r"\s+")) \
        .otherwise(F.array().cast("array<string>"))


def ngrams_of(words: Column, n: int) -> Column:
    """Word n-grams over an already-projected words array — JVM
    ``transform`` over a ``sequence``, no Python."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)])
        )).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column, n: int) -> Column:
    """One-expression convenience form — fine for small inputs; hot
    paths should project :func:`words_col` first (see its docstring)
    and call :func:`ngrams_of`."""
    return ngrams_of(words_col(text), n)


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  min_hits: int = 1, id_col: str = "doc_id",
                  text_col: str = "text",
                  bench_text_col: str = "text") -> DataFrame:
    """Flag training documents that share ≥ ``min_hits`` distinct word
    ``n``-grams with any benchmark/eval text (test-set decontamination
    à la GPT-3 §C / Dolma). Returns ``(id, n_matched, contaminated)``
    for every input doc.

    Scale shape: benchmark suites are MBs while the corpus is TBs, so
    the distinct benchmark n-gram set is **broadcast**; the corpus
    side explodes its n-grams and hash-joins in-map — the 100 TB side
    is never shuffled. The per-doc count is a partial-aggregated
    groupBy on (id), uniform keys. ``F.broadcast`` is pinned
    explicitly so AQE cannot flip the build side."""
    bench = (benchmark
             .select(words_col(F.col(bench_text_col)).alias("_w"))
             .select(F.explode(ngrams_of(F.col("_w"), n))
                     .alias("ngram"))
             .distinct())
    # per-doc dedup happens ROW-SIDE (array_distinct before explode):
    # a corpus-wide distinct() here would shuffle the 100 TB side
    doc_grams = (docs.select(
        F.col(id_col).cast("long").alias("id"),
        words_col(F.col(text_col)).alias("_w"))
        .select("id",
                F.explode(F.array_distinct(ngrams_of(F.col("_w"), n)))
                .alias("ngram")))
    hits = (doc_grams.join(F.broadcast(bench), "ngram")
            .groupBy("id")
            .agg(F.count("*").alias("n_matched")))
    base = docs.select(F.col(id_col).cast("long").alias("id"))
    return (base.join(hits, "id", "left")
            .select("id",
                    F.coalesce("n_matched", F.lit(0).cast("long"))
                     .alias("n_matched"),
                    (F.coalesce("n_matched", F.lit(0))
                     >= min_hits).alias("contaminated")))


# -------------------------------------- exact substring (span) dedup


def duplicate_spans(docs: DataFrame, k: int = 10,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Exact substring-duplication detection (Lee et al. 2022,
    "Deduplicating Training Data…", window formulation): every k-word
    window whose content occurs at MORE THAN ONE (doc, pos) location
    corpus-wide is reported, with the globally-first location marked
    canonical.

    Returns (id, pos, canonical) — pos is the 0-based word offset.

    Scale shape: windows shuffle by a 64-bit hash of the gram (slim
    keys, not the text); the >1-occurrence set comes from a
    partial-aggregated groupBy. This trades the sequential suffix
    array of the paper for a shuffle the cluster can actually do at
    100 TB; window length k bounds memory per row. Hashing admits
    ~W²/2⁶⁵ expected false-duplicate windows (W total windows: at
    W = 10¹² that is ~3·10⁴ windows, ~3·10⁻⁸ of the corpus) —
    negligible for cleaning; group on the gram text instead of ``h``
    to make it exact at the cost of a fat shuffle key."""
    grams = (docs.select(
        F.col(id_col).cast("long").alias("id"),
        words_col(F.col(text_col)).alias("_w"))
        .select("id", F.posexplode(ngrams_of(F.col("_w"), k))
                .alias("pos", "gram")))
    hashed = grams.select("id", "pos",
                          F.xxhash64("gram").alias("h"))
    agg = (hashed.groupBy("h")
           .agg(F.count("*").alias("n"),
                F.min(F.struct("id", "pos")).alias("first"))
           .where(F.col("n") > 1))
    return (hashed.join(agg, "h")
            .select("id", "pos",
                    ((F.col("id") == F.col("first.id"))
                     & (F.col("pos") == F.col("first.pos")))
                    .alias("canonical")))


def dedup_substrings(docs: DataFrame, k: int = 10,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Remove duplicated substrings: every word covered by a
    non-canonical duplicated k-window is dropped; the canonical (first)
    occurrence survives, as do all unique spans. Returns
    (id, text, n_words, n_removed_words).

    The covered-word set is built by exploding each losing window into
    its k word offsets and per-doc distinct-ing — all joins are on
    (id, offset), uniform keys; text rebuild is a bounded per-doc
    aggregation exactly like :func:`paragraph_dedup`'s."""
    words = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(
            F.when(F.length(F.trim(text_col)) > 0,
                   F.split(F.lower(F.trim(text_col)), r"\s+"))
            .otherwise(F.array().cast("array<string>")))
        .alias("widx", "word"))
    losers = duplicate_spans(docs, k, id_col, text_col) \
        .where(~F.col("canonical"))
    covered = (losers.select(
        "id", F.explode(F.sequence(F.col("pos"),
                                   F.col("pos") + (k - 1)))
        .alias("widx")).distinct())
    kept = words.join(covered, ["id", "widx"], "left_anti")
    agg = (kept.groupBy("id").agg(
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(F.struct("widx", "word"))),
            lambda x: x["word"])).alias("text"),
        F.count("*").alias("n_kept")))
    totals = words.groupBy("id").agg(F.count("*").alias("n_words"))
    base = docs.select(F.col(id_col).cast("long").alias("id"))
    return (base
            .join(totals, "id", "left").join(agg, "id", "left")
            .select(
                "id",
                F.coalesce("text", F.lit("")).alias("text"),
                F.coalesce("n_words", F.lit(0).cast("long"))
                 .alias("n_words"),
                (F.coalesce("n_words", F.lit(0))
                 - F.coalesce("n_kept", F.lit(0))).cast("long")
                 .alias("n_removed_words")))
