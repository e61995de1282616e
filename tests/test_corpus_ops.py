"""Corpus-curation operators: PII scrub, stratified sampling,
benchmark decontamination."""

import pytest
from pyspark.sql import functions as F

from nutch_spark.operators import corpus


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [(0, "mail a.b+c@ex-site.org or x@y.io, ip 10.0.255.1, "
             "call +1 (555) 010-4242 now"),
         (1, "no pii here 1.2 not-an-ip 999"),
         (2, "two ips 1.2.3.4 5.6.7.8")],
        "doc_id long, text string")
    s = corpus.pii_scrub(F.col("text"))
    out = {r.doc_id: r for r in df.select(
        "doc_id", s["text"].alias("clean"), s["n_email"].alias("ne"),
        s["n_ipv4"].alias("ni"), s["n_phone"].alias("np")).collect()}
    assert out[0].ne == 2 and out[0].ni == 1 and out[0].np == 1
    assert "<EMAIL>" in out[0].clean and "<IP>" in out[0].clean \
        and "<PHONE>" in out[0].clean
    assert "@" not in out[0].clean and "555" not in out[0].clean
    assert out[1].clean == "no pii here 1.2 not-an-ip 999"
    assert out[2].ni == 2


def test_stratified_sample_deterministic_and_rates(spark):
    df = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de")
         .alias("lang"))
    rates = {"en": 0.5, "de": 0.1}
    a = corpus.stratified_sample(df, rates)
    b = corpus.stratified_sample(df.repartition(13), rates)
    ra = sorted(r.doc_id for r in a.collect())
    rb = sorted(r.doc_id for r in b.collect())
    assert ra == rb  # partitioning-independent
    n_en = sum(1 for i in ra if i % 2 == 0)
    n_de = len(ra) - n_en
    assert abs(n_en / 10000 - 0.5) < 0.02
    assert abs(n_de / 10000 - 0.1) < 0.02
    # unknown stratum dropped by default, kept with default_rate=1
    df2 = spark.createDataFrame([(1, "xx")], "doc_id long, lang string")
    assert corpus.stratified_sample(df2, rates).count() == 0
    assert corpus.stratified_sample(df2, rates,
                                    default_rate=1.0).count() == 1
    # salt changes the sample
    rc = sorted(r.doc_id for r in
                corpus.stratified_sample(df, rates, salt=7).collect())
    assert rc != ra


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today"),
         (1, "completely different words in this one right here ok"),
         (2, "the quick brown fox jumps over a sleepy cat today")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [("The Quick Brown Fox Jumps Over the lazy dog",)],
        "text string")
    out = {r.id: r for r in
           corpus.decontaminate(docs, bench, n=5).collect()}
    assert out[0].contaminated and out[0].n_matched == 5
    assert not out[1].contaminated and out[1].n_matched == 0
    # doc 2 shares only the 5-gram 'the quick brown fox jumps' (+1
    # more with 'jumps over a...' diverging) — exactly 2 matches
    assert out[2].n_matched == 2
    # min_hits raises the bar
    out3 = {r.id: r for r in
            corpus.decontaminate(docs, bench, n=5,
                                 min_hits=3).collect()}
    assert out3[0].contaminated and not out3[2].contaminated


def test_decontaminate_broadcasts_bench_side(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id long, text string")
    bench = spark.createDataFrame([("a b c d e",)], "text string")
    plan = corpus.decontaminate(docs, bench, n=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_duplicate_spans_and_substring_dedup(spark):
    # doc 0 and doc 1 share the 5-word run "v w x y z"; doc 0 also
    # repeats it internally
    docs = spark.createDataFrame(
        [(0, "a b c v w x y z m n v w x y z"),
         (1, "p q v w x y z r s t"),
         (2, "all unique words here nothing shared at all")],
        "doc_id long, text string")
    spans = corpus.duplicate_spans(docs, k=5).collect()
    got = {(r.id, r.pos): r.canonical for r in spans}
    # duplicated 5-gram occurrences: doc0@3, doc0@10, doc1@2
    assert set(got) == {(0, 3), (0, 10), (1, 2)}
    assert got[(0, 3)] and not got[(0, 10)] and not got[(1, 2)]

    out = {r.id: r for r in corpus.dedup_substrings(docs, k=5).collect()}
    # doc 0 keeps its first occurrence, loses words 10..14
    assert out[0].text == "a b c v w x y z m n"
    assert out[0].n_removed_words == 5 and out[0].n_words == 15
    # doc 1 loses words 2..6
    assert out[1].text == "p q r s t"
    assert out[1].n_removed_words == 5
    # doc 2 untouched (lowercased join of its own words)
    assert out[2].text == "all unique words here nothing shared at all"
    assert out[2].n_removed_words == 0


def test_dedup_substrings_overlapping_windows(spark):
    # an 8-word duplicated run yields overlapping duplicated 5-windows;
    # covered-word union must remove the whole run once, not k per win
    run = "h1 h2 h3 h4 h5 h6 h7 h8"
    docs = spark.createDataFrame(
        [(0, run + " tail0 tail1"), (1, "lead0 " + run)],
        "doc_id long, text string")
    out = {r.id: r for r in corpus.dedup_substrings(docs, k=5).collect()}
    assert out[0].text == run + " tail0 tail1"  # canonical survives
    assert out[1].text == "lead0"
    assert out[1].n_removed_words == 8


def test_sample_key_bounded_for_extreme_ids(spark):
    # the multiplicative mix must stay in [0, 1) for multi-billion
    # and negative ids (plain % used to wrap negative and admit rows
    # into rate-0 strata); the closed form must also fit int64 so
    # overflow-checking engines (DuckDB, Spark ANSI) can evaluate it
    df = spark.createDataFrame(
        [(0,), (1,), (-1,), (2**31,), (5_000_000_000,),
         (-5_000_000_000,), (2**62,), (-(2**62),)], "doc_id long")
    keys = [r.k for r in df.select(
        corpus.sample_key(F.col("doc_id")).alias("k")).collect()]
    assert all(0.0 <= k < 1.0 for k in keys)
    # rate-0 stratum admits nothing, even at extreme ids
    df2 = df.withColumn("lang", F.lit("xx"))
    assert corpus.stratified_sample(df2, {"en": 0.5}).count() == 0
