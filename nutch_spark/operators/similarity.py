"""scoring-similarity plugin analog — cosine similarity to a gold
standard for focused crawling.

Reference: ``scoring-similarity`` (CosineSimilarityModel.java:48-145,
DocumentVector.java): term-frequency vectors over
``replaceAll("[^a-zA-Z0-9 ]", " ").toLowerCase().split("\\s+")``
tokens minus a stopword list; per-component cosine of the parse text /
``metatag.keyword`` / ``metatag.description`` against the gold
document; the page score is the component sum divided by the number of
non-zero components (min 1, setURLScoreAfterParsing lines 116-143);
``distributeScoreToOutlinks`` then copies that score onto every
outlink (lines 146-155), steering generate toward on-topic pages.

Deviation (documented): Java's ``split`` emits a leading empty token
when the text starts with a separator, making ``""`` a countable term;
that artifact is dropped here on both the engine and oracle sides.

Spark shape: tokenize → explode → (url, term) counts → broadcast-join
the gold TF vector (one small map) → one aggregation per url for dot
product and norm. All sums are integer-valued (TF products), so they
are exact in doubles and order-independent — the cosine hash-matches
any engine.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_TOKEN_CLEAN = "[^a-zA-Z0-9 ]"


def _gold_tf(gold_text: str, stopwords: frozenset[str]) -> dict:
    toks = re.sub(_TOKEN_CLEAN, " ", gold_text).lower().split()
    tf: dict[str, int] = {}
    for t in toks:
        if t and t not in stopwords:
            tf[t] = tf.get(t, 0) + 1
    return tf


def _tokens_col(col: F.Column, stopwords: frozenset[str]) -> F.Column:
    toks = F.split(F.lower(F.regexp_replace(col, _TOKEN_CLEAN, " ")),
                   r"\s+")
    return F.filter(toks, lambda t: (t != "") & ~t.isin(*stopwords)
                    if stopwords else t != "")


def _component_cosine(docs: DataFrame, spark, col_name: str,
                      gold: dict) -> DataFrame:
    """(url, c) — cosine of one text column against the gold TF."""
    gold_norm = sum(v * v for v in gold.values()) ** 0.5
    if not gold:
        return docs.select("url", F.lit(0.0).alias("c"))
    gold_df = F.broadcast(spark.createDataFrame(
        list(gold.items()), "term string, gtf long"))
    terms = (docs
             .select("url", F.explode(F.col("_toks_" + col_name))
                     .alias("term"))
             .groupBy("url", "term").agg(F.count("*").alias("tf")))
    agg = (terms.join(gold_df, "term", "left")
           .groupBy("url")
           .agg(F.sum(F.col("tf") * F.coalesce("gtf", F.lit(0)))
                .alias("dot"),
                F.sqrt(F.sum(F.col("tf") * F.col("tf")))
                .alias("norm")))
    c = F.when(F.col("norm") * gold_norm == 0, 0.0) \
        .otherwise(F.col("dot") / (F.col("norm") * F.lit(gold_norm)))
    return agg.select("url", c.alias("c"))


def similarity_scores(docs: DataFrame, gold_text: str,
                      stopwords: tuple[str, ...] = (),
                      text_col: str = "text",
                      keyword_col: str | None = None,
                      desc_col: str | None = None) -> DataFrame:
    """(url, score) per CosineSimilarityModel.setURLScoreAfterParsing:
    score = Σ component cosines / max(1, #non-zero components), over
    the text column plus (when given) the metatag keyword/description
    columns."""
    spark = docs.sparkSession
    sw = frozenset(s.strip().lower() for s in stopwords)
    gold = _gold_tf(gold_text, sw)

    comps = [("text", text_col)]
    if keyword_col is not None:
        comps.append(("kw", keyword_col))
    if desc_col is not None:
        comps.append(("desc", desc_col))

    base = docs
    for name, col in comps:
        base = base.withColumn(
            "_toks_" + name,
            _tokens_col(F.coalesce(F.col(col), F.lit("")), sw))

    out = None
    for name, _col in comps:
        part = _component_cosine(base, spark, name, gold) \
            .withColumnRenamed("c", "_c_" + name)
        out = part if out is None else out.join(part, "url", "full_outer")

    cs = [F.coalesce(F.col("_c_" + n), F.lit(0.0)) for n, _ in comps]
    total = cs[0]
    for c in cs[1:]:
        total = total + c
    nonzero = sum((c != 0).cast("int") for c in cs)
    scored = out.select(
        "url",
        (total / F.greatest(nonzero, F.lit(1))).alias("score"))
    # total over the input: a url whose every component tokenized to
    # nothing has no term rows, but the reference still scores it 0.0
    return (docs.select("url").distinct()
            .join(scored, "url", "left")
            .select("url", F.coalesce("score", F.lit(0.0))
                    .alias("score")))
