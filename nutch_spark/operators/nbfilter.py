"""parsefilter-naivebayes analog — relevance-gated outlink pruning.

Reference: ``parsefilter-naivebayes`` (NaiveBayesParseFilter.java:
40-190): a naive-bayes model trained from a ``label\\ttext`` train
file classifies each page's parse text; when a page classifies
IRRELEVANT (class other than "1"), its outlinks are pruned to those
whose url contains a word from ``parsefilter.naivebayes.wordlist`` —
the second-tier gate that keeps a focused crawl from wandering while
still following promising links off bad pages.

The reference delegates to Mahout's trainer; this module implements
standard multinomial naive bayes (Laplace-smoothed, log-space) as
DataFrame programs — a semantics-preserving stand-in, not Mahout
byte-parity (Mahout is not in this sandbox and its TF-IDF weighting is
an implementation detail of the plugin's classifier, not of the
filter's contract). Tokenization matches scoring-similarity's
DocumentVector (strip non-alphanumerics, lowercase).

Scale shape: training aggregates (label, term) counts — one shuffle of
the tokenized train corpus — and collects only the VOCABULARY-sized
model to the driver for broadcast; classification explodes doc terms,
broadcast-joins the model, and aggregates once per url. No per-row
Python anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .similarity import _tokens_col


def train_naive_bayes(train: DataFrame, text_col: str = "text",
                      label_col: str = "label") -> dict:
    """Multinomial NB from (label, text) rows → broadcastable model:
    ``{"priors": {label: log_prior}, "terms": {term: {label:
    log_likelihood}}, "default": {label: log_lik_of_unseen}}``.
    Laplace (add-one) smoothing over the union vocabulary."""
    toks = train.select(F.col(label_col).alias("label"),
                        F.explode(_tokens_col(
                            F.coalesce(F.col(text_col), F.lit("")),
                            frozenset())).alias("term"))
    term_counts = toks.groupBy("label", "term").count().collect()
    doc_counts = {r["label"]: r["n"] for r in
                  train.groupBy(F.col(label_col).alias("label"))
                  .agg(F.count("*").alias("n")).collect()}

    vocab = {r["term"] for r in term_counts}
    v = max(1, len(vocab))
    totals: dict[str, int] = {}
    for r in term_counts:
        totals[r["label"]] = totals.get(r["label"], 0) + r["count"]

    n_docs = sum(doc_counts.values())
    priors = {lab: math.log(n / n_docs) for lab, n in doc_counts.items()}
    default = {lab: math.log(1.0 / (totals.get(lab, 0) + v))
               for lab in doc_counts}
    terms: dict[str, dict[str, float]] = {}
    for r in term_counts:
        terms.setdefault(r["term"], {})[r["label"]] = math.log(
            (r["count"] + 1.0) / (totals.get(r["label"], 0) + v))
    return {"priors": priors, "terms": terms, "default": default}


def nb_classify(docs: DataFrame, model: dict,
                text_col: str = "text") -> DataFrame:
    """(url, label) — argmax over labels of log prior + Σ per-term
    log likelihood (unseen terms take the smoothed default). Ties
    break toward the lexicographically-smallest label, so the argmax
    is deterministic."""
    spark = docs.sparkSession
    labels = sorted(model["priors"])
    rows = [(t,) + tuple(ll.get(lab, model["default"][lab])
                         for lab in labels)
            for t, ll in model["terms"].items()]
    cols = ", ".join(f"ll_{i} double" for i in range(len(labels)))
    model_df = F.broadcast(spark.createDataFrame(
        rows, f"term string, {cols}"))

    toked = docs.select(
        "url", F.explode_outer(_tokens_col(
            F.coalesce(F.col(text_col), F.lit("")),
            frozenset())).alias("term"))
    j = toked.join(model_df, "term", "left")
    # explode_outer keeps empty docs as one null-term row, which must
    # contribute nothing (an empty doc scores its priors alone)
    aggs = []
    for i, lab in enumerate(labels):
        aggs.append(F.sum(F.when(
            F.col("term").isNotNull(),
            F.coalesce(F.col(f"ll_{i}"),
                       F.lit(model["default"][lab])))).alias(f"s_{i}"))
    per_url = j.groupBy("url").agg(*aggs)

    score_cols = []
    for i, lab in enumerate(labels):
        score_cols.append(
            (F.lit(model["priors"][lab])
             + F.coalesce(F.col(f"s_{i}"), F.lit(0.0))).alias(f"sc_{i}"))
    scored = per_url.select("url", *score_cols)
    best = F.greatest(*[F.col(f"sc_{i}") for i in range(len(labels))]) \
        if len(labels) > 1 else F.col("sc_0")
    label = F.lit(labels[-1])
    # walk labels in reverse so earlier (smaller) labels win exact
    # ties; strict equality — an absolute epsilon would be
    # scale-dependent (log-score magnitude grows with doc length) and
    # could hand a genuinely losing label the tie-break
    for i in range(len(labels) - 2, -1, -1):
        label = F.when(F.col(f"sc_{i}") == best,
                       F.lit(labels[i])).otherwise(label)
    return scored.select("url", label.alias("label"))


def naive_bayes_outlink_filter(parse_data: DataFrame,
                               parse_text: DataFrame, model: dict,
                               wordlist: tuple[str, ...],
                               relevant_label: str = "1") -> DataFrame:
    """The plugin's filter contract (NaiveBayesParseFilter.java:
    158-190): pages whose text classifies as ``relevant_label`` keep
    their outlinks; every other page keeps only outlinks whose url
    CONTAINS a wordlist word (containsWord, lines 96-104). Returns
    parse_data with the pruned ``outlinks`` column."""
    labels = nb_classify(parse_text, model)

    def _keep(o):
        cond = F.lit(False)
        for w in wordlist:
            cond = cond | o["to_url"].contains(w)
        return cond
    out = (parse_data.join(labels, "url", "left")
           .withColumn(
               "outlinks",
               F.when(F.col("label") == relevant_label,
                      F.col("outlinks"))
                .otherwise(F.filter("outlinks", _keep)))
           .drop("label"))
    return out
