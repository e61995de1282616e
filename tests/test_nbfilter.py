"""parsefilter-naivebayes analog (NaiveBayesParseFilter.java:40-190)."""

from pyspark.sql import functions as F

from nutch_spark.operators.nbfilter import (
    naive_bayes_outlink_filter, nb_classify, train_naive_bayes)


def _model(spark):
    train = spark.createDataFrame(
        [("1", "spark table data shuffle partition"),
         ("1", "spark data join agg"),
         ("0", "football game score goal"),
         ("0", "game referee goal match")],
        "label string, text string")
    return train_naive_bayes(train)


def test_nb_classify(spark):
    m = _model(spark)
    docs = spark.createDataFrame(
        [("http://a.ex/", "spark shuffle join partition"),
         ("http://b.ex/", "goal goal referee football"),
         ("http://c.ex/", "")],
        "url string, text string")
    got = {r.url: r.label for r in nb_classify(docs, m).collect()}
    assert got["http://a.ex/"] == "1"
    assert got["http://b.ex/"] == "0"
    # empty doc scores priors alone (equal here) -> smallest label
    assert got["http://c.ex/"] == "0"


def test_nb_outlink_filter_prunes_irrelevant_pages(spark):
    """Irrelevant pages keep only wordlist-matching outlinks
    (filter + containsWord, NaiveBayesParseFilter.java:96-190)."""
    m = _model(spark)
    links = [{"to_url": "http://x.ex/topic-hub", "anchor": "a"},
             {"to_url": "http://y.ex/misc", "anchor": "b"}]
    pd_ = spark.createDataFrame(
        [("http://rel.ex/", links), ("http://irr.ex/", links)],
        "url string, outlinks array<struct<to_url string, anchor string>>")
    pt = spark.createDataFrame(
        [("http://rel.ex/", "spark data table"),
         ("http://irr.ex/", "football game goal")],
        "url string, text string")
    out = {r.url: [o["to_url"] for o in r.outlinks]
           for r in naive_bayes_outlink_filter(
               pd_, pt, m, wordlist=("topic",)).collect()}
    assert out["http://rel.ex/"] == ["http://x.ex/topic-hub",
                                     "http://y.ex/misc"]
    assert out["http://irr.ex/"] == ["http://x.ex/topic-hub"]
