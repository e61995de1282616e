"""scoring-similarity plugin (CosineSimilarityModel.java:48-155)."""

import math

import pytest

from nutch_spark.operators.similarity import similarity_scores


def test_cosine_single_component(spark):
    docs = spark.createDataFrame(
        [("http://a.ex/", "spark spark table"),   # overlaps gold
         ("http://b.ex/", "zzz qqq"),             # no overlap
         ("http://c.ex/", "the a")],              # all stopwords
        "url string, text string")
    out = {r.url: r.score for r in similarity_scores(
        docs, "spark table", stopwords=("the", "a")).collect()}
    # doc a: tf (spark 2, table 1), gold (spark 1, table 1):
    # dot 3, |d| sqrt(5), |g| sqrt(2)
    assert out["http://a.ex/"] == pytest.approx(
        3 / (math.sqrt(5) * math.sqrt(2)))
    assert out["http://b.ex/"] == 0.0
    # everything stopworded -> empty vector -> 0.0, url still present
    assert out["http://c.ex/"] == 0.0


def test_score_divides_by_nonzero_components(spark):
    """setURLScoreAfterParsing lines 127-140: sum of component
    cosines / count of NON-ZERO components (min 1)."""
    docs = spark.createDataFrame(
        [("http://a.ex/", "spark", "spark", None),
         ("http://b.ex/", "spark", None, None)],
        "url string, text string, kw string, dsc string")
    out = {r.url: r.score for r in similarity_scores(
        docs, "spark", text_col="text", keyword_col="kw",
        desc_col="dsc").collect()}
    # a: text cosine 1, kw cosine 1, desc 0 -> (1+1)/2 = 1
    assert out["http://a.ex/"] == pytest.approx(1.0)
    # b: only text non-zero -> 1/1
    assert out["http://b.ex/"] == pytest.approx(1.0)


def test_tokenization_strips_punctuation_case(spark):
    """DocumentVector.createDocVect: [^a-zA-Z0-9 ] -> space,
    lowercase (the Java leading-empty-token artifact is dropped)."""
    docs = spark.createDataFrame(
        [("http://a.ex/", "!!SPARK, Table.")], "url string, text string")
    out = similarity_scores(docs, "spark table").collect()
    assert out[0].score == pytest.approx(1.0)
