"""Gopher repetition signals + corpus paragraph dedup."""

from pyspark.sql import functions as F

from nutch_spark.operators.dedup_text import paragraph_dedup
from nutch_spark.operators.textops import (
    line_repetition_features, top_ngram_char_fraction)


def test_line_repetition_features(spark):
    df = spark.createDataFrame(
        [(0, "aa\nbb\naa\ncc\naa"),   # 5 lines, 'aa' x3 -> 2 dups
         (1, "x\ny\nz"),              # no dups
         (2, "only"),                 # single line
         (3, "  \n\n ")],             # all blank
        "doc_id long, text string")
    ft = line_repetition_features(F.col("text"))
    out = {r.doc_id: r for r in df.select(
        "doc_id",
        F.round(ft["dup_line_frac"], 6).alias("dlf"),
        F.round(ft["dup_line_char_frac"], 6).alias("dlcf")).collect()}
    assert out[0].dlf == 0.4            # 2 of 5
    assert out[0].dlcf == 0.4           # 4 of 10 chars
    assert out[1].dlf == 0.0 and out[1].dlcf == 0.0
    assert out[2].dlf == 0.0
    assert out[3].dlf is None and out[3].dlcf is None


def test_top_ngram_char_fraction(spark):
    df = spark.createDataFrame(
        [(0, "a b a b a b c"),   # 'a b' x3 over 13 chars
         (1, "unique words only here"),
         (2, "")],
        "doc_id long, text string")
    out = {r.id: r for r in top_ngram_char_fraction(df).collect()}
    assert out[0].top_ngram == "a b" and out[0].top_count == 3
    assert abs(out[0].top_ngram_char_frac - 9 / 13) < 1e-9
    assert out[1].top_count == 1
    # tie-break at equal count: longest n-gram wins
    assert out[1].top_ngram == "unique words"
    # total over input: empty text returns a null-feature row
    assert 2 in out
    assert out[2].top_ngram is None and out[2].top_count is None
    assert out[2].top_ngram_char_frac is None


def test_paragraph_dedup_global_first_wins(spark):
    df = spark.createDataFrame(
        [(0, "P1\nP2\nP1"),      # in-doc dup of P1
         (1, "P2\nP3"),          # P2 already owned by doc 0
         (2, "P3"),              # P3 owned by doc 1
         (3, "")],               # blank doc
        "doc_id long, text string")
    out = {r.id: r for r in paragraph_dedup(df).collect()}
    assert out[0].text == "P1\nP2" and out[0].n_removed == 1
    assert out[1].text == "P3" and out[1].n_removed == 1
    assert out[2].text == "" and out[2].n_removed == 1
    assert out[3].text == "" and out[3].n_paragraphs == 0
    assert out[0].n_paragraphs == 3


def test_paragraph_dedup_case_insensitive_and_order(spark):
    df = spark.createDataFrame(
        [(5, "Zed\nalpha\n ZED ")], "doc_id long, text string")
    out = paragraph_dedup(df).collect()[0]
    # ' ZED ' collapses onto 'Zed'; original order preserved
    assert out.text == "Zed\nalpha"
