"""Checker tools — the reference's single-URL debug mains as
DataFrame operators.

Reference: net/URLNormalizerChecker.java (normalize stdin urls with a
chosen scope), net/URLFilterChecker.java (print ``+url`` / ``-url``
per filter-chain verdict), parse/ParserChecker.java (fetch one url,
parse, dump text/title/outlinks/signature),
indexer/IndexingFiltersChecker.java (run the indexing-filter chain on
one fetched doc and dump the resulting fields).

The reference tools read stdin / fetch one live url; here each takes a
DataFrame (one row or a million — the chains are the same vectorized
columns the pipeline stages use, so checker output is exactly what the
pipeline would do to those urls, which is the point of the tools).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import CrawlConfig
from ..functions.filters import filter_accepts_col
from ..functions.normalizers import normalizer_udf


def normalizer_checker(urls: DataFrame, cfg: CrawlConfig,
                       scope: str = "default") -> DataFrame:
    """URLNormalizerChecker.java:49-68: each url through the
    configured normalizer chain for ``scope``. Returns
    (url, normalized) — normalized is null when the chain rejects the
    url outright (malformed)."""
    norm = normalizer_udf(cfg, scope)
    return urls.select("url", norm(F.col("url")).alias("normalized"))


def filter_checker(urls: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """URLFilterChecker.java:50-71: the filter-chain verdict per url,
    as the reference prints it: ``+`` accepted, ``-`` rejected.
    Returns (url, verdict)."""
    df = filter_accepts_col(urls, cfg.url_filter_rules, "url")
    return df.select(
        "url",
        F.when(F.col("accepted"), "+").otherwise("-").alias("verdict"))


def automaton_filter_checker(urls: DataFrame, rules) -> DataFrame:
    """URLFilterChecker verdicts for the urlfilter-automaton analog
    (AutomatonURLFilter.java:80-105): first-match-wins ±rules with
    FULL-string automaton acceptance (brics RunAutomaton.run), the
    contrast to urlfilter-regex's substring find(). All rules compile
    into one product DFA per executor; the match is a vectorized
    table walk over the Arrow batch. Returns (url, verdict)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    rules_key = tuple((sign, pat) for sign, pat in rules)

    @pandas_udf(StringType())
    def _verdict(u: pd.Series) -> pd.Series:
        from ..functions.automaton import compiled_filter
        f = compiled_filter(rules_key)
        return pd.Series(f.verdicts(u.tolist()))

    return urls.select("url", _verdict(F.col("url")).alias("verdict"))


def parser_checker(content: DataFrame, cfg: CrawlConfig,
                   now_ms: int = 0) -> DataFrame:
    """ParserChecker.java:90-140: parse the given content rows and
    dump per-url parse results — title, extracted text, outlink count,
    content signature. Returns
    (url, title, text, n_outlinks, signature)."""
    from . import parse as parse_op
    pr = parse_op.parse_segment(content, cfg, now_ms)
    pd_ = pr["parse_data"].select(
        "url", "title", F.size(F.coalesce(
            F.col("outlinks"), F.array())).alias("n_outlinks"),
        "signature")
    return (pr["parse_text"].join(pd_, "url")
            .select("url", "title", "text", "n_outlinks", "signature"))


def indexing_filters_checker(docs: DataFrame) -> DataFrame:
    """IndexingFiltersChecker.java:87-143: dump the NutchDocument the
    indexing-filter chain produced — one (url, field, value) row per
    field, the reference's ``fieldname: value`` listing. ``docs`` is
    the output of :func:`~nutch_spark.operators.indexing_filters.
    apply_indexing_filters`; every non-url column becomes a field row
    (nulls dropped, like fields the chain never set). Array-valued
    fields (anchor, tag) emit one row per element, matching the
    reference's multi-valued NutchField dump."""
    fields = [c for c in docs.columns if c != "url"]
    rows = []
    for c in fields:
        col = docs.schema[c].dataType.typeName()
        if col == "array":
            rows.append(docs.select(
                "url", F.lit(c).alias("field"),
                F.explode(c).alias("value"))
                .withColumn("value", F.col("value").cast("string")))
        else:
            rows.append(docs.select(
                "url", F.lit(c).alias("field"),
                F.col(c).cast("string").alias("value"))
                .where(F.col(c).isNotNull()))
    if not rows:
        # url-only docs frame: the reference's dump of a document with
        # no fields is empty — return the (url, field, value) schema
        # with zero rows rather than raising
        return docs.select(
            "url", F.lit(None).cast("string").alias("field"),
            F.lit(None).cast("string").alias("value")).limit(0)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
