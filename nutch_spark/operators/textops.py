"""Text analysis for large-scale training-data pipelines.

Beyond the reference's parse stage, a 100 TB webtext pipeline needs
per-document text features. Everything here is **pure JVM column
expressions** (whole-stage codegen, no Python) so the same logic runs
identically in Spark and any ANSI-SQL oracle:

- token counting (whitespace + BPE-ish word/punct regex),
- quality scoring (length / punctuation / stopword / uppercase ratios,
  the usual Gopher/C4-style filters),
- n-gram-free language ID (stopword-hit heuristic over a few common
  function words per language),
- document fingerprinting (normalized-text MD5; the exact-dedup key).

The reference's nearest analogs: TextProfileSignature (quality-robust
content hash, crawl/TextProfileSignature.java) and the
language-identifier plugin (src/plugin/language-identifier) — ours are
re-expressed as vectorizable expressions instead of per-doc Java.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# small function-word inventories per language (public knowledge)
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "pour"),
    "es": ("el", "los", "que", "es", "una", "por", "con", "para"),
}

_WORD_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)) \
        .otherwise(F.size(F.split(t, r"\s+")))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and single
    punctuation marks each count as one token (a cheap, deterministic
    proxy for subword tokenizers)."""
    return F.size(F.regexp_extract_all(text, F.lit(_WORD_RE), 0))


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """Count of stopword occurrences (word-bounded, lowercased)."""
    words = "|".join(LANG_STOPWORDS[lang])
    pat = rf"\b({words})\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def quality_features(text: Column) -> dict[str, Column]:
    """C4/Gopher-style quality signals as columns."""
    n_chars = F.length(text)
    n_tokens = token_count_ws(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    n_stop = stopword_hits(text, "en")
    safe = F.greatest(n_chars, F.lit(1))
    safe_t = F.greatest(n_tokens, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_word_len": (n_alpha.cast("double") / safe_t),
        "alpha_ratio": n_alpha.cast("double") / safe,
        "upper_ratio": n_upper.cast("double") / safe,
        "punct_ratio": n_punct.cast("double") / safe,
        "stopword_ratio": n_stop.cast("double") / safe_t,
    }


def quality_score(text: Column) -> Column:
    """Scalar quality score in [0,1]: penalize too-short docs, low
    alpha ratio, shouting, and stopword-free keyword mash."""
    ft = quality_features(text)
    len_ok = F.least(ft["n_tokens"].cast("double") / 20.0, F.lit(1.0))
    alpha_ok = F.least(ft["alpha_ratio"] / 0.6, F.lit(1.0))
    calm = F.lit(1.0) - F.least(ft["upper_ratio"] * 4.0, F.lit(1.0))
    stop_ok = F.least(ft["stopword_ratio"] * 5.0, F.lit(1.0))
    return ((len_ok + alpha_ok + calm + stop_ok) / 4.0)


def lang_id(text: Column) -> Column:
    """Stopword-hit language ID: argmax over per-language function-word
    counts, 'und' (undetermined) when nothing matches.

    Deterministic tie-break: language-code ascending via the greatest()
    evaluation order below (en > de > fr > es requires strict >)."""
    scores = {lang: stopword_hits(text, lang)
              for lang in LANG_STOPWORDS}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # iterate in reverse-alphabetical so earlier langs win exact ties
    for lang in sorted(scores, reverse=True):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best <= 0, F.lit("und")).otherwise(out)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: MD5 of whitespace-normalized, lowercased
    text — the exact-dedup key (rolling-hash-free but
    order-sensitive, unlike TextProfileSignature which sorts by
    frequency; both are exposed)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(F.encode(norm, "UTF-8"))


def document_features(docs: DataFrame,
                      text_col: str = "text") -> DataFrame:
    """documents → per-doc feature frame (the headline text-analysis
    operator)."""
    t = F.col(text_col)
    ft = quality_features(t)
    return docs.select(
        *docs.columns,
        ft["n_tokens"].alias("tokens_ws"),
        token_count_bpe(t).alias("tokens_bpe"),
        F.round(ft["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(ft["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def lines_col(text: Column, delim: str = r"\n+") -> Column:
    """Non-blank lines of ``text``. Hot paths should project this
    once and pass the attribute to :func:`line_repetition_from` —
    inlined, the split+filter is re-evaluated per reference (see
    corpus.words_col)."""
    return F.filter(F.split(text, delim),
                    lambda x: F.length(F.trim(x)) > 0)


def line_repetition_from(lines: Column,
                         dlines: Column | None = None
                         ) -> dict[str, Column]:
    """Gopher-style line-repetition signals (Rae et al. 2021, §A1.1)
    over an already-projected lines array (optionally also a
    projected ``array_distinct`` of it):

    - ``dup_line_frac``: fraction of (non-blank) lines that are a
      repeat of an earlier line;
    - ``dup_line_char_frac``: fraction of line characters contained in
      those repeated occurrences.

    Pure array expressions — one whole-stage-codegen projection, no
    shuffle, no Python. Documents with no non-blank lines yield
    nulls."""
    if dlines is None:
        dlines = F.array_distinct(lines)
    n, nd = F.size(lines), F.size(dlines)
    zero = F.lit(0).cast("long")
    chars = F.aggregate(lines, zero, lambda a, x: a + F.length(x))
    dchars = F.aggregate(dlines, zero, lambda a, x: a + F.length(x))
    ok = n > 0
    return {
        "dup_line_frac": F.when(ok, (n - nd) / n.cast("double")),
        "dup_line_char_frac": F.when(
            ok, (chars - dchars) / chars.cast("double")),
    }


def line_repetition_features(text: Column,
                             delim: str = r"\n+") -> dict[str, Column]:
    """One-expression convenience form of
    :func:`line_repetition_from`; hot paths should project
    :func:`lines_col` first."""
    return line_repetition_from(lines_col(text, delim))


def top_ngram_char_fraction(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            n: int = 2) -> DataFrame:
    """Gopher-style top-n-gram repetition (Rae et al. 2021, §A1.1):
    the fraction of document characters covered by the single most
    frequent word n-gram (occurrences × n-gram length / normalized
    text length). High values flag boilerplate / keyword-stuffing
    pages a training pipeline should drop.

    Scale shape: per-row n-gram construction is a JVM ``transform``
    over a ``sequence`` (no Python); the count happens via
    explode + partial-aggregated groupBy on (doc, n-gram) — uniform
    keys, ordinary shuffle — and the per-document argmax is a window
    over doc_id (bounded by each doc's distinct n-gram count).
    Tie-break: highest count, then longer n-gram, then lexicographic —
    deterministic across engines.

    Total over its input: documents with fewer than ``n`` words have
    no n-grams and come back with null top_ngram / top_count /
    top_ngram_char_frac rather than being dropped (a left join back
    to the input ids — callers joining results never lose docs)."""
    t = F.lower(F.trim(F.col(text_col)))
    raw_words = F.when(F.length(t) > 0, F.split(t, r"\s+")) \
        .otherwise(F.array().cast("array<string>"))
    # project the split ONCE; the gram lambda references the words
    # array per element and an inlined split would be re-evaluated
    # per reference (see corpus.words_col)
    words = F.col("_w")
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)])))
    ex = (docs.select(
        F.col(id_col).cast("long").alias("id"),
        raw_words.alias("_w"))
        .select(
            "id",
            F.length(F.concat_ws(" ", words)).alias("_chars"),
            F.explode(grams).alias("g")))
    counts = ex.groupBy("id", "_chars", "g").agg(
        F.count("*").alias("cnt"))
    w = Window.partitionBy("id").orderBy(
        F.desc("cnt"), F.desc(F.length("g")), F.asc("g"))
    top = (counts
           .withColumn("_rn", F.row_number().over(w))
           .where(F.col("_rn") == 1)
           .select("id", F.col("g").alias("top_ngram"),
                   F.col("cnt").alias("top_count"),
                   (F.col("cnt") * F.length("g")
                    / F.col("_chars").cast("double"))
                   .alias("top_ngram_char_frac")))
    # left join back: docs with < n words (explode emitted nothing)
    # return with null features instead of vanishing
    ids = docs.select(F.col(id_col).cast("long").alias("id"))
    return ids.join(top, "id", "left")
