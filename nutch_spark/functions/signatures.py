"""Content signatures for change detection and dedup.

* ``md5`` of raw bytes (MD5Signature.java:33-38) — Spark builtin
  ``F.md5``, JVM-side.
* text MD5 — ``F.md5(F.encode(text, 'UTF-8'))``.
* TextProfileSignature (TextProfileSignature.java:71-149): tokenize
  letter/digit runs lowercased, keep len > min_token_len, count,
  quantize by ``QUANT = round(maxFreq * quant_rate)`` (min 2 when
  maxFreq > 1), drop below-quant tokens, sort by freq desc (stable on
  insertion order like the reference's Collections.sort), join as
  ``"tok cnt"`` lines, MD5. Python kernel + Arrow pandas UDF.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def text_profile(text: str, min_token_len: int = 2,
                 quant_rate: float = 0.01) -> str:
    """The quantized token profile string that gets hashed."""
    tokens: dict[str, int] = {}
    max_freq = 0
    cur = []
    for ch in text + "\x00":  # sentinel flushes the last token
        if ch.isalnum():
            cur.append(ch.lower())
        else:
            if len(cur) > min_token_len:
                s = "".join(cur)
                cnt = tokens.get(s, 0) + 1
                tokens[s] = cnt
                if cnt > max_freq:
                    max_freq = cnt
            cur = []
    quant = round(max_freq * quant_rate)
    if quant < 2:
        quant = 2 if max_freq > 1 else 1
    profile = []
    for tok, cnt in tokens.items():  # insertion order ≈ first-seen order
        cnt = (cnt // quant) * quant
        if cnt < quant:
            continue
        profile.append((tok, cnt))
    profile.sort(key=lambda t: -t[1])  # stable: ties keep insertion order
    return "\n".join(f"{tok} {cnt}" for tok, cnt in profile)


def text_profile_signature(text: str | None, min_token_len: int = 2,
                           quant_rate: float = 0.01) -> str | None:
    if text is None or len(text) == 0:
        return None  # caller falls back to the raw-bytes MD5
    prof = text_profile(text, min_token_len, quant_rate)
    return hashlib.md5(prof.encode("utf-8")).hexdigest()


def text_profile_udf(min_token_len: int = 2, quant_rate: float = 0.01):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def _sig(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: text_profile_signature(t, min_token_len, quant_rate)
        )

    return _sig


def signature_col(kind: str, html_col: Column, text_col: Column,
                  url_col: Column, min_token_len: int = 2,
                  quant_rate: float = 0.01) -> Column:
    """Signature column per configured kind; raw-MD5 falls back to the
    URL when bytes are absent (MD5Signature.java:33-38)."""
    raw_md5 = F.when(html_col.isNotNull(), F.md5(html_col)) \
        .otherwise(F.md5(F.encode(url_col, "UTF-8")))
    if kind == "md5":
        return raw_md5
    if kind == "text_md5":
        return F.when(text_col.isNotNull(),
                      F.md5(F.encode(text_col, "UTF-8"))).otherwise(raw_md5)
    if kind == "text_profile":
        return F.coalesce(
            text_profile_udf(min_token_len, quant_rate)(text_col), raw_md5)
    raise ValueError(f"unknown signature kind: {kind}")
