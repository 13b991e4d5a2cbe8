"""Text analysis for large-scale training-data pipelines.

All hot-path math is native Column expressions (whole-stage codegen);
the only Python is the rolling-hash fingerprint kernel, Arrow-batched.
Operators: token counting, quality scoring, language ID (stopword-marker
heuristic), document fingerprinting (rolling hash).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType

# A small function-word marker table for the language-ID heuristic.
# Deterministic and public-knowledge (common stopwords per language).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es": ("el", "la", "los", "que", "es", "en", "una", "por", "con", "para"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}

STOPWORD_MARKERS = tuple(
    dict.fromkeys(w for ws in LANG_MARKERS.values() for w in ws)
)


def tokens_col(text: Column, delimiter: str = " ") -> Column:
    """Whitespace token array with empties dropped (JVM-side)."""
    return F.filter(F.split(text, delimiter), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


# GPT-2-style pretokenizer, restricted to constructs RE2 (DuckDB) and
# Java regex agree on (no lookahead): contractions, optional-space
# letter runs, digit runs, punctuation runs, whitespace runs. Matching
# is leftmost, first-alternative in both engines, so counts agree —
# asserted by the token_counts oracle query.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: number of pretokenizer matches — the cheap
    JVM-side proxy for 'how many LLM tokens is this document' used for
    training-data budgeting (whole-stage codegen, no UDF)."""
    return F.regexp_count(text, F.lit(BPE_PRETOKEN_RE))


def quality_features(
    df: DataFrame, text_col: str = "text", stopwords: tuple[str, ...] = ("the", "and", "of", "a", "is", "in", "to")
) -> DataFrame:
    """Add quality-scoring features per doc — all codegen expressions:
    n_chars, n_tokens, avg_token_len, stopword_ratio, alpha_ratio,
    distinct_ratio (type-token ratio)."""
    toks = tokens_col(F.col(text_col))
    sw = F.array(*[F.lit(s) for s in stopwords])
    return (
        df.withColumn("n_chars", F.length(text_col).cast("long"))
        .withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn(
            "avg_token_len",
            F.when(
                F.size(toks) > 0,
                F.aggregate(
                    toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
                )
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(
                F.size(toks) > 0,
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "distinct_ratio",
            F.when(
                F.size(toks) > 0,
                F.size(F.array_distinct(toks)) / F.size(toks),
            ).otherwise(F.lit(0.0)),
        )
    )


def language_id(
    df: DataFrame,
    text_col: str = "text",
    markers: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Add ``lang_guess``: argmax over languages of marker-token hits.

    A deterministic n-gram/stopword heuristic (the classic cheap
    language ID for corpus triage); ties break by language code asc.
    Pure Column expressions — one pass, no UDF, no shuffle.
    """
    markers = markers or LANG_MARKERS
    toks = tokens_col(F.col(text_col))

    def _hits(ws: tuple[str, ...]):
        # NB: a 2-arg lambda would be treated as (element, index) by
        # F.filter — bind the word list via closure factory instead
        return lambda t: t.isin(*ws)

    scores = [
        F.struct(
            F.size(F.filter(toks, _hits(ws))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(markers.items())
    ]
    # array_max on struct compares field-by-field: (hits, lang); to get
    # tie -> smallest lang code we negate nothing and sort desc by hits,
    # asc by lang via sort_array on (−hits, lang)
    neg = [
        F.struct(
            (-s["hits"]).alias("neg_hits"), s["lang"].alias("lang")
        )
        for s in scores
    ]
    best = F.sort_array(F.array(*neg))[0]
    return df.withColumn("lang_guess", best["lang"]).withColumn(
        "lang_guess_hits", (-best["neg_hits"]).cast("long")
    )


_FP_MOD = np.uint64((1 << 61) - 1)
_FP_BASE = np.uint64(1_000_003)


def fingerprint_udf():
    """64-bit rolling polynomial hash over the token stream (Arrow batch).

    fingerprint(doc) = sum over tokens of base^i * h(token) mod 2^61-1 —
    order-sensitive, deterministic, and incremental-friendly (the
    streaming path can extend it per appended chunk).
    """

    base, mod = int(_FP_BASE), int(_FP_MOD)

    @F.pandas_udf(LongType())
    def _fp(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            out = np.zeros(len(batch), dtype=np.int64)
            for i, text in enumerate(batch):
                if not text:
                    continue
                # exact python-int horner loop: acc*base can exceed
                # 2^64, and numpy uint64 would wrap mod 2^64 BEFORE the
                # mod-p reduction, silently changing the hash family
                # (the round-1 minhash bug class). hash_token is
                # memoized, so the per-token cost is the two int ops.
                acc = 0
                for tok in text.split(" "):
                    if tok:
                        acc = (acc * base + hash_token(tok)) % mod
                out[i] = acc
            yield pd.Series(out)

    return _fp


_HASH_MEMO: dict[str, int] = {}
_HASH_MEMO_CAP = 2_000_000  # bound worker memory on adversarial vocab


def hash_token(tok: str) -> int:
    """Deterministic 61-bit FNV-1a-style token hash (process-stable).

    Memoized per worker: token frequency is Zipfian, so the per-byte
    Python loop runs roughly once per VOCABULARY entry, not once per
    occurrence (same trick as the stemmer memo)."""
    h = _HASH_MEMO.get(tok)
    if h is not None:
        return h
    h = 0xCBF29CE484222325
    for b in tok.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    h %= (1 << 61) - 1
    if len(_HASH_MEMO) < _HASH_MEMO_CAP:
        _HASH_MEMO[tok] = h
    return h
