"""Vectorized pandas-UDF analyzer.

The analyzer is one of the three Python kernels of the engine (SURVEY.md
§2.10); everything downstream is native Column expressions. Two shapes:

* ``analyze_udf``      — text -> array<struct<term,pos,orig>> (the
  per-field token stream of the reference cleaner, cleaner3.cpp:534-617).
* ``analyze_agg_udf``  — text -> struct<terms: array<struct<term,
  positions>>, doc_len> with per-doc (term -> sorted positions)
  aggregation done *inside* the UDF. This fuses the reference indexer's
  per-doc aggregation (indexer4.cpp:99-125, SURVEY.md A1) into the
  tokenize pass, eliminating a groupBy(docid, term) shuffle: the only
  wide exchange left in the index build is the shuffle by term.

``mode="compat"`` is the reference-exact analyzer;  ``mode="simple"``
splits on single spaces (used for the SQL-oracle-matched query set over
the synthetic corpus, where DuckDB must reproduce tokenization exactly).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .tokenizer import tokenize_compat, tokenize_simple

TOKEN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("term", StringType()),
            StructField("pos", IntegerType()),
            StructField("orig", StringType()),
        ]
    )
)

AGG_SCHEMA = StructType(
    [
        StructField(
            "terms",
            ArrayType(
                StructType(
                    [
                        StructField("term", StringType()),
                        StructField("positions", ArrayType(IntegerType())),
                    ]
                )
            ),
        ),
        StructField("doc_len", LongType()),
    ]
)


def _tokens_of(text: str | None, mode: str, stem: bool, stopwords, remove_numbers):
    if not text:
        return []
    if mode == "simple":
        return [(t, i + 1, t) for i, t in enumerate(tokenize_simple(text))]
    return tokenize_compat(
        text,
        stem=stem,
        stopwords=stopwords,
        remove_numbers=remove_numbers,
        keep_original=True,
    )


def analyze_udf(
    mode: str = "compat",
    stem: bool = True,
    stopwords: frozenset[str] | None = None,
    remove_numbers: bool = False,
):
    """Returns a pandas UDF: string column -> array<struct<term,pos,orig>>."""

    @F.pandas_udf(TOKEN_SCHEMA)
    def _analyze(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            yield batch.map(
                lambda s: [
                    (t, p, o)
                    for (t, p, o) in _tokens_of(s, mode, stem, stopwords, remove_numbers)
                ]
            )

    return _analyze


def analyze_agg_udf(
    mode: str = "compat",
    stem: bool = True,
    stopwords: frozenset[str] | None = None,
    remove_numbers: bool = False,
):
    """Returns a pandas UDF: text -> struct<terms:[(term, positions)], doc_len>.

    Per-doc aggregation (term -> sorted positions across the whole text)
    happens in-UDF so the tokenize stage stays a narrow map.
    """

    def _agg_one(text: str | None):
        acc: dict[str, list[int]] = {}
        n = 0
        for term, pos, _orig in _tokens_of(text, mode, stem, stopwords, remove_numbers):
            acc.setdefault(term, []).append(pos)
            n += 1
        # positions are emitted in increasing order already; sort defensively
        return (
            [(t, sorted(ps)) for t, ps in acc.items()],
            n,
        )

    @F.pandas_udf(AGG_SCHEMA)
    def _analyze_agg(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in it:
            yield pd.DataFrame(
                [_agg_one(s) for s in batch], columns=["terms", "doc_len"]
            )

    return _analyze_agg


def tokenize_documents(
    df,
    text_col: str = "content",
    id_col: str = "docid",
    mode: str = "compat",
    stem: bool = True,
    stopwords: frozenset[str] | None = None,
    remove_numbers: bool = False,
):
    """docs(id, text) -> (id, term, positions, tf, doc_len) — narrow stage.

    One row per (doc, distinct term); ``doc_len`` is the post-filter token
    count (Σ tf per doc, the reference's doc-length definition,
    Query-engine.hpp:247-254).
    """
    udf = analyze_agg_udf(mode, stem, stopwords, remove_numbers)
    analyzed = df.select(
        F.col(id_col), udf(F.col(text_col)).alias("a")
    ).select(
        id_col,
        F.col("a.doc_len").alias("doc_len"),
        F.explode_outer("a.terms").alias("t"),
    )
    return analyzed.select(
        id_col,
        F.col("t.term").alias("term"),
        F.col("t.positions").alias("positions"),
        F.size("t.positions").alias("tf"),
        "doc_len",
    ).filter(F.col("term").isNotNull())
