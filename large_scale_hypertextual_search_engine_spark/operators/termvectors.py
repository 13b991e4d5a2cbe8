"""Term vectors: the forward index as a queryable table.

Lucene's TermVectors / Elasticsearch's ``_termvectors`` endpoint:
per document, the (term, tf, positions) triples the analyzer
produced — the view feature-extraction, highlighting debuggers and
"why did this doc match" tooling read. The reference materializes
this as its forward index file before inversion (indexer4.cpp
builds term->doc from exactly these triples); here it is a public
operator over the corpus.

Plan shape (100 TB): ONE narrow Arrow pass — the same
``analyze_agg_udf`` kernel the index build uses (so vectors agree
with the index bit-for-bit: same tokenizer, same positions), an
``explode`` that stays partition-local, no shuffle at all unless the
caller aggregates downstream. Re-analysis IS the storage decision:
the engine stores no forward index (the inverted blobs are the only
big artifact), so term vectors cost one scan of the requested docs —
pass a filtered frame to bound it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["term_vectors"]


def term_vectors(
    docs: DataFrame,
    mode: str = "simple",
    stem: bool = False,
    stopwords=None,
    remove_numbers: bool = False,
    text_col: str = "content",
    id_col: str = "docid",
) -> DataFrame:
    """(docid, content) -> (docid, term, tf, positions, doc_len), one
    row per distinct term per doc; ``positions`` is the ascending
    1-based token-position array the analyzer emitted — empty tokens
    dropped THEN renumbered, the same positions the positional index
    stores. Zero-token docs produce no rows. Analyzer knobs match
    ``build_index``."""
    from ..analysis.analyzer import analyze_agg_udf

    from .fanout import fan_out

    udf = analyze_agg_udf(mode, stem, stopwords, remove_numbers)
    return (
        fan_out(docs).select(
            F.col(id_col).cast("string").alias("docid"),
            udf(F.col(text_col)).alias("a"),
        )
        .select(
            "docid",
            F.col("a.doc_len").alias("doc_len"),
            F.explode("a.terms").alias("t"),
        )
        .select(
            "docid",
            F.col("t.term").alias("term"),
            F.size("t.positions").alias("tf"),
            F.col("t.positions").alias("positions"),
            "doc_len",
        )
    )
