"""Significant-terms aggregation: what is this match set ABOUT?

Elasticsearch's ``significant_terms`` agg: rank terms by how
over-represented they are in a query's match set (foreground) versus
the whole corpus (background), scored with Dunning's log-likelihood
ratio G² (Dunning, CL 1993 — the standard significance score; JLH and
chi² are variants of the same 2×2 contingency table). Distinct from
``keywords_tfidf`` (per-document) and RM3 (relevance-model expansion
weights): this is the corpus-statistical "why did these docs match"
signal a drill-down UI shows next to facets.

Plan shape (100 TB): candidate terms prune on the LEXICON METADATA
before any posting decodes — ``min_df <= df <= max_df_frac·N`` is a
codegen filter on the postings table's df column, so stopword-grade
terms (df ~ N) and hapax noise never reach the decode kernel, and the
decoded volume is Σ df over qualifying terms, the inherent cost of
the statistic. Foreground counts are ONE inner join of the decoded
rows against the match-doc set (broadcast when the match set is
small, AQE's call) plus one map-side-combining groupBy(term). The G²
score is pure Column arithmetic over four integer cells — whole-stage
codegen, no Python. Scalars (N, fg_n) ride broadcast 1-row frames,
not driver actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.bm25 import B, K1

__all__ = ["significant_terms"]


def _xlogx_ratio(k, e):
    """k * ln(k/e) with the 0·ln0 = 0 convention (k an integer-valued
    Column, e > 0 whenever the table margins are non-degenerate)."""
    return F.when(k > 0, k * F.log(k / e)).otherwise(F.lit(0.0))


def significant_terms(
    index: dict[str, DataFrame],
    terms: list[str] | DataFrame,
    top_n: int = 10,
    min_df: int = 2,
    max_df_frac: float = 0.5,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    exclude: list[str] | None = None,
) -> DataFrame:
    """-> (term, fg_count, bg_count, score): the ``top_n`` terms most
    over-represented in the match set of ``terms``, scored by G².

    ``fg_count``/``bg_count`` are document frequencies within the
    match set / the corpus. The query's own terms are excluded (they
    are significant by construction). ``bg_count`` is the stored
    global df — like BM25 under tombstones, background stats stay
    global until compaction (the Lucene semantics).
    """
    from .query import decode_postings_df, match_docs, _stats

    n_docs, _ = _stats(index)
    fg_docs = match_docs(
        index, terms, mode=mode, tf_mode=tf_mode, k1=k1, b=b
    ).select("doc_int")

    # exclude the query's own terms (significant by construction); for
    # a pre-computed match frame (e.g. a boolean match set) the caller
    # passes ``exclude`` (its positive terms) — unknowable here
    if exclude is None:
        exclude = [] if isinstance(terms, DataFrame) else list(terms)
    exclude = list(dict.fromkeys(exclude))
    max_df = int(max_df_frac * n_docs)
    cand = index["postings"].filter(
        (F.col("df") >= int(min_df))
        & (F.col("df") <= max_df)
        & ~F.col("term").isin(exclude)
    )
    decoded = decode_postings_df(cand).select("term", "df", "doc_int")

    fg_n = fg_docs.agg(F.count("*").alias("fg_n"))
    counts = (
        decoded.join(fg_docs, "doc_int")
        .groupBy("term")
        .agg(
            F.count("*").alias("fg_count"),
            F.first("df").alias("bg_count"),
        )
        .join(F.broadcast(fg_n))
    )

    # Dunning G² over the 2×2 table (doc contains term × doc in match
    # set): cells as doubles, expected = row·col/N, G² = 2·Σ k·ln(k/e)
    N = F.lit(float(n_docs))
    k11 = F.col("fg_count").cast("double")
    k12 = (F.col("bg_count") - F.col("fg_count")).cast("double")
    k21 = (F.col("fg_n") - F.col("fg_count")).cast("double")
    k22 = N - F.col("bg_count") - F.col("fg_n") + F.col("fg_count")
    r1 = k11 + k12
    r2 = k21 + k22
    c1 = k11 + k21
    c2 = k12 + k22
    g2 = 2.0 * (
        _xlogx_ratio(k11, r1 * c1 / N)
        + _xlogx_ratio(k12, r1 * c2 / N)
        + _xlogx_ratio(k21, r2 * c1 / N)
        + _xlogx_ratio(k22, r2 * c2 / N)
    )
    # one-sided: only terms MORE frequent in the foreground than their
    # corpus rate are "significant" (the Elasticsearch convention)
    scored = counts.withColumn("score", g2).filter(
        k11 / F.col("fg_n") > F.col("bg_count") / N
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("term"))
        .limit(top_n)
        .select("term", "fg_count", "bg_count", "score")
    )
