"""Faceted search: per-facet value counts over a query's match set.

The reference returns a bare docid list per query (Query-engine.hpp:
275-374) — no aggregation over results at all. Faceting ("refine by
language / source / year") is the first thing a search UI adds on top;
this operator computes it engine-side so the UI never pulls the match
set.

Plan shape: ONE membership pass (the same candidate pipeline as
``query.search``, full match set — facet counts over a top-k cut would
be wrong), one join against the facet table on doc_int, then ALL facet
columns melt into (facet, value) rows via an ``explode(array(struct))``
— so N facet dimensions cost ONE aggregation shuffle, not N jobs. The
count aggregate combines map-side; a degenerate facet (every doc its
own value) degrades to the match-set size, never to a hot key.

At 100 TB the facet table is the corpus-metadata table: the join is
doc_int-keyed on both sides and AQE picks the strategy; the melted
frame carries 2 small strings per (doc, facet) — the match set rides
the wire once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.bm25 import B, K1

__all__ = ["search_facets"]


def search_facets(
    index: dict[str, DataFrame],
    terms: list[str],
    facets: DataFrame,
    facet_cols: list[str],
    mode: str = "and",
    tf_mode: str = "true",
    top_n: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """-> (facet, value, n_docs, rank): for each facet column, the
    ``top_n`` values by match count (count desc, value asc), counted
    over the FULL match set of the query.

    ``facets``: a DataFrame keyed by ``doc_int`` or ``docid`` carrying
    the facet columns (any type; values are counted as strings, NULL
    becomes the literal bucket "(none)" so missing metadata is visible
    rather than silently dropped).
    """
    if not facet_cols:
        raise ValueError("facet_cols must be non-empty")
    from .query import match_docs

    if "doc_int" not in facets.columns:
        facets = facets.withColumn(
            "docid", F.col("docid").cast("string")
        ).join(index["docid_map"], "docid")
    # match_docs, NOT search: the full match set must never cross a
    # single-partition rank window just to be counted (the counts don't
    # use ranks) — membership aggregates under the natural distributed
    # groupBy(doc_int) exchange, plan-asserted in tests/test_plans.py
    hits = match_docs(
        index, terms, mode=mode, tf_mode=tf_mode, k1=k1, b=b
    ).select("doc_int")

    melted = (
        hits.join(facets.select("doc_int", *facet_cols), "doc_int")
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("facet"),
                            F.coalesce(
                                F.col(c).cast("string"), F.lit("(none)")
                            ).alias("value"),
                        )
                        for c in facet_cols
                    ]
                )
            ).alias("fv")
        )
        .select("fv.facet", "fv.value")
    )
    counts = melted.groupBy("facet", "value").agg(
        F.count("*").alias("n_docs")
    )
    w = Window.partitionBy("facet").orderBy(
        F.desc("n_docs"), F.asc("value")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("facet", "value", "n_docs", F.col("rank").cast("int").alias("rank"))
    )
