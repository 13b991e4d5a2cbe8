"""Score explanation: per-term BM25 breakdown for a query's top-k docs.

Lucene's ``IndexSearcher.explain`` contract: for each hit, show how the
score decomposes — per matched term, the tf / df / doc-length inputs
and the idf and tf-saturation factors whose product is the term's
contribution; the hit's score is the sum. The reference engine prints
only final scores (Query-engine.hpp:367-373); an explain surface is the
standard relevance-debugging tool a search deployment needs (why did
doc A outrank doc B?) and makes the engine's scoring auditable row by
row against the oracle.

Plan shape: the top-k doc set comes from the same distributed
``match_docs`` + ``orderBy().limit(k)`` pipeline as ``search`` (scores
bit-identical — same sorted FP fold), then the k survivors are
broadcast back onto the per-(doc, term) scored candidates, so the wide
per-term frame is pruned to k docs before any output materializes. The
candidate lineage is traversed twice (once folded for ranking, once
per-term for the breakdown) — both traversals are bucket-pruned
postings scans of only the query's terms, the standard explain cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.bm25 import K1, B, idf_expr, tf_component
from .query import (
    _stats,
    decode_postings_df,
    exclude_tombstones,
    match_docs,
    prune_buckets,
)

__all__ = ["explain_scores"]


def explain_scores(
    index: dict[str, DataFrame],
    terms: list[str],
    top_k: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Per-term breakdown of ``search(index, terms, ...)``'s top-k ->
    (rank, docid, score, term, tf, df, doc_len, idf, tf_comp,
    term_score), one row per (hit, matched term), ordered by (rank,
    term). ``score`` is the hit's total (identical to ``search``);
    ``sum(term_score) == score`` per hit up to FP fold order. In
    ``tf_mode="compat"`` the reference's tf=1 quirk applies: ``tf``
    reports the true stored frequency, ``tf_comp``/``term_score`` use
    tf=1 — the breakdown explains what the engine computed, not what a
    different engine would have."""
    n_docs, avg_dl = _stats(index)
    uniq = list(dict.fromkeys(terms))

    per_doc = match_docs(
        index, uniq, mode=mode, tf_mode=tf_mode, k1=k1, b=b,
        doc_filter=doc_filter,
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    topk = (
        per_doc.orderBy(F.desc("score"), F.asc("doc_int"))
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
    )

    decoded = exclude_tombstones(
        index, decode_postings_df(prune_buckets(index, uniq), uniq)
    )
    doc_stats = index["doc_stats"].select("doc_int", "doc_len")
    tf_eff = F.lit(1.0) if tf_mode == "compat" else F.col("tf").cast("double")
    rows = (
        decoded.join(F.broadcast(topk), "doc_int")
        .join(doc_stats, "doc_int", "left")
        .withColumn(
            "dl",
            F.coalesce(F.col("doc_len"), F.floor(F.lit(avg_dl))).cast(
                "double"
            ),
        )
        .withColumn("idf", idf_expr(F.col("df"), F.lit(float(n_docs))))
        .withColumn(
            "tf_comp", tf_component(tf_eff, F.col("dl"), F.lit(avg_dl), k1, b)
        )
        .withColumn("term_score", F.col("idf") * F.col("tf_comp"))
    )
    return (
        F.broadcast(rows)
        .join(index["docid_map"], "doc_int")
        .select(
            "rank", "docid", "score", "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("dl").alias("doc_len"),
            "idf", "tf_comp", "term_score",
        )
        .orderBy("rank", "term")
    )
