"""Result grouping / field collapse: top hits per metadata group.

The reference returns one flat docid ranking per query
(Query-engine.hpp:275-374); when the corpus is source code, a flat
top-k is usually ten hits from ONE repository. Field collapse — "best
hit per repo, rank repos by their best hit" — is the Lucene grouping
module / Solr ``group=true`` semantics, computed engine-side so the
client never over-fetches to diversify.

Plan shape (100 TB): ``match_docs`` gives the scored FULL match set
with no rank window (the facets/boosted lesson — a single-query rank
window is a one-task funnel). Group heads then reduce under ONE
map-side-combining ``groupBy(group)`` aggregation — ``max(struct(
score, -doc_int))`` is an associative/commutative argmax, so a
degenerate group column (every doc one value) still combines per
partition and ships one row per partition per group, never a hot-key
sort. Group ranking is a distributed ``orderBy().limit(k)``
(TakeOrderedAndProject); only the k surviving group rows ever see a
row_number window. For ``group_top_n > 1`` the within-group ranking
window runs AFTER a broadcast semi-join onto the k surviving groups —
it sorts only those groups' hits, partitioned by group, bounded by
the match set of k groups rather than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.bm25 import B, K1

__all__ = ["search_collapse"]


def search_collapse(
    index: dict[str, DataFrame],
    terms: list[str],
    groups: DataFrame,
    group_col: str,
    top_k: int = 10,
    group_top_n: int = 1,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """-> (group_value, group_rank, docid, hit_rank, score).

    ``groups``: a DataFrame keyed by ``doc_int`` or ``docid`` carrying
    ``group_col`` (any type; grouped as strings, NULL becomes the
    literal bucket "(none)" like ``search_facets``). Groups rank by
    their best hit's score (desc, group asc tiebreak); hits within a
    group rank by (score desc, doc_int asc) — the same tiebreak as
    ``search``.
    """
    if group_top_n < 1:
        raise ValueError("group_top_n must be >= 1")
    from .query import match_docs

    if "doc_int" not in groups.columns:
        groups = groups.withColumn(
            "docid", F.col("docid").cast("string")
        ).join(index["docid_map"], "docid")

    hits = match_docs(index, terms, mode=mode, tf_mode=tf_mode, k1=k1, b=b)
    g = hits.join(
        groups.select(
            "doc_int",
            F.coalesce(F.col(group_col).cast("string"), F.lit("(none)"))
            .alias("group_value"),
        ),
        "doc_int",
    )

    # argmax by (score desc, doc_int asc) as a plain aggregate: struct
    # max compares fields left-to-right, so negating doc_int turns the
    # ascending tiebreak into a max. Combines map-side — skew-immune.
    heads = g.groupBy("group_value").agg(
        F.max(F.struct(F.col("score"), (-F.col("doc_int")).alias("nd")))
        .alias("h")
    )
    top_groups = (
        heads.select(
            "group_value",
            F.col("h.score").alias("head_score"),
            (-F.col("h.nd")).alias("head_doc_int"),
        )
        .orderBy(F.desc("head_score"), F.asc("group_value"))
        .limit(top_k)
        .withColumn(
            "group_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("head_score"), F.asc("group_value")))
            .cast("int"),
        )
    )

    if group_top_n == 1:
        out = top_groups.select(
            "group_value",
            "group_rank",
            F.col("head_doc_int").alias("doc_int"),
            F.lit(1).cast("int").alias("hit_rank"),
            F.col("head_score").alias("score"),
        )
    else:
        surv = g.join(
            F.broadcast(top_groups.select("group_value", "group_rank")),
            "group_value",
        )
        w = Window.partitionBy("group_value").orderBy(
            F.desc("score"), F.asc("doc_int")
        )
        out = (
            surv.withColumn("hit_rank", F.row_number().over(w).cast("int"))
            .filter(F.col("hit_rank") <= group_top_n)
            .select("group_value", "group_rank", "doc_int", "hit_rank", "score")
        )

    return (
        F.broadcast(out)
        .join(index["docid_map"], "doc_int")
        .select("group_value", "group_rank", "docid", "hit_rank", "score")
        .orderBy("group_rank", "hit_rank")
    )
