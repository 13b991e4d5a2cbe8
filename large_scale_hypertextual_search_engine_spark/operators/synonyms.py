"""Query-time synonym expansion: Lucene ``SynonymQuery`` semantics.

The reference scores a flat term list (Query-engine.hpp:275-374) with
no notion of term equivalence classes; real deployments carry a
thesaurus (code-search: ``fn``/``func``/``function``). The standard
contract — Lucene's SynonymQuery, which this reproduces — is that all
members of a synonym group score as ONE pseudo-term:

* ``tf_g(doc)``  = SUM of the member terms' tfs in the doc (an
  occurrence of any member is an occurrence of the group),
* ``df_g``      = MAX of the member terms' dfs (Lucene's merged
  docFreq: an index-METADATA upper bound on the union df, so no extra
  pass over the postings is spent computing an exact distinct-doc
  union), and
* one BM25 contribution per group, summed per doc across groups with
  the engine's deterministic ascending-sorted FP fold.

Groups behave like terms in AND/OR composition: ``mode="and"`` keeps
docs matching EVERY group with at least one member in the lexicon
(mirrors ``search``'s present-term intersection), ``mode="or"`` any.

Spark-first shape: ONE decode pass over the bucket-pruned postings
scan for all member terms, a broadcast (term -> group) map join, then
ONE hash exchange on ``doc_int`` that serves BOTH aggregation levels —
the per-(doc, group) tf sum and the per-doc group-score fold —
because HashPartitioning(doc_int) satisfies the clustered distribution
of (doc_int, group_id); group df arrives as a broadcast of lexicon
metadata. Top-k is the distributed ``orderBy().limit(k)``
(TakeOrderedAndProject) — no single-partition rank window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.bm25 import K1, B, bm25_score
from .query import (
    _stats,
    decode_postings_df,
    exclude_tombstones,
    prune_buckets,
)

__all__ = ["search_synonyms"]


def search_synonyms(
    index: dict[str, DataFrame],
    groups: list[list[str]],
    top_k: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Score synonym-group query ``groups`` -> (rank, doc_int, docid,
    score). Each inner list is one synonym set scored as a single
    pseudo-term (see module docstring); a plain term is a 1-element
    group, so ``search_synonyms(idx, [["a"], ["b"]])`` is rank- and
    score-identical to ``search(idx, ["a", "b"])`` (pytest-asserted).

    A term may appear in several groups (it contributes to each);
    duplicate members within a group are deduped. ``doc_filter``,
    ``tf_mode`` and BM25 parameters behave exactly as in
    ``query.search``.
    """
    if not groups or any(not g for g in groups):
        raise ValueError("groups must be a non-empty list of non-empty lists")
    spark = index["postings"].sparkSession
    n_docs, avg_dl = _stats(index)

    memberships = [
        (gid, term)
        for gid, g in enumerate(groups)
        for term in dict.fromkeys(g)
    ]
    terms = list(dict.fromkeys(t for _, t in memberships))
    member_df = spark.createDataFrame(memberships, "gid int, term string")

    decoded = exclude_tombstones(
        index, decode_postings_df(prune_buckets(index, terms), terms)
    )
    if doc_filter is not None:
        if "doc_int" not in doc_filter.columns:
            doc_filter = (
                doc_filter.select(F.col("docid").cast("string").alias("docid"))
                .join(index["docid_map"], "docid")
            )
        decoded = decoded.join(
            doc_filter.select("doc_int").distinct(), "doc_int", "semi"
        )

    # group df = MAX member df, straight from lexicon metadata (tiny,
    # broadcast); also yields group presence for the AND cardinality.
    gstats = (
        member_df.join(
            F.broadcast(
                index["lexicon"].select("term", "df").filter(
                    F.col("term").isin(terms)
                )
            ),
            "term",
        )
        .groupBy("gid")
        .agg(F.max("df").alias("df_g"))
    )

    cand = decoded.join(F.broadcast(member_df), "term")

    doc_stats = index["doc_stats"].select("doc_int", "doc_len")
    # ONE exchange for both agg levels: per-(doc, gid) tf sum and the
    # per-doc fold both cluster on doc_int
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    per_grp = (
        cand.repartition(npart, "doc_int")
        .groupBy("doc_int", "gid")
        .agg(F.sum("tf").cast("double").alias("tf_g"))
        .join(F.broadcast(gstats), "gid")
        .join(doc_stats, "doc_int", "left")
        .withColumn(
            "dl",
            F.coalesce(F.col("doc_len"), F.floor(F.lit(avg_dl))).cast(
                "double"
            ),
        )
        .withColumn(
            "grp_score",
            bm25_score(
                F.lit(1.0) if tf_mode == "compat" else F.col("tf_g"),
                F.col("df_g"),
                F.col("dl"),
                F.lit(float(n_docs)),
                F.lit(avg_dl),
                k1,
                b,
            ),
        )
    )
    per_doc = per_grp.groupBy("doc_int").agg(
        F.aggregate(
            F.sort_array(F.collect_list("grp_score")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
        F.count("*").alias("n_matched"),
    )
    if mode == "and":
        n_found = gstats.agg(F.countDistinct("gid").alias("n_found"))
        per_doc = per_doc.join(F.broadcast(n_found)).filter(
            F.col("n_matched") == F.col("n_found")
        )

    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    topk = (
        per_doc.orderBy(F.desc("score"), F.asc("doc_int"))
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
    )
    return (
        F.broadcast(topk)
        .join(index["docid_map"], "doc_int")
        .select("rank", "doc_int", "docid", "score")
        .orderBy("rank")
    )
