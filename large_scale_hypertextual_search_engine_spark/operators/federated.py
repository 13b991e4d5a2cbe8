"""Federated search: one BM25 query over SEVERAL indexes, unmerged.

``merge_indexes`` (operators/merge_index.py) is the heavyweight half of
the segment story; this is the lightweight half — Lucene's NRT shape:
query the big base index PLUS fresh delta segments the moment they are
built, merging physically only when convenient. The reference can do
neither (one monolithic build).

Semantics: the indexes cover DISJOINT corpora; the query behaves
exactly as if they had been merged first — global collection stats
(N = Σ n_i, avg_dl mass-weighted), per-term df summed across indexes,
per-index doc_ints offset into one id space using the same offsets
``merge_indexes`` would assign. Rank- and score-identical to searching
the physically merged index (pytest-asserted, bit-exact fold).

Plan shape: per index a bucket-pruned decode of the query terms (small,
independent scans — a delta segment's scan is tiny), a union, then the
standard one-exchange score pipeline. The only driver round-trips are
one max(doc_int) + one stats row per index — per-SEGMENT metadata, the
same scalars an NRT searcher caches.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.bm25 import B, K1, bm25_score

__all__ = ["search_federated"]


def search_federated(
    indexes: list[dict[str, DataFrame]],
    terms: list[str],
    top_k: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    stat_indexes: list[dict[str, DataFrame]] | None = None,
) -> DataFrame:
    """-> (rank, doc_int, docid, score) over the union of ``indexes``
    (disjoint corpora), identical to querying their physical merge.

    ``stat_indexes`` (default: ``indexes``): the segment list that
    defines COLLECTION STATISTICS — n_docs, avg_dl, per-term global df
    and the doc_int offset space. ``indexes`` must be a positional
    prefix of it. Tiered retrieval (operators/tiered.py) passes all
    tiers here while decoding only the top tier(s): candidates come
    from the decoded prefix, but every score is computed under the
    FULL collection's statistics, so surviving docs score bit-identical
    to a query over the physical merge of all tiers — only the
    stats/lexicon metadata of the undecoded tiers is ever read."""
    if not indexes:
        raise ValueError("indexes must be non-empty")
    if stat_indexes is None:
        stat_indexes = indexes
    if len(stat_indexes) < len(indexes):
        raise ValueError("indexes must be a prefix of stat_indexes")
    from .query import decode_postings_df, exclude_tombstones, prune_buckets

    uniq = list(dict.fromkeys(t.lower() for t in terms))
    spark = indexes[0]["postings"].sparkSession

    # per-segment metadata scalars (an NRT searcher caches these).
    # avg_dl uses the exact INTEGER doc-length sum, not Σ avg_i·n_i —
    # the latter re-rounds through each segment's stored double and
    # would diverge from the merged index's sum/count in the last ulp
    offsets, n_docs, dl_sum = [], 0, 0
    off = 0
    for idx in stat_indexes:
        offsets.append(off)
        row = idx["docid_map"].agg(
            F.max("doc_int").alias("mx"), F.count("*").alias("n")
        ).collect()[0]
        n_docs += int(row["n"])
        dl_sum += int(
            idx["doc_stats"].agg(F.sum("doc_len")).collect()[0][0] or 0
        )
        off += int(row["mx"] or 0)
    if n_docs == 0:
        return spark.createDataFrame(
            [], "rank int, doc_int long, docid string, score double"
        )
    avg_dl = dl_sum / n_docs

    def _shift(df, o):
        return df.withColumn("doc_int", F.col("doc_int") + F.lit(int(o)))

    # global df per term = Σ per-index df (postings rows carry df)
    dfs = reduce(
        DataFrame.unionByName,
        [
            prune_buckets(idx, uniq)
            .filter(F.col("term").isin(uniq))
            .select("term", "df")
            for idx in stat_indexes
        ],
    ).groupBy("term").agg(F.sum("df").alias("df"))

    decoded = reduce(
        DataFrame.unionByName,
        [
            _shift(
                exclude_tombstones(
                    idx,
                    decode_postings_df(prune_buckets(idx, uniq), uniq),
                ).select("term", "doc_int", "tf"),
                o,
            )
            for idx, o in zip(indexes, offsets)
        ],
    ).join(F.broadcast(dfs), "term")

    doc_stats = reduce(
        DataFrame.unionByName,
        [
            _shift(idx["doc_stats"].select("doc_int", "doc_len"), o)
            for idx, o in zip(indexes, offsets)
        ],
    )
    docid_map = reduce(
        DataFrame.unionByName,
        [
            _shift(idx["docid_map"].select("docid", "doc_int"), o)
            for idx, o in zip(indexes, offsets)
        ],
    )

    tf_eff = F.lit(1.0) if tf_mode == "compat" else F.col("tf").cast("double")
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    scored = (
        decoded.repartition(npart, "doc_int")
        .join(doc_stats, "doc_int", "left")
        .withColumn(
            "dl",
            F.coalesce(F.col("doc_len"), F.floor(F.lit(avg_dl))).cast(
                "double"
            ),
        )
        .withColumn(
            "term_score",
            bm25_score(
                tf_eff, F.col("df"), F.col("dl"),
                F.lit(float(n_docs)), F.lit(avg_dl), k1, b,
            ),
        )
        .groupBy("doc_int")
        .agg(
            F.countDistinct("term").alias("n_found"),
            # ascending fold: bit-identical to query.search's discipline
            F.aggregate(
                F.sort_array(F.collect_list("term_score")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
    )
    if mode == "and":
        scored = scored.filter(F.col("n_found") == len(uniq))
    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    return (
        F.broadcast(
            scored.orderBy(F.desc("score"), F.asc("doc_int"))
            .limit(top_k)
            .withColumn("rank", F.row_number().over(w))
        )
        .join(docid_map, "doc_int")
        .select("rank", "doc_int", "docid", "score")
    )
