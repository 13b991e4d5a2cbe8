"""Learning-to-rank feature export: (query, doc) -> feature vector.

The training-data step between retrieval and a ranker: for every
(query, candidate-doc) pair, emit the standard lexical feature block
(LETOR / MSLR-style — Qin & Liu 2013's feature families restricted to
what an inverted index knows): BM25 total/max/min, tf sum, idf sum,
matched-term count and ratio, document length. A ``statics`` frame
(PageRank, quality tiers, ...) joins in as extra query-independent
columns — the same shape MSLR's per-URL features take.

Plan shape (100 TB): identical to ``search_batch``'s one-exchange
pipeline — decode once for the distinct term set, broadcast the query
frame onto the decoded candidates, repartition by query_id ONCE so
the per-(query, doc) aggregation clusters on its natural key, every
feature an aggregate of the same pass (no second decode, no window:
feature export is the FULL candidate set, top-k pruning is the
ranker's job downstream). BM25 total uses the same deterministic
sorted FP fold as search, so exported features are bit-consistent
with serving scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.bm25 import B, K1, bm25_score

__all__ = ["ltr_features"]


def ltr_features(
    index: dict[str, DataFrame],
    queries: DataFrame,
    statics: DataFrame | None = None,
    candidates_top_k: int | None = None,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """-> (query_id, doc_int, docid, bm25, bm25_max, bm25_min, tf_sum,
    idf_sum, n_matched, n_terms, match_ratio, doc_len [, statics...]).

    ``queries``: (query_id: long, term: string) rows, like
    ``search_batch``. OR semantics: every doc matching >= 1 query term
    gets a row (candidate generation is the ranker's recall stage;
    filtering is downstream's call). ``statics``: optional frame keyed
    by ``doc_int`` or ``docid``; its other columns append
    query-independent features, missing docs get NULLs.

    ``candidates_top_k``: the standard LTR reranking setup — restrict
    the export to each query's top-k BM25 candidates (the set a
    production reranker would see). Implemented as a per-query rank
    window over the aggregated feature frame (clustering already on
    query_id, so no extra exchange); at 100 TB this is the knob that
    keeps the training table k·|queries| rows instead of the full OR
    candidate set.
    """
    from .query import (
        _stats,
        decode_postings_df,
        exclude_tombstones,
        prune_buckets,
    )

    n_docs, avg_dl = _stats(index)
    queries = queries.dropDuplicates(["query_id", "term"])
    terms = [r["term"] for r in queries.select("term").distinct().collect()]
    decoded = exclude_tombstones(
        index, decode_postings_df(prune_buckets(index, terms), terms)
    )

    npart = int(queries.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cand = (
        F.broadcast(queries).join(decoded, "term").repartition(npart, "query_id")
    )
    doc_stats = index["doc_stats"].select("doc_int", "doc_len")
    cand = cand.join(doc_stats, "doc_int", "left").withColumn(
        "dl",
        F.coalesce(F.col("doc_len"), F.floor(F.lit(avg_dl))).cast("double"),
    )
    tf_eff = F.lit(1.0) if tf_mode == "compat" else F.col("tf").cast("double")
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = cand.withColumn(
        "term_score",
        bm25_score(
            tf_eff, F.col("df"), F.col("dl"), F.lit(float(n_docs)),
            F.lit(avg_dl), k1, b,
        ),
    ).withColumn("idf", idf)

    feats = scored.groupBy("query_id", "doc_int").agg(
        F.aggregate(
            F.sort_array(F.collect_list("term_score")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("bm25"),
        F.max("term_score").alias("bm25_max"),
        F.min("term_score").alias("bm25_min"),
        F.sum(F.col("tf").cast("long")).alias("tf_sum"),
        F.sum("idf").alias("idf_sum"),
        F.count("*").alias("n_matched"),
        F.first("dl").alias("doc_len"),
    )
    n_terms = queries.groupBy("query_id").agg(
        F.countDistinct("term").alias("n_terms")
    )
    feats = feats.join(F.broadcast(n_terms), "query_id").withColumn(
        "match_ratio",
        F.col("n_matched").cast("double") / F.col("n_terms"),
    )
    if candidates_top_k is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("bm25"), F.asc("doc_int")
        )
        feats = (
            feats.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= int(candidates_top_k))
            .drop("rn")
        )
    if statics is not None:
        if "doc_int" not in statics.columns:
            statics = statics.withColumn(
                "docid", F.col("docid").cast("string")
            ).join(index["docid_map"], "docid").drop("docid")
        feats = feats.join(statics, "doc_int", "left")
    return feats.join(index["docid_map"], "doc_int").select(
        "query_id", "doc_int", "docid", "bm25", "bm25_max", "bm25_min",
        "tf_sum", "idf_sum", "n_matched", "n_terms", "match_ratio",
        "doc_len",
        *[c for c in feats.columns
          if c not in {"query_id", "doc_int", "bm25", "bm25_max",
                       "bm25_min", "tf_sum", "idf_sum", "n_matched",
                       "n_terms", "match_ratio", "doc_len"}],
    )
