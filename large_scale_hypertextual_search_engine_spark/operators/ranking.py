"""Alternative ranking models: Dirichlet query likelihood and hybrid
(lexical + vector) reciprocal-rank fusion.

The reference ranks by BM25 only. Two standard companions complete the
retrieval toolbox:

* :func:`search_ql` — query-likelihood with Dirichlet smoothing (Zhai &
  Lafferty 2001, public): score(d) = Σ_{t∈q} ln((tf_td + μ·p(t|C)) /
  (|d| + μ)) with collection model p(t|C) = ctf_t / total_tokens. The
  per-doc sum over ABSENT terms is algebraically folded into a
  per-query constant plus a present-term correction, so only decoded
  candidate rows are ever touched:

      score = C_q + Σ_{t∈q∩d} [ln(tf + μp_t) − ln(μp_t)]
              − |q'| · ln(|d| + μ),   C_q = Σ_{t∈q'} ln(μ p_t)

  (q' = query terms with collection mass; OOV terms carry no evidence
  under the model and are dropped, count reported via the ``n_oov``
  hint in the plan comment). Membership: any query term present (the
  standard QL candidate set).

* :func:`hybrid_search` — reciprocal-rank fusion (Cormack et al. 2009,
  public) of a BM25 top-``depth`` list and a brute-cosine top-``depth``
  list over an embedding column: rrf(d) = Σ_i 1/(k + rank_i(d)). RRF is
  THE standard lexical+dense combiner precisely because it needs no
  score calibration — only ranks cross the fusion, so the two systems'
  incomparable score scales never meet. Both lists are tiny
  (``depth`` rows), so the fusion is a broadcast-sized full-outer join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.bm25 import B, K1

__all__ = ["search_ql", "hybrid_search"]


def search_ql(
    index: dict[str, DataFrame],
    terms: list[str],
    top_k: int = 10,
    mu: float = 2000.0,
) -> DataFrame:
    """Dirichlet-smoothed query likelihood -> (rank, doc_int, docid,
    score). Scores are log-probabilities (negative; higher = better)."""
    import math

    from .query import decode_postings_df, exclude_tombstones, prune_buckets

    uniq = list(dict.fromkeys(t.lower() for t in terms))
    spark = index["postings"].sparkSession

    # collection language model: ctf from the lexicon's tf column,
    # total token mass from the exact doc-length sum
    total_tokens = int(
        index["doc_stats"].agg(F.sum("doc_len")).collect()[0][0] or 0
    )
    if total_tokens == 0:
        return spark.createDataFrame(
            [], "rank int, doc_int long, docid string, score double"
        )
    ctf = {
        r["term"]: int(r["tf"])
        for r in index["lexicon"]
        .filter(F.col("term").isin(uniq))
        .select("term", "tf")
        .collect()
    }
    inq = [t for t in uniq if ctf.get(t)]  # OOV terms carry no evidence
    if not inq:
        return spark.createDataFrame(
            [], "rank int, doc_int long, docid string, score double"
        )
    mup = {t: mu * ctf[t] / total_tokens for t in inq}
    c_q = sum(sorted(math.log(v) for v in mup.values()))
    mup_df = spark.createDataFrame(
        [(t, v) for t, v in sorted(mup.items())], "term string, mup double"
    )

    decoded = exclude_tombstones(
        index, decode_postings_df(prune_buckets(index, inq), inq)
    ).select("term", "doc_int", "tf")
    doc_stats = index["doc_stats"].select("doc_int", "doc_len")
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    avg_dl_floor = None  # dl fallback mirrors query.search
    row = index["collection_stats"].collect()[0]
    avg_dl_floor = float(int(float(row["avg_dl"])))

    scored = (
        decoded.join(F.broadcast(mup_df), "term")
        .repartition(npart, "doc_int")
        .join(doc_stats, "doc_int", "left")
        .withColumn(
            "dl",
            F.coalesce(F.col("doc_len"), F.lit(avg_dl_floor)).cast("double"),
        )
        .withColumn(
            "corr",
            F.log(F.col("tf").cast("double") + F.col("mup"))
            - F.log(F.col("mup")),
        )
        .groupBy("doc_int")
        .agg(
            F.first("dl").alias("dl"),
            F.aggregate(
                F.sort_array(F.collect_list("corr")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("corr_sum"),
        )
        .withColumn(
            "score",
            F.lit(float(c_q))
            + F.col("corr_sum")
            - F.lit(float(len(inq)))
            * F.log(F.col("dl") + F.lit(float(mu))),
        )
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    return (
        F.broadcast(
            scored.orderBy(F.desc("score"), F.asc("doc_int"))
            .limit(top_k)
            .withColumn("rank", F.row_number().over(w))
        )
        .join(index["docid_map"], "doc_int")
        .select("rank", "doc_int", "docid", "score")
    )


def hybrid_search(
    index: dict[str, DataFrame],
    embeddings: DataFrame,
    terms: list[str],
    query_vec: list[float],
    top_k: int = 10,
    depth: int = 100,
    k_rrf: int = 60,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Lexical + dense hybrid retrieval via reciprocal-rank fusion ->
    (rank, doc_int, docid, rrf, bm25_rank, cos_rank).

    ``embeddings``'s ``id_col`` must hold the corpus's external docid
    (as the same value space — joined through docid_map). Docs found by
    only one system still fuse (their other rank term is absent)."""
    from .query import search
    from .similarity import cosine_topk

    lex = (
        search(
            index, terms, top_k=depth, mode="or", tf_mode=tf_mode,
            k1=k1, b=b,
        )
        .select("doc_int", "docid", F.col("rank").alias("bm25_rank"))
    )
    dense0 = cosine_topk(
        embeddings, query_vec, k=depth, vec_col=vec_col, id_col=id_col
    ).select(F.col(id_col).alias("vid"), F.col("score").alias("cos_score"))
    # rank ties break on the NATIVE id type (numeric vec ids order
    # differently from their string form), then map into docid space
    w_c = Window.orderBy(F.desc("cos_score"), F.asc("vid"))
    dense = (
        dense0.withColumn("cos_rank", F.row_number().over(w_c))
        .select(F.col("vid").cast("string").alias("docid"), "cos_rank")
        .join(index["docid_map"], "docid")
        .select("doc_int", "docid", "cos_rank")
    )

    fused = (
        lex.join(dense, ["doc_int", "docid"], "full_outer")
        .withColumn(
            "rrf",
            F.when(
                F.col("bm25_rank").isNotNull(),
                1.0 / (F.lit(float(k_rrf)) + F.col("bm25_rank")),
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("cos_rank").isNotNull(),
                1.0 / (F.lit(float(k_rrf)) + F.col("cos_rank")),
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_int"))
    return (
        fused.orderBy(F.desc("rrf"), F.asc("doc_int"))
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank", "doc_int", "docid", F.round("rrf", 9).alias("rrf"),
            # 0 = "not in that system's top-depth" (a real rank is >= 1);
            # NULL-free so downstream sorts/serializations stay simple
            F.coalesce("bm25_rank", F.lit(0)).alias("bm25_rank"),
            F.coalesce("cos_rank", F.lit(0)).alias("cos_rank"),
        )
    )
