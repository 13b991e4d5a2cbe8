"""Tiered retrieval: doc-quality tiers + MaxScore early termination.

The standard web-scale serving layout (Manning, Raghavan & Schütze,
IR §7.2.1 "Tiered indexes"; bounds are the MaxScore family, Turtle &
Flood 1995): partition the corpus by a static prior (PageRank, quality
score) into tier 1 (small, hot, in RAM at 100 TB scale) and lower
tiers (cold). Serve queries from tier 1; consult lower tiers only when
tier 1 provably cannot be the full answer.

Why tier by DOCUMENT, not by posting impact: tiers partition docs, so
every posting of a doc lives in its tier — a tier-1 candidate's score
under global statistics IS its score in the physical merge of all
tiers (bit-identical; per-term static pruning would instead lose
cross-term contributions and silently mis-score survivors).

The early-termination certificate is exact, from metadata only:

* global stats (n_docs, avg_dl, per-term df summed over ALL tiers)
  come from each tier's stats/lexicon scans — no posting decode;
* for each query term, a lower tier's best possible BM25 contribution
  is ``max over Block-Max blocks of bm25(max_tf, min_dl)`` — the
  per-block (max_tf, min_dl) metadata the WAND path already stores,
  read via a columnar scan that never touches the posting blobs;
* a lower-tier doc scores at most the SUM of those per-term bounds, so
  if tier-1's k-th score >= every lower tier's bound, no lower-tier
  doc can enter the top-k. Ties are safe: tier ordering assigns lower
  doc_ints to higher tiers, and the (score desc, doc_int asc)
  tiebreak prefers them.

On a miss the fallback queries ALL tiers through ``search_federated``
— still one job, exact, bit-identical to the merged index.

No reference-repo counterpart: the reference's roadmap stops at one
monolithic index; this is the serving-scale layer on top.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..functions.bm25 import B, K1, bm25_score
from .federated import search_federated

__all__ = ["build_tiered", "tier_upper_bound", "tiered_search"]


def build_tiered(
    docs: DataFrame,
    prior_col: str,
    frac: float = 0.1,
    id_col: str = "docid",
    text_col: str = "content",
    **build_kw,
) -> list[dict[str, DataFrame]]:
    """Split ``docs`` into [tier1, tier2] by ``prior_col`` (top
    ``frac`` of documents, ties broken by id) and build an index per
    tier. The split reuses the distributed prefix-sum selector with a
    unit token per doc — i.e. "budget = ceil(frac * n) documents" —
    so there is no global ORDER BY window here either."""
    from .index_build import build_index
    from .selection import select_by_token_budget

    n = docs.count()
    m = max(1, math.ceil(frac * n))
    tier1_ids = (
        select_by_token_budget(
            docs.select(id_col, prior_col).withColumn("__one", F.lit(1)),
            m, score_col=prior_col, token_col="__one", id_col=id_col,
        ).select(id_col)
    )
    t1_docs = docs.join(F.broadcast(tier1_ids), id_col, "semi")
    t2_docs = docs.join(F.broadcast(tier1_ids), id_col, "left_anti")
    return [
        build_index(t1_docs.select(id_col, text_col), **build_kw),
        build_index(t2_docs.select(id_col, text_col), **build_kw),
    ]


def tier_upper_bound(
    index: dict[str, DataFrame],
    terms: list[str],
    df_global: dict[str, int],
    n_docs: int,
    avg_dl: float,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> float:
    """Best possible BM25 score any single document of ``index`` can
    reach for ``terms``, under GLOBAL collection stats — Σ over terms
    of max-over-blocks bm25(max_tf, min_dl). Metadata-only: reads the
    term/blocks columns; posting blobs are never decoded (columnar
    pruning skips them at the parquet reader)."""
    from .query import prune_buckets

    uniq = [t for t in dict.fromkeys(terms) if t in df_global]
    if not uniq:
        return 0.0
    spark = index["postings"].sparkSession
    meta = (
        prune_buckets(index, uniq)
        .filter(F.col("term").isin(uniq))
        .select("term", F.explode("blocks").alias("blk"))
        .select(
            "term",
            F.col("blk.max_tf").cast("double").alias("max_tf"),
            F.col("blk.min_dl").cast("double").alias("min_dl"),
        )
    )
    dfs = spark.createDataFrame(
        [(t, int(df_global[t])) for t in uniq], "term string, df long"
    )
    tf_eff = F.lit(1.0) if tf_mode == "compat" else F.col("max_tf")
    per_term = (
        meta.join(F.broadcast(dfs), "term")
        .select(
            "term",
            bm25_score(
                tf_eff, F.col("df"), F.col("min_dl"),
                F.lit(float(n_docs)), F.lit(float(avg_dl)), k1, b,
            ).alias("ub"),
        )
        .groupBy("term")
        .agg(F.max("ub").alias("ub"))
        .collect()
    )
    return float(sum(r["ub"] for r in per_term))


def tiered_search(
    tiers: list[dict[str, DataFrame]],
    terms: list[str],
    top_k: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> tuple[DataFrame, dict]:
    """Query tier 1 under global stats; consult lower tiers only when
    the MaxScore certificate fails. Returns (results, info) where
    results is (rank, doc_int, docid, score) — bit-identical to
    ``search_federated(tiers, ...)`` in BOTH branches (pytest) — and
    info records which path ran and the certificate numbers."""
    if not tiers:
        raise ValueError("tiers must be non-empty")
    from .query import prune_buckets

    uniq = list(dict.fromkeys(t.lower() for t in terms))

    # global per-term df, metadata-only (also tells us whether lower
    # tiers contain the terms at all)
    per_tier_df: list[dict[str, int]] = []
    for idx in tiers:
        rows = (
            prune_buckets(idx, uniq)
            .filter(F.col("term").isin(uniq))
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .collect()
        )
        per_tier_df.append({r["term"]: int(r["df"]) for r in rows})
    df_global: dict[str, int] = {}
    for d in per_tier_df:
        for t, v in d.items():
            df_global[t] = df_global.get(t, 0) + v

    n_docs, dl_sum = 0, 0
    for idx in tiers:
        n_docs += int(idx["docid_map"].count())
        dl_sum += int(
            idx["doc_stats"].agg(F.sum("doc_len")).collect()[0][0] or 0
        )
    avg_dl = dl_sum / n_docs if n_docs else 0.0

    t1 = search_federated(
        tiers[:1], uniq, top_k, mode, tf_mode, k1, b, stat_indexes=tiers
    )
    rows = sorted(t1.collect(), key=lambda r: r["rank"])
    info: dict = {"tiers_queried": 1, "n_tier1_hits": len(rows)}

    lower_has_terms = any(d for d in per_tier_df[1:])
    if not lower_has_terms:
        info["certificate"] = "lower tiers contain no query term"
        return _as_df(t1.sparkSession, rows), info

    if len(rows) < top_k:
        info["certificate"] = "tier-1 under-filled"
        full = search_federated(tiers, uniq, top_k, mode, tf_mode, k1, b)
        info["tiers_queried"] = len(tiers)
        return full, info

    kth = rows[-1]["score"]
    bounds = [
        tier_upper_bound(
            idx, uniq, df_global, n_docs, avg_dl, tf_mode, k1, b
        )
        for idx in tiers[1:]
    ]
    info["kth_score"] = kth
    info["lower_tier_bounds"] = bounds
    if kth >= max(bounds):
        info["certificate"] = "kth >= max lower-tier bound"
        return _as_df(t1.sparkSession, rows), info

    info["certificate"] = "bound exceeded kth — exact fallback"
    full = search_federated(tiers, uniq, top_k, mode, tf_mode, k1, b)
    info["tiers_queried"] = len(tiers)
    return full, info


def _as_df(spark, rows) -> DataFrame:
    """Re-materialize collected top-k rows (k is serving-small) so both
    branches hand back a DataFrame without re-running the tier-1 job."""
    return spark.createDataFrame(
        [(r["rank"], r["doc_int"], r["docid"], r["score"]) for r in rows],
        "rank int, doc_int long, docid string, score double",
    )
