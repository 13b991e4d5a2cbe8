"""PageRank + static-rank-boosted retrieval — the "hypertextual" half.

The reference's own name promises hypertextual search, but its engine
ranks by BM25 alone; link analysis appears nowhere in its code or
roadmap. This module adds the canonical citation-graph signal (Brin &
Page 1998, public) and the score-composition step that folds it into
retrieval, completing the name.

:func:`pagerank` is the standard damped power iteration with dangling-
mass redistribution, expressed as DataFrame aggregates:

    rank'(v) = (1-d)/N + d * ( Σ_{u→v} rank(u)/outdeg(u) + dangling/N )

100 TB design notes:

* Each iteration is two map-side-combining shuffles (join contribs on
  src, aggregate on dst) — the unavoidable minimum for edge-keyed
  message passing. The edge list (with out-degrees pre-joined) is
  materialized ONCE and reused every iteration; per-iteration state is
  2 longs + 1 double per node.
* Dangling mass is ONE scalar aggregate per iteration (sum over
  out-degree-0 nodes) — a driver round-trip of 8 bytes, not a collect.
* Lineage is truncated every iteration (``localCheckpoint``, same
  rationale as operators/graph.py: the logical plan would double per
  round and Catalyst analysis, not data, becomes the bottleneck; on a
  real cluster prefer ``checkpoint`` to a reliable dir).
* Fixed iteration count, no convergence test by default: at web scale
  the L1-delta test costs another shuffle per round; 10-20 damped
  iterations is the textbook operating point. Pass ``tol`` to get the
  extra aggregate and early exit when Σ|Δ| < tol.

:func:`search_boosted` multiplies BM25 by a per-document static prior
(1 + weight·boost) — the composition Google's original ranker used for
IR score × PageRank; any (doc, boost) frame works (PageRank, quality
score, recency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.bm25 import B, K1

__all__ = ["pagerank", "hits", "search_boosted"]


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float | None = None,
) -> DataFrame:
    """(src, dst) directed edge list -> (id, rank), Σ rank = 1.

    Nodes are the union of sources and destinations; duplicate edges
    count once (multigraph semantics are the caller's transform).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # out-degree rides WITH the edges so the per-iteration join touches
    # one table, and contributions combine map-side in the dst agg
    ew = e.join(deg, "src").localCheckpoint(eager=True)
    base = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(
        eager=True
    )
    dangling_ids = nodes.join(
        deg.select(F.col("src").alias("id")), "id", "left_anti"
    ).localCheckpoint(eager=True)

    for _ in range(n_iter):
        # dangling mass as a broadcast 1-row scalar INSIDE the
        # iteration plan: a separate .collect() per iteration doubled
        # the job count (guide §5: the driver should do no data work —
        # and every extra action pays the fixed job floor). Arithmetic
        # is unchanged: dm/n is the same float64 division, evaluated in
        # the JVM instead of the driver.
        dm_df = (
            ranks.join(dangling_ids, "id", "semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        contribs = (
            ew.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "id"), "id", "left")
            .join(F.broadcast(dm_df))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            delta = (
                new_ranks.join(
                    ranks.withColumnRenamed("rank", "old"), "id"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks


def hits(
    edges: DataFrame,
    n_iter: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Kleinberg's HITS (JACM 1999): (src, dst) edges -> (id, authority,
    hub), L2-normalized after every half-step.

    Per iteration (the textbook order — authorities from the PREVIOUS
    hubs, then hubs from the FRESH authorities):

        a(v) = Σ_{u→v} h(u);  a ← a / ||a||₂
        h(v) = Σ_{v→w} a(w);  h ← h / ||h||₂

    100 TB design: same shape as :func:`pagerank` — the distinct edge
    list is materialized once; each iteration is two map-side-combining
    shuffles (one per half-step) plus one 8-byte scalar aggregate per
    normalization; per-iteration lineage truncation via localCheckpoint
    (prefer ``checkpoint`` to a reliable dir on a real cluster). Fixed
    iteration count (convergence of HITS is eigen-vector power
    iteration; 6-20 rounds is the operating range). Nodes without
    in-links have authority 0; without out-links, hub 0.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes.rdd.isEmpty():
        return nodes.withColumn("authority", F.lit(0.0)).withColumn(
            "hub", F.lit(0.0)
        )
    hubs = nodes.withColumn("h", F.lit(1.0)).localCheckpoint(eager=True)
    auth = None
    for _ in range(n_iter):
        raw_a = (
            e.join(hubs.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
        )
        auth = (
            nodes.join(raw_a.withColumnRenamed("dst", "id"), "id", "left")
            .select("id", F.coalesce(F.col("a"), F.lit(0.0)).alias("a"))
            .localCheckpoint(eager=True)
        )
        an = auth.agg(F.sqrt(F.sum(F.col("a") * F.col("a")))).collect()[0][0]
        if an and an > 0:
            auth = auth.select("id", (F.col("a") / F.lit(an)).alias("a"))
        auth = auth.localCheckpoint(eager=True)
        raw_h = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
        )
        hubs = (
            nodes.join(raw_h.withColumnRenamed("src", "id"), "id", "left")
            .select("id", F.coalesce(F.col("h"), F.lit(0.0)).alias("h"))
            .localCheckpoint(eager=True)
        )
        hn = hubs.agg(F.sqrt(F.sum(F.col("h") * F.col("h")))).collect()[0][0]
        if hn and hn > 0:
            hubs = hubs.select("id", (F.col("h") / F.lit(hn)).alias("h"))
        hubs = hubs.localCheckpoint(eager=True)
    return (
        nodes.join(auth, "id", "left")
        .join(hubs, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("a"), F.lit(0.0)).alias("authority"),
            F.coalesce(F.col("h"), F.lit(0.0)).alias("hub"),
        )
    )


def search_boosted(
    index: dict[str, DataFrame],
    terms: list[str],
    boosts: DataFrame,
    top_k: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    weight: float = 1.0,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """BM25 retrieval re-ranked by a static per-document prior:

        final = bm25 * (1 + weight * boost)

    ``boosts``: (doc_int | docid, boost double); docs absent from it
    get boost 0 (prior 1.0 — unboosted). Membership (AND/OR) is decided
    by BM25 exactly as in ``query.search``; only the ordering changes,
    so the full match set re-ranks, not just the BM25 top-k (a
    boost-blind top-k cut would drop a heavily-boosted rank-11 doc).
    Returns (rank, doc_int, docid, score, bm25).
    """
    from pyspark.sql import Window

    from .query import match_docs

    if "doc_int" not in boosts.columns:
        boosts = (
            boosts.select(F.col("docid").cast("string").alias("docid"), "boost")
            .join(index["docid_map"], "docid")
        )
    # match_docs, NOT search: the BM25 ranks would be thrown away (the
    # boosted score defines the order), so the full match set must not
    # funnel through a single-partition rank window first. The boosted
    # top-k is a distributed orderBy().limit(k) — Catalyst compiles it
    # to TakeOrderedAndProject (per-partition top-k, then merge of k-row
    # slices); only the k survivors see a window, to number them.
    hits = match_docs(
        index, terms, mode=mode, tf_mode=tf_mode, k1=k1, b=b
    ).withColumnRenamed("score", "bm25")
    topk = (
        hits.join(boosts.select("doc_int", "boost"), "doc_int", "left")
        .withColumn(
            "score",
            F.col("bm25")
            * (1.0 + F.lit(weight) * F.coalesce(F.col("boost"), F.lit(0.0))),
        )
        .orderBy(F.desc("score"), F.asc("doc_int"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    return (
        F.broadcast(topk.withColumn("rank", F.row_number().over(w)))
        .join(index["docid_map"], "doc_int")
        .select("rank", "doc_int", "docid", "score", "bm25")
        .orderBy("rank")  # k rows: restore rank order after the join
    )
