"""Deep pagination and field-sorted retrieval over the match set.

The reference emits one fixed top-k block per query (Query-engine.hpp:
275-374) — page 2 means re-running the query and slicing client-side.
Elasticsearch's answer is ``search_after``: a keyset cursor on the
total sort key, so page N is a FILTER + top-k, never an OFFSET that
materializes and discards pages 1..N-1.

Plan shape (100 TB): both operators ride ``match_docs`` (scored full
match set, no rank window). ``search_after`` pushes the cursor as a
codegen predicate on (score, doc_int) BEFORE the distributed
``orderBy().limit(k)`` — Catalyst compiles that to
TakeOrderedAndProject, so each partition keeps k rows and only
k×partitions rows reach the driver-side heap; a page-1000 request
costs the same one pass as page 1. The window-row_number-BETWEEN
formulation (the OFFSET funnel) would sort the whole match set in one
task; the oracle SQL deliberately uses it, because DuckDB can.
``search_sorted`` replaces the relevance key with an arbitrary
metadata column (recency, stars) via one doc_int-keyed metadata join
— the sort is still TakeOrderedAndProject, the match set still rides
the wire once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.bm25 import B, K1

__all__ = ["search_after", "search_sorted"]


def search_after(
    index: dict[str, DataFrame],
    terms: list[str],
    cursor: tuple[float, int] | None = None,
    page_size: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """-> (rank, doc_int, docid, score): the next ``page_size`` hits
    strictly after ``cursor`` in the (score desc, doc_int asc) total
    order. ``cursor`` is the (score, doc_int) of the last hit already
    seen (both returned by this function and by ``search``);
    ``None`` means page 1. ``rank`` is page-relative (1..page_size).

    Score comparison is exact: scores are the same deterministic
    sorted-FP fold everywhere in the engine, so the cursor value
    round-trips bit-identically and the keyset predicate never skips
    or duplicates a tied row (doc_int breaks ties totally).
    """
    from .query import match_docs

    per_doc = match_docs(index, terms, mode=mode, tf_mode=tf_mode, k1=k1, b=b)
    if cursor is not None:
        c_score, c_doc = float(cursor[0]), int(cursor[1])
        per_doc = per_doc.filter(
            (F.col("score") < F.lit(c_score))
            | (
                (F.col("score") == F.lit(c_score))
                & (F.col("doc_int") > F.lit(c_doc))
            )
        )
    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    page = (
        per_doc.orderBy(F.desc("score"), F.asc("doc_int"))
        .limit(page_size)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )
    return (
        F.broadcast(page)
        .join(index["docid_map"], "doc_int")
        .select("rank", "doc_int", "docid", "score")
        .orderBy("rank")
    )


def search_sorted(
    index: dict[str, DataFrame],
    terms: list[str],
    sort_by: DataFrame,
    sort_col: str,
    ascending: bool = False,
    top_k: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """-> (rank, docid, sort_value, score): the match set ordered by an
    arbitrary metadata column instead of relevance (sort_value
    desc/asc, then score desc, then doc_int asc — so relevance still
    breaks metadata ties). ``sort_by`` is keyed by ``doc_int`` or
    ``docid``; docs missing from it sort last (NULLs last either
    direction), matching Elasticsearch's ``missing: _last`` default.
    """
    from .query import match_docs

    if "doc_int" not in sort_by.columns:
        sort_by = sort_by.withColumn(
            "docid", F.col("docid").cast("string")
        ).join(index["docid_map"], "docid")

    hits = match_docs(
        index, terms, mode=mode, tf_mode=tf_mode, k1=k1, b=b
    ).join(
        sort_by.select("doc_int", F.col(sort_col).alias("sort_value")),
        "doc_int",
        "left",
    )
    key = (
        F.asc_nulls_last("sort_value")
        if ascending
        else F.desc_nulls_last("sort_value")
    )
    order = [key, F.desc("score"), F.asc("doc_int")]
    page = (
        hits.orderBy(*order)
        .limit(top_k)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)).cast("int"))
    )
    return (
        F.broadcast(page)
        .join(index["docid_map"], "doc_int")
        .select("rank", "docid", "sort_value", "score")
        .orderBy("rank")
    )
