"""BM25 top-k query engine (exact DataFrame path).

Spark rebuild of Query-engine.hpp's search_single/search_multi
(Query-engine.hpp:275-374, SURVEY.md §3.2): query terms filter the
postings table (predicate pushdown prunes files by term), a vectorized
decode kernel expands blobs to (term, doc_int, tf) rows, and scoring,
AND-intersection and top-k are native DataFrame ops — Catalyst compiles
the single-query top-k to TakeOrderedAndProject, which the reference's
full-sort-then-truncate never had.

Modes (quirk register):
* ``tf_mode="compat"`` scores every term with tf=1 (the reference
  decodes docids only — Q3) and falls back to floor(avg_dl) for missing
  doc lengths (Q8). Rank-identical to the reference engine.
* ``tf_mode="true"`` uses real term frequencies.
AND semantics intersect only the query terms that exist in the lexicon
(reference skips empty posting lists — Query-engine.hpp:320-326).
Ties break (score desc, doc_int asc) — our deterministic addition (Q10).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.bm25 import K1, B, bm25_score
from ..functions.varbyte import decode_postings_fast

DECODED_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("df", LongType()),
        StructField("doc_int", LongType()),
        StructField("tf", LongType()),
    ]
)


def decode_postings_df(
    postings: DataFrame,
    terms: list[str] | None = None,
    spread: bool = False,
) -> DataFrame:
    """postings table -> (term, df, doc_int, tf) rows, Arrow-vectorized.

    ``spread`` round-robins the term-filtered rows across the shuffle
    partition count before the decode kernel — useful when the selected
    blobs pack into fewer file-scan partitions than cores AND decode
    CPU dominates (measured: with the lockstep-vectorized decode it
    usually doesn't, so default off; the shuffle moves whole blobs)."""
    src = postings
    if terms is not None:
        src = src.filter(F.col("term").isin(list(terms)))
        if spread:
            n = int(src.sparkSession.conf.get("spark.sql.shuffle.partitions"))
            src = src.repartition(n)

    has_blocks = "blocks" in postings.columns

    def _decode(batches):
        # native-Arrow output (guide §4.2): the term column is built by
        # dictionary-style `take` on the input batch's term array — no
        # per-posting Python string objects (np.repeat over a string
        # made a df-sized object array per term before)
        import pyarrow as pa

        for batch in batches:
            terms_a = batch.column("term")
            dfs = batch.column("df").to_numpy(zero_copy_only=False)
            blobs = batch.column("postings")
            blockss = (
                batch.column("blocks").to_pylist()
                if has_blocks
                else [None] * batch.num_rows
            )
            idx_parts, df_parts, d_parts, tf_parts = [], [], [], []
            for i in range(batch.num_rows):
                blocks = blockss[i]
                offs = (
                    np.array([b["offset"] for b in blocks], dtype=np.int64)
                    if blocks is not None
                    else None
                )
                docids, tfs = decode_postings_fast(blobs[i].as_py(), offs)
                idx_parts.append(np.full(docids.size, i, dtype=np.int64))
                df_parts.append(np.full(docids.size, dfs[i], dtype=np.int64))
                d_parts.append(docids)
                tf_parts.append(tfs)
            if not idx_parts:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    terms_a.take(pa.array(np.concatenate(idx_parts))),
                    pa.array(np.concatenate(df_parts)),
                    pa.array(np.concatenate(d_parts)),
                    pa.array(np.concatenate(tf_parts)),
                ],
                names=["term", "df", "doc_int", "tf"],
            )

    cols = ["term", "df", "postings"] + (["blocks"] if has_blocks else [])
    return src.select(*cols).mapInArrow(_decode, DECODED_SCHEMA)


def prune_buckets(index: dict[str, DataFrame], terms: list[str]) -> DataFrame:
    """Return the postings frame with the barrel predicate applied:
    ``bucket_id IN (crc32(t) mod n for t in terms)`` — computed
    driver-side, so the parquet reader prunes whole partition
    directories before file stats are even consulted (the distributed
    analog of opening only the right barrel files,
    Barrel-manager.hpp:38-43)."""
    postings = index["postings"]
    nb = index.get("_n_buckets")
    if nb and "bucket_id" in postings.columns:
        from .index_build import term_bucket

        buckets = sorted({term_bucket(t, nb) for t in terms})
        postings = postings.filter(F.col("bucket_id").isin(buckets))
    return postings


def exclude_tombstones(index: dict[str, DataFrame], cand: DataFrame) -> DataFrame:
    """Drop tombstoned documents from a candidates frame (a no-op for
    indexes without deletes — the plan is unchanged). Deletes hide
    documents immediately; collection stats and df stay GLOBAL until
    ``deletes.compact_index`` (the Lucene semantics). The tombstone set
    is a tiny parquet scan, so Catalyst broadcasts the anti-join."""
    ts = index.get("tombstones")
    if ts is None:
        return cand
    return cand.join(ts.select("doc_int"), "doc_int", "left_anti")


def _stats(index: dict[str, DataFrame]) -> tuple[int, float]:
    cached = index.get("_stats")
    if cached is not None:
        return cached
    row = index["collection_stats"].collect()[0]
    index["_stats"] = (int(row["n_docs"]), float(row["avg_dl"]))
    return index["_stats"]


def search_batch(
    index: dict[str, DataFrame],
    queries: DataFrame,
    top_k: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    terms: list[str] | None = None,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Score a batch of queries as ONE Spark job.

    ``queries``: (query_id: long, term: string), one row per query term.
    Pass ``terms`` (the distinct term list) when already known to skip a
    driver round-trip. Returns (query_id, rank, doc_int, docid, score).

    ``doc_filter`` restricts results to a document subset (filtered
    retrieval: per-tenant corpora, language slices, date ranges...) —
    a DataFrame with a ``doc_int`` column, or a ``docid`` column which
    is mapped through docid_map. Collection statistics (df, n_docs,
    avg_dl) stay GLOBAL — surviving docs keep their unfiltered scores,
    only membership and therefore ranks change (the standard filtered-
    search semantics, oracle-checked). The restriction is a semi-join
    applied to the decoded candidates BEFORE the scoring shuffle, so a
    selective filter shrinks the one wide exchange; Catalyst/AQE picks
    broadcast vs shuffle join by the filter's size.
    """
    n_docs, avg_dl = _stats(index)
    # a repeated (query_id, term) row would double-count that term's
    # score AND break the AND filter (n_matched inflates per duplicate
    # while n_found counts distinct terms — every doc then fails the
    # intersection). search() dedupes via dict.fromkeys; mirror it here.
    queries = queries.dropDuplicates(["query_id", "term"])
    if terms is None:
        terms = [r["term"] for r in queries.select("term").distinct().collect()]
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

    # ONE shuffle for the whole scoring pipeline: repartitioning the
    # candidates by query_id up front satisfies the clustering of BOTH
    # the per-doc aggregation (query_id is a subset of its keys) and
    # the final top-k window — Catalyst elides their exchanges, so the
    # df~N candidate rows cross the wire once, not twice
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
    scored = cand.withColumn(
        "term_score",
        bm25_score(tf_eff, F.col("df"), F.col("dl"), F.lit(float(n_docs)), F.lit(avg_dl), k1, b),
    )

    # deterministic FP sum: per-doc term scores are sorted before the
    # sequential add, so results are bit-stable across partitionings and
    # bit-identical to the WAND kernel's sorted sum
    per_doc = scored.groupBy("query_id", "doc_int").agg(
        F.aggregate(
            F.sort_array(F.collect_list("term_score")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
        F.count("*").alias("n_matched"),
    )
    if mode == "and":
        # intersect only terms present in the index (per query). Terms
        # present = a term-pruned scan of the postings table's term
        # column (tiny; parquet prunes both files and the blob column) —
        # NOT an agg over the decoded candidate frame, which would run
        # the decode kernel a second time and shuffle df~N rows.
        present = prune_buckets(index, terms).select("term").filter(
            F.col("term").isin([t for t in terms])
        )
        n_found = (
            queries.join(F.broadcast(present), "term")
            .groupBy("query_id")
            .agg(F.countDistinct("term").alias("n_found"))
        )
        per_doc = per_doc.join(F.broadcast(n_found), "query_id").filter(
            F.col("n_matched") == F.col("n_found")
        )

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_int")
    )
    topk = (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "doc_int", "score")
    )
    # attach original docids: top-k is tiny -> broadcast it against the map
    return (
        F.broadcast(topk)
        .join(index["docid_map"], "doc_int")
        .select("query_id", "rank", "doc_int", "docid", "score")
        .orderBy("query_id", "rank")
    )


def match_docs(
    index: dict[str, DataFrame],
    terms: list[str] | DataFrame,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    doc_filter: DataFrame | None = None,
    min_should_match: int = 1,
) -> DataFrame:
    """Scored FULL match set of one query -> (doc_int, score) with NO
    rank window and NO query_id funnel.

    ``terms`` may also be a pre-computed match frame (a DataFrame with
    ``doc_int`` and optionally ``score``) — e.g. the output of
    ``boolsearch.boolean_match_docs`` — in which case it is passed
    through (score defaulting to 0.0). Every match-set consumer
    (facets, collapse, significant terms, numeric aggs, pagination)
    routes its query through this function, so accepting a frame HERE
    makes all of them compose with the boolean query language for
    free; ``mode``/``tf_mode`` and the BM25 parameters are ignored for
    a frame (its scores are whatever produced it).

    ``min_should_match`` (Lucene BooleanQuery
    ``setMinimumNumberShouldMatch``): in OR mode, keep only docs
    matching at least that many DISTINCT query terms — the standard
    precision dial between pure OR (1) and full AND (len(terms)).
    It rides the ``n_matched`` count the aggregation already produces,
    so the plan gains one codegen filter and nothing else; a value
    larger than the number of index-present terms yields no hits
    (an OOV term can never count toward the minimum, as in Lucene).

    ``search`` exists to answer top-k: it repartitions candidates by
    query_id so the per-doc aggregation and the rank window share one
    exchange — correct for top-k, but a single query means a single
    partition, so a consumer that wants the *whole* match set (facets,
    static-rank boosting) would funnel df~N rows through ONE task to
    assign ranks it then throws away. This helper is the match set
    without the window: candidates aggregate under the natural
    ``groupBy(doc_int)`` hash exchange — fully distributed — and the
    AND cardinality check joins a broadcast 1-row count. Scores are
    bit-identical to ``search`` (same ascending-sorted deterministic
    FP fold over per-term BM25).
    """
    if isinstance(terms, DataFrame):
        match = terms
        if "doc_int" not in match.columns:
            match = match.withColumn(
                "docid", F.col("docid").cast("string")
            ).join(index["docid_map"], "docid")
        if "score" not in match.columns:
            match = match.withColumn("score", F.lit(0.0))
        if doc_filter is not None:
            if "doc_int" not in doc_filter.columns:
                doc_filter = (
                    doc_filter.select(
                        F.col("docid").cast("string").alias("docid")
                    ).join(index["docid_map"], "docid")
                )
            match = match.join(
                doc_filter.select("doc_int").distinct(), "doc_int", "semi"
            )
        return match.select("doc_int", "score")

    n_docs, avg_dl = _stats(index)
    uniq = list(dict.fromkeys(terms))
    decoded = exclude_tombstones(
        index, decode_postings_df(prune_buckets(index, uniq), uniq)
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

    doc_stats = index["doc_stats"].select("doc_int", "doc_len")
    cand = decoded.join(doc_stats, "doc_int", "left").withColumn(
        "dl",
        F.coalesce(F.col("doc_len"), F.floor(F.lit(avg_dl))).cast("double"),
    )
    tf_eff = F.lit(1.0) if tf_mode == "compat" else F.col("tf").cast("double")
    scored = cand.withColumn(
        "term_score",
        bm25_score(tf_eff, F.col("df"), F.col("dl"), F.lit(float(n_docs)), F.lit(avg_dl), k1, b),
    )
    per_doc = scored.groupBy("doc_int").agg(
        F.aggregate(
            F.sort_array(F.collect_list("term_score")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
        F.count("*").alias("n_matched"),
    )
    if mode == "and":
        # n_found as a broadcast 1-row cross join (no driver action, no
        # second decode): terms present in the index, per the same
        # term-pruned lightweight postings scan search_batch uses
        n_found = (
            prune_buckets(index, uniq)
            .select("term")
            .filter(F.col("term").isin(uniq))
            .agg(F.countDistinct("term").alias("n_found"))
        )
        per_doc = per_doc.join(F.broadcast(n_found)).filter(
            F.col("n_matched") == F.col("n_found")
        )
    elif min_should_match > 1:
        per_doc = per_doc.filter(
            F.col("n_matched") >= F.lit(int(min_should_match))
        )
    return per_doc.select("doc_int", "score")


def search(
    index: dict[str, DataFrame],
    terms: list[str],
    top_k: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    doc_filter: DataFrame | None = None,
    min_should_match: int = 1,
) -> DataFrame:
    """Single query -> (rank, doc_int, docid, score). ``doc_filter``:
    see search_batch; ``min_should_match``: see match_docs (OR mode
    only — the Lucene minimumNumberShouldMatch precision dial).

    Plan: ``match_docs`` (fully distributed candidate aggregation — no
    query_id funnel) + a distributed ``orderBy().limit(k)`` that
    Catalyst compiles to TakeOrderedAndProject; only the k survivors
    see the rank-numbering window. search() used to delegate to
    search_batch, whose query_id repartition is the right clustering
    for N queries but a ONE-TASK funnel for a single query — with a
    hot OR term at 100x scale that task sorts the full match set to
    produce ranks 11..10^8 nobody asked for. Results are identical:
    scores are the same sorted FP fold (bit-equal, pytest) and the
    (score desc, doc_int asc) tiebreak is unchanged.
    """
    per_doc = match_docs(
        index, terms, mode, tf_mode, k1, b, doc_filter, min_should_match
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


class SemanticExpander:
    """Query-expansion hook (Query-engine.hpp:14,377-395 declares a
    ``SemanticExpander`` and a ``search_semantic`` that calls
    ``expand_query(tokens, 2)`` — but the class is never DEFINED in the
    reference, quirk Q13). We expose the same interface with an
    identity default so a synonym/embedding expander can plug in; the
    base class mirrors the reference's no-expander behavior exactly."""

    def expand_query(
        self, tokens: list[str], max_expansions: int = 2
    ) -> list[str]:
        return list(tokens)


def search_text(
    index: dict[str, DataFrame],
    query: str,
    top_k: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    analyzer_mode: str = "compat",
    stem: bool = True,
    expander: SemanticExpander | None = None,
    doc_filter: DataFrame | None = None,
    min_should_match: int = 1,
) -> DataFrame:
    """Analyze a raw query string with the same analyzer as indexing
    (the reference's query tokenizer skips stemming and never matches a
    stemmed index — quirk Q4; we default to symmetric analysis).
    ``expander`` mirrors search_semantic: None -> plain search; else
    the token list is passed through ``expand_query`` first."""
    from ..analysis.tokenizer import tokenize_compat, tokenize_simple

    if analyzer_mode == "simple":
        terms = tokenize_simple(query)
    else:
        terms = [t.term for t in tokenize_compat(query, stem=stem)]
    if expander is not None:
        terms = expander.expand_query(terms, 2)
    return search(
        index, terms, top_k, mode, tf_mode, doc_filter=doc_filter,
        min_should_match=min_should_match,
    )
