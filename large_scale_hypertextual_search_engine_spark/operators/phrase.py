"""Positional (quoted-phrase) queries over the inverted index.

The index already pays full freight for position lists (encoded per the
reference layout, indexer4.cpp:304-322 — byte-exact by test), but the
reference never reads them at query time (Query-engine.hpp:72-77 skips
them) and lists phrase search as roadmap (README.md:251-263). Its
cross-field position bags would make phrases unsound anyway (quirk
Q12); OUR per-field token stream has no such defect, so this module
closes the gap the reference could not.

Semantics: for a phrase [t_0 .. t_{m-1}], a document matches iff some
position p has t_i at p+i for every i — the terms appear adjacent and
in order, where "position" is the analyzer's token numbering (compat
mode numbers the PRE-filter token runs, so a removed stopword leaves a
gap: "machine the learning" does NOT match the phrase "machine
learning" — faithful to what was actually adjacent in the text).
Matching docs are scored with the SAME per-distinct-term BM25 sum,
ascending-sorted deterministic FP fold, and (score desc, doc_int asc)
tiebreak as ``query.search`` AND mode — a phrase query IS an AND query
with an adjacency filter — plus ``n_occurrences`` (count of phrase
start positions).

Spark-first shape: ONE decode pass, ONE shuffle (the groupBy doc),
broadcast slot/top-k joins. The adjacency test is pure JVM Column work:
``transform(positions, p -> p - i)`` per phrase slot, then a fold of
``array_intersect`` over the per-doc slot arrays — surviving values ARE
the phrase start positions. No Python beyond the shared Arrow decode
kernel. At 100 TB the plan is the ``search_batch`` plan: bucket-pruned
blob scan prunes partition dirs, per-term blobs decode where they live,
candidate rows shuffle once on doc.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.bm25 import K1, B, bm25_score
from ..functions.varbyte import decode_postings
from .query import _stats, exclude_tombstones, prune_buckets

POS_DECODED_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("df", LongType()),
        StructField("doc_int", LongType()),
        StructField("tf", LongType()),
        StructField("positions", ArrayType(LongType())),
    ]
)


def decode_postings_positions_df(
    postings: DataFrame, terms: list[str] | None = None
) -> DataFrame:
    """postings table -> (term, df, doc_int, tf, positions) rows.

    Same term-pruned shape as ``query.decode_postings_df`` but with the
    full-position decode. One ``mapInArrow`` kernel builds the output
    batch natively — the positions column is a single Arrow ListArray
    over the kernel's flat positions with tf-cumsum offsets (guide
    §4.2: no pandas object arrays, no per-doc ``np.split``)."""
    src = postings
    if terms is not None:
        src = src.filter(F.col("term").isin(list(terms)))
    has_blocks = "blocks" in postings.columns

    def _decode(batches):
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
            t_parts, df_parts, d_parts, tf_parts, p_parts = [], [], [], [], []
            for i in range(batch.num_rows):
                blocks = blockss[i]
                offs = (
                    np.array([b["offset"] for b in blocks], dtype=np.int64)
                    if blocks is not None
                    else None
                )
                docids, tfs, flat_pos = decode_postings(
                    blobs[i].as_py(), offs
                )
                n = docids.size
                t_parts.append(np.full(n, i, dtype=np.int64))
                df_parts.append(np.full(n, dfs[i], dtype=np.int64))
                d_parts.append(docids)
                tf_parts.append(tfs)
                p_parts.append(flat_pos)
            if not t_parts:
                continue
            tfs_all = np.concatenate(tf_parts)
            offsets = np.zeros(tfs_all.size + 1, dtype=np.int64)
            offsets[1:] = np.cumsum(tfs_all)
            yield pa.RecordBatch.from_arrays(
                [
                    terms_a.take(pa.array(np.concatenate(t_parts))),
                    pa.array(np.concatenate(df_parts)),
                    pa.array(np.concatenate(d_parts)),
                    pa.array(tfs_all),
                    pa.LargeListArray.from_arrays(
                        pa.array(offsets),
                        pa.array(np.concatenate(p_parts)),
                    ).cast(pa.list_(pa.int64())),
                    # ^ large offsets during build (a hot term's flat
                    # positions can exceed int32 rows), cast to the
                    # declared list<int64> for the schema
                ],
                names=["term", "df", "doc_int", "tf", "positions"],
            )

    cols = ["term", "df", "postings"] + (["blocks"] if has_blocks else [])
    return src.select(*cols).mapInArrow(_decode, POS_DECODED_SCHEMA)


def _phrase_grouped(
    index: dict[str, DataFrame],
    phrase: list[str],
    tf_mode: str,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared pipeline: decode once, adjacency-match, carry per-term
    BM25 scores through the single doc-shuffle. Returns
    (doc_int, n_occurrences, tscores) for phrase-matching docs."""
    if not phrase:
        raise ValueError("empty phrase")
    m = len(phrase)
    n_docs, avg_dl = _stats(index)
    uniq = list(dict.fromkeys(phrase))
    spark = index["postings"].sparkSession

    decoded = exclude_tombstones(
        index, decode_postings_positions_df(prune_buckets(index, uniq), uniq)
    )
    slots = spark.createDataFrame(
        [(i, t) for i, t in enumerate(phrase)], "idx long, term string"
    )
    doc_stats = index["doc_stats"].select("doc_int", "doc_len")
    tf_eff = F.lit(1.0) if tf_mode == "compat" else F.col("tf").cast("double")
    cand = (
        decoded.join(F.broadcast(slots), "term")
        .withColumn("adj", F.transform("positions", lambda p: p - F.col("idx")))
        .join(doc_stats, "doc_int", "left")
        .withColumn(
            "dl",
            F.coalesce(F.col("doc_len"), F.floor(F.lit(avg_dl))).cast("double"),
        )
        .withColumn(
            "term_score",
            bm25_score(
                tf_eff, F.col("df"), F.col("dl"),
                F.lit(float(n_docs)), F.lit(avg_dl), k1, b,
            ),
        )
    )
    grouped = cand.groupBy("doc_int").agg(
        F.count("*").alias("n_slots"),
        F.sort_array(F.collect_list(F.struct("idx", "adj"))).alias("items"),
        # collect_SET: a term repeated in the phrase contributes one
        # (term, score) pair, matching search()'s distinct-term scoring
        F.collect_set(F.struct("term", "term_score")).alias("tscores"),
    )
    starts = F.aggregate(
        F.slice(F.col("items"), 2, m - 1),
        F.col("items")[0]["adj"],
        lambda acc, x: F.array_intersect(acc, x["adj"]),
    )
    return (
        grouped.filter(F.col("n_slots") == m)
        .withColumn("n_occurrences", F.size(starts))
        .filter(F.col("n_occurrences") > 0)
        .select("doc_int", "n_occurrences", "tscores")
    )


def phrase_match_docs(
    index: dict[str, DataFrame],
    phrase: list[str],
    tf_mode: str = "true",
) -> DataFrame:
    """-> (doc_int, n_occurrences) for docs containing the exact
    phrase (match only, no ranking)."""
    return _phrase_grouped(index, phrase, tf_mode, K1, B).select(
        "doc_int", "n_occurrences"
    )


def phrase_search_batch(
    index: dict[str, DataFrame],
    phrases: dict[int, list[str]],
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """N phrase queries as ONE Spark job ->
    (query_id, rank, doc_int, docid, score, n_occurrences).

    Same single-shuffle shape as ``query.search_batch``: distinct terms
    decode once, candidates repartition by query_id so the per-doc agg
    and the per-query top-k window share one exchange. Per-query phrase
    lengths differ, so the all-slots-present check joins a broadcast
    per-query slot count instead of a literal."""
    if not phrases or any(not p for p in phrases.values()):
        raise ValueError("phrases must be non-empty lists")
    n_docs, avg_dl = _stats(index)
    spark = index["postings"].sparkSession
    all_terms = list(dict.fromkeys(t for p in phrases.values() for t in p))

    decoded = exclude_tombstones(
        index,
        decode_postings_positions_df(prune_buckets(index, all_terms), all_terms),
    )
    slots = spark.createDataFrame(
        [(qid, i, t) for qid, p in phrases.items() for i, t in enumerate(p)],
        "query_id long, idx long, term string",
    )
    m_per_q = spark.createDataFrame(
        [(qid, len(p)) for qid, p in phrases.items()], "query_id long, m long"
    )
    doc_stats = index["doc_stats"].select("doc_int", "doc_len")
    tf_eff = F.lit(1.0) if tf_mode == "compat" else F.col("tf").cast("double")
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cand = (
        decoded.join(F.broadcast(slots), "term")
        .repartition(npart, "query_id")
        .withColumn("adj", F.transform("positions", lambda p: p - F.col("idx")))
        .join(doc_stats, "doc_int", "left")
        .withColumn(
            "dl",
            F.coalesce(F.col("doc_len"), F.floor(F.lit(avg_dl))).cast("double"),
        )
        .withColumn(
            "term_score",
            bm25_score(
                tf_eff, F.col("df"), F.col("dl"),
                F.lit(float(n_docs)), F.lit(avg_dl), k1, b,
            ),
        )
    )
    grouped = cand.groupBy("query_id", "doc_int").agg(
        F.count("*").alias("n_slots"),
        F.sort_array(F.collect_list(F.struct("idx", "adj"))).alias("items"),
        F.collect_set(F.struct("term", "term_score")).alias("tscores"),
    )
    starts = F.aggregate(
        F.expr("slice(items, 2, size(items) - 1)"),
        F.col("items")[0]["adj"],
        lambda acc, x: F.array_intersect(acc, x["adj"]),
    )
    per_doc = (
        grouped.join(F.broadcast(m_per_q), "query_id")
        .filter(F.col("n_slots") == F.col("m"))
        .withColumn("n_occurrences", F.size(starts))
        .filter(F.col("n_occurrences") > 0)
        .withColumn(
            "score",
            F.aggregate(
                F.sort_array(
                    F.transform(F.col("tscores"), lambda x: x["term_score"])
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_int"))
    topk = (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "doc_int", "score", "n_occurrences")
    )
    return (
        F.broadcast(topk)
        .join(index["docid_map"], "doc_int")
        .select("query_id", "rank", "doc_int", "docid", "score", "n_occurrences")
        .orderBy("query_id", "rank")
    )


def proximity_match_docs(
    index: dict[str, DataFrame],
    term_a: str,
    term_b: str,
    slop: int,
    ordered: bool = False,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Scored FULL match set of a NEAR/slop query -> (doc_int, score,
    min_dist), no rank window — feeds every match-set consumer
    (facets, collapse, sigterms, pagination) like
    ``query.match_docs`` / ``boolsearch.boolean_match_docs``.
    ``proximity_search`` is this plus the distributed top-k tail.

    A document matches when some occurrence of ``term_a`` and some
    occurrence of ``term_b`` lie within ``slop`` token positions:
    unordered (default) uses ``|p_b - p_a| <= slop``; ``ordered=True``
    requires ``1 <= p_b - p_a <= slop`` (a AFTER-NEAR b). Matching docs
    are scored with the same distinct-term BM25 sum / deterministic FP
    fold / (score desc, doc_int asc) tiebreak as ``query.search`` AND
    mode — a proximity query IS an AND query plus a distance filter —
    and carry ``min_dist``, the smallest qualifying distance.

    Plan shape is the phrase plan: bucket-pruned scan, ONE decode pass,
    ONE doc-shuffle, pure-JVM distance work. The pairwise distance is a
    nested ``transform`` — O(tf_a * tf_b) per doc in whole-stage
    codegen, which for realistic per-doc tfs (tens) beats shipping the
    arrays to Python; for stopword-scale tfs pre-filter candidates (or
    index with stopword removal) as with any positional operator.
    """
    if term_a == term_b:
        raise ValueError("proximity terms must differ")
    if slop < 1:
        raise ValueError("slop must be >= 1")
    n_docs, avg_dl = _stats(index)
    uniq = [term_a, term_b]

    decoded = exclude_tombstones(
        index, decode_postings_positions_df(prune_buckets(index, uniq), uniq)
    )
    doc_stats = index["doc_stats"].select("doc_int", "doc_len")
    tf_eff = F.lit(1.0) if tf_mode == "compat" else F.col("tf").cast("double")
    cand = (
        decoded.join(doc_stats, "doc_int", "left")
        .withColumn(
            "dl",
            F.coalesce(F.col("doc_len"), F.floor(F.lit(avg_dl))).cast("double"),
        )
        .withColumn(
            "term_score",
            bm25_score(
                tf_eff, F.col("df"), F.col("dl"),
                F.lit(float(n_docs)), F.lit(avg_dl), k1, b,
            ),
        )
    )
    grouped = cand.groupBy("doc_int").agg(
        F.count("*").alias("n_terms"),
        F.max(F.when(F.col("term") == term_a, F.col("positions"))).alias("pa"),
        F.max(F.when(F.col("term") == term_b, F.col("positions"))).alias("pb"),
        F.collect_set(F.struct("term", "term_score")).alias("tscores"),
    )
    diffs = F.flatten(
        F.transform(
            "pa",
            lambda p: F.transform(F.col("pb"), lambda q: q - p),
        )
    )
    dists = (
        F.filter(diffs, lambda d: d > 0)
        if ordered
        else F.transform(diffs, lambda d: F.abs(d))
    )
    per_doc = (
        grouped.filter(F.col("n_terms") == 2)
        .withColumn("min_dist", F.array_min(dists))
        .filter(F.col("min_dist").isNotNull() & (F.col("min_dist") <= slop))
        .withColumn(
            "score",
            F.aggregate(
                F.sort_array(
                    F.transform(F.col("tscores"), lambda x: x["term_score"])
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    return per_doc.select("doc_int", "score", "min_dist")


def proximity_search(
    index: dict[str, DataFrame],
    term_a: str,
    term_b: str,
    slop: int,
    ordered: bool = False,
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """NEAR/slop proximity query -> (rank, doc_int, docid, score,
    min_dist): ``proximity_match_docs`` + a distributed
    ``orderBy().limit(k)``; only the k survivors see the rank
    window (see that function for match/score semantics)."""
    per_doc = proximity_match_docs(
        index, term_a, term_b, slop, ordered, tf_mode, k1, b
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
        .select("rank", "doc_int", "docid", "score", "min_dist")
        .orderBy("rank")
    )


def phrase_match_docs(
    index: dict[str, DataFrame],
    phrase: list[str],
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Scored FULL match set of a quoted phrase -> (doc_int, score,
    n_occurrences), no rank window — the phrase analog of
    ``query.match_docs`` for composing with facets / collapse /
    sigterms / pagination."""
    matched = _phrase_grouped(index, phrase, tf_mode, k1, b)
    return matched.withColumn(
        "score",
        F.aggregate(
            F.sort_array(
                F.transform(F.col("tscores"), lambda x: x["term_score"])
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    ).select("doc_int", "score", "n_occurrences")


def phrase_search(
    index: dict[str, DataFrame],
    phrase: list[str],
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Quoted-phrase top-k -> (rank, doc_int, docid, score,
    n_occurrences), rank-consistent with ``query.search`` AND mode on
    the shared candidates (same scores, bit-identical FP fold)."""
    matched = _phrase_grouped(index, phrase, tf_mode, k1, b)
    per_doc = matched.withColumn(
        "score",
        F.aggregate(
            F.sort_array(
                F.transform(F.col("tscores"), lambda x: x["term_score"])
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
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
        .select("rank", "doc_int", "docid", "score", "n_occurrences")
        .orderBy("rank")
    )
