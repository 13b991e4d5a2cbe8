"""BM25F: fielded retrieval over per-field indexes.

The reference indexes one flat token bag per document — its extractor
PARSES fields (title/abstract/body, extractor behavior P1-P10) and then
throws the structure away before indexing, so a title hit scores no
differently than a footnote hit. BM25F (Robertson & Zaragoza 2004's
simple weighted-field variant, public) is the standard fix: per-field
term frequencies are length-normalized PER FIELD, weighted, and summed
BEFORE saturation, so one score sees "twice in the title" as stronger
than "twice anywhere":

    tf~(t, d) = Σ_f  w_f · tf(t, f, d) / B_f(d)
    B_f(d)    = 1 - b_f + b_f · len_f(d) / avgdl_f
    score     = Σ_t  idf(t) · tf~ / (k1 + tf~)
    idf(t)    = ln((N - df + 0.5) / (df + 0.5) + 1)   [df over ANY field]

Architecture: one ordinary index PER FIELD (the existing builder,
unchanged — fields are just columns fed to ``build_index``), combined
at query time. This is the scale-right layout: fields compress/prune
independently, a title-only query touches only the title index, and
adding a field never rewrites the others.

Plan shape: per field a bucket-pruned decode of the query terms (the
same kernel as ``query.search``), unioned with a field tag, ONE
doc_int-keyed exchange serving both the (term, doc) tf~ fold and the
per-doc score fold. doc_int parity across field indexes is required
(build every field from the same docs frame — the dense minting is
docid-ordered, hence identical) and asserted cheaply at query time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.bm25 import B, K1

__all__ = ["search_bm25f"]


def search_bm25f(
    field_indexes: dict[str, dict[str, DataFrame]],
    weights: dict[str, float],
    terms: list[str],
    top_k: int = 10,
    mode: str = "and",
    k1: float = K1,
    b: float | dict[str, float] = B,
) -> DataFrame:
    """-> (rank, doc_int, docid, score) under BM25F.

    ``field_indexes``: {field: index dict} — one per field, built over
    the SAME document set. ``weights``: {field: w_f}. ``b`` may be one
    value or per-field. ``mode="and"`` requires every query term in
    SOME field of the doc; ``"or"`` requires any.
    """
    if set(field_indexes) != set(weights):
        raise ValueError("weights must cover exactly the given fields")
    if not terms:
        raise ValueError("terms must be non-empty")
    from .query import decode_postings_df, exclude_tombstones, prune_buckets

    uniq = list(dict.fromkeys(t.lower() for t in terms))
    fields = sorted(field_indexes)
    first = field_indexes[fields[0]]
    spark = first["postings"].sparkSession

    # N = documents in the (shared) corpus; per-field avgdl differs
    n_docs = int(first["collection_stats"].collect()[0]["n_docs"])
    stats = {
        f: field_indexes[f]["collection_stats"].collect()[0] for f in fields
    }
    for f in fields:
        if int(stats[f]["n_docs"]) != n_docs:
            raise ValueError(
                f"field index {f!r} covers {stats[f]['n_docs']} docs, "
                f"{fields[0]!r} covers {n_docs}: field indexes must be "
                "built over the same document set (doc_int parity)"
            )
    avgdl = {f: float(stats[f]["avg_dl"]) for f in fields}
    b_f = {f: (b[f] if isinstance(b, dict) else b) for f in fields}

    parts = []
    for f in fields:
        idx = field_indexes[f]
        dec = exclude_tombstones(
            idx, decode_postings_df(prune_buckets(idx, uniq), uniq)
        ).select("term", "doc_int", "tf")
        dl = idx["doc_stats"].select(
            "doc_int", F.col("doc_len").alias("dl")
        )
        # w_f * tf / B_f — per-field normalization BEFORE the cross-
        # field sum (the defining difference from per-field BM25 mixes)
        parts.append(
            dec.join(dl, "doc_int", "left")
            .select(
                "term",
                "doc_int",
                (
                    F.lit(float(weights[f]))
                    * F.col("tf").cast("double")
                    / (
                        F.lit(1.0 - b_f[f])
                        + F.lit(b_f[f])
                        * F.coalesce(
                            F.col("dl").cast("double"),
                            F.lit(float(int(avgdl[f]))),
                        )
                        / F.lit(avgdl[f])
                    )
                ).alias("wtf"),
            )
        )
    cand = reduce(DataFrame.unionByName, parts)

    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cand = cand.repartition(npart, "doc_int")
    # tf~ per (term, doc); df = docs containing the term in ANY field.
    # df comes from a WINDOW over the aggregated frame, not a separate
    # aggregate + self-join — referencing the frame twice would make
    # Catalyst re-evaluate the whole per-field decode subtree (plan-
    # asserted: exactly one MapInPandas per field)
    tft = cand.groupBy("term", "doc_int").agg(F.sum("wtf").alias("tft"))
    scored = (
        tft.withColumn(
            "df", F.count("*").over(Window.partitionBy("term"))
        )
        .withColumn(
            "tscore",
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
                + 1.0
            )
            * F.col("tft")
            / (F.lit(float(k1)) + F.col("tft")),
        )
        .groupBy("doc_int")
        .agg(
            F.countDistinct("term").alias("n_found"),
            # deterministic FP fold: ascending sort before the sum,
            # matching query.search's bit-stability discipline
            F.aggregate(
                F.sort_array(F.collect_list("tscore")),
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
        .join(first["docid_map"], "doc_int")
        .select("rank", "doc_int", "docid", "score")
        .orderBy("rank")
    )
