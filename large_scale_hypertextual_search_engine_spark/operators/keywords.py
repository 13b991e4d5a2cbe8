"""Corpus statistics for the training-data pipeline: TF-IDF keyword
extraction and PMI collocation mining.

Neither exists in the reference (it stops at raw df/tf in the lexicon,
indexer4.cpp's aggregate pass); both are staples of corpus curation at
scale — keywords tag documents for mixture/domain bookkeeping,
collocations surface the multiword units worth indexing or filtering.

Both operators are pure Column pipelines (tokenize with the engine's
"simple" whitespace semantics — split + drop empties, matching
tokenize_simple and every DuckDB oracle's ``_TOKS``), one aggregation
chain each, no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["extract_keywords", "collocations"]


def _toks(text_col: str):
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def extract_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top ``top_n`` terms per document by smoothed TF-IDF ->
    (doc_id, term, tf, tfidf, rank).

    tfidf = tf · ln((N + 1) / (df + 1)) — the add-one smoothing keeps
    corpus-universal terms at a small positive weight instead of
    exactly zero, so ties among them still order deterministically by
    (tfidf desc, tf desc, term asc). ``min_df`` drops hapax noise.

    Plan: one explode + two map-side-combining aggregates (per-(doc,
    term) tf, per-term df) + a broadcast of the term-df side + one
    per-doc window. N is the exact document count (one scalar job).
    """
    n = docs.count()
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_toks(text_col)).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df")).filter(
        F.col("df") >= min_df
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.desc("tf"), F.asc("term")
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .withColumn(
            "tfidf",
            F.col("tf") * F.log((F.lit(float(n)) + 1.0) / (F.col("df") + 1.0)),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            "doc_id", "term", "tf",
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Adjacent-bigram collocations ranked by PMI ->
    (term_a, term_b, n_pair, pmi).

    pmi = ln( p(a,b) / (p(a)·p(b)) ) with probabilities over the bigram
    population (n_pairs total): ln(n_ab · N_pairs / (n_a· · n_·b)) —
    unigram marginals are counted over bigram SLOTS (a's count as a
    left element, b's as a right element), so the measure is exactly
    the bigram-table PMI and sums are consistent by construction.
    ``min_count`` is the standard reliability floor (PMI explodes on
    rare pairs). Ties order (pmi desc, n_pair desc, term_a, term_b).

    Plan: one explode of zipped adjacent pairs, three aggregates (pair,
    left-marginal, right-marginal), two broadcast joins — no Python.
    """
    nadj = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = (
        docs.select(_toks(text_col).alias("t"))
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", F.lit(1), nadj).alias("term_a"),
                    F.slice("t", F.lit(2), nadj).alias("term_b"),
                )
            ).alias("p")
        )
        .select("p.term_a", "p.term_b")
    )
    pairs = pairs.persist()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pairs.select(
            "term_a", "term_b", F.lit(0).alias("n_pair"), F.lit(0.0).alias("pmi")
        ).limit(0)
    ab = pairs.groupBy("term_a", "term_b").agg(F.count("*").alias("n_pair"))
    left = pairs.groupBy("term_a").agg(F.count("*").alias("n_a"))
    right = pairs.groupBy("term_b").agg(F.count("*").alias("n_b"))
    return (
        ab.filter(F.col("n_pair") >= min_count)
        .join(F.broadcast(left), "term_a")
        .join(F.broadcast(right), "term_b")
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    F.col("n_pair").cast("double")
                    * F.lit(float(n_pairs))
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ),
                6,
            ),
        )
        .orderBy(
            F.desc("pmi"), F.desc("n_pair"), F.asc("term_a"), F.asc("term_b")
        )
        .limit(top_n)
        .select("term_a", "term_b", "n_pair", "pmi")
    )
