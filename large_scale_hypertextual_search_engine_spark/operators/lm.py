"""N-gram language-model quality scoring: the perplexity proxy.

The standard training-data quality filter (Wenzek et al. 2020's
CCNet: a KenLM 5-gram per language, docs ranked by perplexity;
Brown et al. 2020 §A used an n-gram LM judge the same way): train a
count-based LM on the corpus (or a trusted reference slice), score
every document by average per-token log-probability, and keep/drop
by threshold or quantile. This module is the distributed bigram
instance: counts ARE the model — no training loop, one aggregation.

Plan shape (100 TB): training is TWO map-side-combining count
aggregations over one narrow tokenize pass (unigrams, bigrams) — the
model is a DataFrame, stored like any index artifact. Scoring joins
each doc's bigrams against the model ON THE BIGRAM KEY — a plain
hash join Spark sizes itself (broadcast when the model is small, AQE
otherwise); smoothing makes unseen bigrams a COALESCE, not a second
pass; the per-doc average is the same groupBy the join clustered.
Everything whole-stage codegen; the only Python is none.

Add-k (Lidstone) smoothing: P(w2|w1) = (c(w1 w2) + k) / (c(w1) +
k·V), with V the trained unigram vocabulary size; out-of-vocabulary
history words fall back to c(w1)=0, so every bigram has positive
mass and log-probs stay finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["train_bigram_lm", "score_docs_lm"]


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(docid, toks array) with empty tokens dropped — the simple-mode
    whitespace analyzer (split-then-filter, codegen)."""
    return docs.select(
        F.col(id_col).cast("string").alias("docid"),
        F.filter(
            F.split(F.col(text_col), " "), lambda t: t != ""
        ).alias("toks"),
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "content", id_col: str = "docid"
) -> dict[str, DataFrame]:
    """-> {"unigrams": (w, c), "bigrams": (w1, w2, c), "vocab": 1-row
    (v)} — the count model, storable as parquet like any artifact."""
    toks = _doc_tokens(docs, text_col, id_col)
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    big = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                    " (t, i) -> struct(t as w1, toks[i + 1] as w2))"
                )
            ).alias("b")
        )
        .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count("*").alias("c"))
    )
    vocab = uni.agg(F.count("*").alias("v"))
    return {"unigrams": uni, "bigrams": big, "vocab": vocab}


def score_docs_lm(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    k: float = 1.0,
    text_col: str = "content",
    id_col: str = "docid",
) -> DataFrame:
    """-> (docid, n_bigrams, avg_logprob): mean log P(w2|w1) over each
    doc's bigrams under the add-k-smoothed model. Higher = more
    model-like; a corpus-trained model makes this the fluency /
    boilerplate signal (CCNet keeps the low-perplexity head). Docs
    with < 2 tokens score NULL (no bigrams to judge)."""
    if k <= 0:
        raise ValueError("k must be positive")
    toks = _doc_tokens(docs, text_col, id_col)
    doc_bigrams = toks.select(
        "docid",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                " (t, i) -> struct(t as w1, toks[i + 1] as w2))"
            )
        ).alias("b"),
    ).select("docid", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))

    scored = (
        doc_bigrams.join(
            lm["bigrams"].withColumnRenamed("c", "c12"), ["w1", "w2"], "left"
        )
        .join(
            lm["unigrams"].select(
                F.col("w").alias("w1"), F.col("c").alias("c1")
            ),
            "w1",
            "left",
        )
        .join(F.broadcast(lm["vocab"]))
        .withColumn(
            "logp",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(k)))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(k)) * F.col("v"))
            ),
        )
    )
    per_doc = scored.groupBy("docid").agg(
        F.count("*").alias("n_bigrams"),
        F.avg("logp").alias("avg_logprob"),
    )
    # docs with no bigrams (0- or 1-token) still appear, with NULL score
    return (
        toks.select("docid")
        .join(per_doc, "docid", "left")
        .select(
            "docid",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
        )
    )
