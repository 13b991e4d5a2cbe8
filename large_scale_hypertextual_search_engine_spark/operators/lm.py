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

__all__ = ["train_bigram_lm", "score_docs_lm", "suggest_context", "complete_next", "save_lm", "load_lm", "ngram_counts", "select_by_quality"]


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


def suggest_context(
    index: dict[str, DataFrame],
    lm: dict[str, DataFrame],
    terms: list[str],
    max_dist: int = 1,
    k: float = 1.0,
) -> DataFrame:
    """Context-aware "did you mean": -> (pos, word, suggestion, dist,
    score) for each OUT-OF-VOCABULARY query term, ranked by bigram-LM
    fit with its neighbors — the noisy-channel corrector (Kernighan et
    al. 1990) with the add-k bigram as the language model.

    For the OOV word at position i, every in-lexicon candidate within
    ``max_dist`` scores log P(cand) + log P(cand | term[i-1]) +
    log P(term[i+1] | cand) (edges drop the missing side). The unigram
    source prior log P(cand) = ln(c(cand)/T) is load-bearing, not
    decoration: with an unseen continuation, add-k alone PREFERS rare
    candidates (their smoothing denominator c(cand) + kV is smaller) —
    observed as "teh -> def" beating "teh -> the" before the prior.
    NB (ADVICE r5): the prior's numerator is the INDEX lexicon's tf and
    its denominator the LM's unigram total, so the ranking assumes the
    LM was trained on the same corpus slice with the same
    (whitespace-compatible) analyzer as the index — train the LM on
    the indexed corpus (the CLI default) or expect the prior to be an
    unnormalized score rather than a probability.
    Ties break (dist asc, tf desc, term asc) — the context-free order
    ``correct_terms`` uses. In-vocabulary words are never "corrected".

    One job: the probe frame (word, prev, next) broadcasts against a
    length-pruned lexicon scan with threshold levenshtein (JVM
    codegen), candidates left-join the bigram/unigram count tables on
    their keys, and the per-word argmax is a window over the handful
    of query positions. The lexicon is scanned once for the whole
    query; the model tables join by key like any fact table.
    """
    from pyspark.sql import Window

    words = [w.lower() for w in terms]
    rows = [
        (
            i,
            w,
            words[i - 1] if i > 0 else None,
            words[i + 1] if i + 1 < len(words) else None,
        )
        for i, w in enumerate(words)
    ]
    spark = index["lexicon"].sparkSession
    probe = spark.createDataFrame(
        rows, "pos long, word string, prev string, next string"
    )
    cand = (
        index["lexicon"]
        .select("term", "tf")
        .join(
            F.broadcast(probe),
            F.abs(F.length("term") - F.length("word")) <= max_dist,
        )
        .withColumn(
            "dist", F.levenshtein(F.col("term"), F.col("word"), max_dist)
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
    # drop positions whose word is already in the lexicon (dist 0)
    oov = cand.groupBy("pos").agg(F.min("dist").alias("min_dist"))
    cand = cand.join(
        F.broadcast(oov.filter(F.col("min_dist") > 0).select("pos")), "pos"
    )

    big = lm["bigrams"]
    uni = lm["unigrams"]
    kk = float(k)
    scored = (
        cand.join(
            big.select(
                F.col("w1").alias("prev"), F.col("w2").alias("term"),
                F.col("c").alias("c_pc"),
            ),
            ["prev", "term"], "left",
        )
        .join(
            big.select(
                F.col("w1").alias("term"), F.col("w2").alias("next"),
                F.col("c").alias("c_cn"),
            ),
            ["term", "next"], "left",
        )
        .join(
            uni.select(F.col("w").alias("prev"), F.col("c").alias("c_p")),
            "prev", "left",
        )
        .join(
            uni.select(F.col("w").alias("term"), F.col("c").alias("c_c")),
            "term", "left",
        )
        .join(F.broadcast(lm["vocab"]))
        .join(F.broadcast(
            lm["unigrams"].agg(F.sum("c").alias("t_total"))
        ))
        .withColumn(
            "score",
            F.log(F.col("tf").cast("double") / F.col("t_total"))
            + F.when(
                F.col("prev").isNotNull(),
                F.log(
                    (F.coalesce(F.col("c_pc"), F.lit(0)) + kk)
                    / (F.coalesce(F.col("c_p"), F.lit(0)) + kk * F.col("v"))
                ),
            ).otherwise(F.lit(0.0))
            + F.when(
                F.col("next").isNotNull(),
                F.log(
                    (F.coalesce(F.col("c_cn"), F.lit(0)) + kk)
                    / (F.coalesce(F.col("c_c"), F.lit(0)) + kk * F.col("v"))
                ),
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy("pos").orderBy(
        F.desc("score"), F.asc("dist"), F.desc("tf"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "pos", "word", F.col("term").alias("suggestion"),
            F.col("dist").cast("int").alias("dist"), "score",
        )
        .orderBy("pos")
    )


def complete_next(
    lm: dict[str, DataFrame],
    context: str,
    top_n: int = 10,
) -> DataFrame:
    """Next-word query completion -> (word, c, prob): the ``top_n``
    most likely continuations of ``context``'s LAST token under the
    bigram model (search-box "press space, see suggestions" — the
    multi-word complement to prefix autocomplete). ``prob`` is the
    UNSMOOTHED conditional c(w1 w2)/c(w1): completion ranks observed
    continuations, where smoothing would only add a constant floor.
    One metadata-scale filter + TakeOrderedAndProject; no decode, no
    corpus scan."""
    toks = [t for t in context.lower().split(" ") if t]
    if not toks:
        raise ValueError("context must contain at least one token")
    w1 = toks[-1]
    hist = lm["unigrams"].filter(F.col("w") == w1).select(
        F.col("c").alias("c1")
    )
    return (
        lm["bigrams"]
        .filter(F.col("w1") == w1)
        .join(F.broadcast(hist))
        .select(
            F.col("w2").alias("word"),
            "c",
            (F.col("c").cast("double") / F.col("c1")).alias("prob"),
        )
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(top_n)
    )


def save_lm(lm: dict[str, DataFrame], path: str) -> None:
    """Persist the count model as parquet tables (unigrams/, bigrams/,
    vocab/) — the same artifact discipline as the index: train once on
    the big corpus, reload for every scoring / suggestion job."""
    for name in ("unigrams", "bigrams", "vocab"):
        lm[name].write.mode("overwrite").parquet(f"{path}/{name}")


def load_lm(spark, path: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(f"{path}/{name}")
        for name in ("unigrams", "bigrams", "vocab")
    }


def ngram_counts(
    docs: DataFrame,
    n: int,
    min_count: int = 1,
    text_col: str = "content",
    id_col: str = "docid",
) -> DataFrame:
    """Corpus-wide n-gram counting -> (gram: array<string>, c), the
    general-n sibling of ``train_bigram_lm`` (LM training-data prep,
    collocation mining, contamination grams). One narrow tokenize
    pass, the n-gram windows emitted by a codegen ``transform`` over
    index slices (no self-join — position alignment is free inside
    the row), then ONE map-side-combining count aggregation;
    ``min_count`` prunes the long tail before it leaves the
    aggregation."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = _doc_tokens(docs, text_col, id_col)
    grams = toks.select(
        F.explode(
            F.expr(
                f"transform(slice(toks, 1, greatest(size(toks) - {n - 1}, 0)),"
                f" (t, i) -> slice(toks, i + 1, {n}))"
            )
        ).alias("gram")
    )
    out = grams.groupBy("gram").agg(F.count("*").alias("c"))
    if min_count > 1:
        out = out.filter(F.col("c") >= int(min_count))
    return out


def select_by_quality(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    keep_frac: float = 0.5,
    k: float = 1.0,
    text_col: str = "content",
    id_col: str = "docid",
) -> DataFrame:
    """CCNet's head cut (Wenzek et al. 2020 §3.3): score every doc
    with the bigram LM and keep the best ``keep_frac`` by
    avg_logprob -> (docid, n_bigrams, avg_logprob, keep). The
    threshold is the EXACT (1 - keep_frac) quantile of the scored
    docs (one interpolated-percentile aggregate — a scalar, not a
    sort of the corpus), applied as a codegen filter; ties at the
    threshold keep (>=), so keep-rate can slightly exceed keep_frac
    on heavily-tied score distributions, never undershoot. Unscorable
    docs (< 2 tokens, NULL avg_logprob) are never kept — a doc the
    model cannot judge is not "good"."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("keep_frac must be in (0, 1]")
    scored = score_docs_lm(docs, lm, k=k, text_col=text_col, id_col=id_col)
    thr = scored.filter(F.col("avg_logprob").isNotNull()).agg(
        F.percentile("avg_logprob", F.lit(1.0 - float(keep_frac))).alias("thr")
    )
    return (
        scored.join(F.broadcast(thr))
        .withColumn(
            "keep",
            F.col("avg_logprob").isNotNull()
            & (F.col("avg_logprob") >= F.col("thr")),
        )
        .select("docid", "n_bigrams", "avg_logprob", "keep")
    )
