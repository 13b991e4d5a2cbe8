"""Benchmark decontamination: n-gram overlap against an eval set.

The standard training-data hygiene pass (Brown et al. 2020, "Language
Models are Few-Shot Learners", Appendix C: 13-gram overlap; Dodge et
al. 2021, "Documenting Large Webtext Corpora" use the same shape): a
training document is *contaminated* when it shares at least one
normalized n-token gram with any document of a benchmark / evaluation
set, and must be dropped (or flagged) before training.

Scale design (100 TB corpus, 10^4-10^6-doc benchmark):

* The benchmark side is tiny next to the corpus — its distinct gram
  set (typically 10^5-10^7 grams) is hashed to int64 and BROADCAST, so
  the corpus side never shuffles on gram strings.  When the benchmark
  is genuinely huge Catalyst/AQE falls back to a shuffled hash join —
  the plan stays correct either way.
* Corpus grams are produced by pure JVM expressions — xxhash64 over
  each n-token slice of the token array; no gram string is EVER
  materialized, the join key is a 64-bit hash, 8 bytes/gram. The token
  split is projected through its own select so the higher-order gram
  lambda (interpreted, not codegen) sees a bound column instead of an
  inlined split expression — the inlined form re-evaluates the split
  once per gram and measured 10x slower at sf0.1 (8.9 s vs 0.9 s).
* The only wide operation is the per-doc groupBy over MATCHED rows —
  volume proportional to contamination, not to the corpus.
* ``benchmark_grams`` is exposed separately so a pipeline can compute
  the benchmark gram set once, persist it, and reuse it across corpus
  shards / ingest batches (the reuse pattern every production
  decontamination run wants).

Normalization mirrors the published recipe: lowercase, every
non-alphanumeric run collapsed to one space (expressed identically in
Spark's Java regex and DuckDB's RE2, so the oracle row reproduces it
verbatim).

No reference-repo counterpart: the reference engine
(mrcarnot/Large-Scale-HyperTextual-Search-Engine) stops at indexing +
retrieval; this module is part of the LLM-training-pipeline surface
this repo adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "normalized_tokens",
    "ngrams_col",
    "ngram_hashes_col",
    "benchmark_grams",
    "contamination_report",
    "decontaminate",
]


def normalized_tokens(text: Column) -> Column:
    """Lowercased alphanumeric token array (codegen; empties dropped)."""
    norm = F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")
    return F.filter(F.split(norm, " "), lambda t: t != "")


def ngrams_col(text: Column, n: int) -> Column:
    """DISTINCT normalized n-token grams of ``text`` as array<string>.

    Pure Column expression: ``slice`` windows over the token array,
    ``array_join`` renders each gram, ``array_distinct`` dedups — all
    inside whole-stage codegen.  Docs shorter than ``n`` tokens have no
    gram (empty array; the ``when`` guard also keeps ``sequence`` from
    running backwards on a negative span).

    This is the human-readable form (debugging, audits). The pipeline
    itself runs on :func:`ngram_hashes_col` — same grams, no strings.
    """
    toks = normalized_tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_hashes_col(toks: Column, n: int) -> Column:
    """DISTINCT n-gram HASHES of a TOKEN-ARRAY column as array<long> —
    xxhash64 applied directly to each n-token slice (Spark hashes
    arrays order-sensitively), so no gram string is ever materialized.

    Takes the token array, NOT the raw text: higher-order-function
    lambdas are interpreted (no whole-stage codegen), and an inlined
    split-expression re-evaluates once PER GRAM — measured 10x slower
    at sf0.1 (8.9 s vs 0.9 s). Project ``normalized_tokens`` through
    its own select first (an alias referenced more than once is not
    collapsed into the lambda), as :func:`_gram_frame` does."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.xxhash64(F.slice(toks, i + 1, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<long>")
    )


def _gram_frame(
    df: DataFrame, text_col: str, id_cols: list[str], n: int
) -> DataFrame:
    """(id_cols..., grams: array<long>) with the token split evaluated
    exactly once per row (see ngram_hashes_col). Rows with fewer than
    ``n`` tokens are dropped HERE, on the cheap size(__toks) predicate
    — consumers must explode with ``explode_outer``: a plain explode's
    inferred not-empty filter is pushed below the projections with the
    whole gram expression inlined, re-running the split once per gram
    (measured: the entire 10x win given back)."""
    toksed = df.select(
        *id_cols, normalized_tokens(F.col(text_col)).alias("__toks")
    ).filter(F.size(F.col("__toks")) >= n)
    return toksed.select(
        *id_cols, ngram_hashes_col(F.col("__toks"), n).alias("grams")
    )


def benchmark_grams(
    benchmark: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """The benchmark's distinct gram-hash set: one column ``gram_hash``
    (xxhash64 over the normalized n-token slice).  Compute once,
    persist, reuse across corpus shards."""
    return (
        _gram_frame(benchmark, text_col, [], n)
        .select(F.explode_outer("grams").alias("gram_hash"))
        .filter(F.col("gram_hash").isNotNull())
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """Per-contaminated-doc overlap report:
    (doc_id, overlap_grams, total_grams, overlap_frac).

    ``overlap_grams`` counts DISTINCT normalized n-grams the doc shares
    with the benchmark's gram set; ``total_grams`` is the doc's own
    distinct-gram count; a doc appears iff overlap >= ``min_overlap``
    (Brown et al. use n=13, min_overlap=1).  Output volume is bounded
    by the number of contaminated docs, never the corpus.
    """
    from .fanout import fan_out

    bench = benchmark_grams(
        benchmark, n, benchmark_text_col or text_col
    )
    # per-gram hashing is the heavy narrow stage; a small corpus scan
    # packs into a couple of splits and serializes it (guide §2.5)
    grams = _gram_frame(fan_out(docs), text_col, [id_col], n)
    exploded = grams.select(
        id_col,
        F.size("grams").cast("long").alias("total_grams"),
        F.explode_outer("grams").alias("gram_hash"),
    ).filter(F.col("gram_hash").isNotNull())
    matched = exploded.join(F.broadcast(bench), "gram_hash")
    return (
        matched.groupBy(id_col)
        .agg(
            F.count("*").alias("overlap_grams"),
            F.first("total_grams").alias("total_grams"),
        )
        .filter(F.col("overlap_grams") >= min_overlap)
        .withColumn(
            "overlap_frac",
            F.round(F.col("overlap_grams") / F.col("total_grams"), 6),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """``docs`` with contaminated documents removed (anti-join on the
    report's id set — one hash exchange on the id key)."""
    bad = contamination_report(
        docs, benchmark, n, min_overlap, text_col, id_col,
        benchmark_text_col,
    ).select(id_col)
    return docs.join(bad, id_col, "left_anti")
