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
* Corpus grams are produced by pure JVM expressions (split → slice →
  array_join → xxhash64 inside whole-stage codegen); gram STRINGS live
  only transiently inside the project — the join key is the 64-bit
  hash, 8 bytes/gram.
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
    """
    toks = normalized_tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def benchmark_grams(
    benchmark: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """The benchmark's distinct gram-hash set: one column ``gram_hash``
    (xxhash64 of the normalized gram string).  Compute once, persist,
    reuse across corpus shards."""
    return (
        benchmark.select(
            F.explode(ngrams_col(F.col(text_col), n)).alias("gram")
        )
        .select(F.xxhash64("gram").alias("gram_hash"))
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
    bench = benchmark_grams(
        benchmark, n, benchmark_text_col or text_col
    )
    grams = docs.select(
        F.col(id_col), ngrams_col(F.col(text_col), n).alias("grams")
    )
    exploded = grams.select(
        id_col,
        F.size("grams").cast("long").alias("total_grams"),
        F.explode("grams").alias("gram"),
    ).select(
        id_col, "total_grams", F.xxhash64("gram").alias("gram_hash")
    )
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
