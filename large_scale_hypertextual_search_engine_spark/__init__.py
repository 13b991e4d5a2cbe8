"""PySpark-native full-text indexing + BM25 query engine.

A from-scratch rebuild of the capabilities of the reference C++ pipeline
(`mrcarnot/Large-Scale-HyperTextual-Search-Engine`, surveyed in SURVEY.md)
on idiomatic Spark: DataFrame/Catalyst plans end-to-end, vectorized
pandas/Arrow UDFs for the three kernels Spark lacks (analyzer, varbyte
codec, WAND scorer), and explicit partitioning/skew handling so the same
plans hold on a 1000-executor cluster.

Subpackages
-----------
analysis   reference-compat analyzer: tokenizer + Porter-variant stemmer
functions  varbyte/delta codec, BM25 column expressions, hashing/shingles
operators  index build, BM25 query, autocomplete, dedup, similarity, text stats
sources    corpus loaders, CORD-19-style extractor, golden-artifact readers
plans      stage checkpoint/resume, lineage + metrics
streaming  incremental index maintenance via Structured Streaming
"""

__version__ = "0.1.0"
