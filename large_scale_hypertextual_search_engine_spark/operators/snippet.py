"""Result snippets: best-window highlighting for search hits.

Every interactive search engine shows a text fragment around the match;
the reference returns bare docids (Query-engine.hpp:275-374 emits
(docid, score) only) and lists a web interface as roadmap
(README.md:251-263) — a UI is out of scope for an analytics engine, but
the data-side half, picking WHICH fragment to show, is a query
operator, and this module ships it.

Semantics (deterministic, oracle-checked):
* tokens = simple-mode tokenization (split on ' ', empties dropped,
  positions renumbered — identical to tokenize_simple and the DuckDB
  oracle's renumbered ordinality);
* candidate windows = every start position p in [0, max(n - W, 0)] of
  width W tokens (a doc shorter than W has the single window p = 0);
* window score = number of DISTINCT query terms present in the window;
* best window = highest score, earliest start on ties;
* snippet = the window's tokens joined by a single space; ``n_hits`` =
  the best window's distinct-term count.

Spark-first shape: everything is pure JVM Column expressions — split /
filter / sequence / transform / slice / array_contains — inside whole-
stage codegen; no Python UDF, no shuffle beyond the (broadcast) join
with the ranked hits. Per-row work is O(n_tokens * W * n_terms) with W
and n_terms both small constants, and rows are already filtered to the
top-k hits before the text is ever scanned, so at 100 TB the text scan
touches only k documents per query (column-pruned to the text column).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def _window_hits(toks: Column, start: Column, window: int, terms: list[str]) -> Column:
    """Distinct query terms inside toks[start .. start+window-1] (0-based
    start). Unrolled over the (plan-time constant) term list."""
    sl = F.slice(toks, start + F.lit(1), window)
    return reduce(
        lambda a, b: a + b,
        [F.array_contains(sl, F.lit(t)).cast("int") for t in terms],
    )


def best_window_snippets(
    docs: DataFrame,
    terms: list[str],
    window: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Append (snippet, n_hits, start) to ``docs``: the best W-token
    window of each document's ``text_col`` for the given query terms
    (see module docstring for the exact tie-break semantics). ``start``
    is the 0-based token position of the window, exposed for
    testing/debugging."""
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = list(dict.fromkeys(terms))
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    starts = F.sequence(F.lit(0), F.greatest(F.size("__toks") - window, F.lit(0)))
    return (
        docs.withColumn("__toks", toks)
        .withColumn(
            "__win_scores",
            F.transform(
                starts, lambda p: _window_hits(F.col("__toks"), p, window, terms)
            ),
        )
        # array_position returns the FIRST index of the max -> the
        # earliest best window, 1-based
        .withColumn("n_hits", F.array_max("__win_scores").cast("int"))
        .withColumn(
            "start",
            (F.array_position("__win_scores", F.col("n_hits")) - 1).cast("int"),
        )
        .withColumn(
            "snippet",
            F.array_join(F.slice("__toks", F.col("start") + 1, window), " "),
        )
        .drop("__toks", "__win_scores")
    )


def search_snippets(
    index: dict[str, DataFrame],
    docs: DataFrame,
    terms: list[str],
    top_k: int = 10,
    window: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k + best-window snippet in one plan ->
    (rank, docid, score, n_hits, snippet). The ranked hits (k rows) are
    broadcast into the documents scan, so only the hit documents' text
    is ever tokenized."""
    from .query import search

    hits = search(index, terms, top_k=top_k, mode=mode, tf_mode=tf_mode)
    hit_docs = F.broadcast(hits).join(
        docs.select(
            F.col(id_col).cast("string").alias("docid"),
            F.col(text_col).alias("text"),
        ),
        "docid",
    )
    return (
        best_window_snippets(hit_docs, terms, window=window, text_col="text")
        .select("rank", "docid", "score", "n_hits", "snippet")
        .orderBy("rank")
    )
