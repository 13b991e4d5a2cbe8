"""Prefix autocomplete ranked by collection term frequency.

Spark rebuild of the reference trie engine (Auto-complete.hpp:11-48,
106-148, SURVEY.md §3.3): the trie's O(|prefix|) descent becomes
``startswith`` predicate pushdown over the term-sorted lexicon — with
the lexicon written sorted by term, parquet/Iceberg min/max file stats
prune every file outside the prefix range, which is the distributed
analog of walking the trie. ``orderBy(tf desc).limit(k)`` compiles to
TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def suggest(
    lexicon: DataFrame,
    prefix: str,
    max_suggestions: int = 10,
    lowercase: bool = True,
) -> DataFrame:
    """-> (term, tf) top suggestions for a prefix.

    The reference lowercases the prefix (ASCII) before descent
    (Auto-complete.hpp:109-112); ties rank by term asc for determinism
    (the reference's sort is unstable — quirk Q10 analog).
    """
    if lowercase:
        prefix = "".join(
            chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in prefix
        )
    return (
        lexicon.filter(F.col("term").startswith(prefix))
        .select("term", "tf")
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(max_suggestions)
    )


def suggest_many(
    lexicon: DataFrame, prefixes: DataFrame, max_suggestions: int = 10
) -> DataFrame:
    """Batch autocomplete: prefixes(prefix) x lexicon -> top-k per prefix
    as one job (range join on prefix bounds + windowed top-k)."""
    from pyspark.sql import Window

    joined = F.broadcast(prefixes).join(
        lexicon.select("term", "tf"),
        F.col("term").startswith(F.col("prefix")),
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("tf"), F.asc("term"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_suggestions)
        .select("prefix", "rank", "term", "tf")
    )
