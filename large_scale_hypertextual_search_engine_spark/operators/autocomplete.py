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
    as one job.

    NOT a broadcast nested-loop ``startswith`` join (round-1 finding:
    O(|lexicon| * |prefixes|) with no pruning): prefixes are grouped by
    length and each group becomes a hash EQUI-join on
    ``substring(term, 1, len) = prefix`` — the scan stays one pass over
    the lexicon per distinct length, each row probing a hash table.
    Prefix lengths are a tiny driver-side collect (the prefixes frame
    is user-supplied and small by construction)."""
    from functools import reduce
    from pyspark.sql import Window

    lengths = sorted(
        r[0]
        for r in prefixes.select(F.length("prefix").alias("l")).distinct().collect()
        if r[0]
    )
    lex = lexicon.select("term", "tf")
    parts = [
        lex.join(
            F.broadcast(prefixes.filter(F.length("prefix") == n)),
            F.substring("term", 1, n) == F.col("prefix"),
        )
        for n in lengths
    ]
    if not parts:
        return prefixes.select(
            "prefix", F.lit(0).alias("rank"),
            F.lit("").alias("term"), F.lit(0).cast("long").alias("tf"),
        ).limit(0)
    joined = reduce(lambda a, b: a.unionByName(b), parts)
    w = Window.partitionBy("prefix").orderBy(F.desc("tf"), F.asc("term"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_suggestions)
        .select("prefix", "rank", "term", "tf")
    )


class AutocompleteServer:
    """Low-latency serving path (<100 ms target, Auto-complete.hpp:3):
    collect the lexicon ONCE into term-sorted numpy arrays and answer
    prefixes driver-side with two binary searches + a partial top-k —
    microseconds warm, mirroring the reference's in-memory trie without
    a per-query Spark job. The Spark paths above remain for batch.

    The lexicon is small relative to the corpus (Heaps' law: ~1M terms
    per 10^9 docs scale regime, a few hundred MB at most), so a single
    serving node holds it comfortably; shard by term range if not.
    """

    def __init__(self, lexicon: DataFrame, lowercase: bool = True):
        import numpy as np

        rows = lexicon.select("term", "tf").orderBy("term").collect()
        self._terms = np.array([r["term"] for r in rows])
        self._tfs = np.array([r["tf"] for r in rows], dtype=np.int64)
        self._lowercase = lowercase

    def suggest(self, prefix: str, max_suggestions: int = 10) -> list[tuple[str, int]]:
        import numpy as np

        if self._lowercase:
            prefix = "".join(
                chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in prefix
            )
        lo = int(np.searchsorted(self._terms, prefix, side="left"))
        hi = int(np.searchsorted(self._terms, prefix + "\U0010ffff", side="left"))
        if lo >= hi:
            return []
        tfs = self._tfs[lo:hi]
        k = min(max_suggestions, tfs.size)
        # the slice is term-ascending by construction, so a STABLE sort
        # on -tf alone realizes (tf desc, term asc) exactly — argpartition
        # on tf broke ties at the k-th boundary arbitrarily vs the Spark
        # suggest/suggest_many paths (r2 advice)
        order = np.argsort(-tfs, kind="stable")[:k]
        return [(str(self._terms[lo + i]), int(tfs[i])) for i in order]
