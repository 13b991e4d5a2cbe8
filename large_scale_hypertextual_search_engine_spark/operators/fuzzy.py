"""Fuzzy term matching: edit-distance lookup + "did you mean".

The reference has no spelling correction — a typo returns zero hits
(its AND path drops unknown terms silently, Query-engine.hpp:320-326).
This module adds the standard two paths:

* :func:`fuzzy_candidates` — brute scan: length-pruned lexicon scan
  with Spark's BUILT-IN ``levenshtein`` (JVM codegen, threshold-bounded
  so the DP aborts early) — no Python in the plan. Fine up to very
  large lexicons because a lexicon is tiny next to its postings; this
  is also the DuckDB-oracle-checkable path.
* :class:`DeletionIndex` — the scale path (SymSpell's public
  deletion-neighborhood scheme, Garbe 2012): precompute every term's
  deletion signatures up to ``max_dist`` ONCE into a bucketed table;
  a lookup generates the query word's (tiny) signature set and joins.
  Two words within edit distance d always share a deletion signature
  (each at most d deletions deep), so candidate recall is exact;
  candidates are verified with true levenshtein. Lookup cost is
  O(|sig(word)|) index probes instead of a lexicon scan — the right
  shape when the lexicon itself is distributed at 10^12-file scale.

``search_fuzzy`` rewrites out-of-vocabulary query terms to their best
correction (dist asc, tf desc, term asc — frequency breaks ties, the
classic noisy-channel prior) and runs the normal BM25 search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.bm25 import B, K1

__all__ = ["fuzzy_candidates", "search_fuzzy", "DeletionIndex"]


def fuzzy_candidates(
    index: dict[str, DataFrame],
    word: str,
    max_dist: int = 1,
    top_n: int = 5,
) -> DataFrame:
    """Lexicon terms within ``max_dist`` edits of ``word`` ->
    (term, dist, tf), ranked (dist asc, tf desc, term asc), top_n.

    Plan: column-pruned lexicon scan, length-difference prune (a
    necessary condition for distance <= d, pushed to the scan), then
    codegen ``levenshtein(term, word, threshold)`` — the threshold
    variant abandons a row's DP as soon as the bound is exceeded.
    """
    w = word.lower()
    cand = (
        index["lexicon"]
        .select("term", "tf")
        .filter(F.abs(F.length("term") - F.lit(len(w))) <= max_dist)
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(w), max_dist))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
    return (
        cand.orderBy(F.asc("dist"), F.desc("tf"), F.asc("term"))
        .limit(top_n)
        .select("term", F.col("dist").cast("int").alias("dist"), "tf")
    )


def _deletions(word: str, max_dist: int) -> set[str]:
    """All strings reachable from ``word`` by <= max_dist single-char
    deletions (including ``word`` itself)."""
    out = {word}
    frontier = {word}
    for _ in range(max_dist):
        frontier = {
            s[:i] + s[i + 1 :] for s in frontier for i in range(len(s))
        }
        out |= frontier
    return out


class DeletionIndex:
    """SymSpell-style deletion-neighborhood index over the lexicon.

    ``build`` materializes (sig, term, tf) — every term keyed by each
    of its <= max_dist-deep deletion signatures. ``lookup`` joins the
    query word's signature set (a handful of rows, broadcast) against
    it and verifies candidates with true levenshtein: identical results
    to :func:`fuzzy_candidates` (pytest-asserted) without scanning the
    lexicon. Persist ``self.sigs`` with ``save``/bucketing for reuse;
    at cluster scale write it ``bucketBy(sig)`` so a lookup touches one
    bucket.
    """

    def __init__(self, sigs: DataFrame, max_dist: int):
        self.sigs = sigs
        self.max_dist = max_dist

    @classmethod
    def build(
        cls, index: dict[str, DataFrame], max_dist: int = 1
    ) -> "DeletionIndex":
        lex = index["lexicon"].select("term", "tf")
        sig = F.explode(
            F.udf(
                lambda t: sorted(_deletions(t, max_dist)), "array<string>"
            )("term")
        )
        # the deletion generator is the one per-term Python hop — it
        # runs ONCE at build, never at lookup; signatures are tiny
        # strings so the exploded table stays lexicon-shaped
        sigs = lex.select(sig.alias("sig"), "term", "tf")
        return cls(sigs, max_dist)

    def save(self, path: str) -> None:
        """Persist the signature table (partition-friendly parquet) +
        a max_dist sidecar; at cluster scale prefer ``bucketBy(sig)``
        into a table so a lookup touches one bucket."""
        import json
        from pathlib import Path

        self.sigs.write.mode("overwrite").parquet(path)
        (Path(path) / "_deletion_index.json").write_text(
            json.dumps({"max_dist": self.max_dist})
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "DeletionIndex":
        import json
        from pathlib import Path

        meta = json.loads((Path(path) / "_deletion_index.json").read_text())
        return cls(spark.read.parquet(path), int(meta["max_dist"]))

    def lookup(
        self, spark: SparkSession, word: str, top_n: int = 5
    ) -> DataFrame:
        w = word.lower()
        probe = spark.createDataFrame(
            [(s,) for s in sorted(_deletions(w, self.max_dist))],
            "sig string",
        )
        cand = (
            self.sigs.join(F.broadcast(probe), "sig")
            .select("term", "tf")
            .distinct()
            .withColumn(
                "dist", F.levenshtein(F.col("term"), F.lit(w), self.max_dist)
            )
            .filter((F.col("dist") >= 0) & (F.col("dist") <= self.max_dist))
        )
        return (
            cand.orderBy(F.asc("dist"), F.desc("tf"), F.asc("term"))
            .limit(top_n)
            .select("term", F.col("dist").cast("int").alias("dist"), "tf")
        )


def search_fuzzy(
    index: dict[str, DataFrame],
    terms: list[str],
    top_k: int = 10,
    mode: str = "and",
    tf_mode: str = "true",
    max_dist: int = 1,
    k1: float = K1,
    b: float = B,
) -> tuple[DataFrame, dict[str, str]]:
    """BM25 search with out-of-vocabulary terms rewritten to their best
    correction. Returns (results, corrections) where corrections maps
    each rewritten input term to what it became; in-vocabulary terms
    are never touched (exact match beats any correction)."""
    from .query import search

    lex = index["lexicon"].select("term")
    uniq = list(dict.fromkeys(t.lower() for t in terms))
    present = {
        r["term"]
        for r in lex.filter(F.col("term").isin(uniq)).collect()
    }
    corrections: dict[str, str] = {}
    final: list[str] = []
    for t in uniq:
        if t in present:
            final.append(t)
            continue
        best = fuzzy_candidates(index, t, max_dist=max_dist, top_n=1).collect()
        if best:
            corrections[t] = best[0]["term"]
            final.append(best[0]["term"])
        else:
            final.append(t)  # uncorrectable: keeps the engine's
            # missing-term semantics (AND fails / OR skips)
    return (
        search(
            index, list(dict.fromkeys(final)), top_k=top_k, mode=mode,
            tf_mode=tf_mode, k1=k1, b=b,
        ),
        corrections,
    )
