"""Warm single-query BM25 serving (the reference's in-memory engine).

``search()`` in operators.query is the batch-analytics path: exact, one
Spark job, but a single interactive query pays ~seconds of fixed
planning/shuffle cost regardless of data touched. The reference engine
never pays that — it IS a warm in-memory process (Query-engine.hpp
holds the lexicon + doc lengths; Barrel-manager.hpp:16-43 LRU-pins at
most 3 postings barrels). ``SearchServer`` is that architecture's
serving analog on top of the Spark-built index:

* collection stats, doc lengths and the docid map are collected ONCE
  into dense numpy arrays (doc_int is dense 1..N by construction);
* per-term posting lists are fetched on miss via ONE bucket-pruned,
  term-filtered Spark job (a few rows — the same partition-dir +
  file-stats pruning as the query path), decoded with the shared
  varbyte kernel, and LRU-cached (``max_cached_terms``, the
  Barrel-manager analog);
* scoring/AND/top-k run in numpy with the SAME double-precision BM25
  expression tree, the same ascending-sorted per-doc fold, and the
  same (score desc, doc_int asc) tiebreak as ``operators.query.
  search`` — rank-identical, scores equal to double rounding (JVM
  Math.log and libm log may differ in the last ulp); asserted in
  tests/test_serving.py.

Scale note: the driver-side state is O(n_docs) for lengths + docids
(~12 GB per 10^9 docs) — a single serving node covers any index whose
docid map fits, which is the reference's own operating envelope. Beyond
that, shard serving nodes by docid range and merge top-k (the sharded
WAND path in operators.wand is the in-cluster version of the same
split).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions.bm25 import B, K1
from ..functions.varbyte import decode_postings, decode_postings_fast
from .query import prune_buckets

_EMPTY = np.empty(0, np.int64)


def _phrase_match(phrase, pos):
    """Adjacent-in-order phrase match over position-decoded postings ->
    (phrase_docs, n_occurrences), both sorted by doc. ``pos`` maps
    term -> (df, docids, tfs, flat_positions); a term absent from the
    map (no postings) can never phrase-match. The adjacency test is the
    numpy mirror of the Spark path's array_intersect fold: per phrase
    slot i every (doc, position - i) pair is emitted, then one lexsort
    groups equal (doc, adjusted) keys — a key held by all m slots is a
    phrase start."""
    m = len(phrase)
    if any(t not in pos for t in phrase):
        return _EMPTY, _EMPTY
    doc_parts, adj_parts = [], []
    for i, t in enumerate(phrase):
        _df, docids, tfs, flat_pos = pos[t]
        doc_parts.append(np.repeat(docids, tfs))
        adj_parts.append(flat_pos - i)
    docs = np.concatenate(doc_parts)
    if docs.size == 0:
        return _EMPTY, _EMPTY
    adjs = np.concatenate(adj_parts)
    order = np.lexsort((adjs, docs))
    docs, adjs = docs[order], adjs[order]
    # group boundaries of equal (doc, adj); a group of size m has
    # every slot (each slot contributes at most one row per key)
    new_grp = np.empty(docs.size, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (docs[1:] != docs[:-1]) | (adjs[1:] != adjs[:-1])
    grp_start = np.flatnonzero(new_grp)
    grp_len = np.diff(np.append(grp_start, docs.size))
    full = grp_len == m
    if not full.any():
        return _EMPTY, _EMPTY
    return np.unique(docs[grp_start[full]], return_counts=True)


def _near_match(pos, a, b, lo, hi):
    """Proximity match -> sorted unique docs containing an occurrence
    pair (pa of ``a``, pb of ``b``) with ``lo <= pb - pa <= hi``
    (unordered NEAR/k: lo=-k hi=k; ordered PRE/k: lo=1 hi=k). Numpy
    mirror of the boolsearch windowed-intersection slot encoding: per b
    occurrence, a searchsorted range-count of a-positions inside
    [pb - hi, pb - lo] over a composite (doc << 32 | position) key —
    valid because posting lists are doc-sorted and position lists
    ascend within a doc, so the composite key is globally sorted."""
    if a not in pos or b not in pos:
        return _EMPTY
    _dfa, docs_a, tfs_a, pos_a = pos[a]
    _dfb, docs_b, tfs_b, pos_b = pos[b]
    if pos_a.size == 0 or pos_b.size == 0:
        return _EMPTY
    shift = np.int64(1) << np.int64(32)
    key_a = np.repeat(docs_a, tfs_a).astype(np.int64) * shift + pos_a
    docs_bf = np.repeat(docs_b, tfs_b).astype(np.int64)
    hi_pa = pos_b.astype(np.int64) - lo  # highest qualifying a-position
    lo_pa = np.maximum(pos_b.astype(np.int64) - hi, 0)
    valid = hi_pa >= 0
    cnt = np.searchsorted(
        key_a, docs_bf * shift + hi_pa, side="right"
    ) - np.searchsorted(key_a, docs_bf * shift + lo_pa, side="left")
    return np.unique(docs_bf[valid & (cnt > 0)])


def _sorted_member(haystack, needles):
    """Boolean membership of ``needles`` in SORTED unique ``haystack``."""
    if haystack.size == 0:
        return np.zeros(needles.size, dtype=bool)
    idx = np.searchsorted(haystack, needles)
    idx[idx == haystack.size] = 0
    return haystack[idx] == needles


class SearchServer:
    def __init__(
        self,
        index: dict[str, DataFrame],
        max_cached_terms: int = 100_000,
    ):
        self._index = index
        self._cache: OrderedDict[str, tuple[int, np.ndarray, np.ndarray]] = (
            OrderedDict()
        )
        self._max_cached = max_cached_terms

        row = index["collection_stats"].collect()[0]
        self.n_docs = int(row["n_docs"])
        self.avg_dl = float(row["avg_dl"])
        # dl fallback mirrors query.search: coalesce(doc_len, floor(avg_dl))
        # Cold-start state is bulk-loaded via Arrow record batches —
        # vectorized scatter per batch into the preallocated arrays, no
        # per-row Python. (The old toLocalIterator row loop was O(rows)
        # interpreter work: hours at the documented 10^9-doc envelope;
        # Arrow batches are minutes.)
        self._dl = np.full(self.n_docs + 1, float(np.floor(self.avg_dl)))
        for batch in (
            index["doc_stats"].select("doc_int", "doc_len").toArrow().to_batches()
        ):
            idx = batch.column("doc_int").to_numpy(zero_copy_only=False)
            self._dl[idx] = batch.column("doc_len").to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
        self._docids = np.empty(self.n_docs + 1, dtype=object)
        for batch in (
            index["docid_map"].select("docid", "doc_int").toArrow().to_batches()
        ):
            idx = batch.column("doc_int").to_numpy(zero_copy_only=False)
            self._docids[idx] = np.asarray(
                batch.column("docid").to_pylist(), dtype=object
            )
        # tombstones: deleted docs are masked out of every decoded
        # posting entry at fetch time, before caching — every query
        # path is then delete-clean for free. df stays the stored
        # (global) value for scoring, mirroring the Spark paths'
        # pre-compaction semantics. Build a NEW server (or call
        # refresh_tombstones) after delete_docs.
        ts = index.get("tombstones")
        self._deleted = (
            np.sort(
                ts.select("doc_int")
                .toPandas()["doc_int"]
                .to_numpy()
                .astype(np.int64)
            )
            if ts is not None
            else _EMPTY
        )

    def refresh_tombstones(self) -> None:
        """Re-read the index's tombstone set and drop cached entries
        (posting caches were filtered against the old set)."""
        ts = self._index.get("tombstones")
        self._deleted = (
            np.sort(
                ts.select("doc_int")
                .toPandas()["doc_int"]
                .to_numpy()
                .astype(np.int64)
            )
            if ts is not None
            else _EMPTY
        )
        self._cache.clear()

    def _mask_deleted(self, docids, tfs, flat_pos=None):
        """Drop tombstoned docs from one decoded posting entry."""
        if self._deleted.size == 0 or docids.size == 0:
            return (docids, tfs) if flat_pos is None else (docids, tfs, flat_pos)
        keep = ~_sorted_member(self._deleted, docids)
        if keep.all():
            return (docids, tfs) if flat_pos is None else (docids, tfs, flat_pos)
        if flat_pos is None:
            return docids[keep], tfs[keep]
        return docids[keep], tfs[keep], flat_pos[np.repeat(keep, tfs)]

    # ---------------------------------------------------------- postings
    def _fetch(self, terms: list[str]) -> dict[str, tuple]:
        """One bucket-pruned Spark job for ALL missing terms. Returns
        the entry for EVERY requested term (fetched or cache-hit) so the
        in-flight query never depends on cache residency — with a small
        ``max_cached_terms`` a query with more unique terms than the
        cache would otherwise evict its own entries mid-fetch."""
        entries: dict[str, tuple] = {
            t: self._cache[t] for t in terms if t in self._cache
        }
        missing = [t for t in terms if t not in entries]
        if not missing:
            return entries
        src = prune_buckets(self._index, missing).filter(
            F.col("term").isin(missing)
        )
        has_blocks = "blocks" in src.columns
        cols = ["term", "df", "postings"] + (["blocks"] if has_blocks else [])
        for r in src.select(*cols).collect():
            offs = (
                np.array([b["offset"] for b in r["blocks"]], dtype=np.int64)
                if has_blocks
                else None
            )
            docids, tfs = self._mask_deleted(
                *decode_postings_fast(bytes(r["postings"]), offs)
            )
            entries[r["term"]] = (int(r["df"]), docids, tfs)
        for t in missing:  # negative-cache absent terms (df = 0)
            if t not in entries:
                entries[t] = (0, np.empty(0, np.int64), np.empty(0, np.int64))
        for t in missing:
            self._put(t, entries[t])
        return entries

    def _fetch_positions(
        self, terms: list[str]
    ) -> dict[str, tuple[int, np.ndarray, np.ndarray, np.ndarray]]:
        """One bucket-pruned Spark job decoding FULL positions for the
        given terms -> {term: (df, docids, tfs, flat_positions)}.
        Positions are not LRU-cached: a position list is ~tf/2 x the
        docid list, so caching phrase fetches would multiply resident
        memory for a query type that is a small minority of traffic."""
        src = prune_buckets(self._index, terms).filter(
            F.col("term").isin(list(terms))
        )
        has_blocks = "blocks" in src.columns
        cols = ["term", "df", "postings"] + (["blocks"] if has_blocks else [])
        out: dict[str, tuple] = {}
        for r in src.select(*cols).collect():
            offs = (
                np.array([b["offset"] for b in r["blocks"]], dtype=np.int64)
                if has_blocks
                else None
            )
            docids, tfs, flat_pos = self._mask_deleted(
                *decode_postings(bytes(r["postings"]), offs)
            )
            out[r["term"]] = (int(r["df"]), docids, tfs, flat_pos)
        return out

    def _put(self, term: str, entry) -> None:
        self._cache[term] = entry
        self._cache.move_to_end(term)
        while len(self._cache) > self._max_cached:
            self._cache.popitem(last=False)

    def warm(self, terms: list[str]) -> None:
        """Prefetch posting lists (e.g. the head of the query log)."""
        self._fetch(list(dict.fromkeys(terms)))

    # ------------------------------------------------------------- query
    def search(
        self,
        terms: list[str],
        top_k: int = 10,
        mode: str = "and",
        tf_mode: str = "true",
        k1: float = K1,
        b: float = B,
    ) -> list[dict]:
        """-> [{rank, doc_int, docid, score}] — rank-identical (and
        score-bit-identical) to operators.query.search."""
        uniq = list(dict.fromkeys(terms))
        entries = self._fetch(uniq)
        per_term = [
            (t, *entries[t]) for t in uniq if entries[t][0] > 0
        ]
        for t in uniq:
            if t in self._cache:
                self._cache.move_to_end(t, last=True)
        if not per_term:
            return []

        doc_parts, score_parts = [], []
        for _t, df, docids, tfs in per_term:
            # identical double expression tree to functions.bm25
            idf = np.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)
            tf = (
                np.float64(1.0)
                if tf_mode == "compat"
                else tfs.astype(np.float64)
            )
            dl = self._dl[docids]
            tfc = ((k1 + 1.0) * tf) / (
                k1 * (1.0 - b + b * (dl / self.avg_dl)) + tf
            )
            doc_parts.append(docids)
            score_parts.append(np.broadcast_to(idf * tfc, docids.shape))

        docs = np.concatenate(doc_parts)
        scores = np.concatenate(score_parts)
        # per-doc fold over ASCENDING term scores — the same
        # deterministic-FP sum as sort_array + aggregate in search_batch
        order = np.lexsort((scores, docs))
        docs, scores = docs[order], scores[order]
        uniq_docs, starts, counts = np.unique(
            docs, return_index=True, return_counts=True
        )
        sums = np.add.reduceat(scores, starts)
        if mode == "and":
            keep = counts == len(per_term)
            uniq_docs, sums = uniq_docs[keep], sums[keep]
        if uniq_docs.size == 0:
            return []
        k = min(top_k, uniq_docs.size)
        top = np.lexsort((uniq_docs, -sums))[:k]
        return [
            {
                "rank": i + 1,
                "doc_int": int(uniq_docs[j]),
                "docid": self._docids[int(uniq_docs[j])],
                "score": float(sums[j]),
            }
            for i, j in enumerate(top)
        ]

    def search_phrase(
        self,
        phrase: list[str],
        top_k: int = 10,
        tf_mode: str = "true",
        k1: float = K1,
        b: float = B,
    ) -> list[dict]:
        """Quoted-phrase top-k, rank- and score-identical to
        ``operators.phrase.phrase_search``. The adjacency test is the
        numpy mirror of the Spark path's array_intersect fold: per
        phrase slot i every (doc, position - i) pair is emitted, then
        one lexsort groups equal (doc, adjusted) keys — a key held by
        all m slots is a phrase start."""
        if not phrase:
            raise ValueError("empty phrase")
        uniq = list(dict.fromkeys(phrase))
        pos = self._fetch_positions(uniq)
        phrase_docs, n_occ = _phrase_match(phrase, pos)
        if phrase_docs.size == 0:
            return []

        # scoring: identical expression tree + ascending per-doc fold as
        # search() AND mode, restricted to the phrase docs (which by
        # construction contain every distinct term)
        parts = []
        for t in uniq:
            df, docids, tfs, _fp = pos[t]
            idf = np.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)
            tf = (
                np.float64(1.0)
                if tf_mode == "compat"
                else tfs[np.searchsorted(docids, phrase_docs)].astype(np.float64)
            )
            dl = self._dl[phrase_docs]
            tfc = ((k1 + 1.0) * tf) / (
                k1 * (1.0 - b + b * (dl / self.avg_dl)) + tf
            )
            parts.append(np.broadcast_to(idf * tfc, phrase_docs.shape))
        scores = np.sort(np.stack(parts), axis=0)
        sums = np.zeros(phrase_docs.size)
        for row in scores:
            sums = sums + row
        k = min(top_k, phrase_docs.size)
        top = np.lexsort((phrase_docs, -sums))[:k]
        return [
            {
                "rank": i + 1,
                "doc_int": int(phrase_docs[j]),
                "docid": self._docids[int(phrase_docs[j])],
                "score": float(sums[j]),
                "n_occurrences": int(n_occ[j]),
            }
            for i, j in enumerate(top)
        ]

    def search_boolean(
        self,
        query,
        top_k: int = 10,
        tf_mode: str = "true",
        k1: float = K1,
        b: float = B,
        analyze=None,
    ) -> list[dict]:
        """Boolean query (string or pre-parsed AST) served warm —
        rank-identical (scores equal to double rounding) to
        ``operators.boolsearch.boolean_search``. Same semantics: docs
        satisfying the expression over leaf memberships, scored as BM25
        over the positive terms they contain; negative-only queries
        rejected. Leaf memberships become numpy bool arrays over the
        candidate union, the AST folds into vectorized &/|/~, scoring
        reuses the ascending (doc, score) lexsort + reduceat fold of
        ``search()``."""
        from functools import reduce

        from .boolsearch import (
            And,
            Near,
            Not,
            Phrase,
            Term,
            _collect_patterns,
            _eval_const,
            _leaf_terms,
            _leaves,
            _positive_terms,
            expand_wildcards_local,
            parse_query,
        )

        node = parse_query(query, analyze) if isinstance(query, str) else query
        if _collect_patterns(node):
            # wildcard leaves: expand against a lazily-loaded in-memory
            # lexicon snapshot (term, df) — metadata-scale, Arrow bulk
            # load like the cold-start state; identical (df desc, term
            # asc) cap semantics to the Spark path's LIKE join
            if not hasattr(self, "_lex_terms"):
                tbl = self._index["lexicon"].select("term", "df").toArrow()
                self._lex_terms = tbl.column("term").to_pylist()
                self._lex_dfs = tbl.column("df").to_numpy(
                    zero_copy_only=False
                )
            node = expand_wildcards_local(
                node, self._lex_terms, self._lex_dfs
            )
        leaves = list(dict.fromkeys(_leaves(node)))
        ids = {leaf: i for i, leaf in enumerate(leaves)}
        if _eval_const(node, {i: False for i in ids.values()}, ids):
            raise ValueError(
                "query would match documents containing none of its terms "
                "(e.g. a bare or OR-ed NOT); add a positive clause"
            )
        positive = sorted(_positive_terms(node))
        phrase_terms = sorted(
            {
                t
                for l in leaves
                if isinstance(l, (Phrase, Near))
                for t in _leaf_terms(l)
            }
        )
        flat_terms = sorted(
            {l.term for l in leaves if isinstance(l, Term)}
            - set(phrase_terms)
        )
        # one positions job for phrase/proximity terms, one cached fetch
        # for the rest; positional-term (df, docids, tfs) reused for
        # scoring so no term is decoded twice
        pos = self._fetch_positions(phrase_terms) if phrase_terms else {}
        entries = {t: e[:3] for t, e in pos.items()}
        for t, e in self._fetch(flat_terms).items():
            entries[t] = e

        leaf_docs = []
        for leaf in leaves:
            if isinstance(leaf, Term):
                leaf_docs.append(
                    entries.get(leaf.term, (0, _EMPTY, _EMPTY))[1]
                )
            elif isinstance(leaf, Near):
                lo, hi = (
                    (1, leaf.slop) if leaf.ordered else (-leaf.slop, leaf.slop)
                )
                leaf_docs.append(_near_match(pos, leaf.a, leaf.b, lo, hi))
            else:
                leaf_docs.append(_phrase_match(list(leaf.terms), pos)[0])
        nonempty = [d for d in leaf_docs if d.size]
        if not nonempty:
            return []
        cand = np.unique(np.concatenate(nonempty))
        member = [_sorted_member(d, cand) for d in leaf_docs]

        def ev(n):
            if isinstance(n, (Term, Phrase, Near)):
                return member[ids[n]]
            if isinstance(n, Not):
                return ~ev(n.child)
            op = np.logical_and if isinstance(n, And) else np.logical_or
            return reduce(op, (ev(c) for c in n.children))

        matched = cand[ev(node)]
        if matched.size == 0:
            return []

        doc_parts, score_parts = [], []
        for t in positive:
            df, docids, tfs = entries.get(t, (0, _EMPTY, _EMPTY))
            if df == 0:
                continue
            idx = np.searchsorted(docids, matched)
            idx_c = np.minimum(idx, docids.size - 1)
            mask = docids[idx_c] == matched
            docs_t = matched[mask]
            idf = np.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)
            tf = (
                np.broadcast_to(np.float64(1.0), docs_t.shape)
                if tf_mode == "compat"
                else tfs[idx_c[mask]].astype(np.float64)
            )
            dl = self._dl[docs_t]
            tfc = ((k1 + 1.0) * tf) / (
                k1 * (1.0 - b + b * (dl / self.avg_dl)) + tf
            )
            doc_parts.append(docs_t)
            score_parts.append(idf * tfc)
        if not doc_parts:
            return []
        docs = np.concatenate(doc_parts)
        scores = np.concatenate(score_parts)
        order = np.lexsort((scores, docs))
        docs, scores = docs[order], scores[order]
        uniq_docs, starts = np.unique(docs, return_index=True)
        sums = np.add.reduceat(scores, starts)
        k = min(top_k, uniq_docs.size)
        top = np.lexsort((uniq_docs, -sums))[:k]
        return [
            {
                "rank": i + 1,
                "doc_int": int(uniq_docs[j]),
                "docid": self._docids[int(uniq_docs[j])],
                "score": float(sums[j]),
            }
            for i, j in enumerate(top)
        ]
