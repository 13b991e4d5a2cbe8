"""Boolean query language: parser + single-shuffle DataFrame evaluator.

The reference lists "No query parser yet" as a limitation and
"Implement Boolean search" on its roadmap (README.md:240-263); its
engine accepts only a flat term list with a fixed AND/OR mode
(Query-engine.hpp:275-374). This module closes that gap: a recursive-
descent parser for

    query   := or
    or      := and (OR and)*
    and     := not ((AND)? not)*          -- adjacency is implicit AND
    not     := NOT not | prox
    prox    := atom ((NEAR/k | PRE/k) atom)?   -- term operands only
    atom    := '(' query ')' | '"' phrase '"' | term

(keywords case-insensitive; quoted phrases use the positional index,
see operators/phrase.py) and an evaluator that compiles the AST into a
single Catalyst plan.

Semantics:
* A document MATCHES when the boolean expression holds over its leaf
  memberships — term leaf: the doc contains the term; phrase leaf: the
  doc contains the exact adjacent-in-order phrase. Queries that would
  match a document containing none of the query's terms (e.g. ``NOT x``
  alone, or ``a OR NOT b``) are rejected up front: evaluation is over
  the union of the leaves' posting lists, so an engine cannot enumerate
  the complement of the collection — the standard IR restriction.
* Matching docs SCORE as the BM25 sum over the distinct POSITIVE terms
  they contain (a term is positive when some occurrence in the AST sits
  under an even number of NOTs; phrase terms count). Negative-only
  terms gate membership but contribute no score — identical to how
  ``query.search`` AND/OR modes score their term sets, same
  deterministic ascending-sorted FP fold, same (score desc, doc_int
  asc) tiebreak. ``a AND b`` and ``a OR b`` are rank-identical to
  search(mode="and"/"or") by construction (pytest-asserted), EXCEPT
  that a term absent from the lexicon fails an AND here (strict
  boolean) where the reference skips it (Query-engine.hpp:320-326 —
  that compat behavior stays on ``search``).

Spark-first shape: ONE decode pass over the bucket-pruned postings scan
(positions ride along only when the query has a phrase leaf), then ONE
hash exchange on doc_int that serves BOTH aggregation levels — the
per-(doc, leaf) slot/adjacency agg and the per-doc leaf-set agg — since
HashPartitioning(doc_int) satisfies the clustered distribution of
(doc_int, leaf_id). The boolean expression itself becomes a pure-JVM
Column over ``array_contains(matched_leaves, id)``: no Python in the
filter, no per-leaf subquery joins, no N-way intersection shuffles. At
100 TB this is the ``search_batch`` plan with a richer residual filter.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.bm25 import K1, B, bm25_score
from .phrase import decode_postings_positions_df
from .query import (
    _stats,
    decode_postings_df,
    exclude_tombstones,
    prune_buckets,
)

# ------------------------------------------------------------------ AST


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Phrase:
    terms: tuple[str, ...]


@dataclass(frozen=True)
class Near:
    """Proximity leaf: ``a NEAR/k b`` (unordered, |pos_b - pos_a| <= k)
    or ``a PRE/k b`` (ordered, 1 <= pos_b - pos_a <= k)."""

    a: str
    b: str
    slop: int
    ordered: bool = False


@dataclass(frozen=True)
class Not:
    child: "Node"


@dataclass(frozen=True)
class And:
    children: tuple["Node", ...]


@dataclass(frozen=True)
class Or:
    children: tuple["Node", ...]


Node = Term | Phrase | Near | Not | And | Or

_KEYWORDS = {"and": "AND", "or": "OR", "not": "NOT"}


def _lex(q: str) -> list[tuple[str, str]]:
    """-> [(kind, value)]; kinds: LP RP AND OR NOT PHRASE TERM."""
    toks: list[tuple[str, str]] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c == "(":
            toks.append(("LP", c))
            i += 1
        elif c == ")":
            toks.append(("RP", c))
            i += 1
        elif c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise ValueError(f"unterminated quote at offset {i}")
            toks.append(("PHRASE", q[i + 1 : j]))
            i = j + 1
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in '()"':
                j += 1
            word = q[i:j]
            mprox = re.fullmatch(r"(near|pre)/(\d+)", word.lower())
            if mprox:
                toks.append(
                    ("NEAR", (int(mprox.group(2)), mprox.group(1) == "pre"))
                )
            else:
                toks.append((_KEYWORDS.get(word.lower(), "TERM"), word))
            i = j
    return toks


def parse_query(q: str, analyze=None) -> Node:
    """Parse a boolean query string into an AST.

    ``analyze`` maps a raw word to its index terms (list); default
    splits on single spaces and lowercases — the engine's "simple"
    analyzer (tokenizer.tokenize_simple semantics for single words).
    A word that analyzes to several terms becomes an implicit phrase
    (consistent with how search engines treat hyphenated input).
    """
    if analyze is None:
        analyze = lambda w: [t for t in w.lower().split(" ") if t]  # noqa: E731
    toks = _lex(q)
    pos = 0

    def peek():
        return toks[pos][0] if pos < len(toks) else None

    def take():
        nonlocal pos
        if pos >= len(toks):
            raise ValueError("unexpected end of query")
        t = toks[pos]
        pos += 1
        return t

    def p_atom() -> Node:
        kind, val = take()
        if kind == "LP":
            node = p_or()
            if peek() != "RP":
                raise ValueError("unbalanced parenthesis")
            take()
            return node
        if kind == "PHRASE":
            terms = [t for w in val.split() for t in analyze(w)]
            if not terms:
                raise ValueError("empty phrase")
            return Term(terms[0]) if len(terms) == 1 else Phrase(tuple(terms))
        if kind == "TERM":
            terms = analyze(val)
            if not terms:
                raise ValueError(f"word {val!r} analyzes to no terms")
            return Term(terms[0]) if len(terms) == 1 else Phrase(tuple(terms))
        raise ValueError(f"unexpected {val!r}")

    def p_prox() -> Node:
        left = p_atom()
        if peek() != "NEAR":
            return left
        _, (slop, ordered) = take()
        right = p_atom()
        for side in (left, right):
            if not isinstance(side, Term):
                raise ValueError(
                    "NEAR/PRE operands must be single terms, got "
                    f"{type(side).__name__}"
                )
        return Near(left.term, right.term, slop, ordered)

    def p_not() -> Node:
        if peek() == "NOT":
            take()
            return Not(p_not())
        return p_prox()

    def p_and() -> Node:
        children = [p_not()]
        while True:
            nxt = peek()
            if nxt == "AND":
                take()
                children.append(p_not())
            elif nxt in ("TERM", "PHRASE", "LP", "NOT"):
                children.append(p_not())  # implicit AND
            else:
                break
        return children[0] if len(children) == 1 else And(tuple(children))

    def p_or() -> Node:
        children = [p_and()]
        while peek() == "OR":
            take()
            children.append(p_and())
        return children[0] if len(children) == 1 else Or(tuple(children))

    if not toks:
        raise ValueError("empty query")
    node = p_or()
    if pos != len(toks):
        raise ValueError(f"trailing input from token {pos}: {toks[pos:]}")
    return node


# ------------------------------------------------------------ analysis


def _leaves(node: Node) -> list["Term | Phrase | Near"]:
    if isinstance(node, (Term, Phrase, Near)):
        return [node]
    if isinstance(node, Not):
        return _leaves(node.child)
    return [l for c in node.children for l in _leaves(c)]


def _positive_terms(node: Node, neg: bool = False) -> set[str]:
    """Terms with at least one occurrence under an even number of NOTs."""
    if isinstance(node, Term):
        return set() if neg else {node.term}
    if isinstance(node, Phrase):
        return set() if neg else set(node.terms)
    if isinstance(node, Near):
        return set() if neg else {node.a, node.b}
    if isinstance(node, Not):
        return _positive_terms(node.child, not neg)
    return set().union(*(_positive_terms(c, neg) for c in node.children))


def _eval_const(node: Node, truth: dict[int, bool], ids: dict[Node, int]) -> bool:
    if isinstance(node, (Term, Phrase, Near)):
        return truth[ids[node]]
    if isinstance(node, Not):
        return not _eval_const(node.child, truth, ids)
    vals = (_eval_const(c, truth, ids) for c in node.children)
    return all(vals) if isinstance(node, And) else any(vals)


def _compile(node: Node, ids: dict[Node, int], present: Column) -> Column:
    if isinstance(node, (Term, Phrase, Near)):
        return F.array_contains(present, F.lit(ids[node]))
    if isinstance(node, Not):
        return ~_compile(node.child, ids, present)
    cols = [_compile(c, ids, present) for c in node.children]
    op = (lambda a, b: a & b) if isinstance(node, And) else (lambda a, b: a | b)
    return reduce(op, cols)


def _leaf_terms(leaf) -> tuple[str, ...]:
    if isinstance(leaf, Phrase):
        return leaf.terms
    if isinstance(leaf, Near):
        return (leaf.a, leaf.b)
    return (leaf.term,)


def _slot_rows(leaf, lid: int) -> list[tuple]:
    """-> [(leaf_id, idx, term, m, lo, hi)]: per-slot token-position
    windows such that a multi-slot leaf matches a document iff the
    intersection of its slots' shifted-window position arrays is
    non-empty. Phrase slot i contributes {p - i} (survivors are the
    phrase start positions); NEAR/k expands the left term to
    [p - k, p + k] (PRE/k: [p + 1, p + k]) against the right term's
    raw positions — one mechanism covers adjacency and proximity."""
    if isinstance(leaf, Phrase):
        return [
            (lid, i, t, len(leaf.terms), -i, -i)
            for i, t in enumerate(leaf.terms)
        ]
    if isinstance(leaf, Near):
        lo, hi = (1, leaf.slop) if leaf.ordered else (-leaf.slop, leaf.slop)
        return [(lid, 0, leaf.a, 2, lo, hi), (lid, 1, leaf.b, 2, 0, 0)]
    return [(lid, 0, leaf.term, 1, 0, 0)]


# ----------------------------------------------------------- evaluator


def boolean_search(
    index: dict[str, DataFrame],
    query: str | Node,
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    analyze=None,
) -> DataFrame:
    """Evaluate a boolean query -> (rank, doc_int, docid, score).

    ``query`` is a raw string (parsed with :func:`parse_query`) or a
    pre-built AST node. See module docstring for match/score semantics
    and the single-decode / single-shuffle plan shape.
    """
    node = parse_query(query, analyze) if isinstance(query, str) else query
    leaves = list(dict.fromkeys(_leaves(node)))
    ids = {leaf: i for i, leaf in enumerate(leaves)}

    # reject queries satisfiable by a document containing no query term
    if _eval_const(node, {i: False for i in ids.values()}, ids):
        raise ValueError(
            "query would match documents containing none of its terms "
            "(e.g. a bare or OR-ed NOT); add a positive clause"
        )

    positive = sorted(_positive_terms(node))
    all_terms = sorted({t for l in leaves for t in _leaf_terms(l)})
    has_positional = any(isinstance(l, (Phrase, Near)) for l in leaves)
    n_docs, avg_dl = _stats(index)
    spark = index["postings"].sparkSession

    pruned = prune_buckets(index, all_terms)
    decoded = exclude_tombstones(
        index,
        decode_postings_positions_df(pruned, all_terms)
        if has_positional
        else decode_postings_df(pruned, all_terms),
    )

    # (leaf_id, slot idx, term, m, window): Term leaves are 1-slot leaves
    slot_rows = []
    for leaf, lid in ids.items():
        slot_rows += _slot_rows(leaf, lid)
    slots = spark.createDataFrame(
        slot_rows, "leaf_id long, idx long, term string, m long, lo long, hi long"
    )

    doc_stats = index["doc_stats"].select("doc_int", "doc_len")
    tf_eff = F.lit(1.0) if tf_mode == "compat" else F.col("tf").cast("double")
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cand = (
        decoded.join(F.broadcast(slots), "term")
        # the ONLY exchange: hash on doc_int co-locates every (doc, leaf)
        # group AND every doc group, so both groupBys below reuse it
        .repartition(npart, "doc_int")
        .join(doc_stats, "doc_int", "left")
        .withColumn(
            "dl",
            F.coalesce(F.col("doc_len"), F.floor(F.lit(avg_dl))).cast("double"),
        )
        .withColumn(
            "term_score",
            bm25_score(
                tf_eff, F.col("df"), F.col("dl"),
                F.lit(float(n_docs)), F.lit(avg_dl), k1, b,
            ),
        )
    )
    if has_positional:
        cand = cand.withColumn(
            "adj",
            F.flatten(
                F.transform(
                    "positions",
                    lambda p: F.sequence(p + F.col("lo"), p + F.col("hi")),
                )
            ),
        )
        items = F.sort_array(F.collect_list(F.struct("idx", "adj")))
        starts = F.aggregate(
            F.expr("slice(items, 2, size(items) - 1)"),
            F.col("items")[0]["adj"],
            lambda acc, x: F.array_intersect(acc, x["adj"]),
        )
        per_leaf = (
            cand.groupBy("doc_int", "leaf_id")
            .agg(
                F.count("*").alias("n_slots"),
                F.max("m").alias("m"),
                items.alias("items"),
                F.collect_set(F.struct("term", "term_score")).alias("ts"),
            )
            .withColumn(
                "matched",
                (F.col("n_slots") == F.col("m"))
                & ((F.col("m") == 1) | (F.size(starts) > 0)),
            )
        )
    else:
        per_leaf = cand.groupBy("doc_int", "leaf_id").agg(
            F.collect_set(F.struct("term", "term_score")).alias("ts"),
        ).withColumn("matched", F.lit(True))

    per_doc = per_leaf.groupBy("doc_int").agg(
        F.collect_set(F.when(F.col("matched"), F.col("leaf_id"))).alias(
            "present"
        ),
        F.array_distinct(F.flatten(F.collect_list("ts"))).alias("all_ts"),
    )
    pos_scores = F.filter(
        F.col("all_ts"), lambda x: x["term"].isin(positive) if positive else F.lit(False)
    )
    matched_docs = per_doc.filter(_compile(node, ids, F.col("present"))).withColumn(
        "score",
        F.aggregate(
            F.sort_array(F.transform(pos_scores, lambda x: x["term_score"])),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    topk = (
        matched_docs.orderBy(F.desc("score"), F.asc("doc_int"))
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
    )
    return (
        F.broadcast(topk)
        .join(index["docid_map"], "doc_int")
        .select("rank", "doc_int", "docid", "score")
    )


def boolean_search_batch(
    index: dict[str, DataFrame],
    queries: dict[int, str | Node],
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    analyze=None,
) -> DataFrame:
    """N boolean queries as ONE Spark job ->
    (query_id, rank, doc_int, docid, score).

    Same single-shuffle shape as ``phrase_search_batch``: the union of
    all queries' terms decodes once (with positions only if ANY query
    has a phrase leaf), candidates repartition by query_id so the
    per-(doc, leaf) agg, the per-doc agg and the per-query top-k window
    share one exchange. Each query's boolean expression and positive-
    term filter compile into per-query branches of ONE ``CASE query_id``
    Column — plan-time constants, so the whole filter stays in codegen.
    Per-query results are row-identical to ``boolean_search`` (pytest).
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    parsed: dict[int, Node] = {}
    ids_per_q: dict[int, dict[Node, int]] = {}
    for qid, q in queries.items():
        node = parse_query(q, analyze) if isinstance(q, str) else q
        leaves = list(dict.fromkeys(_leaves(node)))
        ids = {leaf: i for i, leaf in enumerate(leaves)}
        if _eval_const(node, {i: False for i in ids.values()}, ids):
            raise ValueError(
                f"query {qid} would match documents containing none of "
                "its terms; add a positive clause"
            )
        parsed[qid] = node
        ids_per_q[qid] = ids

    all_terms = sorted(
        {t for ids in ids_per_q.values() for l in ids for t in _leaf_terms(l)}
    )
    has_positional = any(
        isinstance(l, (Phrase, Near)) for ids in ids_per_q.values() for l in ids
    )
    n_docs, avg_dl = _stats(index)
    spark = index["postings"].sparkSession

    pruned = prune_buckets(index, all_terms)
    decoded = exclude_tombstones(
        index,
        decode_postings_positions_df(pruned, all_terms)
        if has_positional
        else decode_postings_df(pruned, all_terms),
    )

    slot_rows = []
    for qid, ids in ids_per_q.items():
        for leaf, lid in ids.items():
            slot_rows += [(qid, *row) for row in _slot_rows(leaf, lid)]
    slots = spark.createDataFrame(
        slot_rows,
        "query_id long, leaf_id long, idx long, term string, m long, "
        "lo long, hi long",
    )

    doc_stats = index["doc_stats"].select("doc_int", "doc_len")
    tf_eff = F.lit(1.0) if tf_mode == "compat" else F.col("tf").cast("double")
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cand = (
        decoded.join(F.broadcast(slots), "term")
        # the ONLY exchange: hash on query_id co-locates every
        # (query, doc, leaf) group, every (query, doc) group AND the
        # per-query top-k window partition
        .repartition(npart, "query_id")
        .join(doc_stats, "doc_int", "left")
        .withColumn(
            "dl",
            F.coalesce(F.col("doc_len"), F.floor(F.lit(avg_dl))).cast("double"),
        )
        .withColumn(
            "term_score",
            bm25_score(
                tf_eff, F.col("df"), F.col("dl"),
                F.lit(float(n_docs)), F.lit(avg_dl), k1, b,
            ),
        )
    )
    if has_positional:
        cand = cand.withColumn(
            "adj",
            F.flatten(
                F.transform(
                    "positions",
                    lambda p: F.sequence(p + F.col("lo"), p + F.col("hi")),
                )
            ),
        )
        items = F.sort_array(F.collect_list(F.struct("idx", "adj")))
        starts = F.aggregate(
            F.expr("slice(items, 2, size(items) - 1)"),
            F.col("items")[0]["adj"],
            lambda acc, x: F.array_intersect(acc, x["adj"]),
        )
        per_leaf = (
            cand.groupBy("query_id", "doc_int", "leaf_id")
            .agg(
                F.count("*").alias("n_slots"),
                F.max("m").alias("m"),
                items.alias("items"),
                F.collect_set(F.struct("term", "term_score")).alias("ts"),
            )
            .withColumn(
                "matched",
                (F.col("n_slots") == F.col("m"))
                & ((F.col("m") == 1) | (F.size(starts) > 0)),
            )
        )
    else:
        per_leaf = cand.groupBy("query_id", "doc_int", "leaf_id").agg(
            F.collect_set(F.struct("term", "term_score")).alias("ts"),
        ).withColumn("matched", F.lit(True))

    per_doc = per_leaf.groupBy("query_id", "doc_int").agg(
        F.collect_set(F.when(F.col("matched"), F.col("leaf_id"))).alias(
            "present"
        ),
        F.array_distinct(F.flatten(F.collect_list("ts"))).alias("all_ts"),
    )

    # one CASE query_id dispatch for the boolean filter...
    match_expr = F.lit(False)
    for qid, node in parsed.items():
        match_expr = F.when(
            F.col("query_id") == qid,
            _compile(node, ids_per_q[qid], F.col("present")),
        ).otherwise(match_expr)
    # ...and one for the per-query positive-term score filter
    # unreachable base (every row's query_id is in `parsed`), typed via all_ts
    pos_expr = F.filter(F.col("all_ts"), lambda x: F.lit(False))
    for qid, node in parsed.items():
        positive = sorted(_positive_terms(node))
        pos_expr = F.when(
            F.col("query_id") == qid,
            F.filter(
                F.col("all_ts"),
                lambda x: x["term"].isin(positive) if positive else F.lit(False),
            ),
        ).otherwise(pos_expr)

    matched_docs = per_doc.filter(match_expr).withColumn(
        "score",
        F.aggregate(
            F.sort_array(F.transform(pos_expr, lambda x: x["term_score"])),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_int"))
    topk = (
        matched_docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "rank", "doc_int", "score")
    )
    return (
        F.broadcast(topk)
        .join(index["docid_map"], "doc_int")
        .select("query_id", "rank", "doc_int", "docid", "score")
    )
