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
    atom    := '(' query ')' | [field ':'] '"' phrase '"'
             | [field ':'] '/' regex '/' | [field ':'] term

Terms containing ``*``/``?`` are wildcard leaves; ``/.../``-delimited
atoms are regex leaves (anchored full-term match, Lucene RegexpQuery).
Both expand against the index lexicon before evaluation (one shared
metadata-scale job, :func:`expand_wildcards`).

(keywords case-insensitive; quoted phrases use the positional index,
see operators/phrase.py) and an evaluator that compiles the AST into a
single Catalyst plan. A ``field:`` prefix (identifier-shaped, single
colon — ``std::x`` stays a term) scopes its atom to one field and is
evaluated by :func:`fielded_boolean_search` over per-field indexes with
BM25F scoring; the flat evaluators reject fielded atoms.

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
    field: str | None = None


@dataclass(frozen=True)
class Phrase:
    terms: tuple[str, ...]
    field: str | None = None


@dataclass(frozen=True)
class Near:
    """Proximity leaf: ``a NEAR/k b`` (unordered, |pos_b - pos_a| <= k)
    or ``a PRE/k b`` (ordered, 1 <= pos_b - pos_a <= k)."""

    a: str
    b: str
    slop: int
    ordered: bool = False
    field: str | None = None


@dataclass(frozen=True)
class Wildcard:
    """Multi-term leaf: ``te*`` / ``t?st`` (``*`` = any run, ``?`` = one
    char), or — with ``kind="regex"`` — a ``/regex/`` literal matched as
    a FULL anchored regular expression. Matched against INDEX terms
    (post-analysis, so patterns are not stemmed — Lucene's wildcard /
    RegexpQuery contract) and REWRITTEN before evaluation into an OR of
    the concrete matching terms (:func:`expand_wildcards`), capped at
    ``max_expansions`` by (df desc, term asc); zero matches become a
    never-present sentinel term, so ``x OR zzz*`` degrades to ``x`` and
    ``x AND NOT zzz*`` excludes nothing. Expanded terms score as
    ordinary OR terms (Lucene's SCORING_BOOLEAN_REWRITE). Regex
    patterns are taken verbatim (not lowercased, not analyzed) and must
    stay within the Java/Python/RE2 common syntax — the expansion runs
    JVM-side (``RLIKE``) on the Spark path and via ``re`` on the warm
    serving path, kept in agreement by the parser's up-front
    ``re.compile`` validation plus the parity pytest."""

    pattern: str
    field: str | None = None
    kind: str = "glob"


@dataclass(frozen=True)
class Not:
    child: "Node"


@dataclass(frozen=True)
class And:
    children: tuple["Node", ...]


@dataclass(frozen=True)
class Or:
    children: tuple["Node", ...]


Node = Term | Phrase | Near | Wildcard | Not | And | Or

_KEYWORDS = {"and": "AND", "or": "OR", "not": "NOT"}

# a field prefix is identifier-shaped; `std::foo`-style tokens (rest
# starts with another ':') are NOT field prefixes
_FIELD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _split_field(word: str) -> tuple[str | None, str]:
    """``title:foo`` -> ("title", "foo"); words without an
    identifier-shaped single-colon prefix pass through unsplit."""
    head, sep, rest = word.partition(":")
    if (
        sep
        and rest
        and not rest.startswith(":")
        and _FIELD_RE.fullmatch(head)
    ):
        return head, rest
    return None, word


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
            # field:"quoted phrase" — the quote stops the word scan, so
            # a trailing ':' followed by '"' is a field prefix on the
            # phrase that follows
            if (
                word.endswith(":")
                and j < n
                and q[j] == '"'
                and _FIELD_RE.fullmatch(word[:-1])
            ):
                toks.append(("FIELD", word[:-1]))
                i = j
                continue
            mprox = re.fullmatch(r"(near|pre)/(\d+)", word.lower())
            if mprox:
                toks.append(
                    ("NEAR", (int(mprox.group(2)), mprox.group(1) == "pre"))
                )
            else:
                toks.append((_KEYWORDS.get(word.lower(), "TERM"), word))
            i = j
    return toks


def _make_leaf(words: list[str], analyze, field: str | None) -> Node:
    terms = [t for w in words for t in analyze(w)]
    if not terms:
        raise ValueError(f"input {words!r} analyzes to no terms")
    return (
        Term(terms[0], field=field)
        if len(terms) == 1
        else Phrase(tuple(terms), field=field)
    )


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
        if kind == "FIELD":  # field:"quoted phrase"
            nkind, nval = take()
            if nkind != "PHRASE":
                raise ValueError(f"field prefix {val!r}: must precede a phrase")
            return _make_leaf(nval.split(), analyze, field=val)
        if kind == "PHRASE":
            return _make_leaf(val.split(), analyze, field=None)
        if kind == "TERM":
            field, word = _split_field(val)
            if len(word) >= 3 and word.startswith("/") and word.endswith("/"):
                pat = word[1:-1]
                try:
                    re.compile(pat)
                except re.error as e:
                    raise ValueError(f"invalid regex {pat!r}: {e}") from e
                return Wildcard(pat, field=field, kind="regex")
            if "*" in word or "?" in word:
                if not word.strip("*?"):
                    raise ValueError(
                        f"wildcard {word!r} has no literal characters"
                    )
                return Wildcard(word.lower(), field=field)
            return _make_leaf([word], analyze, field=field)
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
        fields = {left.field, right.field} - {None}
        if len(fields) > 1:
            raise ValueError(
                "NEAR/PRE operands must share one field, got "
                f"{left.field!r} and {right.field!r}"
            )
        return Near(
            left.term, right.term, slop, ordered,
            field=next(iter(fields), None),
        )

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


def _leaves(node: Node) -> list["Term | Phrase | Near | Wildcard"]:
    if isinstance(node, (Term, Phrase, Near, Wildcard)):
        return [node]
    if isinstance(node, Not):
        return _leaves(node.child)
    return [l for c in node.children for l in _leaves(c)]


# ------------------------------------------------------- wildcards

# sentinel for a wildcard with zero index matches: never in any lexicon
# (analyzers never emit NULs), so strict-boolean membership makes an
# AND on it fail and an OR fall through — exactly Lucene's empty
# MultiTermQuery rewrite.
_NOMATCH_TERM = "\x00nomatch\x00"


def _glob_to_like(pattern: str) -> str:
    """Glob (``*``/``?``) -> SQL LIKE (``%``/``_``), escaping LIKE's
    own metacharacters so they stay literal."""
    out = []
    for c in pattern:
        if c == "*":
            out.append("%")
        elif c == "?":
            out.append("_")
        elif c in ("%", "_", "\\"):
            out.append("\\" + c)
        else:
            out.append(c)
    return "".join(out)


def _glob_to_regex(pattern: str) -> "re.Pattern[str]":
    """Glob -> anchored regex with EXACTLY the LIKE translation's
    semantics: ``*``/``?`` are the only metacharacters; everything else
    (including ``[``, which fnmatch would treat as a class) is literal."""
    out = []
    for c in pattern:
        out.append(".*" if c == "*" else "." if c == "?" else re.escape(c))
    return re.compile("".join(out) + r"\Z")


def expand_wildcards_local(
    node: Node,
    terms,
    dfs,
    max_expansions: int = 64,
) -> Node:
    """Driver-local twin of :func:`expand_wildcards` for the warm
    serving path: expand against an in-memory (terms, dfs) lexicon
    snapshot instead of a Spark job. Same contract — top
    ``max_expansions`` matches by (df desc, term asc), zero matches
    become the never-present sentinel. ``terms``/``dfs`` are parallel
    sequences (numpy arrays or lists)."""
    pats = _collect_patterns(node)
    if not pats:
        return node
    mapping: dict[tuple[str, str | None, str], tuple[str, ...]] = {}
    for pat, field, kind in pats:
        rx = (
            re.compile("(?:" + pat + r")\Z")
            if kind == "regex"
            else _glob_to_regex(pat)
        )
        hits = [
            (-int(df), str(t))
            for t, df in zip(terms, dfs)
            if rx.match(str(t))
        ]
        hits.sort()
        mapping[(pat, field, kind)] = tuple(
            t for _, t in hits[:max_expansions]
        )
    return _rewrite_wildcards(node, mapping)


def _collect_patterns(node: Node) -> set[tuple[str, str | None, str]]:
    return {
        (l.pattern, l.field, l.kind)
        for l in _leaves(node)
        if isinstance(l, Wildcard)
    }


def _expand_map(
    lexicon_for,
    patterns: set[tuple[str, str | None, str]],
    max_expansions: int,
) -> dict[tuple[str, str | None, str], tuple[str, ...]]:
    """One lexicon job per distinct source lexicon: broadcast the
    pattern table, LIKE/RLIKE-join against (term, df), keep each
    pattern's top ``max_expansions`` terms by (df desc, term asc). The
    lexicon is index METADATA (orders of magnitude smaller than
    postings), and the rank window partitions by pattern over only that
    pattern's matches, bounded by the lexicon — the standard
    MultiTermQuery envelope; the cap keeps the rewritten query itself
    small. Glob and regex patterns share one pattern table and one
    join: each row carries its kind, a LIKE translation (globs) and an
    anchored regex (regex leaves), and the join predicate dispatches
    per row — still a single broadcast nested-loop over metadata."""
    by_lex: dict[int, tuple[DataFrame, list[tuple[str, str | None, str]]]] = {}
    for pat, field, kind in patterns:
        lex = lexicon_for(field)
        key = id(lex._jdf) if hasattr(lex, "_jdf") else id(lex)
        by_lex.setdefault(key, (lex, []))[1].append((pat, field, kind))
    out: dict[tuple[str, str | None, str], tuple[str, ...]] = {
        k: () for k in patterns
    }
    for lex, pats in by_lex.values():
        spark = lex.sparkSession
        pat_df = spark.createDataFrame(
            [
                (p, k, _glob_to_like(p) if k == "glob" else None,
                 "^(?:" + p + ")$" if k == "regex" else None)
                for p, k in dict.fromkeys((p, k) for p, _, k in pats)
            ],
            "pattern string, kind string, like_pat string, re_pat string",
        )
        w = Window.partitionBy("pattern", "kind").orderBy(
            F.desc("df"), F.asc("term")
        )
        rows = (
            lex.select("term", "df")
            .join(
                F.broadcast(pat_df),
                F.expr(
                    "(kind = 'glob' AND term LIKE like_pat) OR "
                    "(kind = 'regex' AND term RLIKE re_pat)"
                ),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= max_expansions)
            .select("pattern", "kind", "term", "rn")
            .collect()
        )
        got: dict[tuple[str, str], list[tuple[int, str]]] = {}
        for r in rows:
            got.setdefault((r["pattern"], r["kind"]), []).append(
                (r["rn"], r["term"])
            )
        for pat, field, kind in pats:
            out[(pat, field, kind)] = tuple(
                t for _, t in sorted(got.get((pat, kind), []))
            )
    return out


def _rewrite_wildcards(node: Node, mapping: dict) -> Node:
    if isinstance(node, Wildcard):
        terms = mapping[(node.pattern, node.field, node.kind)]
        if not terms:
            return Term(_NOMATCH_TERM, field=node.field)
        if len(terms) == 1:
            return Term(terms[0], field=node.field)
        return Or(tuple(Term(t, field=node.field) for t in terms))
    if isinstance(node, (Term, Phrase, Near)):
        return node
    if isinstance(node, Not):
        return Not(_rewrite_wildcards(node.child, mapping))
    kids = tuple(_rewrite_wildcards(c, mapping) for c in node.children)
    return And(kids) if isinstance(node, And) else Or(kids)


def expand_wildcards(
    node: Node,
    lexicon: DataFrame,
    max_expansions: int = 64,
) -> Node:
    """Rewrite every :class:`Wildcard` leaf into an OR of the concrete
    index terms matching its pattern (see Wildcard docstring for the
    cap / zero-match semantics). Returns the node unchanged when it has
    no wildcard leaves."""
    pats = _collect_patterns(node)
    if not pats:
        return node
    return _rewrite_wildcards(
        node, _expand_map(lambda _field: lexicon, pats, max_expansions)
    )


def _positive_terms(node: Node, neg: bool = False) -> set[str]:
    """Terms with at least one occurrence under an even number of NOTs."""
    if isinstance(node, Wildcard):
        raise ValueError(
            "unexpanded wildcard leaf — call expand_wildcards() first"
        )
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
    if isinstance(leaf, Wildcard):
        raise ValueError(
            "unexpanded wildcard leaf — call expand_wildcards() first"
        )
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


def boolean_match_docs(
    index: dict[str, DataFrame],
    query: str | Node,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    analyze=None,
    max_expansions: int = 64,
) -> DataFrame:
    """Scored FULL match set of a boolean query -> (doc_int, score)
    with NO rank window — the boolean analog of ``query.match_docs``.

    Because every match-set consumer (``search_facets``,
    ``search_collapse``, ``significant_terms``, the numeric aggs,
    ``search_after``/``search_sorted``) accepts a pre-computed match
    frame in place of its term list, this is the composition point:
    "facet counts for ``(spark OR merge) AND NOT join``" is
    ``search_facets(idx, boolean_match_docs(idx, q), ...)``. Same
    single-decode / single-doc_int-exchange plan as
    :func:`boolean_search`, which is this plus the distributed
    top-k tail.
    """
    node = parse_query(query, analyze) if isinstance(query, str) else query
    node = expand_wildcards(node, index["lexicon"], max_expansions)
    leaves = list(dict.fromkeys(_leaves(node)))
    ids = {leaf: i for i, leaf in enumerate(leaves)}
    if any(l.field for l in leaves):
        raise ValueError(
            "fielded atoms (field:term) need per-field indexes — use "
            "fielded_boolean_search(field_indexes, weights, ...)"
        )

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
    return matched_docs.select("doc_int", "score")


def boolean_search(
    index: dict[str, DataFrame],
    query: str | Node,
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    analyze=None,
    max_expansions: int = 64,
) -> DataFrame:
    """Evaluate a boolean query -> (rank, doc_int, docid, score).

    ``query`` is a raw string (parsed with :func:`parse_query`) or a
    pre-built AST node. See module docstring for match/score semantics
    and the single-decode / single-shuffle plan shape. Wildcard leaves
    (``te*`` / ``t?st``) are expanded against the lexicon up front
    (:func:`expand_wildcards`, one metadata-scale job), so the
    evaluator itself only ever sees concrete terms.

    :func:`boolean_match_docs` (the match set, no rank window) plus a
    distributed ``orderBy().limit(k)`` — only the k survivors see the
    rank-numbering window.
    """
    matched_docs = boolean_match_docs(
        index, query, tf_mode=tf_mode, k1=k1, b=b, analyze=analyze,
        max_expansions=max_expansions,
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
        .orderBy("rank")
    )


def boolean_search_batch(
    index: dict[str, DataFrame],
    queries: dict[int, str | Node],
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    analyze=None,
    max_expansions: int = 64,
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
    raw: dict[int, Node] = {
        qid: parse_query(q, analyze) if isinstance(q, str) else q
        for qid, q in queries.items()
    }
    # expand every query's wildcards with ONE shared lexicon job
    all_pats = set().union(*(_collect_patterns(n) for n in raw.values()))
    if all_pats:
        mapping = _expand_map(
            lambda _field: index["lexicon"], all_pats, max_expansions
        )
        raw = {
            qid: _rewrite_wildcards(n, mapping) for qid, n in raw.items()
        }
    parsed: dict[int, Node] = {}
    ids_per_q: dict[int, dict[Node, int]] = {}
    for qid, node in raw.items():
        leaves = list(dict.fromkeys(_leaves(node)))
        ids = {leaf: i for i, leaf in enumerate(leaves)}
        if any(l.field for l in leaves):
            raise ValueError(
                f"query {qid}: fielded atoms need fielded_boolean_search"
            )
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
        .orderBy("query_id", "rank")
    )


# ------------------------------------------------- fielded evaluation


def fielded_boolean_search(
    field_indexes: dict[str, dict[str, DataFrame]],
    weights: dict[str, float],
    query: str | Node,
    top_k: int | None = 10,
    k1: float = K1,
    b: float | dict[str, float] = B,
    analyze=None,
    max_expansions: int = 64,
) -> DataFrame:
    """Boolean queries over per-field indexes with BM25F scoring —
    ``title:foo AND body:"bar baz" NOT qux`` — the composition of the
    boolean language (this module) and the BM25F machinery
    (operators/bm25f.py). The reference parses fields and flattens them
    away (cleaner3.cpp:534-617 -> indexer4.cpp:99-118, quirk Q12); we
    kept them, so the two halves compose.

    Semantics:
    * Membership: a ``field:``-prefixed leaf must hold INSIDE that
      field (term present there; phrase adjacent there; NEAR within
      that field's positions — positional leaves always match within a
      single field, since per-field indexes number positions per
      field). An unprefixed leaf holds if it holds in ANY one field.
      The boolean expression gates membership exactly as
      :func:`boolean_search`.
    * Score: full BM25F over the query's positive terms — per-field tf
      normalized by its own field length, weighted, summed BEFORE
      saturation; idf from the candidate any-field document frequency —
      exactly :func:`~..bm25f.search_bm25f`'s formula (bit-parity
      pytest), regardless of which fields gate membership. Negative
      terms never score.

    Plan shape: per field ONE bucket-pruned decode (positions ride only
    if the query has positional leaves), per-row ``w_f·tf/B_f`` before
    the union, broadcast slot join, then ONE doc_int exchange serving
    all three aggregation levels (doc+leaf+field adjacency, doc+leaf
    any-field OR, doc leaf-set + score fold). The any-field df the idf
    needs is cross-document, so it cannot ride the doc-keyed exchange:
    it is ONE extra term-pruned job over the positive terms' blobs,
    returning |positive| rows to the driver — idf then enters the main
    plan as a constant-folded literal.

    ``top_k=None`` returns the FULL match set (doc_int, docid, score)
    with no rank window (the ``match_docs`` discipline).
    """
    node = parse_query(query, analyze) if isinstance(query, str) else query
    pats = _collect_patterns(node)
    if pats:
        unknown_p = sorted(
            {f for _, f in pats if f} - set(field_indexes)
        )
        if unknown_p:
            raise ValueError(
                f"unknown field(s) {unknown_p} in wildcard patterns"
            )
        # field-scoped patterns expand against that field's lexicon;
        # unprefixed ones against the any-field union (df summed across
        # fields so the expansion cap ranks by collection frequency)
        union_lex = None

        def _lexicon_for(field):
            nonlocal union_lex
            if field is not None:
                return field_indexes[field]["lexicon"]
            if union_lex is None:
                union_lex = reduce(
                    DataFrame.unionByName,
                    [
                        fi["lexicon"].select("term", "df")
                        for fi in field_indexes.values()
                    ],
                ).groupBy("term").agg(F.sum("df").alias("df"))
            return union_lex

        node = _rewrite_wildcards(
            node, _expand_map(_lexicon_for, pats, max_expansions)
        )
    leaves = list(dict.fromkeys(_leaves(node)))
    ids = {leaf: i for i, leaf in enumerate(leaves)}
    if _eval_const(node, {i: False for i in ids.values()}, ids):
        raise ValueError(
            "query would match documents containing none of its terms "
            "(e.g. a bare or OR-ed NOT); add a positive clause"
        )
    fields = sorted(field_indexes)
    if set(field_indexes) != set(weights):
        raise ValueError("weights must cover exactly the given fields")
    unknown = sorted({l.field for l in leaves if l.field} - set(fields))
    if unknown:
        raise ValueError(f"unknown field(s) {unknown}; have {fields}")

    positive = sorted(_positive_terms(node))
    all_terms = sorted({t for l in leaves for t in _leaf_terms(l)})
    has_positional = any(isinstance(l, (Phrase, Near)) for l in leaves)

    from .phrase import decode_postings_positions_df as _dec_pos
    from .query import decode_postings_df as _dec

    first = field_indexes[fields[0]]
    spark = first["postings"].sparkSession
    n_docs = int(first["collection_stats"].collect()[0]["n_docs"])
    stats = {
        f: field_indexes[f]["collection_stats"].collect()[0] for f in fields
    }
    for f in fields:
        if int(stats[f]["n_docs"]) != n_docs:
            raise ValueError(
                f"field index {f!r} covers {stats[f]['n_docs']} docs, "
                f"{fields[0]!r} covers {n_docs}: field indexes must be "
                "built over the same document set (doc_int parity)"
            )
    avgdl = {f: float(stats[f]["avg_dl"]) for f in fields}
    b_f = {f: (b[f] if isinstance(b, dict) else b) for f in fields}

    def _part(f: str, terms: list[str], positional: bool) -> DataFrame:
        idx = field_indexes[f]
        decode = _dec_pos if positional else _dec
        dec = exclude_tombstones(
            idx, decode(prune_buckets(idx, terms), terms)
        )
        dl = idx["doc_stats"].select("doc_int", F.col("doc_len").alias("dl"))
        return (
            dec.join(dl, "doc_int", "left")
            .withColumn("field", F.lit(f))
            .withColumn(
                "wtf",
                F.lit(float(weights[f]))
                * F.col("tf").cast("double")
                / (
                    F.lit(1.0 - b_f[f])
                    + F.lit(b_f[f])
                    * F.coalesce(
                        F.col("dl").cast("double"),
                        F.lit(float(int(avgdl[f]))),
                    )
                    / F.lit(avgdl[f])
                ),
            )
        )

    # any-field df per positive term: one term-pruned side job (see
    # docstring); tombstoned docs excluded, matching search_bm25f
    df_any: dict[str, int] = {}
    if positive:
        df_union = reduce(
            DataFrame.unionByName,
            [
                exclude_tombstones(
                    field_indexes[f],
                    _dec(prune_buckets(field_indexes[f], positive), positive),
                ).select("term", "doc_int")
                for f in fields
            ],
        )
        df_any = {
            r["term"]: r["n"]
            for r in df_union.groupBy("term")
            .agg(F.countDistinct("doc_int").alias("n"))
            .collect()
        }

    slot_rows = []
    for leaf, lid in ids.items():
        for row in _slot_rows(leaf, lid):
            slot_rows.append((*row, leaf.field))
    slots = spark.createDataFrame(
        slot_rows,
        "leaf_id long, idx long, term string, m long, lo long, hi long, "
        "sfield string",
    )

    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cand = (
        reduce(DataFrame.unionByName, [_part(f, all_terms, has_positional) for f in fields])
        .join(F.broadcast(slots), "term")
        # a slot row gates membership only in its own field; the
        # (term, field, wtf) triples for scoring flow from EVERY field
        .withColumn(
            "ok",
            F.col("sfield").isNull() | (F.col("sfield") == F.col("field")),
        )
        # the ONLY wide exchange: doc_int hash-clusters all three aggs
        .repartition(npart, "doc_int")
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
        items = F.sort_array(
            F.collect_list(F.when(F.col("ok"), F.struct("idx", "adj")))
        )
        starts = F.aggregate(
            F.expr("slice(items, 2, size(items) - 1)"),
            F.col("items")[0]["adj"],
            lambda acc, x: F.array_intersect(acc, x["adj"]),
        )
        g1 = (
            cand.groupBy("doc_int", "leaf_id", "field")
            .agg(
                F.count_distinct(F.when(F.col("ok"), F.col("idx"))).alias(
                    "n_slots"
                ),
                F.max("m").alias("m"),
                items.alias("items"),
                F.collect_set(F.struct("term", "field", "wtf")).alias("ts"),
            )
            .withColumn(
                "matched",
                (F.col("n_slots") == F.col("m"))
                & ((F.col("m") == 1) | (F.size(starts) > 0)),
            )
        )
    else:
        g1 = (
            cand.groupBy("doc_int", "leaf_id", "field")
            .agg(
                F.count_distinct(F.when(F.col("ok"), F.col("idx"))).alias(
                    "n_slots"
                ),
                F.max("m").alias("m"),
                F.collect_set(F.struct("term", "field", "wtf")).alias("ts"),
            )
            .withColumn("matched", F.col("n_slots") == F.col("m"))
        )
    g2 = g1.groupBy("doc_int", "leaf_id").agg(
        F.max("matched").alias("matched"),  # any-field OR per leaf
        F.array_distinct(F.flatten(F.collect_list("ts"))).alias("ts"),
    )
    per_doc = g2.groupBy("doc_int").agg(
        F.collect_set(F.when(F.col("matched"), F.col("leaf_id"))).alias(
            "present"
        ),
        F.array_distinct(F.flatten(F.collect_list("ts"))).alias("all_ts"),
    )
    gated = per_doc.filter(_compile(node, ids, F.col("present")))

    # BM25F score from the carried (term, field, wtf) triples: per
    # positive term an ascending-sorted wtf fold (bit-stable; equals a
    # 2-field SUM exactly), idf as a constant-folded JVM log over the
    # side-job df. Terms absent from a doc contribute an exact 0.0.
    tscores = []
    for t in positive:
        dfv = float(df_any.get(t, 0))
        tft = F.aggregate(
            F.sort_array(
                F.transform(
                    F.filter(F.col("all_ts"), lambda x: x["term"] == F.lit(t)),
                    lambda x: x["wtf"],
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        idf = F.log(
            (F.lit(float(n_docs)) - F.lit(dfv) + 0.5) / (F.lit(dfv) + 0.5)
            + 1.0
        )
        tscores.append(idf * tft / (F.lit(float(k1)) + tft))
    scored = gated.withColumn(
        "score",
        F.aggregate(
            F.sort_array(F.array(*tscores)), F.lit(0.0), lambda acc, x: acc + x
        )
        if tscores
        else F.lit(0.0),
    )
    if top_k is None:
        return scored.join(first["docid_map"], "doc_int").select(
            "doc_int", "docid", "score"
        )
    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    topk = (
        scored.orderBy(F.desc("score"), F.asc("doc_int"))
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
    )
    return (
        F.broadcast(topk)
        .join(first["docid_map"], "doc_int")
        .select("rank", "doc_int", "docid", "score")
        .orderBy("rank")
    )
