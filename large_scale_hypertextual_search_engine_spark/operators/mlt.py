"""More-Like-This: find documents similar to a source document.

Lucene's ``MoreLikeThis`` contract (queries/mlt): extract the source
document's most characteristic terms by tf·idf, build an OR query from
the top ``max_terms``, and rank the corpus against it — excluding the
source document itself. The reference engine has nothing comparable
(its query side accepts only user-typed term lists); MLT is the
standard "related documents / near-duplicate triage" surface a search
deployment needs, and for a training-data pipeline it doubles as a
cheap source-conditioned retrieval primitive.

Term selection uses the house smoothed idf — ``tf · ln((N + 1) /
(df + 1))``, identical to ``keywords.extract_keywords`` and the RM3
expander — with deterministic (weight desc, term asc) tie-break, so
the selected query is reproducible and oracle-expressible. df comes
from the INDEX lexicon (metadata, broadcast), tf from tokenizing just
the source document (a pushed-down single-doc scan of the corpus
table, not a postings decode: reading one doc's text is O(doc), while
discovering one doc's terms from an inverted index is O(index)).

Plan: single-doc scan -> explode/count (a few hundred rows) ->
broadcast lexicon join -> top-``max_terms`` collect (tiny, one
driver round-trip — same envelope as RM3's expansion collect) ->
``match_docs`` OR retrieval (fully distributed, no rank-window
funnel) -> drop the source doc -> distributed ``orderBy().limit(k)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.bm25 import K1, B, bm25_score
from .query import _stats, decode_postings_df, exclude_tombstones, match_docs

__all__ = ["mlt_terms", "more_like_this", "related_docs"]


def mlt_terms(
    index: dict[str, DataFrame],
    docs: DataFrame,
    docid: str,
    max_terms: int = 5,
    min_df: int = 2,
    text_col: str = "content",
    id_col: str = "docid",
) -> list[str]:
    """Top ``max_terms`` characteristic terms of ``docid`` by smoothed
    tf·idf (see module docstring). Terms must exist in the index
    lexicon with df >= ``min_df`` (default 2 — a df-1 term occurs in
    NO other document, so it can never contribute a hit beyond the
    excluded source; Lucene's minDocFreq guard). Tokenization is the engine's
    "simple" split-on-space (the mode the driver indexes use); pass a
    pre-analyzed text column for other analyzers."""
    n_docs, _ = _stats(index)
    tf = (
        docs.filter(F.col(id_col).cast("string") == str(docid))
        .select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
    )
    rows = (
        tf.join(
            F.broadcast(index["lexicon"].select("term", "df")), "term"
        )
        .filter(F.col("df") >= min_df)
        .withColumn(
            "weight",
            F.col("tf")
            * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)),
        )
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(max_terms)
        .collect()
    )
    if not rows:
        raise ValueError(
            f"doc {docid!r}: no indexable terms (missing doc, empty text, "
            f"or every term below min_df={min_df})"
        )
    return [r["term"] for r in rows]


def more_like_this(
    index: dict[str, DataFrame],
    docs: DataFrame,
    docid: str,
    top_k: int = 10,
    max_terms: int = 5,
    min_df: int = 2,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    text_col: str = "content",
    id_col: str = "docid",
    doc_filter: DataFrame | None = None,
    terms: list[str] | None = None,
) -> DataFrame:
    """Documents most similar to ``docid`` -> (rank, doc_int, docid,
    score): OR-mode BM25 over the source doc's top-``max_terms`` tf·idf
    terms, source doc excluded. Score semantics identical to
    ``search(terms, mode="or")`` (same fold, same tiebreak). Pass
    ``terms`` (e.g. from an earlier :func:`mlt_terms` call) to skip the
    selection job."""
    if terms is None:
        terms = mlt_terms(
            index, docs, docid,
            max_terms=max_terms, min_df=min_df,
            text_col=text_col, id_col=id_col,
        )
    per_doc = match_docs(
        index, terms, mode="or", tf_mode=tf_mode, k1=k1, b=b,
        doc_filter=doc_filter,
    )
    # exclude the source doc by doc_int (a broadcast 1-row anti-join
    # against the pushed-down docid_map filter) so the full docid_map
    # — corpus-sized at 10^12 docs — is never joined before the limit
    src = index["docid_map"].filter(
        F.col("docid") == str(docid)
    ).select("doc_int")
    per_doc = per_doc.join(F.broadcast(src), "doc_int", "anti")
    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    topk = (
        per_doc.orderBy(F.desc("score"), F.asc("doc_int"))
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w))
    )
    return (
        F.broadcast(topk)
        .join(index["docid_map"], "doc_int")
        .select("rank", "doc_int", "docid", "score")
        .orderBy("rank")
    )


def related_docs(
    index: dict[str, DataFrame],
    docs: DataFrame,
    top_k: int = 10,
    max_terms: int = 5,
    min_df: int = 2,
    max_df: int | None = None,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    text_col: str = "content",
    id_col: str = "docid",
) -> DataFrame:
    """Batch More-Like-This: for EVERY document in ``docs``, its
    ``top_k`` most similar other documents -> (src_docid, rank, docid,
    score). The corpus-scale "related documents / semantic near-dup
    triage" pipeline: one job, no driver-side term collect, no
    per-query loop — per-source results are identical to
    ``more_like_this`` called per doc (pytest-asserted).

    Plan (three wide exchanges, all key-distributed):
    1. term selection — one explode + per-(doc, term) count, a lexicon
       df join (metadata; Catalyst broadcasts when small), and a
       per-doc rank window (partitioned by doc — no funnel) keeping the
       top ``max_terms`` by the house smoothed tf·idf;
    2. candidate generation — postings are pruned by a SEMI-JOIN on the
       selected-term frame (the term set is data-scale here, so no
       driver isin list / bucket collect), decoded once, then joined to
       the query table by term;
    3. scoring — per-(source, candidate) BM25 fold and a per-source
       rank window, both clustered on the source key so one hash
       exchange serves both.

    ``max_df`` is the Lucene MLT ``maxDocFreq`` guard and the SCALE
    knob: a selected term contributes df(term) candidate rows per
    selecting source, so stopword-grade terms must be capped out —
    candidate volume is bounded by n_docs · max_terms · max_df.
    ``min_df`` (default 2) drops hapaxes, which can never produce a
    non-self hit. Self-matches are excluded by construction.
    """
    spark = index["postings"].sparkSession
    n_docs, avg_dl = _stats(index)

    lex = index["lexicon"].select("term", "df").filter(
        F.col("df") >= min_df
    )
    if max_df is not None:
        lex = lex.filter(F.col("df") <= max_df)

    tf = (
        docs.select(
            F.col(id_col).cast("string").alias("src_docid"),
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            ).alias("term"),
        )
        .groupBy("src_docid", "term")
        .agg(F.count("*").alias("qtf"))
    )
    wsel = Window.partitionBy("src_docid").orderBy(
        F.desc("weight"), F.asc("term")
    )
    queries = (
        tf.join(lex, "term")
        .withColumn(
            "weight",
            F.col("qtf")
            * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)),
        )
        .withColumn("rn", F.row_number().over(wsel))
        .filter(F.col("rn") <= max_terms)
        .select("src_docid", "term")
    )
    # source doc_int rides along for self-exclusion (join by docid is
    # the same key distribution the docid_map is already stored under)
    queries = queries.join(
        index["docid_map"].select(
            F.col("docid").alias("src_docid"),
            F.col("doc_int").alias("src_doc_int"),
        ),
        "src_docid",
    )

    # decode pruned by SEMI-JOIN (term set is data, not driver state)
    sel_terms = queries.select("term").distinct()
    decoded = exclude_tombstones(
        index,
        decode_postings_df(index["postings"].join(sel_terms, "term", "semi")),
    )

    # per-(term, doc) BM25 term score computed BEFORE the query join:
    # the score depends only on (tf, df, dl), so evaluating it on the
    # |selected terms' postings| decoded rows instead of after the
    # |sources x terms x df| explosion does ~|sources|x less arithmetic
    # and lets every exploded row carry ONE double instead of
    # (term, tf, df, dl). Values are bit-identical — same expression,
    # same float64 inputs, evaluated earlier in the plan.
    doc_stats = index["doc_stats"].select("doc_int", "doc_len")
    tf_eff = F.lit(1.0) if tf_mode == "compat" else F.col("tf").cast("double")
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    scored = (
        # fan the decoded rows out before the broadcast query join: the
        # pruned postings scan packs into a couple of tasks, and the
        # candidate explosion + shuffle write would otherwise run
        # 2-wide on 32 cores (guide §2.5). Pinned round-robin; the
        # decoded frame is small (Σ df of the selected terms).
        decoded.repartition(npart)
        .join(doc_stats, "doc_int", "left")
        .withColumn(
            "dl",
            F.coalesce(F.col("doc_len"), F.floor(F.lit(avg_dl))).cast(
                "double"
            ),
        )
        .select(
            "term",
            "doc_int",
            bm25_score(
                tf_eff, F.col("df"), F.col("dl"),
                F.lit(float(n_docs)), F.lit(avg_dl), k1, b,
            ).alias("term_score"),
        )
    )
    # explosion join + per-pair fold, keyed by the SOURCE's dense int
    # (8 bytes through the one wide exchange instead of the docid
    # string); src_docid is re-attached to the tiny top-k at the end
    cand = (
        scored.join(queries.select("src_doc_int", "term"), "term")
        .filter(F.col("doc_int") != F.col("src_doc_int"))
        .select("src_doc_int", "doc_int", "term_score")
        .repartition(npart, "src_doc_int")
    )
    per_pair = cand.groupBy("src_doc_int", "doc_int").agg(
        F.aggregate(
            F.sort_array(F.collect_list("term_score")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score")
    )
    wtop = Window.partitionBy("src_doc_int").orderBy(
        F.desc("score"), F.asc("doc_int")
    )
    topk = (
        per_pair.withColumn("rank", F.row_number().over(wtop))
        .filter(F.col("rank") <= top_k)
    )
    with_src = F.broadcast(topk).join(
        index["docid_map"].select(
            F.col("doc_int").alias("src_doc_int"),
            F.col("docid").alias("src_docid"),
        ),
        "src_doc_int",
    )
    return (
        F.broadcast(with_src)
        .join(index["docid_map"], "doc_int")
        .select(
            "src_docid", F.col("rank").cast("int").alias("rank"),
            "docid", "score",
        )
        .orderBy("src_docid", "rank")
    )
