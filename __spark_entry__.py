"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises engine operators from SURVEY.md §2
over the driver testdata; ``oracle_sql()`` holds the DuckDB-equivalent
ANSI SQL. Tokenization for the full-text queries is the SQL-mirrorable
"simple" mode (split on single space) so both engines tokenize
identically; the reference-exact compat analyzer is covered by the
golden-fixture pytest suite instead (tests/test_analyzer_golden.py).

Floating-point policy: both sides sort by EXACT doubles (identical
formulas, identical operand order) and round only in the projection
(6 dp); monetary aggregates go through scaled-integer sums so they are
bit-exact across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_INDEX_CACHE: dict[str, dict] = {}


def _oracle_path(kind: str, sf_dir: str | None = None) -> str:
    """Per-SF scratch path for stored-artifact oracle entries.

    The path is derived from sf_dir (md5 suffix), so two harness runs at
    DIFFERENT SFs can never overwrite each other's artifacts (round-3
    ADVICE: the old fixed /tmp paths raced). A query function passes its
    sf_dir, which also records the path for oracle_sql() — the oracle
    SQL is generated at call time and references whichever SF ran last
    in this process (the documented contract: the Spark query executes
    first, then its oracle, side by side). Defaults to the driver's
    sf0.01 when no query has run yet."""
    import hashlib

    if sf_dir is not None:
        _ORACLE_PATHS[kind] = (
            f"/tmp/lshse_oracle_{kind}_"
            f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
        )
    return _ORACLE_PATHS[kind]


_ORACLE_PATHS: dict[str, str] = {}
for _kind in (
    "minhash_sigs", "simhash", "ivf", "ivf_centroids", "ivfpq",
    "ivfpq_centroids", "dup_pairs", "merge_a", "merge_b", "merge_out",
):
    _oracle_path(_kind, "/root/testdata/sf0.01")

K1, B = 1.5, 0.75
QUALITY_STOPWORDS = ("the", "and", "of", "a", "is", "in", "to")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"),
        F.col("text").alias("content"),
    )


_LM_CACHE: dict = {}


def _lm(spark: SparkSession, sf_dir: str) -> dict:
    """Bigram model for the documents table, trained once per sf_dir
    (four registry rows consume it) with the count tables cached."""
    lm = _LM_CACHE.get(sf_dir)
    if lm is not None:
        return lm
    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        train_bigram_lm,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"),
        F.col("text").alias("content"),
    )
    lm = train_bigram_lm(docs)
    for k in ("unigrams", "bigrams", "vocab"):
        lm[k] = lm[k].cache()
    _LM_CACHE[sf_dir] = lm
    return lm


def _index(spark: SparkSession, sf_dir: str) -> dict:
    idx = _INDEX_CACHE.get(sf_dir)
    if idx is not None:
        return idx
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        build_index,
    )

    idx = build_index(
        _docs(spark, sf_dir), mode="simple", stem=False, salt_buckets=2
    )
    for k in ("doc_stats", "postings", "lexicon", "docid_map", "collection_stats"):
        idx[k] = idx[k].cache()
    _INDEX_CACHE[sf_dir] = idx
    return idx


def _bm25(spark, sf_dir, terms, mode, tf_mode, k=10):
    from large_scale_hypertextual_search_engine_spark.operators.query import search

    res = search(_index(spark, sf_dir), terms, top_k=k, mode=mode, tf_mode=tf_mode)
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


# ---------------------------------------------------------------- queries

def q_ft_lexicon_stats(spark, sf_dir):
    lex = _index(spark, sf_dir)["lexicon"]
    return (
        lex.select("term", "df", "tf")
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(100)
    )


def q_ft_doc_stats(spark, sf_dir):
    return _index(spark, sf_dir)["doc_stats"].select(
        "docid", F.col("doc_len").cast("long").alias("doc_len")
    )


def q_ft_collection_stats(spark, sf_dir):
    return _index(spark, sf_dir)["collection_stats"].select(
        "n_docs", F.round("avg_dl", 6).alias("avg_dl")
    )


def q_ft_docid_map(spark, sf_dir):
    return _index(spark, sf_dir)["docid_map"].select("docid", "doc_int")


def q_ft_bm25_single(spark, sf_dir):
    return _bm25(spark, sf_dir, ["spark"], "and", "true")


def q_ft_bm25_and(spark, sf_dir):
    return _bm25(spark, sf_dir, ["spark", "join"], "and", "true")


def q_ft_bm25_and_compat(spark, sf_dir):
    return _bm25(spark, sf_dir, ["spark", "join"], "and", "compat")


def q_ft_bm25_or(spark, sf_dir):
    return _bm25(spark, sf_dir, ["merge", "window"], "or", "true")


def q_ft_msm(spark, sf_dir):
    """OR retrieval with Lucene minimumNumberShouldMatch=2 over three
    terms: docs matching >= 2 distinct query terms — one codegen filter
    on the n_matched count the per-doc aggregation already produces."""
    from large_scale_hypertextual_search_engine_spark.operators.query import search

    res = search(
        _index(spark, sf_dir), ["merge", "window", "spark"], top_k=10,
        mode="or", tf_mode="true", min_should_match=2,
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


_TIERS_CACHE: dict = {}


def q_ft_tiered(spark, sf_dir):
    """Tiered retrieval (doc-quality tiers + MaxScore certificate):
    the corpus splits into a 20% high-prior tier (prior = n_chars) and
    the rest; the query runs on tier 1 under GLOBAL stats and consults
    tier 2 only when the metadata bound beats the k-th score. Either
    branch is bit-identical to the flat index, so the oracle is the
    plain BM25 SQL over all documents."""
    from large_scale_hypertextual_search_engine_spark.operators.tiered import (
        build_tiered, tiered_search,
    )

    tiers = _TIERS_CACHE.get(sf_dir)
    if tiers is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").cast("string").alias("docid"),
            F.col("text").alias("content"),
            F.col("n_chars").cast("double").alias("prior"),
        )
        tiers = build_tiered(
            docs, "prior", frac=0.2, mode="simple", stem=False,
            salt_buckets=2,
        )
        _TIERS_CACHE[sf_dir] = tiers
    res, _info = tiered_search(
        tiers, ["merge", "window"], top_k=10, mode="or", tf_mode="true"
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_ft_bm25_wand(spark, sf_dir):
    """Block-Max WAND, sharded serving path — rank-identical to exact OR
    top-k by construction, so it shares the ft_bm25_or oracle SQL."""
    from large_scale_hypertextual_search_engine_spark.operators.wand import (
        wand_search,
    )

    res = wand_search(
        _index(spark, sf_dir), ["merge", "window"], top_k=10,
        tf_mode="true", n_shards=4,
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_ft_phrase(spark, sf_dir):
    """Positional phrase query "fast key": docs where the two tokens are
    adjacent in order, scored like AND BM25 over the matching docs, plus
    the phrase occurrence count. Exercises the position lists the
    reference encodes but never reads (README.md:251-263 roadmap)."""
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        phrase_search,
    )

    res = phrase_search(
        _index(spark, sf_dir), ["fast", "key"], top_k=10, tf_mode="true"
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
    )


def q_ft_proximity(spark, sf_dir):
    """NEAR/4 proximity query (fast, key): docs where the two tokens
    fall within 4 positions (unordered), AND-mode BM25 scoring plus the
    minimum qualifying distance. Complements ft_phrase: same positional
    decode, distance filter instead of adjacency."""
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        proximity_search,
    )

    res = proximity_search(
        _index(spark, sf_dir), "fast", "key", slop=4, top_k=10, tf_mode="true"
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
        F.col("min_dist").cast("long").alias("min_dist"),
    )


def q_ft_boolean(spark, sf_dir):
    """Boolean query language: "(spark OR merge) AND NOT join" — docs
    containing spark or merge but not join, scored as BM25 over the
    positive terms present. The reference lists boolean search as
    roadmap (README.md:240-263); this is the parser + single-shuffle
    evaluator closing that gap."""
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_search,
    )

    res = boolean_search(
        _index(spark, sf_dir), "(spark OR merge) AND NOT join", top_k=10
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_ft_boolean_near(spark, sf_dir):
    """Boolean query with an ORDERED proximity leaf:
    "fast PRE/4 key AND NOT merge" — docs where some occurrence of
    "key" follows "fast" within 4 positions and "merge" is absent,
    scored as BM25 over the positive terms {fast, key}. Exercises the
    NEAR/PRE windowed-intersection slot encoding in the boolean
    evaluator (unordered NEAR is oracle-covered by ft_proximity)."""
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_search,
    )

    res = boolean_search(
        _index(spark, sf_dir), "fast PRE/4 key AND NOT merge", top_k=10
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_ft_wildcard(spark, sf_dir):
    """Wildcard boolean query: "s* AND NOT join" — the glob leaf is
    expanded against the index lexicon (Lucene MultiTermQuery contract,
    boolsearch.expand_wildcards) into an OR of the concrete matching
    terms, then evaluated by the ordinary single-shuffle boolean plan.
    The oracle computes the same membership with SQL LIKE (exact while
    the pattern's match count stays under max_expansions)."""
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_search,
    )

    res = boolean_search(
        _index(spark, sf_dir), "s* AND NOT join", top_k=10
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_ft_regexp(spark, sf_dir):
    """Regexp boolean query: "/s.*/ AND NOT join" — the /regex/ leaf is
    expanded against the index lexicon (Lucene RegexpQuery contract:
    anchored full-term match) by the same one-job LIKE/RLIKE pattern
    join the glob leaves use, then evaluated by the ordinary
    single-shuffle boolean plan. The oracle computes membership with
    DuckDB regexp_full_match (exact while the match count stays under
    max_expansions)."""
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_search,
    )

    res = boolean_search(
        _index(spark, sf_dir), "/s.*/ AND NOT join", top_k=10
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_ft_synonyms(spark, sf_dir):
    """Synonym-group retrieval (Lucene SynonymQuery): groups
    [[spark, merge], [join]] score as two pseudo-terms — per-doc tf
    summed across group members, df = MAX member df (index metadata),
    AND across groups. One decode, one doc_int exchange for both agg
    levels, distributed top-k."""
    from large_scale_hypertextual_search_engine_spark.operators.synonyms import (
        search_synonyms,
    )

    res = search_synonyms(
        _index(spark, sf_dir), [["spark", "merge"], ["join"]],
        top_k=10, mode="and",
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_ft_mlt(spark, sf_dir):
    """More-Like-This: top-5 tf·idf terms of the lowest-doc_id document
    -> OR BM25 retrieval excluding the source doc (Lucene MoreLikeThis
    contract). Term selection and scoring both oracle-expressible: the
    same smoothed idf as keywords_tfidf, the same BM25 as ft_bm25_or."""
    from large_scale_hypertextual_search_engine_spark.operators.mlt import (
        more_like_this,
    )

    docs = _docs(spark, sf_dir)
    src = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.min("doc_id").cast("string"))
        .first()[0]
    )
    res = more_like_this(
        _index(spark, sf_dir), docs, src, top_k=10, max_terms=5
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_ft_related(spark, sf_dir):
    """Batch More-Like-This over the whole documents table: for every
    doc, its top-3 related docs by OR BM25 over the doc's top-3 tf·idf
    terms (self excluded). One job — no per-source loop, postings
    pruned by a term semi-join, per-source rank windows."""
    from large_scale_hypertextual_search_engine_spark.operators.mlt import (
        related_docs,
    )

    res = related_docs(
        _index(spark, sf_dir), _docs(spark, sf_dir), top_k=3, max_terms=3
    )
    return res.select(
        "src_docid", F.col("rank").cast("int").alias("rank"),
        "docid", F.round("score", 6).alias("score"),
    )


def q_ft_explain(spark, sf_dir):
    """Per-term BM25 breakdown (Lucene explain contract) for the top-5
    of the ft_bm25_and query: one row per (hit, matched term) carrying
    tf / df / doc_len and the idf × tf-saturation factorization whose
    sum reproduces the hit's score."""
    from large_scale_hypertextual_search_engine_spark.operators.explain import (
        explain_scores,
    )

    res = explain_scores(
        _index(spark, sf_dir), ["spark", "join"], top_k=5, mode="and"
    )
    return res.select(
        F.col("rank").cast("int").alias("rank"),
        "docid",
        F.round("score", 6).alias("score"),
        "term",
        "tf", "df",
        F.col("doc_len").cast("double").alias("doc_len"),
        F.round("idf", 6).alias("idf"),
        F.round("tf_comp", 6).alias("tf_comp"),
        F.round("term_score", 6).alias("term_score"),
    )


def q_ft_facets(spark, sf_dir):
    """Faceted search: lang/source value counts over the FULL match set
    of the ft_bm25_and query (spark AND join) — N facet dimensions in
    ONE aggregation shuffle via explode(array(struct))."""
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        search_facets,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"), "lang", "source"
    )
    return search_facets(
        _index(spark, sf_dir), ["spark", "join"], docs,
        ["lang", "source"], mode="and", top_n=5,
    )


def q_ft_collapse(spark, sf_dir):
    """Field collapse (Lucene grouping / Solr group=true): top-2 hits
    per lang over the ft_bm25_and match set, groups ranked by their
    best hit — heads via a skew-immune max(struct) aggregate, the
    within-group window only over the k surviving groups."""
    from large_scale_hypertextual_search_engine_spark.operators.collapse import (
        search_collapse,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"), "lang"
    )
    res = search_collapse(
        _index(spark, sf_dir), ["spark", "join"], docs, "lang",
        top_k=5, group_top_n=2, mode="and",
    )
    return res.select(
        "group_value", "group_rank", "docid", "hit_rank",
        F.round("score", 6).alias("score"),
    )


def q_ft_search_after(spark, sf_dir):
    """Keyset deep pagination (Elasticsearch search_after): page 2 of
    the ft_bm25_or ranking via a (score, doc_int) cursor filter +
    TakeOrderedAndProject — page N never sorts more than the
    post-cursor remainder, and no OFFSET materializes pages 1..N-1."""
    from large_scale_hypertextual_search_engine_spark.operators.pagination import (
        search_after,
    )

    idx = _index(spark, sf_dir)
    page1 = search_after(
        idx, ["merge", "window"], page_size=10, mode="or"
    ).collect()
    cursor = (page1[-1]["score"], page1[-1]["doc_int"])
    res = search_after(
        idx, ["merge", "window"], cursor=cursor, page_size=10, mode="or"
    )
    return res.select(
        "rank", "docid", F.round("score", 6).alias("score")
    )


def q_ft_sorted(spark, sf_dir):
    """Field-sorted retrieval: the ft_bm25_and match set ordered by the
    n_chars metadata column (desc, relevance tiebreak) — one
    doc_int-keyed metadata join, the sort a distributed
    TakeOrderedAndProject, never a full-order window."""
    from large_scale_hypertextual_search_engine_spark.operators.pagination import (
        search_sorted,
    )

    meta = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"), "n_chars"
    )
    res = search_sorted(
        _index(spark, sf_dir), ["spark", "join"], meta, "n_chars",
        ascending=False, top_k=10, mode="and",
    )
    return res.select(
        "rank", "docid",
        F.col("sort_value").cast("bigint").alias("sort_value"),
        F.round("score", 6).alias("score"),
    )


def q_ft_sigterms(spark, sf_dir):
    """Significant terms (Elasticsearch significant_terms, Dunning G²):
    terms over-represented in the ft_bm25_and match set vs the corpus —
    candidates pruned on lexicon df metadata BEFORE any posting decode,
    one fg join + map-side-combining agg, G² as pure codegen."""
    from large_scale_hypertextual_search_engine_spark.operators.sigterms import (
        significant_terms,
    )

    res = significant_terms(
        _index(spark, sf_dir), ["spark", "join"], top_n=10, min_df=2,
        max_df_frac=0.5, mode="and",
    )
    return res.select(
        "term",
        F.col("fg_count").cast("bigint").alias("fg_count"),
        F.col("bg_count").cast("bigint").alias("bg_count"),
        F.round("score", 6).alias("score"),
    )


def q_ft_histogram(spark, sf_dir):
    """Numeric histogram facet (Elasticsearch histogram agg): n_chars
    distribution of the ft_bm25_and match set at interval 250 — one
    map-side-combining aggregation, codegen bucketing."""
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        histogram_facet,
    )

    meta = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"), "n_chars"
    )
    res = histogram_facet(
        _index(spark, sf_dir), ["spark", "join"], meta, "n_chars", 250,
        mode="and",
    )
    return res.select(
        F.col("bucket_start").cast("double").alias("bucket_start"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
    )


def q_ft_range_facet(spark, sf_dir):
    """Range facet (Elasticsearch range agg): fixed half-open n_chars
    report over the ft_bm25_and match set, zero-filled tails."""
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        range_facet,
    )

    meta = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"), "n_chars"
    )
    res = range_facet(
        _index(spark, sf_dir), ["spark", "join"], meta, "n_chars",
        [0.0, 400.0, 800.0], mode="and",
    )
    # open ends as the ES-style "*" key (NULL bounds would break the
    # driver's mixed-type row sort)
    return res.select(
        F.concat(
            F.coalesce(F.col("range_lo").cast("string"), F.lit("*")),
            F.lit(".."),
            F.coalesce(F.col("range_hi").cast("string"), F.lit("*")),
        ).alias("range_key"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
    )


def q_ltr_features(spark, sf_dir):
    """LTR feature export: the full (query, doc) candidate feature
    block for a 2-query batch — one decode, one query_id exchange, the
    bm25 feature bit-identical to serving scores."""
    from large_scale_hypertextual_search_engine_spark.operators.ltr import (
        ltr_features,
    )

    qdf = spark.createDataFrame(
        [(1, "spark"), (1, "join"), (2, "merge"), (2, "window"),
         (2, "zzz_oov")],
        "query_id long, term string",
    )
    res = ltr_features(_index(spark, sf_dir), qdf)
    return res.select(
        "query_id", "docid",
        F.round("bm25", 6).alias("bm25"),
        F.round("bm25_max", 6).alias("bm25_max"),
        F.round("bm25_min", 6).alias("bm25_min"),
        F.col("tf_sum").cast("bigint").alias("tf_sum"),
        F.round("idf_sum", 6).alias("idf_sum"),
        F.col("n_matched").cast("bigint").alias("n_matched"),
        F.col("n_terms").cast("bigint").alias("n_terms"),
        F.round("match_ratio", 6).alias("match_ratio"),
        F.col("doc_len").cast("double").alias("doc_len"),
    )


def q_ft_stats_facet(spark, sf_dir):
    """Extended-stats agg (Elasticsearch stats): one global aggregate
    row over the match set's n_chars — six scalars per partition cross
    the wire, nothing else."""
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        stats_facet,
    )

    meta = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"), "n_chars"
    )
    res = stats_facet(
        _index(spark, sf_dir), ["spark", "join"], meta, "n_chars",
        mode="and",
    )
    return res.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("min").cast("double").alias("min"),
        F.col("max").cast("double").alias("max"),
        F.round("sum", 6).alias("sum"),
        F.round("avg", 6).alias("avg"),
        F.round("std", 6).alias("std"),
    )


def q_ft_facets_boolean(spark, sf_dir):
    """Composition: facet counts over a BOOLEAN query's match set —
    boolean_match_docs feeds search_facets directly (every match-set
    consumer accepts a pre-computed match frame)."""
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_match_docs,
    )
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        search_facets,
    )

    idx = _index(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"), "lang"
    )
    return search_facets(
        idx, boolean_match_docs(idx, "(merge OR spark) AND NOT join"),
        docs, ["lang"], top_n=5,
    )


def q_ft_termvectors(spark, sf_dir):
    """Term vectors (Lucene TermVectors / ES _termvectors): forward
    (doc, term, tf, positions) triples for a 1-in-97 doc slice — one
    narrow Arrow analyze pass, no shuffle."""
    from large_scale_hypertextual_search_engine_spark.operators.termvectors import (
        term_vectors,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 97 == 0)
        .select(
            F.col("doc_id").cast("string").alias("docid"),
            F.col("text").alias("content"),
        )
    )
    res = term_vectors(docs)
    return res.select(
        "docid", "term",
        F.col("tf").cast("bigint").alias("tf"),
        F.expr("transform(positions, x -> cast(x as bigint))").alias(
            "positions"
        ),
        F.col("doc_len").cast("bigint").alias("doc_len"),
    )


def q_lm_quality(spark, sf_dir):
    """Bigram-LM quality scoring (the CCNet perplexity-proxy filter):
    train add-1 bigram counts on the corpus, score a 1-in-11 doc slice
    by mean log P(w2|w1) — counts are two aggregations, scoring one
    bigram-keyed join, all codegen."""
    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        score_docs_lm,
        train_bigram_lm,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"),
        F.col("text").alias("content"),
    )
    lm = _lm(spark, sf_dir)
    target = docs.filter(F.col("docid").cast("long") % 11 == 0)
    res = score_docs_lm(target, lm, k=1.0)
    return res.select(
        "docid",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.round("avg_logprob", 6).alias("avg_logprob"),
    )


def q_ft_suggest(spark, sf_dir):
    """Context-aware did-you-mean: OOV terms of 'fast sprak jion'
    corrected by bigram-LM fit with their neighbors (noisy-channel,
    Kernighan et al. 1990) — one lexicon scan, model joins by key."""
    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        suggest_context,
        train_bigram_lm,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"),
        F.col("text").alias("content"),
    )
    lm = _lm(spark, sf_dir)
    res = suggest_context(
        _index(spark, sf_dir), lm, ["fast", "sprak", "jion"], max_dist=2,
    )
    return res.select(
        "pos", "word", "suggestion", "dist",
        F.round("score", 6).alias("score"),
    )


def q_lm_complete(spark, sf_dir):
    """Next-word completion: top continuations of '... spark' under
    the corpus bigram model — one metadata-scale filter plus
    TakeOrderedAndProject, no corpus scan."""
    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        complete_next,
        train_bigram_lm,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"),
        F.col("text").alias("content"),
    )
    lm = _lm(spark, sf_dir)
    res = complete_next(lm, "tune the spark", top_n=10)
    return res.select(
        "word", F.col("c").cast("bigint").alias("c"),
        F.round("prob", 6).alias("prob"),
    )


def q_ngram_counts(spark, sf_dir):
    """Corpus trigram counts (LM training-data prep): codegen window
    transform, no self-join, one count aggregation; min_count prunes
    the tail inside the agg."""
    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        ngram_counts,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"),
        F.col("text").alias("content"),
    )
    res = ngram_counts(docs, 3, min_count=3)
    return res.select("gram", F.col("c").cast("bigint").alias("c"))


def q_ft_cardinality(spark, sf_dir):
    """Cardinality agg: distinct n_chars values the ft_bm25_and match
    set touches (exact path; the HLL variant is the 100 TB default)."""
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        cardinality_facet,
    )

    meta = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"), "n_chars"
    )
    res = cardinality_facet(
        _index(spark, sf_dir), ["spark", "join"], meta, "n_chars",
        mode="and",
    )
    return res.select(F.col("n_distinct").cast("bigint").alias("n_distinct"))


def q_ft_percentiles(spark, sf_dir):
    """Percentiles agg: interpolated n_chars quantiles of the
    ft_bm25_and match set (exact path; percentile_approx is the
    100 TB default)."""
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        percentiles_facet,
    )

    meta = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"), "n_chars"
    )
    res = percentiles_facet(
        _index(spark, sf_dir), ["spark", "join"], meta, "n_chars",
        percentiles=[0.25, 0.5, 0.75, 0.95], mode="and",
    )
    return res.select("p", F.round("value", 6).alias("value"))


def q_lm_select(spark, sf_dir):
    """CCNet head cut: keep the best 30% of the corpus by bigram-LM
    avg_logprob — exact interpolated quantile threshold (a scalar
    aggregate, not a corpus sort) applied as a codegen filter."""
    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        select_by_quality,
        train_bigram_lm,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"),
        F.col("text").alias("content"),
    )
    lm = _lm(spark, sf_dir)
    res = select_by_quality(docs, lm, keep_frac=0.3)
    return res.select(
        "docid",
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.round("avg_logprob", 6).alias("avg_logprob"),
        "keep",
    )


def q_ft_ql(spark, sf_dir):
    """Dirichlet query-likelihood ranking (Zhai & Lafferty 2001,
    mu=2000): the standard LM alternative to BM25, over the same
    decoded candidates — absent-term mass folded into a per-query
    constant so only present rows are touched."""
    from large_scale_hypertextual_search_engine_spark.operators.ranking import (
        search_ql,
    )

    res = search_ql(_index(spark, sf_dir), ["spark", "join"], top_k=10,
                    mu=2000.0)
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_ft_hybrid(spark, sf_dir):
    """Hybrid lexical+dense retrieval via reciprocal-rank fusion
    (Cormack et al. 2009, k=60): BM25 OR top-50 fused with brute-cosine
    top-50 over the embeddings table — the standard combiner because
    only RANKS cross the fusion, never the incomparable score scales."""
    from large_scale_hypertextual_search_engine_spark.operators.ranking import (
        hybrid_search,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    res = hybrid_search(
        _index(spark, sf_dir), emb, ["spark", "join"], qvec,
        top_k=10, depth=50, k_rrf=60,
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"), "rrf",
        F.col("bm25_rank").cast("int").alias("bm25_rank"),
        F.col("cos_rank").cast("int").alias("cos_rank"),
    )


def q_ft_rm3(spark, sf_dir):
    """Pseudo-relevance feedback (RM3/Rocchio): AND top-10 of
    (spark, join) feeds back its top-2 tf·idf-weighted new terms, the
    expanded query re-runs in OR mode — a real implementation of the
    SemanticExpander the reference declares but never defines (Q13)."""
    from large_scale_hypertextual_search_engine_spark.operators.feedback import (
        search_rm3,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("docid"),
        F.col("text").alias("content"),
    )
    res, _expanded = search_rm3(
        _index(spark, sf_dir), docs, ["spark", "join"], top_k=10,
        fb_k=10, max_expansions=2,
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_keywords(spark, sf_dir):
    """TF-IDF keyword extraction: top-3 terms per document by smoothed
    tf·idf (tf · ln((N+1)/(df+1))) — the doc-tagging staple of corpus
    curation. Pure Column pipeline, two aggregates + one window."""
    from large_scale_hypertextual_search_engine_spark.operators.keywords import (
        extract_keywords,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract_keywords(docs, "text", "doc_id", top_n=3).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "term", F.col("tf").cast("long").alias("tf"), "tfidf", "rank",
    )


def q_collocations(spark, sf_dir):
    """PMI collocation mining over adjacent bigrams (min_count=5,
    top-50 by rounded PMI): surfaces the multiword units worth indexing
    or filtering. Marginals counted over bigram slots, so the measure
    is the exact bigram-table PMI."""
    from large_scale_hypertextual_search_engine_spark.operators.keywords import (
        collocations,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return collocations(docs, "text", min_count=5, top_n=50).select(
        "term_a", "term_b", F.col("n_pair").cast("long").alias("n_pair"),
        "pmi",
    )


_BM25F_CACHE: dict[str, dict] = {}


def _field_indexes(spark, sf_dir):
    """Two per-field indexes (title = first 8 tokens, body = rest) over
    the same document set — BM25F's scale-right layout: each field is
    an ordinary index built by the unchanged builder."""
    got = _BM25F_CACHE.get(sf_dir)
    if got is not None:
        return got
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        build_index,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("toks", F.filter(F.split("text", " "), lambda x: x != ""))
        .select(
            F.col("doc_id").cast("string").alias("docid"),
            F.array_join(F.slice("toks", 1, 8), " ").alias("title"),
            F.array_join(
                F.expr("slice(toks, 9, greatest(size(toks) - 8, 1))"), " "
            ).alias("body"),
        )
    )
    idxs = {
        f: build_index(
            docs.select("docid", F.col(f).alias("content")),
            mode="simple", stem=False, salt_buckets=2,
        )
        for f in ("title", "body")
    }
    _BM25F_CACHE[sf_dir] = idxs
    return idxs


def q_ft_bm25f(spark, sf_dir):
    """BM25F fielded retrieval (title weight 2, body 1): per-field tf
    normalized by its own field length, weighted and summed BEFORE
    saturation (Robertson & Zaragoza 2004). Full AND match set, no
    rank, so the row set is tie-break-proof."""
    from large_scale_hypertextual_search_engine_spark.operators.bm25f import (
        search_bm25f,
    )

    res = search_bm25f(
        _field_indexes(spark, sf_dir), {"title": 2.0, "body": 1.0},
        ["spark", "join"], top_k=2**31 - 1, mode="and",
    )
    return res.select("docid", F.round("score", 6).alias("score"))


def q_ft_phrase_wand(spark, sf_dir):
    """Two-phase positional retrieval (r5): the SAME phrase query as
    ft_phrase answered by the Block-Max WAND + in-kernel positional
    verify path (wand_phrase_search) — candidates pruned by the AND
    upper bound, positions decoded only for aligned docs. Checked
    against the identical DuckDB oracle as the exact path, proving the
    pruning is exact, not approximate."""
    from large_scale_hypertextual_search_engine_spark.operators.wand import (
        wand_phrase_search,
    )

    res = wand_phrase_search(
        _index(spark, sf_dir), ["fast", "key"], top_k=10, tf_mode="true"
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
    )


def q_ft_proximity_wand(spark, sf_dir):
    """Two-phase NEAR/4 via wand_proximity_search, same oracle as the
    exact ft_proximity path."""
    from large_scale_hypertextual_search_engine_spark.operators.wand import (
        wand_proximity_search,
    )

    res = wand_proximity_search(
        _index(spark, sf_dir), "fast", "key", slop=4, top_k=10,
        tf_mode="true",
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
        F.col("min_dist").cast("long").alias("min_dist"),
    )


def q_ft_boolean_fielded(spark, sf_dir):
    """Fielded boolean query with BM25F scoring: membership gates per
    field (spark in title AND merge anywhere NOT join in title), score
    is the ft_bm25f formula over the positive terms. Full match set
    (top_k=None), so the row set is tie-break-proof."""
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        fielded_boolean_search,
    )

    res = fielded_boolean_search(
        _field_indexes(spark, sf_dir), {"title": 2.0, "body": 1.0},
        "title:spark AND merge NOT title:join", top_k=None,
    )
    return res.select("docid", F.round("score", 6).alias("score"))


def q_ft_merged(spark, sf_dir):
    """Index merge equivalence, oracle-checked end-to-end: the corpus
    splits in two (by docid STRING order, so merged doc_int order
    equals a fresh build's), each half builds its own on-disk index,
    ``merge_indexes`` combines them, and BM25 over the merged index
    must reproduce the plain full-corpus SQL — the FULL match set, no
    top-k, so the row set is tie-break-proof. Half-builds resume via
    the lineage fingerprints; only the merge reruns per call."""
    import shutil

    from large_scale_hypertextual_search_engine_spark.operators.merge_index import (
        merge_indexes,
    )
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search,
    )
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "cast(doc_id as string) as docid", "text as content"
    )
    da = _oracle_path("merge_a", sf_dir)
    db = _oracle_path("merge_b", sf_dir)
    do = _oracle_path("merge_out", sf_dir)
    build_and_save_index(
        docs.filter(F.col("docid") < "3"), da, "oracle-merge-a",
        mode="simple", stem=False,
    )
    build_and_save_index(
        docs.filter(F.col("docid") >= "3"), db, "oracle-merge-b",
        mode="simple", stem=False,
    )
    shutil.rmtree(do, ignore_errors=True)
    merged = merge_indexes(spark, da, db, do)
    res = search(merged, ["spark", "join"], top_k=2**31 - 1, mode="and")
    return res.select("docid", F.round("score", 6).alias("score"))


def q_pagerank(spark, sf_dir):
    """PageRank over a deterministic synthetic link graph derived from
    the documents table (doc_id % 5 == 0 are dangling; everyone else
    links to three affine-mod neighbors). 6 damped iterations with
    dangling-mass redistribution; DuckDB oracle unrolls the same six
    iterations as CTE stages. Ordered by ROUNDED rank so the top-50 cut
    is FP-robust across engines."""
    from large_scale_hypertextual_search_engine_spark.operators.linkrank import (
        pagerank,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()
    src = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("src")
    )
    parts = [
        src.select("src", ((F.col("src") * a + c) % n).alias("dst"))
        for a, c in ((7, 1), (13, 3), (31, 11))
    ]
    edges = parts[0].union(parts[1]).union(parts[2]).filter(
        F.col("src") != F.col("dst")
    )
    r = pagerank(edges, n_iter=6)
    return (
        r.select(
            F.col("id").cast("long").alias("id"),
            F.round("rank", 9).alias("rank"),
        )
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(50)
    )


def q_hits(spark, sf_dir):
    """Kleinberg HITS over the same synthetic link graph as
    q_pagerank: 6 iterations, L2-normalized after every half-step;
    DuckDB oracle unrolls the identical half-steps as CTE stages.
    Ordered by ROUNDED authority so the top-50 cut is FP-robust."""
    from large_scale_hypertextual_search_engine_spark.operators.linkrank import (
        hits,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()
    src = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("src")
    )
    parts = [
        src.select("src", ((F.col("src") * a + c) % n).alias("dst"))
        for a, c in ((7, 1), (13, 3), (31, 11))
    ]
    edges = parts[0].union(parts[1]).union(parts[2]).filter(
        F.col("src") != F.col("dst")
    )
    r = hits(edges, n_iter=6)
    return (
        r.select(
            F.col("id").cast("long").alias("id"),
            F.round("authority", 9).alias("authority"),
            F.round("hub", 9).alias("hub"),
        )
        .orderBy(F.desc("authority"), F.asc("id"))
        .limit(50)
    )


def q_ft_fuzzy(spark, sf_dir):
    """Fuzzy term lookup ("did you mean"): lexicon terms within 2 edits
    of the typo "sprak", ranked (dist asc, tf desc, term asc). Pure
    JVM: length-difference prune pushed to the lexicon scan, codegen
    threshold-bounded levenshtein — no Python in the plan (plan-
    asserted in tests/test_fuzzy.py)."""
    from large_scale_hypertextual_search_engine_spark.operators.fuzzy import (
        fuzzy_candidates,
    )

    return fuzzy_candidates(_index(spark, sf_dir), "sprak", max_dist=2, top_n=5)


def q_ft_bm25_deleted(spark, sf_dir):
    """Tombstoned retrieval: the ft_bm25_and query against an index
    where doc_id % 7 == 0 has been DELETED (operators/deletes.py).
    Pre-compaction semantics (Lucene-style): deleted docs are hidden
    from membership immediately, collection stats (df, n_docs, avg_dl)
    stay global — so surviving docs keep their scores and the oracle is
    the filtered-retrieval SQL with the complement predicate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = dict(_index(spark, sf_dir))
    idx["tombstones"] = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(F.col("doc_id").cast("string").alias("docid"))
        .join(idx["docid_map"], "docid")
        .select("doc_int", "docid")
    )
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search,
    )

    res = search(idx, ["spark", "join"], top_k=10, mode="and", tf_mode="true")
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_ft_bm25_filtered(spark, sf_dir):
    """Filtered retrieval: the ft_bm25_and query restricted to the
    doc_id % 3 == 0 corpus slice. Global collection stats (df, n_docs,
    avg_dl) — surviving docs keep their unfiltered scores, membership
    and ranks change."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flt = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").cast("string").alias("docid")
    )
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search,
    )

    res = search(
        _index(spark, sf_dir), ["spark", "join"], top_k=10, mode="and",
        tf_mode="true", doc_filter=flt,
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_boolean_batch(spark, sf_dir):
    """boolean_search_batch: N boolean queries as one single-shuffle
    job; per-query results row-identical to boolean_search."""
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_search_batch,
    )

    qs = {1: "(spark OR merge) AND NOT join", 2: "spark AND join"}
    res = boolean_search_batch(_index(spark, sf_dir), qs, top_k=10)
    return res.select(
        F.col("query_id").cast("int").alias("query_id"),
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
    )


def q_ft_snippets(spark, sf_dir):
    """BM25 AND top-10 for (spark, join) with best-window snippets:
    the 10-token window of each hit maximizing distinct query terms
    (earliest on ties), pure-JVM higher-order expressions over the
    broadcast-joined hit docs. The reference returns bare docids
    (Query-engine.hpp:275-374); this is the result-presentation half
    of its web-interface roadmap item."""
    from large_scale_hypertextual_search_engine_spark.operators.snippet import (
        search_snippets,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = search_snippets(
        _index(spark, sf_dir), docs, ["spark", "join"],
        top_k=10, window=10, mode="and", tf_mode="true",
    )
    return res.select(
        "docid", F.col("rank").cast("int").alias("rank"),
        F.round("score", 6).alias("score"),
        F.col("n_hits").cast("int").alias("n_hits"),
        "snippet",
    )


def q_autocomplete_batch(spark, sf_dir):
    """suggest_many: per-length hash equi-joins, one job for N prefixes."""
    from large_scale_hypertextual_search_engine_spark.operators.autocomplete import (
        suggest_many,
    )

    prefixes = spark.createDataFrame(
        [("s",), ("re",), ("con",)], "prefix string"
    )
    out = suggest_many(
        _index(spark, sf_dir)["lexicon"], prefixes, max_suggestions=5
    )
    return out.select("prefix", F.col("rank").cast("int").alias("rank"), "term", "tf")


def q_ft_autocomplete(spark, sf_dir):
    from large_scale_hypertextual_search_engine_spark.operators.autocomplete import (
        suggest,
    )

    return suggest(_index(spark, sf_dir)["lexicon"], "s", max_suggestions=10)


def q_dedup_exact(spark, sf_dir):
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        exact_duplicates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        exact_duplicates(docs, "text", "doc_id", min_group_size=1)
        .orderBy(F.desc("n_docs"), F.asc("digest"))
        .limit(100)
        .select("digest", "n_docs", "keep_id")
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 500
    )
    # max_gram_df=None: the DuckDB oracle computes UNCAPPED Jaccard, so
    # the capped default must not silently diverge at larger SFs; the
    # df-capped scale path is exercised by test_ngram_hot_shingle_cap
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.2, max_gram_df=None
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs, exact all-pairs baseline (the
    oracle-checkable path; the LSH-banded variant is pytest-verified
    for recall against this)."""
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        embedding_cosine_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 500
    )
    pairs = embedding_cosine_pairs(
        emb, "embedding", "vec_id", threshold=0.4, method="exact"
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q_ann_cosine_topk(spark, sf_dir):
    from large_scale_hypertextual_search_engine_spark.operators.similarity import (
        cosine_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    top = cosine_topk(emb, qvec, k=10, vec_col="embedding", id_col="vec_id")
    w = Window.orderBy(F.desc("score"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "vec_id", "rank", F.round("score", 6).alias("score")
    )


_PQ_CACHE: dict = {}


def q_ann_pq(spark, sf_dir):
    """Product-quantization ANN (Jégou et al. 2011): vectors stored as
    m=8 one-byte codes (32x compression), scored via ADC lookup-table
    gather, ADC top-100 exactly re-ranked against the float vectors.
    Approximate by contract — no SQL oracle; recall vs the exact scan
    and the ADC==reconstruction identity are pytest-asserted
    (tests/test_pq.py), and this entry's rows-only check pins the
    deterministic (seeded) end-to-end path."""
    from large_scale_hypertextual_search_engine_spark.operators.pq import (
        pq_encode, pq_search, pq_train,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cached = _PQ_CACHE.get(sf_dir)
    if cached is None:
        cb = pq_train(emb, m=8, k=256, sample=5000, seed=7)
        codes = pq_encode(emb, cb)
        cached = _PQ_CACHE[sf_dir] = (cb, codes)
    cb, codes = cached
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    res = pq_search(
        codes, cb, qvec, top_k=10, refine_with=emb, refine=100
    )
    w = Window.orderBy(F.desc("score"), F.asc("vec_id"))
    return res.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("vec_id", "rank", F.round("score", 6).alias("score"))


def q_decontam_report(spark, sf_dir):
    """Benchmark decontamination (Brown et al. 2020 App. C shape):
    8-gram overlap of every corpus doc against a deterministic
    'benchmark' slice (doc_id % 37 == 0). Corpus grams are pure-codegen
    expressions hashed to int64 before a broadcast join against the
    benchmark gram set; output volume = contaminated docs only."""
    from large_scale_hypertextual_search_engine_spark.operators.decontam import (
        contamination_report,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    return contamination_report(docs, bench, n=8).orderBy("doc_id")


def q_select_budget(spark, sf_dir):
    """Token-budget corpus selection: the greedy best-quality prefix
    (distinct_ratio DESC, doc_id ASC) whose cumulative whitespace-token
    count fits 10,000 tokens — computed as a distributed prefix-sum
    (range partition + per-partition offsets), never a single global
    ORDER BY window."""
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        select_by_token_budget,
    )
    from large_scale_hypertextual_search_engine_spark.operators.textstats import (
        quality_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    scored = quality_features(docs, "text", QUALITY_STOPWORDS).select(
        "doc_id", "n_tokens", "distinct_ratio"
    )
    sel = select_by_token_budget(
        scored, budget=10_000, score_col="distinct_ratio",
        token_col="n_tokens", id_col="doc_id",
    )
    return sel.select(
        "doc_id", "n_tokens", "cum_tokens",
        F.round("distinct_ratio", 6).alias("score"),
    ).orderBy("doc_id")


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-language Bernoulli sample (md5-prefix
    threshold): en 1.0, de 0.5, fr 0.25, zh 0.1, everything else (es)
    at the 0.05 default — the reproducible training-mixture primitive;
    the same rows survive on every run and in the DuckDB oracle."""
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        sample_stratified,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    return (
        sample_stratified(
            docs, {"en": 1.0, "de": 0.5, "fr": 0.25, "zh": 0.1},
            group_col="lang", id_col="doc_id", default_rate=0.05,
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def q_pack_sequences(spark, sf_dir):
    """GPT-style concat-and-chunk sequence packing: whitespace-token
    stream in doc_id order cut into 512-token training sequences; one
    row per (doc, sequence it contributes to). Distributed prefix-sum
    (range exchange + P driver offsets + narrow span kernel) — never a
    one-task global ORDER BY window."""
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        pack_sequences,
    )
    from large_scale_hypertextual_search_engine_spark.operators.textstats import (
        token_count,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(docs, seq_len=512).orderBy("doc_id", "seq_id")


def q_token_counts(spark, sf_dir):
    """Whitespace + BPE-ish pretokenizer token counts per doc — the
    training-data budgeting primitives, both pure codegen expressions."""
    from large_scale_hypertextual_search_engine_spark.operators.textstats import (
        bpe_token_count, token_count,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


def q_text_quality(spark, sf_dir):
    from large_scale_hypertextual_search_engine_spark.operators.textstats import (
        quality_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality_features(docs, "text", QUALITY_STOPWORDS).select(
        F.col("doc_id"),
        F.col("n_tokens"),
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("distinct_ratio", 6).alias("distinct_ratio"),
    )


def q_lang_id(spark, sf_dir):
    from large_scale_hypertextual_search_engine_spark.operators.textstats import (
        language_id,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return language_id(docs, "text").select(
        "doc_id", "lang_guess", "lang_guess_hits"
    )


def q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.to_date("l_shipdate") <= F.lit("1998-09-02")
    )
    qi = F.round("l_quantity", 0).cast("long")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dc = F.round(F.col("l_discount") * 100, 0).cast("long")
    tc = F.round(F.col("l_tax") * 100, 0).cast("long")
    return (
        li.select(
            "l_returnflag", "l_linestatus",
            qi.alias("qi"), pc.alias("pc"), dc.alias("dc"), tc.alias("tc"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qi").alias("sum_qty"),
            (F.sum("pc") / 100.0).alias("sum_base_price"),
            (F.sum(F.col("pc") * (100 - F.col("dc"))) / 10000.0).alias("sum_disc_price"),
            (
                F.sum(F.col("pc") * (100 - F.col("dc")) * (100 + F.col("tc")))
                / 1000000.0
            ).alias("sum_charge"),
            (F.sum("qi") / F.count("*")).alias("avg_qty"),
            (F.sum("pc") / 100.0 / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_tpch_q3(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.to_date("o_orderdate") < F.lit("1995-03-15")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.to_date("l_shipdate") > F.lit("1995-03-15")
    )
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dc = F.round(F.col("l_discount") * 100, 0).cast("long")
    j = (
        li.withColumn("rev_i", pc * (100 - dc))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        j.groupBy("o_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "o_orderpriority")
        .agg(F.sum("rev_i").alias("rev_i"))
        .orderBy(F.desc("rev_i"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey", "o_orderdate", "o_orderpriority",
            (F.col("rev_i") / 10000.0).alias("revenue"),
        )
    )


def q_tpch_q5(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dc = F.round(F.col("l_discount") * 100, 0).cast("long")
    j = (
        li.withColumn("rev_i", pc * (100 - dc))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        j.groupBy("r_name", "n_name")
        .agg((F.sum("rev_i") / 10000.0).alias("revenue"), F.count("*").alias("n_items"))
    )


def q_window_top_order(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def q_events_daily(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    vi = F.round(F.col("value") * 1000, 0).cast("long")
    ki = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(
            F.to_date("ts").alias("day"), "event_type", "user_id",
            vi.alias("vi"), ki.alias("ki"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum("vi") / 1000.0).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("ki").alias("sum_k"),
        )
    )


def q_events_windowed(spark, sf_dir):
    """Tumbling-window rollup via the STREAMING operator run in batch
    mode (withWatermark is a no-op on a batch DataFrame — the same code
    path serves readStream; late-data semantics are asserted in
    tests/test_streaming_windows.py). Values are summed as scaled longs
    for FP determinism vs the oracle."""
    from large_scale_hypertextual_search_engine_spark.streaming.windows import (
        windowed_event_counts,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "value", F.round(F.col("value") * 1000, 0).cast("long")
    )
    out = windowed_event_counts(ev, "1 hour", "30 minutes")
    return out.select(
        "window_start",
        "window_end",
        "event_type",
        "n_events",
        (F.col("sum_value") / 1000.0).alias("sum_value"),
    )


def q_events_sessionize(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # ts is TIMESTAMP_NTZ; session tz is UTC so the cast is lossless
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    new_sess = F.when(
        prev.isNull() | ((us(F.col("ts")) - us(prev)) > 1_800_000_000),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("ns", new_sess)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"), F.count("*").alias("n_events"))
    )


# -------- rows-only entries (non-SQL-expressible kernels; pytest-verified)

def q_dedup_minhash(spark, sf_dir):
    """Alias of q_dedup_minhash_banded (round-4 fold): the primary
    minhash entry now runs the oracle-checked stored-signature path.
    The in-memory single-pass variant (minhash_lsh_pairs) remains
    covered by pytest (banding == in-memory equivalence in
    tests/test_operators.py) and timed by bench.py's dedup_minhash."""
    return q_dedup_minhash_banded(spark, sf_dir)


def q_dedup_minhash_banded(spark, sf_dir):
    """MinHash near-dup with the signature table PERSISTED (the 100 TB
    shape: store signatures once, re-dedup without re-shingling). The
    signature kernel is not SQL-expressible, but the banding +
    est_jaccard half over the stored table IS — the oracle reads the
    same parquet, so this checks the whole relational half; the kernel
    itself is pytest-verified (exact _modmul61 + Jaccard estimate)."""
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        minhash_pairs_from_signatures, minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    sig_path = _oracle_path("minhash_sigs", sf_dir)
    minhash_signatures(docs, "text", "doc_id").write.mode("overwrite").parquet(
        sig_path
    )
    sigs = spark.read.parquet(sig_path)
    return minhash_pairs_from_signatures(sigs, "doc_id", threshold=0.5).select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def q_dedup_simhash(spark, sf_dir):
    """Alias of q_dedup_simhash_stored (round-4 fold): the primary
    simhash entry now runs the oracle-checked persisted-fingerprint
    path; the in-memory variant (simhash_near_pairs) stays
    pytest-covered."""
    return q_dedup_simhash_stored(spark, sf_dir)


def q_dedup_simhash_stored(spark, sf_dir):
    """SimHash near-dup with the 64-bit fingerprint table PERSISTED.
    The kernel (weighted bit projections of FNV token hashes) is not
    SQL-expressible, but the slice-bucketing + exact-Hamming half over
    the stored table is — the oracle reads the same parquet. Mirrors
    dedup_minhash_banded's split of kernel (pytest) vs relational
    (DuckDB) verification."""
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        simhash_pairs_from_hashes, simhash_udf,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    sh_path = _oracle_path("simhash", sf_dir)
    docs.select(
        "doc_id", simhash_udf()(F.col("text")).alias("simhash")
    ).write.mode("overwrite").parquet(sh_path)
    sh = spark.read.parquet(sh_path)
    return simhash_pairs_from_hashes(sh, "doc_id", max_hamming=3)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING: minhash banded pairs -> distributed
    connected components (hash-min label propagation, one min-combined
    shuffle per round) -> (doc_id, cluster_id, is_canonical). The pair
    table is PERSISTED per-SF so the oracle — a DuckDB recursive-CTE
    min-label fixpoint — reads exactly the edge list the Spark
    clustering consumed; the iterative Spark half is therefore fully
    relational-checked, and the signature kernel upstream is the same
    pytest-verified one as dedup_minhash_banded."""
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        minhash_pairs_from_signatures, minhash_signatures,
    )
    from large_scale_hypertextual_search_engine_spark.operators.graph import (
        dedup_clusters,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    pairs_path = _oracle_path("dup_pairs", sf_dir)
    sigs = minhash_signatures(docs, "text", "doc_id")
    minhash_pairs_from_signatures(sigs, "doc_id", threshold=0.5).select(
        "id_a", "id_b"
    ).write.mode("overwrite").parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)
    return dedup_clusters(pairs)


def q_text_fingerprint(spark, sf_dir):
    from large_scale_hypertextual_search_engine_spark.operators.textstats import (
        fingerprint_udf,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", fingerprint_udf()(F.col("text")).alias("fingerprint"))


def q_ann_lsh(spark, sf_dir):
    from large_scale_hypertextual_search_engine_spark.operators.similarity import (
        lsh_bucket_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return lsh_bucket_topk(emb, qvec, k=10).select(
        "vec_id", F.round("score", 6).alias("score")
    )


def q_ann_ivf(spark, sf_dir):
    """Alias of q_ann_ivf_stored (round-4 fold): the primary IVF entry
    now persists the trained centroids too, so probe selection + exact
    re-rank are oracle-checked; k-means training quality stays
    pytest-asserted via recall
    (tests/test_operators.py::test_ivf_partitioned_prunes_and_recalls)."""
    return q_ann_ivf_stored(spark, sf_dir)


def q_ann_ivf_stored(spark, sf_dir):
    """IVF-flat ANN with the trained centroids ALSO persisted as parquet:
    k-means itself is not SQL-expressible, but given the stored
    centroids + centroid-partitioned table, the probe selection
    (nprobe nearest cells) and exact re-rank ARE — the DuckDB oracle
    reproduces both from the same files, closing the pruning+rerank
    semantics under an oracle (the training quality is pytest-asserted
    via recall)."""
    from large_scale_hypertextual_search_engine_spark.operators.similarity import (
        ivf_topk, write_ivf_partitioned,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = _oracle_path("ivf", sf_dir)
    C = write_ivf_partitioned(emb, path, n_centroids=16, seed=42)
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(C)],
        "centroid_id int, cvec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        _oracle_path("ivf_centroids", sf_dir)
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return ivf_topk(spark, path, qvec, k=10, nprobe=4).select(
        "vec_id", F.round("score", 6).alias("score")
    )


def q_ann_ivfpq(spark, sf_dir):
    """IVF-PQ (IVFADC, Jégou et al. 2011 §IV): coarse cells + residual
    PQ codes, 32x-compressed storage partitioned by cell. The probe
    selection (stored centroids) and the exact re-rank over the probed
    cells are oracle-checked (stored-artifact pattern, as ann_ivf);
    the ADC kernel runs in-path feeding the re-rank candidates, and
    its quantization quality is pytest-asserted via recall + the
    exact ADC==reconstruction identity (tests/test_pq.py)."""
    from large_scale_hypertextual_search_engine_spark.operators.pq import (
        ivfpq_topk, write_ivfpq_partitioned,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = _oracle_path("ivfpq", sf_dir)
    C, _cb = write_ivfpq_partitioned(
        emb, path, n_centroids=16, m=8, k=256, seed=42
    )
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(C)],
        "centroid_id int, cvec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        _oracle_path("ivfpq_centroids", sf_dir)
    )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    # refine >= probed-cell population: every probed row is exactly
    # re-scored, so the result is the exact top-k WITHIN the probed
    # cells — SQL-reproducible — while the ADC gather still executes
    # as the candidate stage.
    return ivfpq_topk(
        spark, path, qvec, k=10, nprobe=4,
        refine_with=emb, refine=1 << 30,
    ).select("vec_id", F.round("score", 6).alias("score"))


def _ann_ivfpq_stored_oracle() -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT centroid_id, cvec
  FROM read_parquet('{_oracle_path("ivfpq_centroids")}/*.parquet')
),
probes AS (
  SELECT c.centroid_id
  FROM c CROSS JOIN q
  ORDER BY list_sum(list_transform(generate_series(1, len(c.cvec)),
    i -> c.cvec[i] * CAST(q.qv[i] AS DOUBLE))) DESC, c.centroid_id ASC
  LIMIT 4
),
cand AS (
  SELECT vec_id
  FROM read_parquet('{_oracle_path("ivfpq")}/*/*.parquet', hive_partitioning = true)
  WHERE centroid_id IN (SELECT centroid_id FROM probes)
),
v AS (
  SELECT e.vec_id, e.embedding
  FROM embeddings e JOIN cand USING (vec_id)
),
s AS (
  SELECT v.vec_id,
    list_sum(list_transform(generate_series(1, len(v.embedding)),
      i -> CAST(v.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
    / ( sqrt(list_sum(list_transform(generate_series(1, len(v.embedding)),
          i -> CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))))
      * sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),
          i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) ) AS score
  FROM v CROSS JOIN q
)
SELECT vec_id, round(score, 6) AS score
FROM s ORDER BY score DESC, vec_id ASC LIMIT 10"""


def _ann_ivf_stored_oracle() -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
c AS (
  SELECT centroid_id, cvec
  FROM read_parquet('{_oracle_path("ivf_centroids")}/*.parquet')
),
probes AS (
  SELECT c.centroid_id
  FROM c CROSS JOIN q
  ORDER BY list_sum(list_transform(generate_series(1, len(c.cvec)),
    i -> c.cvec[i] * CAST(q.qv[i] AS DOUBLE))) DESC, c.centroid_id ASC
  LIMIT 4
),
v AS (
  SELECT vec_id, embedding
  FROM read_parquet('{_oracle_path("ivf")}/*/*.parquet', hive_partitioning = true)
  WHERE centroid_id IN (SELECT centroid_id FROM probes)
),
s AS (
  SELECT v.vec_id,
    list_sum(list_transform(generate_series(1, len(v.embedding)),
      i -> CAST(v.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
    / ( sqrt(list_sum(list_transform(generate_series(1, len(v.embedding)),
          i -> CAST(v.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE))))
      * sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),
          i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) ) AS score
  FROM v CROSS JOIN q
)
SELECT vec_id, round(score, 6) AS score
FROM s ORDER BY score DESC, vec_id ASC LIMIT 10"""


def _ann_lsh_oracle_sql(n_planes: int = 8, dim: int = 64, seed: int = 42) -> str:
    """DuckDB oracle for q_ann_lsh: the SAME rng hyperplanes embedded as
    SQL literals, bucket = packed sign bits, multiprobe=1 candidates =
    Hamming<=1 from the query's bucket, exact cosine re-rank inside."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))

    def dot(plane) -> str:
        lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
        return (
            "list_sum(list_transform(generate_series(1, len(embedding)), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i]))"
        )

    bucket = " + ".join(
        f"(CASE WHEN {dot(p)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH b AS (
  SELECT vec_id, embedding, ({bucket}) AS bucket FROM embeddings
),
qb AS (SELECT bucket AS qbucket FROM b WHERE vec_id = 0),
cand AS (
  SELECT b.vec_id, b.embedding FROM b, qb
  WHERE bit_count(xor(CAST(b.bucket AS BIGINT), CAST(qb.qbucket AS BIGINT))) <= 1
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT c.vec_id,
    list_sum(list_transform(generate_series(1, len(c.embedding)),
      i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
    / ( sqrt(list_sum(list_transform(generate_series(1, len(c.embedding)),
          i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))
      * sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),
          i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) ) AS score
  FROM cand c CROSS JOIN q
)
SELECT vec_id, round(score, 6) AS score
FROM s ORDER BY score DESC, vec_id ASC LIMIT 10"""


def q_ft_compat_analyzer(spark, sf_dir):
    """Reference-exact analyzer (stem + charset) over the corpus: top
    stemmed terms. Not SQL-expressible (Porter-variant stemmer)."""
    from large_scale_hypertextual_search_engine_spark.analysis.analyzer import (
        tokenize_documents,
    )

    toks = tokenize_documents(
        _docs(spark, sf_dir), text_col="content", id_col="docid",
        mode="compat", stem=True,
    )
    return (
        toks.groupBy("term")
        .agg(F.countDistinct("docid").alias("df"), F.sum("tf").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(50)
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: two-term AND BM25 top-k over sf0.001."""
    return q_ft_bm25_and(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ft_lexicon_stats": q_ft_lexicon_stats,
        "ft_doc_stats": q_ft_doc_stats,
        "ft_collection_stats": q_ft_collection_stats,
        "ft_docid_map": q_ft_docid_map,
        "ft_bm25_single": q_ft_bm25_single,
        "ft_bm25_and": q_ft_bm25_and,
        "ft_bm25_filtered": q_ft_bm25_filtered,
        "ft_bm25_deleted": q_ft_bm25_deleted,
        "ft_fuzzy": q_ft_fuzzy,
        "pagerank_top": q_pagerank,
        "hits_top": q_hits,
        "ft_facets": q_ft_facets,
        "ft_collapse": q_ft_collapse,
        "ft_search_after": q_ft_search_after,
        "ft_sigterms": q_ft_sigterms,
        "ft_histogram": q_ft_histogram,
        "ft_stats_facet": q_ft_stats_facet,
        "ft_cardinality": q_ft_cardinality,
        "ft_percentiles": q_ft_percentiles,
        "ft_facets_boolean": q_ft_facets_boolean,
        "ft_termvectors": q_ft_termvectors,
        "ft_suggest": q_ft_suggest,
        "lm_complete": q_lm_complete,
        "lm_select": q_lm_select,
        "ngram_counts": q_ngram_counts,
        "lm_quality": q_lm_quality,
        "ft_range_facet": q_ft_range_facet,
        "ltr_features": q_ltr_features,
        "ft_sorted": q_ft_sorted,
        "ft_merged": q_ft_merged,
        "ft_bm25f": q_ft_bm25f,
        "ft_boolean_fielded": q_ft_boolean_fielded,
        "keywords_tfidf": q_keywords,
        "collocations_pmi": q_collocations,
        "ft_ql": q_ft_ql,
        "ft_hybrid": q_ft_hybrid,
        "ft_rm3": q_ft_rm3,
        "ft_bm25_and_compat": q_ft_bm25_and_compat,
        "ft_bm25_or": q_ft_bm25_or,
        "ft_msm": q_ft_msm,
        "ft_tiered": q_ft_tiered,
        "ft_bm25_wand": q_ft_bm25_wand,
        "ft_phrase": q_ft_phrase,
        "ft_phrase_wand": q_ft_phrase_wand,
        "ft_proximity": q_ft_proximity,
        "ft_proximity_wand": q_ft_proximity_wand,
        "ft_boolean": q_ft_boolean,
        "ft_wildcard": q_ft_wildcard,
        "ft_regexp": q_ft_regexp,
        "ft_synonyms": q_ft_synonyms,
        "ft_mlt": q_ft_mlt,
        "ft_related": q_ft_related,
        "ft_explain": q_ft_explain,
        "ft_boolean_near": q_ft_boolean_near,
        "boolean_batch": q_boolean_batch,
        "ft_snippets": q_ft_snippets,
        "ft_autocomplete": q_ft_autocomplete,
        "autocomplete_batch": q_autocomplete_batch,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_embedding": q_dedup_embedding,
        "ann_cosine_topk": q_ann_cosine_topk,
        "text_quality": q_text_quality,
        "token_counts": q_token_counts,
        "decontam_report": q_decontam_report,
        "select_budget": q_select_budget,
        "sample_stratified": q_sample_stratified,
        "pack_sequences": q_pack_sequences,
        "lang_id": q_lang_id,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "window_top_order": q_window_top_order,
        "events_daily": q_events_daily,
        "events_windowed": q_events_windowed,
        "events_sessionize": q_events_sessionize,
        "dedup_minhash": q_dedup_minhash,
        "dedup_minhash_banded": q_dedup_minhash_banded,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_stored": q_dedup_simhash_stored,
        "dedup_clusters": q_dedup_clusters,
        "text_fingerprint": q_text_fingerprint,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "ann_pq": q_ann_pq,
        "ann_ivf_stored": q_ann_ivf_stored,
        "ann_ivfpq": q_ann_ivfpq,
        "ft_compat_analyzer": q_ft_compat_analyzer,
    }


_TOKS = """
toks AS (
  SELECT docid, term FROM (
    SELECT CAST(doc_id AS VARCHAR) AS docid,
           unnest(string_split(text, ' ')) AS term
    FROM documents
  ) WHERE term <> ''
)"""

_DL_STATS = """
dl AS (SELECT docid, COUNT(*) AS doc_len FROM toks GROUP BY docid),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT SUM(doc_len) FROM dl) * 1.0 / (SELECT COUNT(*) FROM documents) AS avg_dl
)"""


def _bm25_true_sql(terms: list[str], mode: str, msm: int | None = None) -> str:
    inlist = ", ".join(f"'{t}'" for t in terms)
    if mode == "and":
        having = "HAVING COUNT(DISTINCT term) = (SELECT COUNT(*) FROM dfs)"
    elif msm and msm > 1:
        having = f"HAVING COUNT(DISTINCT term) >= {int(msm)}"
    else:
        having = ""
    return f"""
WITH {_TOKS},{_DL_STATS},
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ({inlist}) GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
cand AS (SELECT docid FROM tfs GROUP BY docid {having}),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN cand c ON c.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
       round(score, 6) AS score
FROM scored
ORDER BY score DESC, docid ASC
LIMIT 10"""


def _phrase_true_sql(phrase: list[str]) -> str:
    """Oracle for phrase_search: token positions via renumbered
    ordinality (empties dropped THEN renumbered, matching
    tokenize_simple), adjacency via a pos+i self-join chain, scoring
    identical to _bm25_true_sql restricted to phrase-matching docs."""
    inlist = ", ".join(f"'{t}'" for t in dict.fromkeys(phrase))
    joins = " ".join(
        f"JOIN tokp t{i} ON t{i}.docid = t0.docid AND t{i}.pos = t0.pos + {i}"
        for i in range(1, len(phrase))
    )
    conds = " AND ".join(
        f"t{i}.term = '{t}'" for i, t in enumerate(phrase)
    )
    return f"""
WITH {_TOKS},{_DL_STATS},
tokp AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY ord) AS pos
  FROM (
    SELECT CAST(doc_id AS VARCHAR) AS docid,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents
  ) WHERE term <> ''
),
occ AS (
  SELECT t0.docid, COUNT(*) AS n_occurrences
  FROM tokp t0 {joins}
  WHERE {conds}
  GROUP BY t0.docid
),
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ({inlist}) GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
scored AS (
  SELECT t.docid, o.n_occurrences,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN occ o ON o.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid, o.n_occurrences
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
       round(score, 6) AS score,
       CAST(n_occurrences AS BIGINT) AS n_occurrences
FROM scored
ORDER BY score DESC, docid ASC
LIMIT 10"""


def _proximity_true_sql(a: str, b: str, slop: int) -> str:
    """Oracle for proximity_search (unordered NEAR/slop): positions via
    the same renumbered ordinality as the phrase oracle, min pairwise
    |pos_b - pos_a| per doc (base shift invariant: SQL positions are
    1-based, Spark's 0-based), scoring identical to _bm25_true_sql
    restricted to qualifying docs."""
    return f"""
WITH {_TOKS},{_DL_STATS},
tokp AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY ord) AS pos
  FROM (
    SELECT CAST(doc_id AS VARCHAR) AS docid,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents
  ) WHERE term <> ''
),
pd AS (
  SELECT ta.docid, MIN(abs(tb.pos - ta.pos)) AS min_dist
  FROM tokp ta
  JOIN tokp tb ON tb.docid = ta.docid
  WHERE ta.term = '{a}' AND tb.term = '{b}'
  GROUP BY ta.docid
  HAVING MIN(abs(tb.pos - ta.pos)) <= {slop}
),
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('{a}', '{b}') GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
scored AS (
  SELECT t.docid, p.min_dist,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN pd p ON p.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid, p.min_dist
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
       round(score, 6) AS score,
       CAST(min_dist AS BIGINT) AS min_dist
FROM scored
ORDER BY score DESC, docid ASC
LIMIT 10"""


def _bm25_filtered_sql(terms: list[str], pred: str) -> str:
    """Oracle for filtered retrieval: dfs stay GLOBAL (computed before
    the filter), candidate membership and scoring restrict to documents
    satisfying ``pred`` (a SQL predicate over the documents table)."""
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOKS},{_DL_STATS},
tfs0 AS (SELECT docid, term, COUNT(*) AS tf FROM toks
         WHERE term IN ({inlist}) GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs0 GROUP BY term),
flt AS (SELECT CAST(doc_id AS VARCHAR) AS docid FROM documents WHERE {pred}),
tfs AS (SELECT t.* FROM tfs0 t JOIN flt ON flt.docid = t.docid),
cand AS (SELECT docid FROM tfs GROUP BY docid
         HAVING COUNT(DISTINCT term) = (SELECT COUNT(*) FROM dfs)),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN cand c ON c.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
       round(score, 6) AS score
FROM scored
ORDER BY score DESC, docid ASC
LIMIT 10"""


def _pagerank_sql(n_iter: int = 6, damping: float = 0.85) -> str:
    """Oracle for q_pagerank: the SAME synthetic edge rule and the SAME
    damped power iteration with dangling-mass redistribution, unrolled
    as one CTE stage per iteration. Both sides round to 9 decimals and
    order by the ROUNDED rank, so the top-50 cut tolerates sub-ulp FP
    association differences between engines."""
    nn = "(SELECT COUNT(*) FROM documents)"
    edge_selects = " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id * {a} + {c}) % {nn} AS dst "
        f"FROM documents WHERE doc_id % 5 <> 0"
        for a, c in ((7, 1), (13, 3), (31, 11))
    )
    stages = [
        f"""
edges AS (
  SELECT DISTINCT src, dst FROM ({edge_selects}) WHERE src <> dst
),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges UNION SELECT dst FROM edges
  )
),
nc AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT id, 1.0 / (SELECT n FROM nc) AS rank FROM nodes)"""
    ]
    for i in range(1, n_iter + 1):
        p = i - 1
        stages.append(f"""
d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dm FROM r{p}
         WHERE id NOT IN (SELECT src FROM deg)),
c{i} AS (SELECT e.dst AS id, SUM(r.rank / g.deg) AS c
         FROM edges e
         JOIN r{p} r ON r.id = e.src
         JOIN deg g ON g.src = e.src
         GROUP BY e.dst),
r{i} AS (SELECT nodes.id,
           (1.0 - {damping}) / (SELECT n FROM nc)
           + {damping} * (COALESCE(c.c, 0)
                          + (SELECT dm FROM d{i}) / (SELECT n FROM nc)) AS rank
         FROM nodes LEFT JOIN c{i} c ON c.id = nodes.id)""")
    return (
        "WITH "
        + ",".join(stages)
        + f"""
SELECT id, round(rank, 9) AS rank
FROM r{n_iter}
ORDER BY round(rank, 9) DESC, id ASC
LIMIT 50"""
    )


def _hits_sql(n_iter: int = 6) -> str:
    """Oracle for q_hits: the SAME synthetic edge rule and the SAME
    half-step-normalized power iteration, unrolled one CTE pair per
    iteration. Both sides round to 9 decimals and order by the ROUNDED
    authority (sub-ulp FP association tolerance, as _pagerank_sql)."""
    nn = "(SELECT COUNT(*) FROM documents)"
    edge_selects = " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id * {a} + {c}) % {nn} AS dst "
        f"FROM documents WHERE doc_id % 5 <> 0"
        for a, c in ((7, 1), (13, 3), (31, 11))
    )
    stages = [
        f"""
edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM ({edge_selects}) WHERE src <> dst
),
nodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges UNION SELECT dst FROM edges
  )
),
h0 AS MATERIALIZED (SELECT id, 1.0 AS h FROM nodes)"""
    ]
    for i in range(1, n_iter + 1):
        p = i - 1
        stages.append(f"""
ar{i} AS MATERIALIZED (SELECT nodes.id, COALESCE(x.a, 0) AS a
          FROM nodes LEFT JOIN (
            SELECT e.dst AS id, SUM(h.h) AS a
            FROM edges e JOIN h{p} h ON h.id = e.src GROUP BY e.dst
          ) x ON x.id = nodes.id),
an{i} AS (SELECT sqrt(SUM(a * a)) AS n FROM ar{i}),
a{i} AS MATERIALIZED (SELECT id,
           CASE WHEN (SELECT n FROM an{i}) > 0
                THEN a / (SELECT n FROM an{i}) ELSE a END AS a
         FROM ar{i}),
hr{i} AS MATERIALIZED (SELECT nodes.id, COALESCE(x.h, 0) AS h
          FROM nodes LEFT JOIN (
            SELECT e.src AS id, SUM(a.a) AS h
            FROM edges e JOIN a{i} a ON a.id = e.dst GROUP BY e.src
          ) x ON x.id = nodes.id),
hn{i} AS (SELECT sqrt(SUM(h * h)) AS n FROM hr{i}),
h{i} AS MATERIALIZED (SELECT id,
           CASE WHEN (SELECT n FROM hn{i}) > 0
                THEN h / (SELECT n FROM hn{i}) ELSE h END AS h
         FROM hr{i})""")
    return (
        "WITH "
        + ",".join(stages)
        + f"""
SELECT nodes.id,
       round(a{n_iter}.a, 9) AS authority,
       round(h{n_iter}.h, 9) AS hub
FROM nodes
JOIN a{n_iter} ON a{n_iter}.id = nodes.id
JOIN h{n_iter} ON h{n_iter}.id = nodes.id
ORDER BY round(a{n_iter}.a, 9) DESC, nodes.id ASC
LIMIT 50"""
    )


def _boolean_near_sql(a: str, b: str, slop: int, neg: str) -> str:
    """Oracle for a boolean query with an ORDERED proximity leaf:
    ``a PRE/slop b AND NOT neg``. Membership: some occurrence pair with
    1 <= pos_b - pos_a <= slop (renumbered 1-based positions — the base
    shift cancels in the difference) and ``neg`` absent. Score: the
    _bm25_true_sql fold over the positive terms {a, b} (the negated
    term gates membership, never the score)."""
    return f"""
WITH {_TOKS},{_DL_STATS},
tokp AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY ord) AS pos
  FROM (
    SELECT CAST(doc_id AS VARCHAR) AS docid,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents
  ) WHERE term <> ''
),
pd AS (
  SELECT DISTINCT ta.docid
  FROM tokp ta
  JOIN tokp tb ON tb.docid = ta.docid
  WHERE ta.term = '{a}' AND tb.term = '{b}'
    AND tb.pos - ta.pos BETWEEN 1 AND {slop}
),
cand AS (
  SELECT docid FROM pd
  WHERE docid NOT IN (SELECT DISTINCT docid FROM toks WHERE term = '{neg}')
),
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('{a}', '{b}') GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN cand c ON c.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
       round(score, 6) AS score
FROM scored
ORDER BY score DESC, docid ASC
LIMIT 10"""


def _boolean_true_sql(
    positive: list[str],
    negative: list[str],
    positive_like: str | None = None,
    positive_regex: str | None = None,
) -> str:
    """Oracle for boolean_search over the normal form
    ``(p1 OR p2 OR ...) AND NOT n1 AND NOT n2 ...``: membership = any
    positive term present and no negative term present; score = the
    _bm25_true_sql OR fold over the positive terms (negative terms gate
    membership, never the score — boolsearch module docstring).

    ``positive_like`` swaps the positive IN-list for a SQL LIKE pattern
    — the oracle for a WILDCARD leaf (boolsearch.expand_wildcards): the
    engine expands the glob against the lexicon into an OR of concrete
    terms, which is exactly "every token matching the pattern" as long
    as max_expansions exceeds the match count (true at oracle SF: the
    whole vocabulary is 31 terms). ``positive_regex`` does the same for
    a /regex/ leaf via regexp_full_match (the engine's RLIKE expansion
    is ^$-anchored)."""
    pos_in = ", ".join(f"'{t}'" for t in positive)
    neg_in = ", ".join(f"'{t}'" for t in negative)
    if positive_regex is not None:
        pos_pred = f"regexp_full_match(term, '{positive_regex}')"
    elif positive_like is not None:
        pos_pred = f"term LIKE '{positive_like}'"
    else:
        pos_pred = f"term IN ({pos_in})"
    return f"""
WITH {_TOKS},{_DL_STATS},
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE {pos_pred} GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
neg AS (SELECT DISTINCT docid FROM toks WHERE term IN ({neg_in})),
cand AS (SELECT docid FROM tfs
         WHERE docid NOT IN (SELECT docid FROM neg) GROUP BY docid),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN cand c ON c.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
       round(score, 6) AS score
FROM scored
ORDER BY score DESC, docid ASC
LIMIT 10"""


def _snippet_true_sql(terms: list[str], window: int) -> str:
    """Oracle for search_snippets: the _bm25_true_sql AND top-k, then
    per hit the best W-token window — candidate starts are every
    renumbered position p <= greatest(n - W + 1, 1), window score =
    COUNT(DISTINCT query terms) inside [p, p + W - 1], best = highest
    score then earliest start, snippet = ordered string_agg of the
    window's tokens."""
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOKS},{_DL_STATS},
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ({inlist}) GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
cand AS (SELECT docid FROM tfs GROUP BY docid
         HAVING COUNT(DISTINCT term) = (SELECT COUNT(*) FROM dfs)),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN cand c ON c.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
),
topk AS (
  SELECT docid,
         CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
         round(score, 6) AS score
  FROM scored ORDER BY score DESC, docid ASC LIMIT 10
),
tokp AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY ord) AS pos
  FROM (
    SELECT CAST(doc_id AS VARCHAR) AS docid,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents
  ) WHERE term <> '' AND docid IN (SELECT docid FROM topk)
),
len AS (SELECT docid, COUNT(*) AS n FROM tokp GROUP BY docid),
winh AS (
  SELECT st.docid, st.pos AS s, COUNT(DISTINCT h.term) AS hits
  FROM tokp st
  JOIN len l ON l.docid = st.docid
  LEFT JOIN tokp h ON h.docid = st.docid
       AND h.pos BETWEEN st.pos AND st.pos + {window} - 1
       AND h.term IN ({inlist})
  WHERE st.pos <= greatest(l.n - {window} + 1, 1)
  GROUP BY st.docid, st.pos
),
best AS (
  SELECT docid, s, hits FROM (
    SELECT docid, s, hits,
           row_number() OVER (PARTITION BY docid ORDER BY hits DESC, s ASC) AS rn
    FROM winh
  ) WHERE rn = 1
),
snip AS (
  SELECT b.docid, string_agg(t.term, ' ' ORDER BY t.pos) AS snippet
  FROM best b
  JOIN tokp t ON t.docid = b.docid
       AND t.pos BETWEEN b.s AND b.s + {window} - 1
  GROUP BY b.docid
)
SELECT k.docid, k.rank, k.score, CAST(b.hits AS INTEGER) AS n_hits, s.snippet
FROM topk k
JOIN best b ON b.docid = k.docid
JOIN snip s ON s.docid = k.docid
ORDER BY k.rank"""


def _bm25_compat_sql(terms: list[str]) -> str:
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOKS},{_DL_STATS},
tfs AS (SELECT docid, term FROM toks WHERE term IN ({inlist}) GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
cand AS (SELECT docid FROM tfs GROUP BY docid
         HAVING COUNT(DISTINCT term) = (SELECT COUNT(*) FROM dfs)),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * 1.0) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + 1.0)) ) AS score
  FROM tfs t
  JOIN cand c ON c.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
       round(score, 6) AS score
FROM scored
ORDER BY score DESC, docid ASC
LIMIT 10"""


_LANG_MARKERS_SQL = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "es": ("el", "la", "los", "que", "es", "en", "una", "por", "con", "para"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}


def _lang_id_sql() -> str:
    hit_cols = ",\n    ".join(
        "SUM(CASE WHEN term IN ({}) THEN 1 ELSE 0 END) AS {}".format(
            ", ".join(f"'{w}'" for w in ws), lang
        )
        for lang, ws in sorted(_LANG_MARKERS_SQL.items())
    )
    return f"""
WITH {_TOKS},
h AS (
  SELECT docid,
    {hit_cols}
  FROM toks GROUP BY docid
)
SELECT CAST(docid AS BIGINT) AS doc_id,
  CASE
    WHEN de >= en AND de >= es AND de >= fr AND de >= zh THEN 'de'
    WHEN en >= es AND en >= fr AND en >= zh THEN 'en'
    WHEN es >= fr AND es >= zh THEN 'es'
    WHEN fr >= zh THEN 'fr'
    ELSE 'zh'
  END AS lang_guess,
  CAST(greatest(de, en, es, fr, zh) AS BIGINT) AS lang_guess_hits
FROM h"""


def oracle_sql() -> dict[str, str]:
    sq = "', '"
    out = {
        "ft_lexicon_stats": f"""
WITH {_TOKS}
SELECT term, COUNT(DISTINCT docid) AS df, COUNT(*) AS tf
FROM toks GROUP BY term
ORDER BY tf DESC, term ASC LIMIT 100""",
        "ft_doc_stats": f"""
WITH {_TOKS}
SELECT d.docid, COALESCE(t.doc_len, 0) AS doc_len
FROM (SELECT CAST(doc_id AS VARCHAR) AS docid FROM documents) d
LEFT JOIN (SELECT docid, COUNT(*) AS doc_len FROM toks GROUP BY docid) t
  ON d.docid = t.docid""",
        "ft_collection_stats": f"""
WITH {_TOKS},
dl AS (SELECT docid, COUNT(*) AS doc_len FROM toks GROUP BY docid)
SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       round((SELECT SUM(doc_len) FROM dl) * 1.0
             / (SELECT COUNT(*) FROM documents), 6) AS avg_dl""",
        "ft_docid_map": """
SELECT docid, CAST(row_number() OVER (ORDER BY docid ASC) AS BIGINT) AS doc_int
FROM (SELECT CAST(doc_id AS VARCHAR) AS docid FROM documents)""",
        "ft_bm25_single": _bm25_true_sql(["spark"], "and"),
        "ft_bm25_and": _bm25_true_sql(["spark", "join"], "and"),
        "ft_bm25_and_compat": _bm25_compat_sql(["spark", "join"]),
        "ft_bm25_filtered": _bm25_filtered_sql(
            ["spark", "join"], "doc_id % 3 = 0"
        ),
        "ft_bm25_deleted": _bm25_filtered_sql(
            ["spark", "join"], "doc_id % 7 <> 0"
        ),
        "ft_fuzzy": f"""
WITH {_TOKS},
lex AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
c AS (
  SELECT term, tf, levenshtein(term, 'sprak') AS dist
  FROM lex WHERE abs(length(term) - 5) <= 2
)
SELECT term, CAST(dist AS INT) AS dist, tf
FROM c WHERE dist <= 2
ORDER BY dist ASC, tf DESC, term ASC LIMIT 5""",
        "ft_bm25_or": _bm25_true_sql(["merge", "window"], "or"),
        "ft_msm": _bm25_true_sql(["merge", "window", "spark"], "or", msm=2),
        "ft_tiered": _bm25_true_sql(["merge", "window"], "or"),
        # WAND is exact top-k: the oracle is the same SQL as ft_bm25_or
        "ft_bm25_wand": _bm25_true_sql(["merge", "window"], "or"),
        "ft_phrase": _phrase_true_sql(["fast", "key"]),
        "ft_phrase_wand": _phrase_true_sql(["fast", "key"]),
        "ft_proximity": _proximity_true_sql("fast", "key", 4),
        "ft_proximity_wand": _proximity_true_sql("fast", "key", 4),
        "ft_boolean": _boolean_true_sql(["merge", "spark"], ["join"]),
        "ft_wildcard": _boolean_true_sql([], ["join"], positive_like="s%"),
        "ft_regexp": _boolean_true_sql([], ["join"], positive_regex="s.*"),
        "ft_synonyms": f"""
WITH {_TOKS},{_DL_STATS},
gmap(term, gid) AS (VALUES ('spark', 0), ('merge', 0), ('join', 1)),
tfg AS (SELECT t.docid, g.gid, COUNT(*) AS tf_g
        FROM toks t JOIN gmap g USING (term) GROUP BY t.docid, g.gid),
mdf AS (SELECT term, COUNT(DISTINCT docid) AS df FROM toks
        WHERE term IN ('spark', 'merge', 'join') GROUP BY term),
gdf AS (SELECT g.gid, MAX(m.df) AS df_g
        FROM gmap g JOIN mdf m USING (term) GROUP BY g.gid),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df_g + 0.5) / (f.df_g + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf_g) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf_g)) ) AS score,
         COUNT(*) AS n_matched
  FROM tfg t
  JOIN gdf f USING (gid)
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
       round(score, 6) AS score
FROM scored
WHERE n_matched = (SELECT COUNT(*) FROM gdf)
ORDER BY score DESC, docid ASC
LIMIT 10""",
        "ft_mlt": f"""
WITH {_TOKS},{_DL_STATS},
src AS (SELECT CAST(MIN(doc_id) AS VARCHAR) AS docid FROM documents),
stf AS (SELECT term, COUNT(*) AS tf FROM toks
        WHERE docid = (SELECT docid FROM src) GROUP BY term),
alldf AS (SELECT term, COUNT(DISTINCT docid) AS df FROM toks GROUP BY term),
sel AS (
  SELECT t.term
  FROM stf t JOIN alldf f USING (term) CROSS JOIN stats s
  WHERE f.df >= 2
  ORDER BY t.tf * ln((s.n_docs + 1.0) / (f.df + 1.0)) DESC, t.term ASC
  LIMIT 5
),
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN (SELECT term FROM sel) GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN dfs f USING (term)
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  WHERE t.docid <> (SELECT docid FROM src)
  GROUP BY t.docid
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
       round(score, 6) AS score
FROM scored
ORDER BY score DESC, docid ASC
LIMIT 10""",
        "ft_related": f"""
WITH {_TOKS},{_DL_STATS},
tf0 AS (SELECT docid, term, COUNT(*) AS qtf FROM toks GROUP BY docid, term),
alldf AS (SELECT term, COUNT(DISTINCT docid) AS df FROM toks GROUP BY term),
sel AS (
  SELECT src_docid, term FROM (
    SELECT t.docid AS src_docid, t.term,
           row_number() OVER (
             PARTITION BY t.docid
             ORDER BY t.qtf * ln((s.n_docs + 1.0) / (f.df + 1.0)) DESC,
                      t.term ASC
           ) AS rn
    FROM tf0 t JOIN alldf f USING (term) CROSS JOIN stats s
    WHERE f.df >= 2
  ) WHERE rn <= 3
),
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN (SELECT DISTINCT term FROM sel) GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
scored AS (
  -- deterministic ascending-sorted left fold (list_reduce over
  -- list_sort): the exact mirror of the engine's
  -- aggregate(sort_array(collect_list(term_score))) discipline.
  -- A plain SUM is parallel-order-nondeterministic in DuckDB, and a
  -- last-ulp wobble between runs can swap near-tied ranks (observed
  -- once at sf0.001 under a contended host).
  SELECT q.src_docid, t.docid,
         list_reduce(list_sort(list(
             ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf))
         )), (a, b) -> a + b) AS score
  FROM sel q
  JOIN tfs t USING (term)
  JOIN dfs f USING (term)
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  WHERE t.docid <> q.src_docid
  GROUP BY q.src_docid, t.docid
),
ranked AS (
  SELECT src_docid,
         CAST(row_number() OVER (
           PARTITION BY src_docid ORDER BY score DESC, docid ASC
         ) AS INTEGER) AS rank,
         docid, round(score, 6) AS score
  FROM scored
)
SELECT src_docid, rank, docid, score
FROM ranked WHERE rank <= 3
ORDER BY src_docid, rank""",
        "ft_explain": f"""
WITH {_TOKS},{_DL_STATS},
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('spark', 'join') GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
cand AS (SELECT docid FROM tfs GROUP BY docid
         HAVING COUNT(DISTINCT term) = (SELECT COUNT(*) FROM dfs)),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN cand c ON c.docid = t.docid
  JOIN dfs f USING (term)
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
),
topk AS (
  SELECT docid,
         CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INTEGER) AS rank,
         score
  FROM scored ORDER BY score DESC, docid ASC LIMIT 5
)
SELECT k.rank, t.docid, round(k.score, 6) AS score, t.term,
       CAST(t.tf AS BIGINT) AS tf,
       CAST(f.df AS BIGINT) AS df,
       CAST(l.doc_len AS DOUBLE) AS doc_len,
       round(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0), 6) AS idf,
       round(((1.5 + 1.0) * t.tf) /
             (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf), 6) AS tf_comp,
       round(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
           * (((1.5 + 1.0) * t.tf) /
              (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)), 6) AS term_score
FROM tfs t
JOIN topk k ON k.docid = t.docid
JOIN dfs f USING (term)
JOIN dl l ON l.docid = t.docid
CROSS JOIN stats s
ORDER BY k.rank, t.term""",
        "ft_boolean_near": _boolean_near_sql("fast", "key", 4, "merge"),
        "pagerank_top": _pagerank_sql(6, 0.85),
        "hits_top": _hits_sql(6),
        "ft_rm3": f"""
WITH {_TOKS},{_DL_STATS},
qt0 AS (SELECT 'spark' AS term UNION ALL SELECT 'join'),
tfs0 AS (SELECT docid, term, COUNT(*) AS tf FROM toks
         WHERE term IN (SELECT term FROM qt0) GROUP BY docid, term),
dfs0 AS (SELECT term, COUNT(*) AS df FROM tfs0 GROUP BY term),
cand0 AS (SELECT docid FROM tfs0 GROUP BY docid
          HAVING COUNT(DISTINCT term) = (SELECT COUNT(*) FROM dfs0)),
fb AS (
  SELECT t.docid
  FROM tfs0 t
  JOIN cand0 c ON c.docid = t.docid
  JOIN dfs0 f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
  ORDER BY SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
              * (((1.5 + 1.0) * t.tf) /
                 (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) )
           DESC, t.docid ASC
  LIMIT 10
),
alldf AS (SELECT term, COUNT(DISTINCT docid) AS df FROM toks GROUP BY term),
ftf AS (SELECT term, COUNT(*) AS tf_fb FROM toks
        JOIN fb USING (docid) GROUP BY term),
expansion AS (
  SELECT f.term
  FROM ftf f JOIN alldf a USING (term)
  WHERE f.term NOT IN (SELECT term FROM qt0)
  ORDER BY f.tf_fb * ln(((SELECT n_docs FROM stats) + 1.0) / (a.df + 1.0))
           DESC, f.term ASC
  LIMIT 2
),
qt AS (SELECT term FROM qt0 UNION SELECT term FROM expansion),
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN (SELECT term FROM qt) GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INT) AS rank,
       round(score, 6) AS score
FROM scored ORDER BY score DESC, docid ASC LIMIT 10""",
        "ft_ql": f"""
WITH {_TOKS},{_DL_STATS},
tot AS (SELECT SUM(doc_len) AS n FROM dl),
ctf AS (SELECT term, COUNT(*) AS ctf FROM toks
        WHERE term IN ('spark', 'join') GROUP BY term),
mup AS (SELECT term, 2000.0 * ctf / (SELECT n FROM tot) AS mup FROM ctf),
cq AS (SELECT SUM(ln(mup)) AS c, COUNT(*) AS k FROM mup),
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('spark', 'join') GROUP BY docid, term),
scored AS (
  SELECT t.docid,
         (SELECT c FROM cq)
         + SUM(ln(t.tf + m.mup) - ln(m.mup))
         - (SELECT k FROM cq) * ln(l.doc_len + 2000.0) AS score
  FROM tfs t
  JOIN mup m ON m.term = t.term
  JOIN dl l ON l.docid = t.docid
  GROUP BY t.docid, l.doc_len
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INT) AS rank,
       round(score, 6) AS score
FROM scored ORDER BY score DESC, docid ASC LIMIT 10""",
        "ft_hybrid": f"""
WITH {_TOKS},{_DL_STATS},
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('spark', 'join') GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
cand AS (SELECT docid FROM tfs GROUP BY docid),
bscored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN cand c ON c.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
),
bm AS (
  SELECT docid,
         CAST(row_number() OVER (ORDER BY score DESC, docid ASC) AS INT)
           AS bm25_rank
  FROM bscored ORDER BY score DESC, docid ASC LIMIT 50
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cscored AS (
  SELECT e.vec_id,
    list_sum(list_transform(generate_series(1, len(e.embedding)),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
    / ( sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
      * sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),
          i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) ) AS score
  FROM embeddings e CROSS JOIN q
),
cs AS (
  SELECT CAST(vec_id AS VARCHAR) AS docid,
         CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INT)
           AS cos_rank
  FROM cscored ORDER BY score DESC, vec_id ASC LIMIT 50
),
fused AS (
  SELECT COALESCE(bm.docid, cs.docid) AS docid, bm.bm25_rank, cs.cos_rank,
         COALESCE(1.0 / (60 + bm.bm25_rank), 0)
         + COALESCE(1.0 / (60 + cs.cos_rank), 0) AS rrf0
  FROM bm FULL OUTER JOIN cs ON cs.docid = bm.docid
)
SELECT docid,
       CAST(row_number() OVER (ORDER BY rrf0 DESC, docid ASC) AS INT) AS rank,
       round(rrf0, 9) AS rrf,
       COALESCE(bm25_rank, 0) AS bm25_rank,
       COALESCE(cos_rank, 0) AS cos_rank
FROM fused ORDER BY rrf0 DESC, docid ASC LIMIT 10""",
        "keywords_tfidf": """
WITH toks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nc AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf,
         t.tf * ln(((SELECT n FROM nc) + 1.0) / (f.df + 1.0)) AS tfidf0
  FROM tf t JOIN dfs f ON f.term = t.term
),
ranked AS (
  SELECT doc_id, term, tf, round(tfidf0, 6) AS tfidf,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf0 DESC, tf DESC, term ASC
         ) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= 3""",
        "collocations_pmi": """
WITH d AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
pairs AS (
  SELECT unnest(list_transform(
           generate_series(1, len(t) - 1),
           i -> {'term_a': t[i], 'term_b': t[i + 1]}
         ), recursive := true)
  FROM d WHERE len(t) >= 2
),
np AS (SELECT COUNT(*) AS n FROM pairs),
ab AS (SELECT term_a, term_b, COUNT(*) AS n_pair FROM pairs GROUP BY 1, 2),
la AS (SELECT term_a, COUNT(*) AS n_a FROM pairs GROUP BY 1),
rb AS (SELECT term_b, COUNT(*) AS n_b FROM pairs GROUP BY 1),
ranked AS (
  SELECT ab.term_a, ab.term_b, ab.n_pair,
         round(ln(ab.n_pair * 1.0 * (SELECT n FROM np)
                  / (la.n_a * 1.0 * rb.n_b)), 6) AS pmi
  FROM ab JOIN la USING (term_a) JOIN rb USING (term_b)
  WHERE ab.n_pair >= 5
)
SELECT term_a, term_b, n_pair, pmi FROM ranked
ORDER BY pmi DESC, n_pair DESC, term_a ASC, term_b ASC
LIMIT 50""",
        "ft_boolean_fielded": """
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS docid,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
fld AS (
  SELECT docid, 'title' AS field, unnest(toks[1:8]) AS term FROM docs
  UNION ALL
  SELECT docid, 'body' AS field, unnest(toks[9:]) AS term FROM docs
),
len AS (SELECT docid, field, COUNT(*) AS dl FROM fld GROUP BY docid, field),
nc AS (SELECT COUNT(*) AS n FROM documents),
avgdl AS (SELECT field, SUM(dl) * 1.0 / (SELECT n FROM nc) AS ad
          FROM len GROUP BY field),
tfs AS (SELECT docid, field, term, COUNT(*) AS tf FROM fld
        WHERE term IN ('merge', 'spark') GROUP BY docid, field, term),
wtf AS (
  SELECT t.docid, t.term,
         SUM( (CASE t.field WHEN 'title' THEN 2.0 ELSE 1.0 END) * t.tf
              / (1.0 - 0.75 + 0.75 * (l.dl / a.ad)) ) AS tft
  FROM tfs t
  JOIN len l ON l.docid = t.docid AND l.field = t.field
  JOIN avgdl a ON a.field = t.field
  GROUP BY t.docid, t.term
),
dfs AS (SELECT term, COUNT(*) AS df FROM wtf GROUP BY term),
scored AS (
  SELECT w.docid,
         SUM( ln(((SELECT n FROM nc) - f.df + 0.5) / (f.df + 0.5) + 1.0)
              * w.tft / (1.5 + w.tft) ) AS score
  FROM wtf w JOIN dfs f ON f.term = w.term
  GROUP BY w.docid
)
SELECT s.docid, round(s.score, 6) AS score
FROM scored s
WHERE s.docid IN (SELECT docid FROM fld WHERE field = 'title' AND term = 'spark')
  AND s.docid IN (SELECT docid FROM fld WHERE term = 'merge')
  AND s.docid NOT IN (SELECT docid FROM fld WHERE field = 'title' AND term = 'join')""",
        "ft_bm25f": """
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS docid,
         list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
fld AS (
  SELECT docid, 'title' AS field, unnest(toks[1:8]) AS term FROM docs
  UNION ALL
  SELECT docid, 'body' AS field, unnest(toks[9:]) AS term FROM docs
),
len AS (SELECT docid, field, COUNT(*) AS dl FROM fld GROUP BY docid, field),
nc AS (SELECT COUNT(*) AS n FROM documents),
avgdl AS (SELECT field, SUM(dl) * 1.0 / (SELECT n FROM nc) AS ad
          FROM len GROUP BY field),
tfs AS (SELECT docid, field, term, COUNT(*) AS tf FROM fld
        WHERE term IN ('spark', 'join') GROUP BY docid, field, term),
wtf AS (
  SELECT t.docid, t.term,
         SUM( (CASE t.field WHEN 'title' THEN 2.0 ELSE 1.0 END) * t.tf
              / (1.0 - 0.75 + 0.75 * (l.dl / a.ad)) ) AS tft
  FROM tfs t
  JOIN len l ON l.docid = t.docid AND l.field = t.field
  JOIN avgdl a ON a.field = t.field
  GROUP BY t.docid, t.term
),
dfs AS (SELECT term, COUNT(*) AS df FROM wtf GROUP BY term),
scored AS (
  SELECT w.docid,
         SUM( ln(((SELECT n FROM nc) - f.df + 0.5) / (f.df + 0.5) + 1.0)
              * w.tft / (1.5 + w.tft) ) AS score,
         COUNT(*) AS n_found
  FROM wtf w JOIN dfs f ON f.term = w.term
  GROUP BY w.docid
)
SELECT docid, round(score, 6) AS score
FROM scored WHERE n_found = 2""",
        # merged(A, B) must reproduce the plain full-corpus BM25 — the
        # FULL match set (no rank/limit), so ties cannot flake the hash
        "ft_merged": f"""
WITH {_TOKS},{_DL_STATS},
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('spark', 'join') GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
cand AS (SELECT docid FROM tfs GROUP BY docid
         HAVING COUNT(DISTINCT term) = (SELECT COUNT(*) FROM dfs)),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN cand c ON c.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
)
SELECT docid, round(score, 6) AS score FROM scored""",
        "ft_facets": f"""
WITH {_TOKS},
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('spark', 'join') GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
cand AS (SELECT docid FROM tfs GROUP BY docid
         HAVING COUNT(DISTINCT term) = (SELECT COUNT(*) FROM dfs)),
meta AS (SELECT CAST(doc_id AS VARCHAR) AS docid, lang, source FROM documents),
melted AS (
  SELECT 'lang' AS facet, COALESCE(lang, '(none)') AS value
  FROM meta JOIN cand USING (docid)
  UNION ALL
  SELECT 'source' AS facet, COALESCE(source, '(none)') AS value
  FROM meta JOIN cand USING (docid)
),
counts AS (SELECT facet, value, COUNT(*) AS n_docs
           FROM melted GROUP BY facet, value),
ranked AS (
  SELECT facet, value, n_docs,
         CAST(row_number() OVER (
           PARTITION BY facet ORDER BY n_docs DESC, value ASC
         ) AS INT) AS rank
  FROM counts
)
SELECT facet, value, n_docs, rank FROM ranked WHERE rank <= 5""",
        "ft_collapse": f"""
WITH {_TOKS},{_DL_STATS},
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('spark', 'join') GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
cand AS (SELECT docid FROM tfs GROUP BY docid
         HAVING COUNT(DISTINCT term) = (SELECT COUNT(*) FROM dfs)),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN cand c ON c.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
),
grp AS (
  SELECT s.docid, s.score,
         COALESCE(d.lang, '(none)') AS group_value
  FROM scored s
  JOIN (SELECT CAST(doc_id AS VARCHAR) AS docid, lang FROM documents) d
    USING (docid)
),
hits AS (
  SELECT group_value, docid, score,
         CAST(row_number() OVER (
           PARTITION BY group_value ORDER BY score DESC, docid ASC
         ) AS INT) AS hit_rank
  FROM grp
),
topg AS (
  SELECT group_value, score AS head_score,
         CAST(row_number() OVER (
           ORDER BY score DESC, group_value ASC
         ) AS INT) AS group_rank
  FROM hits WHERE hit_rank = 1
  ORDER BY score DESC, group_value ASC
  LIMIT 5
)
SELECT h.group_value, t.group_rank, h.docid, h.hit_rank,
       round(h.score, 6) AS score
FROM topg t
JOIN hits h ON h.group_value = t.group_value AND h.hit_rank <= 2
ORDER BY t.group_rank, h.hit_rank""",
        "ltr_features": f"""
WITH {_TOKS},{_DL_STATS},
q(query_id, term) AS (VALUES (1, 'spark'), (1, 'join'), (2, 'merge'),
                             (2, 'window'), (2, 'zzz_oov')),
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
nt AS (SELECT query_id, COUNT(DISTINCT term) AS n_terms FROM q GROUP BY query_id),
cand AS (
  SELECT q.query_id, t.docid, t.tf,
         ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0) AS idf,
         ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
           * (((1.5 + 1.0) * t.tf) /
              (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf))
           AS term_score,
         l.doc_len
  FROM q
  JOIN tfs t ON t.term = q.term
  JOIN dfs f ON f.term = q.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
),
per AS (
  SELECT query_id, docid,
         SUM(term_score) AS bm25,
         MAX(term_score) AS bm25_max,
         MIN(term_score) AS bm25_min,
         CAST(SUM(tf) AS BIGINT) AS tf_sum,
         SUM(idf) AS idf_sum,
         CAST(COUNT(*) AS BIGINT) AS n_matched,
         CAST(MAX(doc_len) AS DOUBLE) AS doc_len
  FROM cand GROUP BY query_id, docid
)
SELECT CAST(p.query_id AS BIGINT) AS query_id, p.docid,
       round(p.bm25, 6) AS bm25,
       round(p.bm25_max, 6) AS bm25_max,
       round(p.bm25_min, 6) AS bm25_min,
       p.tf_sum,
       round(p.idf_sum, 6) AS idf_sum,
       p.n_matched,
       CAST(n.n_terms AS BIGINT) AS n_terms,
       round(p.n_matched * 1.0 / n.n_terms, 6) AS match_ratio,
       p.doc_len
FROM per p JOIN nt n USING (query_id)""",
        "lm_quality": """
WITH tokp AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY ord) AS pos
  FROM (
    SELECT CAST(doc_id AS VARCHAR) AS docid,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents
  ) WHERE term <> ''
),
uni AS (SELECT term AS w, COUNT(*) AS c FROM tokp GROUP BY term),
voc AS (SELECT COUNT(*) AS v FROM uni),
big AS (
  SELECT a.term AS w1, b.term AS w2, COUNT(*) AS c
  FROM tokp a JOIN tokp b ON b.docid = a.docid AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
target AS (SELECT CAST(doc_id AS VARCHAR) AS docid FROM documents
           WHERE doc_id % 11 = 0),
db AS (
  SELECT a.docid, a.term AS w1, b.term AS w2
  FROM tokp a JOIN tokp b ON b.docid = a.docid AND b.pos = a.pos + 1
  WHERE a.docid IN (SELECT docid FROM target)
),
scored AS (
  SELECT db.docid,
         ln((COALESCE(g.c, 0) + 1.0) / (COALESCE(u.c, 0) + 1.0 * v.v)) AS lp
  FROM db
  LEFT JOIN big g ON g.w1 = db.w1 AND g.w2 = db.w2
  LEFT JOIN uni u ON u.w = db.w1
  CROSS JOIN voc v
),
per AS (SELECT docid, COUNT(*) AS n_bigrams, AVG(lp) AS avg_logprob
        FROM scored GROUP BY docid)
SELECT t.docid,
       CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(p.avg_logprob, 6) AS avg_logprob
FROM target t LEFT JOIN per p USING (docid)""",
        "ngram_counts": """
WITH tokp AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY ord) AS pos
  FROM (
    SELECT CAST(doc_id AS VARCHAR) AS docid,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents
  ) WHERE term <> ''
)
SELECT [a.term, b.term, c3.term] AS gram,
       CAST(COUNT(*) AS BIGINT) AS c
FROM tokp a
JOIN tokp b ON b.docid = a.docid AND b.pos = a.pos + 1
JOIN tokp c3 ON c3.docid = a.docid AND c3.pos = a.pos + 2
GROUP BY 1
HAVING COUNT(*) >= 3""",
        "lm_select": """
WITH tokp AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY ord) AS pos
  FROM (
    SELECT CAST(doc_id AS VARCHAR) AS docid,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents
  ) WHERE term <> ''
),
uni AS (SELECT term AS w, COUNT(*) AS c FROM tokp GROUP BY term),
voc AS (SELECT COUNT(*) AS v FROM uni),
big AS (
  SELECT a.term AS w1, b.term AS w2, COUNT(*) AS c
  FROM tokp a JOIN tokp b ON b.docid = a.docid AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
db AS (
  SELECT a.docid, a.term AS w1, b.term AS w2
  FROM tokp a JOIN tokp b ON b.docid = a.docid AND b.pos = a.pos + 1
),
scored AS (
  SELECT db.docid,
         ln((COALESCE(g.c, 0) + 1.0) / (COALESCE(u.c, 0) + 1.0 * v.v)) AS lp
  FROM db
  LEFT JOIN big g ON g.w1 = db.w1 AND g.w2 = db.w2
  LEFT JOIN uni u ON u.w = db.w1
  CROSS JOIN voc v
),
per0 AS (SELECT docid, COUNT(*) AS n_bigrams, AVG(lp) AS avg_logprob
         FROM scored GROUP BY docid),
per AS (
  SELECT CAST(d.doc_id AS VARCHAR) AS docid,
         CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         p.avg_logprob
  FROM documents d LEFT JOIN per0 p ON p.docid = CAST(d.doc_id AS VARCHAR)
),
thr AS (SELECT quantile_cont(avg_logprob, 0.7) AS t FROM per
        WHERE avg_logprob IS NOT NULL)
SELECT per.docid, per.n_bigrams,
       round(per.avg_logprob, 6) AS avg_logprob,
       (per.avg_logprob IS NOT NULL AND per.avg_logprob >= thr.t) AS keep
FROM per CROSS JOIN thr""",
        "lm_complete": """
WITH tokp AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY ord) AS pos
  FROM (
    SELECT CAST(doc_id AS VARCHAR) AS docid,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents
  ) WHERE term <> ''
),
uni AS (SELECT term AS w, COUNT(*) AS c FROM tokp GROUP BY term),
big AS (
  SELECT a.term AS w1, b.term AS w2, COUNT(*) AS c
  FROM tokp a JOIN tokp b ON b.docid = a.docid AND b.pos = a.pos + 1
  GROUP BY 1, 2
)
SELECT g.w2 AS word, CAST(g.c AS BIGINT) AS c,
       round(g.c * 1.0 / u.c, 6) AS prob
FROM big g JOIN uni u ON u.w = g.w1
WHERE g.w1 = 'spark'
ORDER BY g.c DESC, g.w2 ASC LIMIT 10""",
        "ft_suggest": """
WITH tokp AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY ord) AS pos
  FROM (
    SELECT CAST(doc_id AS VARCHAR) AS docid,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents
  ) WHERE term <> ''
),
uni AS (SELECT term AS w, COUNT(*) AS c FROM tokp GROUP BY term),
voc AS (SELECT COUNT(*) AS v FROM uni),
big AS (
  SELECT a.term AS w1, b.term AS w2, COUNT(*) AS c
  FROM tokp a JOIN tokp b ON b.docid = a.docid AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
q(qpos, word, prev, nxt) AS (VALUES
  (0, 'fast', CAST(NULL AS VARCHAR), 'sprak'),
  (1, 'sprak', 'fast', 'jion'),
  (2, 'jion', 'sprak', CAST(NULL AS VARCHAR))
),
cand AS (
  SELECT q.qpos, q.word, q.prev, q.nxt, u.w AS term, u.c AS tf,
         levenshtein(u.w, q.word) AS dist
  FROM q JOIN uni u ON abs(length(u.w) - length(q.word)) <= 2
  WHERE levenshtein(u.w, q.word) <= 2
),
oov AS (SELECT qpos FROM cand GROUP BY qpos HAVING MIN(dist) > 0),
tot AS (SELECT SUM(c) AS t_total FROM uni),
scored AS (
  SELECT c.qpos, c.word, c.term, c.dist, c.tf,
    ln(c.tf * 1.0 / t.t_total)
  + (CASE WHEN c.prev IS NOT NULL THEN
       ln((COALESCE(bp.c, 0) + 1.0) / (COALESCE(up.c, 0) + 1.0 * v.v))
     ELSE 0 END)
  + (CASE WHEN c.nxt IS NOT NULL THEN
       ln((COALESCE(bn.c, 0) + 1.0) / (COALESCE(uc.c, 0) + 1.0 * v.v))
     ELSE 0 END) AS score
  FROM cand c
  JOIN oov USING (qpos)
  CROSS JOIN tot t
  LEFT JOIN big bp ON bp.w1 = c.prev AND bp.w2 = c.term
  LEFT JOIN big bn ON bn.w1 = c.term AND bn.w2 = c.nxt
  LEFT JOIN uni up ON up.w = c.prev
  LEFT JOIN uni uc ON uc.w = c.term
  CROSS JOIN voc v
)
SELECT CAST(qpos AS BIGINT) AS pos, word, term AS suggestion,
       CAST(dist AS INT) AS dist, round(score, 6) AS score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qpos ORDER BY score DESC, dist ASC, tf DESC, term ASC
  ) AS rn FROM scored
) WHERE rn = 1 ORDER BY pos""",
        "ft_termvectors": """
WITH tokp AS (
  SELECT docid, term,
         row_number() OVER (PARTITION BY docid ORDER BY ord) AS pos
  FROM (
    SELECT CAST(doc_id AS VARCHAR) AS docid,
           unnest(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS ord
    FROM documents WHERE doc_id % 97 = 0
  ) WHERE term <> ''
),
dl AS (SELECT docid, MAX(pos) AS doc_len FROM tokp GROUP BY docid)
SELECT t.docid, t.term,
       CAST(COUNT(*) AS BIGINT) AS tf,
       list(t.pos ORDER BY t.pos) AS positions,
       CAST(d.doc_len AS BIGINT) AS doc_len
FROM tokp t JOIN dl d USING (docid)
GROUP BY t.docid, t.term, d.doc_len""",
        "ft_facets_boolean": f"""
WITH {_TOKS},
pos AS (SELECT DISTINCT docid FROM toks WHERE term IN ('merge', 'spark')),
neg AS (SELECT DISTINCT docid FROM toks WHERE term = 'join'),
cand AS (SELECT docid FROM pos
         WHERE docid NOT IN (SELECT docid FROM neg)),
meta AS (SELECT CAST(doc_id AS VARCHAR) AS docid, lang FROM documents),
counts AS (
  SELECT 'lang' AS facet, COALESCE(lang, '(none)') AS value,
         COUNT(*) AS n_docs
  FROM meta JOIN cand USING (docid)
  GROUP BY 2
),
ranked AS (
  SELECT facet, value, n_docs,
         CAST(row_number() OVER (
           ORDER BY n_docs DESC, value ASC
         ) AS INT) AS rank
  FROM counts
)
SELECT facet, value, n_docs, rank FROM ranked WHERE rank <= 5""",
        "ft_percentiles": f"""
WITH {_TOKS},
cand AS (SELECT docid FROM toks WHERE term IN ('spark', 'join')
         GROUP BY docid HAVING COUNT(DISTINCT term) = 2),
vals AS (
  SELECT CAST(d.n_chars AS DOUBLE) AS v
  FROM documents d
  JOIN cand c ON c.docid = CAST(d.doc_id AS VARCHAR)
  WHERE d.n_chars IS NOT NULL
),
q AS (SELECT quantile_cont(v, [0.25, 0.5, 0.75, 0.95]) AS qs FROM vals)
SELECT CAST([0.25, 0.5, 0.75, 0.95][i] AS DOUBLE) AS p, round(val, 6) AS value
FROM (SELECT unnest(qs) AS val, generate_subscripts(qs, 1) AS i FROM q)
ORDER BY p""",
        "ft_cardinality": f"""
WITH {_TOKS},
cand AS (SELECT docid FROM toks WHERE term IN ('spark', 'join')
         GROUP BY docid HAVING COUNT(DISTINCT term) = 2)
SELECT CAST(COUNT(DISTINCT d.n_chars) AS BIGINT) AS n_distinct
FROM documents d
JOIN cand c ON c.docid = CAST(d.doc_id AS VARCHAR)
WHERE d.n_chars IS NOT NULL""",
        "ft_stats_facet": f"""
WITH {_TOKS},
cand AS (SELECT docid FROM toks WHERE term IN ('spark', 'join')
         GROUP BY docid HAVING COUNT(DISTINCT term) = 2),
vals AS (
  SELECT CAST(d.n_chars AS DOUBLE) AS v
  FROM documents d
  JOIN cand c ON c.docid = CAST(d.doc_id AS VARCHAR)
  WHERE d.n_chars IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(v) AS min, MAX(v) AS max,
       round(SUM(v), 6) AS sum,
       round(AVG(v), 6) AS avg,
       round(stddev_samp(v), 6) AS std
FROM vals""",
        "ft_histogram": f"""
WITH {_TOKS},
cand AS (SELECT docid FROM toks WHERE term IN ('spark', 'join')
         GROUP BY docid HAVING COUNT(DISTINCT term) = 2),
vals AS (
  SELECT CAST(d.n_chars AS DOUBLE) AS v
  FROM documents d
  JOIN cand c ON c.docid = CAST(d.doc_id AS VARCHAR)
  WHERE d.n_chars IS NOT NULL
)
SELECT floor(v / 250.0) * 250.0 AS bucket_start,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM vals GROUP BY 1 ORDER BY 1""",
        "ft_range_facet": f"""
WITH {_TOKS},
cand AS (SELECT docid FROM toks WHERE term IN ('spark', 'join')
         GROUP BY docid HAVING COUNT(DISTINCT term) = 2),
vals AS (
  SELECT CAST(d.n_chars AS DOUBLE) AS v
  FROM documents d
  JOIN cand c ON c.docid = CAST(d.doc_id AS VARCHAR)
  WHERE d.n_chars IS NOT NULL
),
ranges(range_lo, range_hi) AS (VALUES
  (CAST(NULL AS DOUBLE), 0.0),
  (0.0, 400.0),
  (400.0, 800.0),
  (800.0, CAST(NULL AS DOUBLE))
)
SELECT COALESCE(CAST(r.range_lo AS VARCHAR), '*') || '..'
       || COALESCE(CAST(r.range_hi AS VARCHAR), '*') AS range_key,
       CAST(COUNT(v.v) AS BIGINT) AS n_docs
FROM ranges r
LEFT JOIN vals v
  ON (r.range_lo IS NULL OR v.v >= r.range_lo)
 AND (r.range_hi IS NULL OR v.v < r.range_hi)
GROUP BY r.range_lo, r.range_hi""",
        "ft_sigterms": f"""
WITH {_TOKS},
fg AS (SELECT docid FROM toks WHERE term IN ('spark', 'join')
       GROUP BY docid HAVING COUNT(DISTINCT term) = 2),
fgn AS (SELECT COUNT(*) AS fg_n FROM fg),
nn AS (SELECT COUNT(*) AS n FROM documents),
dfs AS (SELECT term, COUNT(DISTINCT docid) AS bg FROM toks GROUP BY term),
fgc AS (SELECT t.term, COUNT(DISTINCT t.docid) AS fg_count
        FROM toks t JOIN fg USING (docid) GROUP BY t.term),
cells AS (
  SELECT d.term,
         CAST(c.fg_count AS DOUBLE) AS k11,
         CAST(d.bg - c.fg_count AS DOUBLE) AS k12,
         CAST(f.fg_n - c.fg_count AS DOUBLE) AS k21,
         CAST(n.n - d.bg - f.fg_n + c.fg_count AS DOUBLE) AS k22,
         CAST(n.n AS DOUBLE) AS nd,
         c.fg_count, d.bg, f.fg_n
  FROM dfs d
  JOIN fgc c USING (term)
  CROSS JOIN fgn f CROSS JOIN nn n
  WHERE d.bg >= 2 AND d.bg <= CAST(floor(0.5 * n.n) AS BIGINT)
    AND d.term NOT IN ('spark', 'join')
),
scored AS (
  SELECT term, fg_count, bg, fg_n, nd,
         2.0 * (
           CASE WHEN k11 > 0 THEN k11 * ln(k11 / ((k11+k12)*(k11+k21)/nd)) ELSE 0 END
         + CASE WHEN k12 > 0 THEN k12 * ln(k12 / ((k11+k12)*(k12+k22)/nd)) ELSE 0 END
         + CASE WHEN k21 > 0 THEN k21 * ln(k21 / ((k21+k22)*(k11+k21)/nd)) ELSE 0 END
         + CASE WHEN k22 > 0 THEN k22 * ln(k22 / ((k21+k22)*(k12+k22)/nd)) ELSE 0 END
         ) AS score
  FROM cells
  WHERE k11 / fg_n > bg / nd
)
SELECT term, CAST(fg_count AS BIGINT) AS fg_count,
       CAST(bg AS BIGINT) AS bg_count, round(score, 6) AS score
FROM scored ORDER BY score DESC, term ASC LIMIT 10""",
        # keyset pagination: the oracle IS the funnel formulation
        # (row_number BETWEEN) the operator exists to avoid
        "ft_search_after": f"""
WITH {_TOKS},{_DL_STATS},
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('merge', 'window') GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
),
ranked AS (
  SELECT docid, score,
         row_number() OVER (ORDER BY score DESC, docid ASC) AS rn
  FROM scored
)
SELECT CAST(rn - 10 AS INT) AS rank, docid, round(score, 6) AS score
FROM ranked WHERE rn BETWEEN 11 AND 20 ORDER BY rn""",
        "ft_sorted": f"""
WITH {_TOKS},{_DL_STATS},
tfs AS (SELECT docid, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('spark', 'join') GROUP BY docid, term),
dfs AS (SELECT term, COUNT(*) AS df FROM tfs GROUP BY term),
cand AS (SELECT docid FROM tfs GROUP BY docid
         HAVING COUNT(DISTINCT term) = (SELECT COUNT(*) FROM dfs)),
scored AS (
  SELECT t.docid,
         SUM( ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
            * (((1.5 + 1.0) * t.tf) /
               (1.5 * (1.0 - 0.75 + 0.75 * (l.doc_len / s.avg_dl)) + t.tf)) ) AS score
  FROM tfs t
  JOIN cand c ON c.docid = t.docid
  JOIN dfs f ON f.term = t.term
  JOIN dl l ON l.docid = t.docid
  CROSS JOIN stats s
  GROUP BY t.docid
),
joined AS (
  SELECT s.docid, s.score, d.n_chars
  FROM scored s
  JOIN (SELECT CAST(doc_id AS VARCHAR) AS docid, n_chars FROM documents) d
    USING (docid)
)
SELECT CAST(row_number() OVER (
         ORDER BY n_chars DESC, score DESC, docid ASC
       ) AS INT) AS rank,
       docid, CAST(n_chars AS BIGINT) AS sort_value,
       round(score, 6) AS score
FROM joined
ORDER BY n_chars DESC, score DESC, docid ASC
LIMIT 10""",
        "boolean_batch": f"""
SELECT CAST(1 AS INTEGER) AS query_id, * FROM (
{_boolean_true_sql(["merge", "spark"], ["join"])}
)
UNION ALL
SELECT CAST(2 AS INTEGER) AS query_id, * FROM (
{_bm25_true_sql(["spark", "join"], "and")}
)""",
        "ft_snippets": _snippet_true_sql(["spark", "join"], 10),
        "autocomplete_batch": f"""
WITH {_TOKS},
lex AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
p AS (SELECT * FROM (VALUES ('s'), ('re'), ('con')) AS t(prefix)),
j AS (
  SELECT p.prefix, lex.term, lex.tf,
         row_number() OVER (
           PARTITION BY p.prefix ORDER BY lex.tf DESC, lex.term ASC
         ) AS rank
  FROM p JOIN lex ON substring(lex.term, 1, length(p.prefix)) = p.prefix
)
SELECT prefix, CAST(rank AS INT) AS rank, term, tf
FROM j WHERE rank <= 5""",
        "ft_autocomplete": f"""
WITH {_TOKS}
SELECT term, COUNT(*) AS tf
FROM toks WHERE term LIKE 's%'
GROUP BY term
ORDER BY tf DESC, term ASC LIMIT 10""",
        "dedup_exact": """
SELECT md5(text) AS digest, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents
GROUP BY md5(text)
ORDER BY n_docs DESC, digest ASC LIMIT 100""",
        "dedup_ngram_jaccard": """
WITH docs AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents WHERE doc_id < 500
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(0, greatest(len(toks) - 3, 0)),
           i -> array_to_string(toks[i + 1 : i + 3], ' ')
         )) AS gs
  FROM docs WHERE len(toks) > 0
),
sizes AS (SELECT doc_id, len(gs) AS n_grams FROM grams),
ex AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(n_inter * 1.0 / (sa.n_grams + sb.n_grams - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_inter * 1.0 / (sa.n_grams + sb.n_grams - n_inter) >= 0.2""",
        "dedup_embedding": """
WITH n AS (
  SELECT vec_id, embedding,
    sqrt(list_sum(list_transform(embedding,
      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings WHERE vec_id < 500
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(
    list_sum(list_transform(generate_series(1, len(a.embedding)),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (a.nrm * b.nrm), 6) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(generate_series(1, len(a.embedding)),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (a.nrm * b.nrm) >= 0.4""",
        "ann_cosine_topk": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id,
    list_sum(list_transform(generate_series(1, len(e.embedding)),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
    / ( sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
      * sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),
          i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) ) AS score
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id,
       CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INTEGER) AS rank,
       round(score, 6) AS score
FROM s ORDER BY score DESC, vec_id ASC LIMIT 10""",
        "ann_lsh": _ann_lsh_oracle_sql(),
        "ann_ivf_stored": _ann_ivf_stored_oracle(),
        # primary folded onto its stored twin (round-4: every fold-able
        # entry converges to oracle-checked; see q_ann_ivf docstring)
        "ann_ivf": _ann_ivf_stored_oracle(),
        "ann_ivfpq": _ann_ivfpq_stored_oracle(),
        # oracle over the SAME persisted signature table the Spark query
        # writes (the kernel is pytest-verified; banding/est_jaccard are
        # relational and fully checked here). 16 bands x 4 rows; DuckDB
        # list slice is 1-based inclusive.
        "dedup_minhash_banded": f"""
WITH s AS (
  SELECT doc_id, sig
  FROM read_parquet('{_oracle_path("minhash_sigs")}/*.parquet')
),
bands AS (
  SELECT doc_id, b, sig[b*4+1 : b*4+4] AS key
  FROM s CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM bands a
  JOIN bands c ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
),
p AS (
  SELECT cand.id_a, cand.id_b,
    list_sum(list_transform(generate_series(1, 64),
      i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 64.0
      AS est_jaccard
  FROM cand
  JOIN s sa ON sa.doc_id = cand.id_a
  JOIN s sb ON sb.doc_id = cand.id_b
)
SELECT id_a, id_b, round(est_jaccard, 6) AS est_jaccard
FROM p WHERE est_jaccard >= 0.5""",
        # oracle over the persisted near-dup PAIR table: a recursive-CTE
        # min-label fixpoint reproduces the Spark hash-min connected
        # components exactly (labels propagate along symmetric edges to
        # the min reachable id).
        "dedup_clusters": f"""
WITH RECURSIVE e AS (
  SELECT id_a AS s, id_b AS d
  FROM read_parquet('{_oracle_path("dup_pairs")}/*.parquet')
  UNION
  SELECT id_b, id_a
  FROM read_parquet('{_oracle_path("dup_pairs")}/*.parquet')
),
r(node, label) AS (
  SELECT s, s FROM e
  UNION
  SELECT e.s, r.label FROM e JOIN r ON r.node = e.d
)
SELECT node AS doc_id, MIN(label) AS cluster_id,
       node = MIN(label) AS is_canonical
FROM r GROUP BY node""",
        # oracle over the persisted simhash table (same split: kernel is
        # pytest-verified, bucketing + Hamming verify checked here).
        # (h >> 16t) & 65535 extracts each 16-bit slice — the mask makes
        # DuckDB's arithmetic shift equal Spark's shiftrightunsigned.
        "dedup_simhash_stored": f"""
WITH s AS (
  SELECT doc_id, simhash FROM read_parquet('{_oracle_path("simhash")}/*.parquet')
),
sl AS (
  SELECT doc_id, simhash, t, (simhash >> (16 * t)) & 65535 AS key
  FROM s CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS t)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS h_a, b.simhash AS h_b
  FROM sl a JOIN sl b ON a.t = b.t AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(h_a, h_b)) <= 3""",
        "decontam_report": """
WITH corpus AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                     x -> x <> '') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(toks) - 7),
                                      i -> array_to_string(toks[i:i+7], ' '))) AS gs
  FROM corpus WHERE len(toks) >= 8
),
bg AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 37 = 0),
cg AS (SELECT doc_id, len(gs) AS total, unnest(gs) AS g FROM grams),
ov AS (
  SELECT doc_id,
         COUNT(*) AS overlap_grams,
         CAST(ANY_VALUE(total) AS BIGINT) AS total_grams
  FROM cg JOIN bg USING (g)
  GROUP BY doc_id
)
SELECT doc_id, overlap_grams, total_grams,
       round(overlap_grams * 1.0 / total_grams, 6) AS overlap_frac
FROM ov
WHERE overlap_grams >= 1
ORDER BY doc_id""",
        "select_budget": """
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
q AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN len(list_distinct(toks)) * 1.0 / len(toks)
              ELSE 0.0 END AS score
  FROM base
),
c AS (
  SELECT doc_id, n_tokens, score,
         SUM(n_tokens) OVER (ORDER BY score DESC, doc_id ASC) AS cum
  FROM q
)
SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
       round(score, 6) AS score
FROM c WHERE cum <= 10000
ORDER BY doc_id""",
        "sample_stratified": """
WITH thr AS (
  SELECT * FROM (VALUES
    ('en', '100000000'), ('de', '080000000'),
    ('fr', '040000000'), ('zh', '019999999')
  ) AS t(lang, thr)
)
SELECT doc_id, lang
FROM documents LEFT JOIN thr USING (lang)
WHERE '0' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      < COALESCE(thr, '00ccccccc')
ORDER BY doc_id""",
        "pack_sequences": r"""
WITH toks AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
      AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    CAST(SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT) AS s
  FROM toks WHERE n_tokens > 0
)
SELECT c.doc_id,
  k.seq_id,
  GREATEST(c.s, k.seq_id * 512) - k.seq_id * 512 AS tok_start,
  LEAST(c.s + c.n_tokens, (k.seq_id + 1) * 512)
    - GREATEST(c.s, k.seq_id * 512) AS n_tok
FROM c, LATERAL (
  SELECT UNNEST(range(c.s // 512, (c.s + c.n_tokens - 1) // 512 + 1))
    AS seq_id
) k
ORDER BY doc_id, seq_id""",
        "token_counts": r"""
SELECT doc_id,
  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
    AS n_ws_tokens,
  CAST(len(regexp_extract_all(
    text, '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
  )) AS BIGINT) AS n_bpe_tokens
FROM documents""",
        "text_quality": f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  round(CASE WHEN len(toks) > 0
    THEN list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) * 1.0 / len(toks)
    ELSE 0.0 END, 6) AS avg_token_len,
  round(CASE WHEN len(toks) > 0
    THEN len(list_filter(toks, t -> t IN ('{sq.join(QUALITY_STOPWORDS)}'))) * 1.0 / len(toks)
    ELSE 0.0 END, 6) AS stopword_ratio,
  round(CASE WHEN len(toks) > 0
    THEN len(list_distinct(toks)) * 1.0 / len(toks)
    ELSE 0.0 END, 6) AS distinct_ratio
FROM base""",
        "lang_id": _lang_id_sql(),
        "tpch_q1": """
WITH f AS (
  SELECT l_returnflag, l_linestatus,
    CAST(round(l_quantity, 0) AS BIGINT) AS qi,
    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc,
    CAST(round(l_discount * 100, 0) AS BIGINT) AS dc,
    CAST(round(l_tax * 100, 0) AS BIGINT) AS tc
  FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
  CAST(SUM(qi) AS BIGINT) AS sum_qty,
  CAST(SUM(pc) AS BIGINT) / 100.0 AS sum_base_price,
  CAST(SUM(pc * (100 - dc)) AS BIGINT) / 10000.0 AS sum_disc_price,
  CAST(SUM(pc * (100 - dc) * (100 + tc)) AS BIGINT) / 1000000.0 AS sum_charge,
  CAST(SUM(qi) AS BIGINT) / COUNT(*) AS avg_qty,
  CAST(SUM(pc) AS BIGINT) / 100.0 / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM f GROUP BY l_returnflag, l_linestatus""",
        "tpch_q3": """
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
       / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
GROUP BY o_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) DESC,
         o_orderkey ASC
LIMIT 10""",
        "tpch_q5": """
SELECT r_name, n_name,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
       / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name""",
        "window_top_order": """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1""",
        "events_windowed": """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 1000, 0) AS BIGINT)) AS BIGINT) / 1000.0
         AS sum_value
FROM events GROUP BY 1, 2, 3""",
        "events_daily": """
SELECT CAST(ts AS DATE) AS day, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(round(value * 1000, 0) AS BIGINT)) AS BIGINT) / 1000.0 AS sum_value,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY CAST(ts AS DATE), event_type""",
        "events_sessionize": """
WITH x AS (
  SELECT user_id,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              > 1800000000
         THEN 1 ELSE 0 END AS ns
  FROM events
)
SELECT user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM x GROUP BY user_id""",
    }
    # round-4 fold: the legacy kernel-primary entries alias their
    # oracle-checked stored twins (same query function, same SQL), so
    # the only remaining no-oracle rows are text_fingerprint (kernel
    # pinned by a hypothesis property vs the big-int Horner) and
    # ft_compat_analyzer (stemmer not SQL-expressible).
    out["dedup_minhash"] = out["dedup_minhash_banded"]
    out["dedup_simhash"] = out["dedup_simhash_stored"]
    return out
