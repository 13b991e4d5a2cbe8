"""Physical-plan regression tests.

These assert the *plan shape* properties the engine's scale story
depends on — they catch silent regressions (a filter that stops
reaching the scan, a kernel that starts running twice, a join that
stops broadcasting) that row-level correctness tests cannot see.
"""

import re

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index, load_index,
    )

    out = str(tmp_path_factory.mktemp("planidx"))
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(120)
    )
    build_and_save_index(docs, out, "plan-test", mode="simple", stem=False)
    return load_index(spark, out)


def test_term_filter_reaches_postings_scan(spark, small_index):
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        decode_postings_df, prune_buckets,
    )

    terms = ["the", "and"]
    d = decode_postings_df(prune_buckets(small_index, terms), terms)
    plan = _plan(d)
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, plan
    # the term predicate must be applied AT the scan (DataFilters), not
    # in a post-scan Filter over the full table
    assert any("term" in l and " IN " in l for l in scan_lines), scan_lines


def test_search_batch_single_decode_single_repartition(spark, small_index):
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search_batch,
    )

    q = spark.createDataFrame(
        [(0, "the"), (1, "the"), (1, "and")], "query_id long, term string"
    )
    plan = _plan(search_batch(small_index, q, top_k=5))
    # the decode kernel must run exactly once (round-1 bug: a second
    # aggregate forced the whole decode to execute twice)
    assert len(re.findall(r"MapInPandas|MapInArrow", plan)) == 1, plan
    # the decoded-candidates frame crosses the wire exactly once: the
    # explicit query_id repartition that serves both the per-doc agg
    # and the final top-k window
    assert len(re.findall(r"REPARTITION_BY_NUM", plan)) == 1, plan


def test_textstats_plans_are_python_free(spark):
    from large_scale_hypertextual_search_engine_spark.operators.textstats import (
        language_id, quality_features,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps")], "doc_id long, text string"
    )
    for df in (
        quality_features(docs, "text", ("the",)),
        language_id(docs, "text"),
    ):
        plan = _plan(df)
        assert not re.search(r"EvalPython|InPandas", plan), plan


def test_tpch_q3_broadcasts_small_sides(spark):
    import __spark_entry__ as entry

    plan = _plan(entry.q_tpch_q3(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_tpch_q5_broadcasts_all_dims(spark):
    """r2 finding: q5 left customer to a shuffle join; every dimension
    (customer, supplier, nation, region) must broadcast — the fact
    table is the only shuffle participant."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_tpch_q5(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_phrase_search_plan_shape(spark, small_index):
    """Phrase plan: the positions decode kernel runs exactly ONCE (the
    match and the scoring both feed off the same grouped frame), the
    term predicate reaches the postings scan, and the slot/top-k joins
    broadcast — no sort-merge join anywhere in a phrase query."""
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        phrase_search,
    )

    plan = _plan(phrase_search(small_index, ["the", "and"], top_k=5))
    assert len(re.findall(r"MapInPandas|MapInArrow", plan)) == 1, plan
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert any("term" in l and " IN " in l for l in scan_lines), scan_lines
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_phrase_search_batch_plan_shape(spark, small_index):
    """Batch phrase mirrors search_batch: one decode kernel, one
    explicit query_id repartition feeding both the per-doc agg and the
    per-query window."""
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        phrase_search_batch,
    )

    plan = _plan(
        phrase_search_batch(
            small_index, {1: ["the", "and"], 2: ["the"]}, top_k=5
        )
    )
    assert len(re.findall(r"MapInPandas|MapInArrow", plan)) == 1, plan
    assert len(re.findall(r"REPARTITION_BY_NUM", plan)) == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_facets_single_aggregation_exchange(spark, small_index):
    """N facet dimensions must share ONE aggregation: exactly one
    explode (the melt) and one count-aggregate pair over it."""
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        search_facets,
    )

    facets = spark.createDataFrame(
        [(i, "en", "src") for i in range(1, 121)],
        "doc_int long, lang string, source string",
    )
    plan = _plan(
        search_facets(small_index, ["the"], facets, ["lang", "source"], top_n=5)
    )
    assert len(re.findall(r"Generate explode", plan)) == 1, plan
    # one decode of the postings total (the membership pass)
    assert len(re.findall(r"MapInPandas|MapInArrow", plan)) == 1, plan


def test_bm25f_decodes_once_per_field(spark, small_index, tmp_path_factory):
    """BM25F must scan/decode each FIELD index exactly once."""
    from large_scale_hypertextual_search_engine_spark.operators.bm25f import (
        search_bm25f,
    )
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index, load_index,
    )

    out2 = str(tmp_path_factory.mktemp("planidx2"))
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(120)
    )
    build_and_save_index(docs, out2, "plan-test2", mode="simple", stem=False)
    idx2 = load_index(spark, out2)
    plan = _plan(
        search_bm25f(
            {"title": small_index, "body": idx2},
            {"title": 2.0, "body": 1.0},
            ["the"], top_k=5,
        )
    )
    assert len(re.findall(r"MapInPandas|MapInArrow", plan)) == 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_federated_decodes_once_per_segment(spark, small_index, tmp_path_factory):
    from large_scale_hypertextual_search_engine_spark.operators.federated import (
        search_federated,
    )
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index, load_index,
    )

    out2 = str(tmp_path_factory.mktemp("planidx3"))
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .filter(F.col("docid").cast("long").between(200, 320))
    )
    build_and_save_index(docs, out2, "plan-test3", mode="simple", stem=False)
    seg2 = load_index(spark, out2)
    plan = _plan(
        search_federated([small_index, seg2], ["the"], top_k=5, mode="or")
    )
    assert len(re.findall(r"MapInPandas|MapInArrow", plan)) == 2, plan
    # one candidate exchange: the explicit doc_int repartition
    assert len(re.findall(r"REPARTITION_BY_NUM", plan)) == 1, plan


def test_tombstone_free_plan_unchanged(spark, small_index):
    """An index WITHOUT tombstones must produce a plan with no
    anti-join — exclude_tombstones is a strict no-op."""
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search,
    )

    assert "tombstones" not in small_index
    plan = _plan(search(small_index, ["the"], top_k=5))
    assert "LeftAnti" not in plan, plan


def test_match_docs_has_no_rank_window(spark, small_index):
    """match_docs is the rank-window-free match set (r4 finding #1):
    no Window anywhere, no query_id funnel repartition, one decode."""
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        match_docs,
    )

    for mode in ("and", "or"):
        plan = _plan(match_docs(small_index, ["the", "and"], mode=mode))
        assert "Window" not in plan, plan
        assert "REPARTITION_BY_NUM" not in plan, plan
        assert len(re.findall(r"MapInPandas|MapInArrow", plan)) == 1, plan


def test_facets_no_single_partition_window(spark, small_index):
    """The full match set must never cross a single-partition window
    (r4 finding #1): every Window in the facets plan partitions by
    facet; the membership pass has none."""
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        search_facets,
    )

    facets = spark.createDataFrame(
        [(i, "en") for i in range(1, 121)], "doc_int long, lang string"
    )
    plan = _plan(search_facets(small_index, ["the"], facets, ["lang"], top_n=5))
    win_lines = [l for l in plan.splitlines() if "Window" in l]
    assert win_lines, plan  # the per-facet rank window exists...
    for l in win_lines:  # ...and every window is facet-partitioned
        assert "facet#" in l.split("windowspecdefinition")[0] or "[facet#" in l, l


def test_boosted_topk_is_distributed(spark, small_index):
    """search_boosted's top-k must be a TakeOrderedAndProject over the
    distributed match set (r4 finding #1), not a full-set rank window:
    the only Window sits above the GlobalLimit (numbers <= k rows)."""
    from large_scale_hypertextual_search_engine_spark.operators.linkrank import (
        search_boosted,
    )

    boosts = spark.createDataFrame(
        [(i, 0.5) for i in range(1, 61)], "doc_int long, boost double"
    )
    plan = _plan(search_boosted(small_index, ["the"], boosts, top_k=5))
    assert "TakeOrderedAndProject" in plan, plan
    # the window (rank numbering) consumes the take-ordered output, so
    # in the operator tree it appears strictly ABOVE (before, in
    # toString order) the TakeOrderedAndProject node
    lines = plan.splitlines()
    win_at = [i for i, l in enumerate(lines) if "Window" in l]
    take_at = [i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l]
    assert win_at and take_at and max(win_at) < min(take_at), plan


def test_single_query_search_topk_is_distributed(spark, small_index):
    """r5: search() must not funnel its candidates through a one-task
    query_id repartition — the top-k is a TakeOrderedAndProject over
    the distributed match set; the only Window numbers <= k rows above
    the limit."""
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search,
    )

    plan = _plan(search(small_index, ["the", "and"], top_k=5))
    assert "TakeOrderedAndProject" in plan, plan
    assert "REPARTITION_BY_NUM" not in plan, plan
    lines = plan.splitlines()
    win_at = [i for i, l in enumerate(lines) if "Window" in l]
    take_at = [i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l]
    assert win_at and take_at and max(win_at) < min(take_at), plan


def test_synonyms_single_doc_exchange_distributed_topk(spark, small_index):
    """search_synonyms: one explicit doc_int repartition serves both
    agg levels (per-(doc, group) tf sum and per-doc fold); top-k is a
    TakeOrderedAndProject — no single-partition rank window."""
    from large_scale_hypertextual_search_engine_spark.operators.synonyms import (
        search_synonyms,
    )

    plan = _plan(
        search_synonyms(small_index, [["the", "and"], ["of"]], top_k=5)
    )
    assert "TakeOrderedAndProject" in plan, plan
    # exactly one hash repartition of the candidate frame
    assert plan.count("REPARTITION_BY_NUM") == 1, plan
    lines = plan.splitlines()
    win_at = [i for i, l in enumerate(lines) if "Window" in l]
    take_at = [i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l]
    assert win_at and take_at and max(win_at) < min(take_at), plan


def test_mlt_topk_is_distributed(spark, small_index):
    """more_like_this: retrieval rides match_docs (no rank-window
    funnel) + TakeOrderedAndProject; the source-doc exclusion is a
    broadcast anti-join, not a docid_map-wide join below the limit."""
    from large_scale_hypertextual_search_engine_spark.operators.mlt import (
        more_like_this,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(120)
    )
    docid = docs.selectExpr("min(docid)").first()[0]
    plan = _plan(more_like_this(small_index, docs, docid, top_k=5))
    assert "TakeOrderedAndProject" in plan, plan
    assert "REPARTITION_BY_NUM" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_explain_prunes_to_topk_before_output(spark, small_index):
    """explain_scores: the per-term breakdown joins the k survivors as
    a BROADCAST (the wide candidate frame is pruned to k docs before
    any output), and no single-partition window exists."""
    from large_scale_hypertextual_search_engine_spark.operators.explain import (
        explain_scores,
    )

    plan = _plan(explain_scores(small_index, ["the", "and"], top_k=5))
    assert "TakeOrderedAndProject" in plan, plan
    assert "REPARTITION_BY_NUM" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_related_docs_no_funnel_semi_join_prune(spark, small_index):
    """related_docs (batch MLT): every Window partitions by a data key
    (src_docid — no one-task funnel), the postings decode is pruned by
    a semi-join on the selected-term frame (no driver isin list), and
    one explicit src repartition feeds the scoring agg + rank window."""
    from large_scale_hypertextual_search_engine_spark.operators.mlt import (
        related_docs,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(50)
    )
    plan = _plan(related_docs(small_index, docs, top_k=3, max_terms=3))
    win_lines = [l for l in plan.splitlines() if "Window" in l]
    assert win_lines
    for l in win_lines:
        # every window is source-partitioned (term selection by
        # src_docid; the scoring top-k by the dense src_doc_int key
        # that rides the wide exchange since r6)
        assert "src_docid" in l or "src_doc_int" in l, l
    assert "LeftSemi" in plan, plan
    # two pinned exchanges since r6: the decode fan-out (round-robin,
    # so the candidate explosion runs at full width) and the src-keyed
    # exchange feeding the scoring agg + rank window
    assert plan.count("REPARTITION_BY_NUM") == 2, plan


def test_collapse_heads_are_aggregate_not_window(spark, small_index):
    """search_collapse with group_top_n=1: group heads come from a
    map-side-combining max(struct) AGGREGATE — no Window touches the
    match set; the only Window numbers <= k group rows above the
    GlobalLimit (same shape as search's distributed top-k)."""
    from large_scale_hypertextual_search_engine_spark.operators.collapse import (
        search_collapse,
    )

    groups = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(1, 121)],
        "doc_int long, lang string",
    )
    plan = _plan(
        search_collapse(small_index, ["the"], groups, "lang", top_k=3)
    )
    assert "TakeOrderedAndProject" in plan, plan
    lines = plan.splitlines()
    win_at = [i for i, l in enumerate(lines) if "Window" in l]
    take_at = [i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l]
    assert win_at and take_at and max(win_at) < min(take_at), plan


def test_search_after_topk_is_distributed(spark, small_index):
    """search_after: cursor predicate + TakeOrderedAndProject; the only
    Window numbers the page rows above the limit."""
    from large_scale_hypertextual_search_engine_spark.operators.pagination import (
        search_after,
    )

    plan = _plan(
        search_after(small_index, ["the"], cursor=(1.5, 3), page_size=5)
    )
    assert "TakeOrderedAndProject" in plan, plan
    lines = plan.splitlines()
    win_at = [i for i, l in enumerate(lines) if "Window" in l]
    take_at = [i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l]
    assert win_at and take_at and max(win_at) < min(take_at), plan


def test_sigterms_and_numeric_aggs_have_no_window(spark, small_index):
    """significant_terms / histogram / stats: pure aggregation plans —
    no Window operator anywhere, no per-row Python."""
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        histogram_facet,
        stats_facet,
    )
    from large_scale_hypertextual_search_engine_spark.operators.sigterms import (
        significant_terms,
    )

    vals = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 121)],
        "doc_int long, n double",
    )
    for df in (
        significant_terms(small_index, ["the"], top_n=5),
        histogram_facet(small_index, ["the"], vals, "n", 10.0),
        stats_facet(small_index, ["the"], vals, "n"),
    ):
        plan = _plan(df)
        assert "Window" not in plan, plan
        assert "BatchEvalPython" not in plan, plan


def test_lm_plans_are_python_free(spark, small_index):
    """train/score/suggest: whole-stage codegen only — no Python
    evaluation anywhere; scoring carries no Window."""
    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        score_docs_lm,
        suggest_context,
        train_bigram_lm,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(100)
    )
    lm = train_bigram_lm(docs)
    score_plan = _plan(score_docs_lm(docs, lm))
    assert "BatchEvalPython" not in score_plan, score_plan
    assert "Window" not in score_plan, score_plan
    sug_plan = _plan(suggest_context(small_index, lm, ["teh"], max_dist=1))
    assert "BatchEvalPython" not in sug_plan, sug_plan
