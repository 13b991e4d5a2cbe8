"""Synonym-group retrieval (Lucene SynonymQuery semantics): summed tf,
max member df, group-level AND/OR, brute-force oracle parity, and
degenerate equivalence with plain ``search``.
"""

import pytest

from large_scale_hypertextual_search_engine_spark.functions.bm25 import (
    bm25_score_py,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.query import search
from large_scale_hypertextual_search_engine_spark.operators.synonyms import (
    search_synonyms,
)


@pytest.fixture(scope="module")
def syn_fixture(spark):
    docs_df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
    )
    idx = build_index(docs_df, mode="simple", stem=False, salt_buckets=2)
    for k in ("doc_stats", "postings", "lexicon", "docid_map",
              "collection_stats"):
        idx[k] = idx[k].cache()
    docs = {
        r["docid"]: [t for t in r["content"].split(" ") if t]
        for r in docs_df.collect()
    }
    return idx, docs


def _brute_synonyms(docs, groups, top_k=10, mode="and"):
    """Driver-side oracle: tf_g = sum member tf, df_g = max member df."""
    n_docs = len(docs)
    avg_dl = sum(len(t) for t in docs.values()) / n_docs
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    present_groups = [
        gid for gid, g in enumerate(groups) if any(t in df for t in g)
    ]
    out = []
    for docid, toks in docs.items():
        scores = []
        for gid in present_groups:
            members = dict.fromkeys(groups[gid])
            tf_g = sum(toks.count(t) for t in members)
            if tf_g == 0:
                continue
            df_g = max(df[t] for t in members if t in df)
            scores.append(
                bm25_score_py(tf_g, df_g, len(toks), n_docs, avg_dl)
            )
        if not scores:
            continue
        if mode == "and" and len(scores) < len(present_groups):
            continue
        acc = 0.0  # the engine's ascending-sorted sequential FP fold
        for x in sorted(scores):
            acc += x
        out.append((docid, acc))
    out.sort(key=lambda x: (-x[1], x[0]))
    return [(d, round(s, 6)) for d, s in out[:top_k]]


def _got(res):
    return [(r["docid"], round(r["score"], 6)) for r in res.collect()]


def _pick_groups(docs):
    """Two synonym groups built from the corpus vocabulary such that at
    least one doc contains members of both."""
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    common = sorted(df, key=lambda t: (-df[t], t))
    assert len(common) >= 4
    return [[common[0], common[2]], [common[1]]]


def test_matches_brute_force_and(syn_fixture):
    idx, docs = syn_fixture
    groups = _pick_groups(docs)
    got = _got(search_synonyms(idx, groups, top_k=10, mode="and"))
    assert got == _brute_synonyms(docs, groups, 10, "and")


def test_matches_brute_force_or(syn_fixture):
    idx, docs = syn_fixture
    groups = _pick_groups(docs)
    got = _got(search_synonyms(idx, groups, top_k=10, mode="or"))
    assert got == _brute_synonyms(docs, groups, 10, "or")


def test_singleton_groups_equal_plain_search(syn_fixture):
    idx, docs = syn_fixture
    groups = _pick_groups(docs)
    flat = [groups[0][0], groups[1][0]]
    for mode in ("and", "or"):
        syn = _got(
            search_synonyms(idx, [[t] for t in flat], top_k=10, mode=mode)
        )
        plain = [
            (r["docid"], round(r["score"], 6))
            for r in search(idx, flat, top_k=10, mode=mode).collect()
        ]
        assert syn == plain, mode


def test_oov_member_ignored_within_group(syn_fixture):
    idx, docs = syn_fixture
    groups = _pick_groups(docs)
    with_oov = [groups[0] + ["zzzqqqneverseen"], groups[1]]
    assert _got(search_synonyms(idx, with_oov, top_k=10)) == _got(
        search_synonyms(idx, groups, top_k=10)
    )


def test_all_oov_group_not_required_in_and(syn_fixture):
    """A group with NO member in the lexicon is not 'present', so AND
    does not require it — mirrors search()'s present-term semantics."""
    idx, docs = syn_fixture
    groups = _pick_groups(docs)
    with_ghost = groups + [["zzzqqqneverseen"]]
    assert _got(search_synonyms(idx, with_ghost, top_k=10)) == _got(
        search_synonyms(idx, groups, top_k=10)
    )


def test_duplicate_members_deduped(syn_fixture):
    idx, docs = syn_fixture
    groups = _pick_groups(docs)
    doubled = [groups[0] + [groups[0][0]], groups[1]]
    assert _got(search_synonyms(idx, doubled, top_k=10)) == _got(
        search_synonyms(idx, groups, top_k=10)
    )


def test_doc_filter_restricts(syn_fixture, spark):
    idx, docs = syn_fixture
    groups = _pick_groups(docs)
    keep = sorted(docs)[::2]
    flt = spark.createDataFrame([(d,) for d in keep], "docid string")
    got = _got(search_synonyms(idx, groups, top_k=100, doc_filter=flt))
    unfiltered = _brute_synonyms(docs, groups, 10**9, "and")
    expected = [x for x in unfiltered if x[0] in set(keep)][:100]
    assert got == expected


def test_empty_groups_rejected(syn_fixture):
    idx, _ = syn_fixture
    with pytest.raises(ValueError):
        search_synonyms(idx, [])
    with pytest.raises(ValueError):
        search_synonyms(idx, [["a"], []])
