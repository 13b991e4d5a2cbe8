"""Dirichlet query likelihood and hybrid RRF: Python-mirror parity."""

import math

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.ranking import (
    hybrid_search,
    search_ql,
)

MU = 500.0


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(200)
        .cache()
    )


@pytest.fixture(scope="module")
def ql_index(spark, corpus):
    return build_index(corpus, mode="simple", stem=False, salt_buckets=2)


def _mirror_ql(rows, terms, mu):
    """The UNFOLDED textbook formula: Σ_t ln((tf + μ·p_t) / (|d| + μ))
    over every in-collection query term, present or not — verifying the
    operator's per-query-constant folding algebraically."""
    tf, dl, ctf, total = {}, {}, {}, 0
    for r in rows:
        toks = [t for t in r["content"].split(" ") if t]
        dl[r["docid"]] = len(toks)
        total += len(toks)
        for t in toks:
            tf.setdefault(r["docid"], {}).setdefault(t, 0)
            tf[r["docid"]][t] += 1
            ctf[t] = ctf.get(t, 0) + 1
    inq = [t for t in dict.fromkeys(terms) if ctf.get(t)]
    scores = {}
    for d in dl:
        if not any(tf.get(d, {}).get(t) for t in inq):
            continue  # candidate set: >= 1 query term present
        s = 0.0
        for t in inq:
            p = ctf[t] / total
            s += math.log(
                (tf.get(d, {}).get(t, 0) + mu * p) / (dl[d] + mu)
            )
        scores[d] = s
    return scores


def test_ql_matches_unfolded_formula(spark, corpus, ql_index):
    rows = corpus.collect()
    want = _mirror_ql(rows, ["join", "spark"], MU)
    got = {
        r["docid"]: r["score"]
        for r in search_ql(
            ql_index, ["join", "spark"], top_k=10**6, mu=MU
        ).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), d
    assert got


def test_ql_drops_oov_terms(spark, corpus, ql_index):
    with_oov = {
        r["docid"]: r["score"]
        for r in search_ql(
            ql_index, ["join", "zzzmissing"], top_k=10**6, mu=MU
        ).collect()
    }
    without = {
        r["docid"]: r["score"]
        for r in search_ql(ql_index, ["join"], top_k=10**6, mu=MU).collect()
    }
    assert with_oov == without and with_oov


def test_ql_all_oov_empty(spark, ql_index):
    assert search_ql(ql_index, ["zzz", "qqq"], top_k=5).count() == 0


def test_hybrid_rrf_matches_components(spark, corpus, ql_index):
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search,
    )
    from large_scale_hypertextual_search_engine_spark.operators.similarity import (
        cosine_topk,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 200)
        .cache()
    )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
    ]
    depth, k = 30, 60
    bm = {
        r["docid"]: r["rank"]
        for r in search(
            ql_index, ["join", "spark"], top_k=depth, mode="or"
        ).collect()
    }
    cos_rows = sorted(
        (
            (-r["score"], int(r["vec_id"]))
            for r in cosine_topk(
                emb, qvec, k=depth, vec_col="embedding", id_col="vec_id"
            ).collect()
        )
    )
    cos = {str(vid): i + 1 for i, (_, vid) in enumerate(cos_rows)}
    want = {}
    for d in set(bm) | set(cos):
        want[d] = (1.0 / (k + bm[d]) if d in bm else 0.0) + (
            1.0 / (k + cos[d]) if d in cos else 0.0
        )
    top = sorted(want.items(), key=lambda x: (-x[1], int(x[0])))[:10]

    got = hybrid_search(
        ql_index, emb, ["join", "spark"], qvec, top_k=10, depth=depth,
        k_rrf=k,
    ).collect()
    got_pairs = [(r["docid"], r["rrf"]) for r in sorted(got, key=lambda r: r["rank"])]
    # rrf tie-break is doc_int (== docid string order); mirror uses
    # int order — compare as sets of (docid, rrf) over the top-10 pool
    assert {d for d, _ in got_pairs} <= set(want)
    for d, v in got_pairs:
        assert v == pytest.approx(want[d], abs=5e-10), d  # rrf is round(,9)
    assert {round(v, 9) for _, v in got_pairs} == {
        round(v, 9) for _, v in top
    }
    # both systems contribute to the fused pool
    assert any(r["bm25_rank"] > 0 for r in got)
    assert any(r["cos_rank"] > 0 for r in got)


def test_hybrid_single_system_docs_still_fuse(spark, ql_index):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 450).collect()[0]["embedding"]
    ]
    got = hybrid_search(
        ql_index, emb, ["join"], qvec, top_k=50, depth=20, k_rrf=60
    ).collect()
    only_dense = [r for r in got if r["bm25_rank"] == 0]
    only_lex = [r for r in got if r["cos_rank"] == 0]
    assert only_dense and only_lex  # docs found by exactly one system
    for r in only_dense:
        assert r["rrf"] == pytest.approx(1.0 / (60 + r["cos_rank"]), abs=5e-10)
