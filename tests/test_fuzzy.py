"""Fuzzy term matching: brute parity vs Python levenshtein, SymSpell
deletion-index equivalence, and search_fuzzy correction semantics."""

import pytest

from large_scale_hypertextual_search_engine_spark.operators.fuzzy import (
    DeletionIndex,
    fuzzy_candidates,
    search_fuzzy,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.query import search


@pytest.fixture(scope="module")
def fidx(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
    )
    idx = build_index(docs, mode="simple", stem=False, salt_buckets=2)
    idx["lexicon"] = idx["lexicon"].cache()
    return idx


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(idx, word, d, n):
    lex = [(r["term"], r["tf"]) for r in idx["lexicon"].select("term", "tf").collect()]
    cand = [(t, _lev(t, word), tf) for t, tf in lex]
    cand = [(t, dist, tf) for t, dist, tf in cand if dist <= d]
    cand.sort(key=lambda x: (x[1], -x[2], x[0]))
    return [(t, dist, tf) for t, dist, tf in cand[:n]]


@pytest.mark.parametrize("word,d", [("sprak", 2), ("joim", 1), ("colunm", 2)])
def test_fuzzy_candidates_match_bruteforce(spark, fidx, word, d):
    got = [
        (r["term"], r["dist"], r["tf"])
        for r in fuzzy_candidates(fidx, word, max_dist=d, top_n=5).collect()
    ]
    want = _brute(fidx, word, d, 5)
    assert got == want
    assert got, (word, d)


def test_exact_word_wins(spark, fidx):
    got = fuzzy_candidates(fidx, "join", max_dist=1, top_n=3).collect()
    assert got[0]["term"] == "join" and got[0]["dist"] == 0


@pytest.mark.parametrize("d", [1, 2])
def test_deletion_index_equals_brute_scan(spark, fidx, d):
    di = DeletionIndex.build(fidx, max_dist=d)
    di.sigs = di.sigs.cache()
    for word in ["joim", "sprak", "valeu", "join"]:
        got = [
            (r["term"], r["dist"], r["tf"])
            for r in di.lookup(spark, word, top_n=5).collect()
        ]
        want = [
            (r["term"], r["dist"], r["tf"])
            for r in fuzzy_candidates(fidx, word, max_dist=d, top_n=5).collect()
        ]
        assert got == want, (word, d)


def test_search_fuzzy_corrects_oov(spark, fidx):
    res, corr = search_fuzzy(fidx, ["joim", "spark"], top_k=10, mode="and")
    assert corr == {"joim": "join"}
    want = [
        (r["rank"], r["docid"], r["score"])
        for r in search(fidx, ["join", "spark"], top_k=10, mode="and").collect()
    ]
    got = [(r["rank"], r["docid"], r["score"]) for r in res.collect()]
    assert sorted(got) == sorted(want)
    assert got


def test_search_fuzzy_leaves_vocab_terms_alone(spark, fidx):
    res, corr = search_fuzzy(fidx, ["join", "spark"], top_k=5, mode="and")
    assert corr == {}
    assert res.count() == 5


def test_fuzzy_plan_is_jvm_only(spark, fidx):
    plan = (
        fuzzy_candidates(fidx, "sprak", max_dist=2, top_n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the cached lexicon's BUILD lineage (which legitimately uses
    # Arrow kernels) is printed under its InMemoryRelation — assert
    # Python-freedom of the fuzzy query plan above it only
    query_plan = plan.split("InMemoryRelation")[0]
    assert "levenshtein" in query_plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in query_plan, plan


def test_deletion_index_save_load_roundtrip(spark, fidx, tmp_path):
    path = str(tmp_path / "delidx")
    di = DeletionIndex.build(fidx, max_dist=1)
    di.save(path)
    loaded = DeletionIndex.load(spark, path)
    assert loaded.max_dist == 1
    a = [tuple(r) for r in di.lookup(spark, "joim", top_n=5).collect()]
    b = [tuple(r) for r in loaded.lookup(spark, "joim", top_n=5).collect()]
    assert a == b and a


def test_correct_terms_one_job_matches_per_term(spark, fidx):
    """Batched correction (ONE lexicon scan for N typos, r4 finding #3)
    returns exactly what the per-term fuzzy_candidates argmin would."""
    from large_scale_hypertextual_search_engine_spark.operators.fuzzy import (
        correct_terms,
    )

    words = ["sprak", "joim", "windoq", "zzzzzzzzqqq"]
    got = correct_terms(fidx, words, max_dist=1)
    for w in words:
        best = fuzzy_candidates(fidx, w, max_dist=1, top_n=1).collect()
        if best:
            assert got[w] == best[0]["term"], w
        else:
            assert w not in got
    # dedup + case-fold behave like the engine's term handling
    assert correct_terms(fidx, ["JOIM", "joim"], max_dist=1) == {
        "joim": got["joim"]
    }
    assert correct_terms(fidx, [], max_dist=1) == {}


def test_deletion_index_build_is_pandas_udf(spark, fidx):
    """The signature generator must be Arrow-batched (ArrowEvalPython /
    no row-at-a-time BatchEvalPython), and the table must equal the
    Python-generated signature set."""
    from large_scale_hypertextual_search_engine_spark.operators.fuzzy import (
        _deletions,
    )

    di = DeletionIndex.build(fidx, max_dist=1)
    plan = di.sigs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, plan

    lex = {
        r["term"]: r["tf"]
        for r in fidx["lexicon"].select("term", "tf").limit(50).collect()
    }
    got = {
        (r["sig"], r["term"], r["tf"])
        for r in di.sigs.filter(
            di.sigs["term"].isin(list(lex))
        ).collect()
    }
    want = {
        (s, t, tf) for t, tf in lex.items() for s in _deletions(t, 1)
    }
    assert got == want


def test_no_row_udf_anywhere_in_package():
    """House rule (input_hint: no per-row Python): the package must not
    call F.udf / pyspark.sql.functions.udf anywhere — pandas_udf,
    mapInPandas and mapInArrow are the only Python escapes."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / (
        "large_scale_hypertextual_search_engine_spark"
    )
    offenders = []
    for py in pkg.rglob("*.py"):
        src = py.read_text()
        for m in re.finditer(
            r"F\.udf\s*\(|functions\s+import\s+(?:[\w, ]*[^_\w])?udf\b",
            src,
        ):
            offenders.append(f"{py.name}:{src[: m.start()].count(chr(10)) + 1}")
    assert not offenders, offenders
