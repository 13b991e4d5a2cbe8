"""Corpus selection (operators/selection.py).

select_by_token_budget must equal the single-window SQL semantics
(inclusive cumsum over score DESC, id ASC prefix) computed brute-force
on the driver; sample_stratified must be deterministic, rate-accurate,
and honor the default rate.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.selection import (
    sample_stratified,
    select_by_token_budget,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def scored(spark):
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("score"),
    ).cache()


def _brute_prefix(rows, budget):
    order = sorted(rows, key=lambda r: (-r["score"], r["doc_id"]))
    out, cum = {}, 0
    for r in order:
        cum += r["n_tokens"]
        if cum > budget:
            break
        out[r["doc_id"]] = cum
    return out


@pytest.mark.parametrize("budget", [0, 500, 10_000, 10**9])
def test_budget_prefix_matches_bruteforce(spark, scored, budget):
    rows = [r.asDict() for r in scored.collect()]
    expect = _brute_prefix(rows, budget)
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in select_by_token_budget(
            scored, budget, score_col="score"
        ).collect()
    }
    assert got == expect


def test_budget_boundary_doc_included_exactly(spark, scored):
    # budget equal to some prefix sum: that doc is IN (inclusive <=)
    rows = [r.asDict() for r in scored.collect()]
    full = _brute_prefix(rows, 10**9)
    some_cum = sorted(full.values())[len(full) // 2]
    got = select_by_token_budget(scored, some_cum, score_col="score")
    assert got.agg(F.max("cum_tokens")).first()[0] == some_cum


def test_budget_partition_invariance(spark, scored):
    a = select_by_token_budget(scored, 7_000, score_col="score", partitions=2)
    b = select_by_token_budget(scored, 7_000, score_col="score", partitions=16)
    sa = sorted((r["doc_id"], r["cum_tokens"]) for r in a.collect())
    sb = sorted((r["doc_id"], r["cum_tokens"]) for r in b.collect())
    assert sa == sb and sa


def test_budget_null_tokens_count_zero(spark):
    df = spark.createDataFrame(
        [(1, 5, 1.0), (2, None, 0.9), (3, 5, 0.8)],
        "doc_id long, n_tokens long, score double",
    )
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in select_by_token_budget(df, 10).collect()
    }
    assert got == {1: 5, 2: 5, 3: 10}


def _keep(doc_id, rate):
    draw = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return draw < int(rate * 16**8)


def test_stratified_matches_md5_threshold(spark):
    docs = spark.read.parquet(DOCS).select("doc_id", "lang")
    rates = {"en": 1.0, "de": 0.5, "fr": 0.25, "zh": 0.1}
    got = {
        r["doc_id"]
        for r in sample_stratified(
            docs, rates, group_col="lang", default_rate=0.05
        ).collect()
    }
    expect = {
        r["doc_id"]
        for r in docs.collect()
        if _keep(r["doc_id"], rates.get(r["lang"], 0.05))
    }
    assert got == expect
    # default path (es has no explicit rate) must be exercised but thin
    langs = {r["lang"] for r in docs.collect()}
    assert "es" in langs


def test_stratified_deterministic_and_rate_accurate(spark):
    docs = spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"), F.lit("g").alias("lang")
    )
    s1 = sample_stratified(docs, {"g": 0.3}, group_col="lang")
    s2 = sample_stratified(docs, {"g": 0.3}, group_col="lang")
    n1, n2 = s1.count(), s2.count()
    assert n1 == n2
    assert abs(n1 / 20_000 - 0.3) < 0.02  # md5 uniformity
    # rate 1.0 keeps all, rate 0.0 keeps none
    assert sample_stratified(docs, {"g": 1.0}, group_col="lang").count() == 20_000
    assert sample_stratified(docs, {"g": 0.0}, group_col="lang").count() == 0


def test_budget_plan_has_no_global_window(spark, scored):
    plan = (
        select_by_token_budget(scored, 5_000, score_col="score")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan  # distributed scan, not a funnel
    assert "rangepartitioning" in plan, plan


# ---------------------------------------------------------------- packing


def _pack_brute(rows, L):
    """rows: [(id, tokens)] -> set of (id, seq_id, tok_start, n_tok)."""
    out = []
    s = 0
    for i, t in sorted(rows):
        if not t:
            continue
        for k in range(s // L, (s + t - 1) // L + 1):
            lo, hi = max(s, k * L), min(s + t, (k + 1) * L)
            out.append((i, k, lo - k * L, hi - lo))
        s += t
    return sorted(out)


@pytest.fixture(scope="module")
def pack_rows():
    import random

    rng = random.Random(11)
    return [(i, rng.randint(0, 900)) for i in range(1, 401)]


def test_pack_matches_bruteforce(spark, pack_rows):
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        pack_sequences,
    )

    df = spark.createDataFrame(pack_rows, "doc_id long, n_tokens long")
    got = sorted(map(tuple, pack_sequences(df, 512).collect()))
    assert got == _pack_brute(pack_rows, 512)


def test_pack_partition_invariance(spark, pack_rows):
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        pack_sequences,
    )

    df = spark.createDataFrame(pack_rows, "doc_id long, n_tokens long")
    a = sorted(map(tuple, pack_sequences(df, 256, partitions=2).collect()))
    b = sorted(
        map(tuple, pack_sequences(df.repartition(16), 256, partitions=16).collect())
    )
    assert a == b


def test_pack_sequences_are_exactly_full(spark, pack_rows):
    """Every sequence except the last must contain exactly seq_len
    tokens, and offsets within a sequence must tile it contiguously."""
    from collections import defaultdict

    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        pack_sequences,
    )

    L = 128
    df = spark.createDataFrame(pack_rows, "doc_id long, n_tokens long")
    rows = pack_sequences(df, L).collect()
    per_seq = defaultdict(list)
    for r in rows:
        per_seq[r["seq_id"]].append((r["tok_start"], r["n_tok"]))
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))  # no gaps in seq ids
    for k, spans in per_seq.items():
        spans.sort()
        total = sum(n for _, n in spans)
        assert total == L or (k == last and 0 < total <= L)
        pos = 0
        for st, n in spans:
            assert st == pos and n > 0
            pos += n


def test_pack_long_doc_spans_many_sequences(spark):
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 5000), (3, 7)], "doc_id long, n_tokens long"
    )
    got = sorted(map(tuple, pack_sequences(df, 512).collect()))
    assert got == _pack_brute([(1, 10), (2, 5000), (3, 7)], 512)
    assert len([r for r in got if r[0] == 2]) == 10  # ceil-ish span count


def test_pack_drops_zero_and_null_token_docs(spark):
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(1, 100), (2, 0), (3, None), (4, 50)], "doc_id long, n_tokens long"
    )
    got = sorted(map(tuple, pack_sequences(df, 512).collect()))
    assert got == [(1, 0, 0, 100), (4, 0, 100, 50)]


def test_pack_rejects_bad_seq_len(spark):
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        pack_sequences,
    )

    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, 0)


def test_pack_plan_has_no_global_window(spark, pack_rows):
    from large_scale_hypertextual_search_engine_spark.operators.selection import (
        pack_sequences,
    )

    df = spark.createDataFrame(pack_rows, "doc_id long, n_tokens long")
    plan = (
        pack_sequences(df, 512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert "rangepartitioning" in plan, plan
