"""Autocomplete: Spark path, batch equi-join path, driver serving path."""

import time

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.autocomplete import (
    AutocompleteServer,
    suggest,
    suggest_many,
)


@pytest.fixture(scope="module")
def lexicon(spark):
    rows = [
        ("spark", 100), ("sparse", 80), ("spat", 10), ("span", 95),
        ("sql", 70), ("scan", 60), ("join", 50), ("jolt", 5),
        ("window", 40), ("widget", 41),
    ]
    return spark.createDataFrame(rows, "term string, tf long").cache()


def test_suggest_many_matches_single(spark, lexicon):
    prefixes = spark.createDataFrame(
        [("sp",), ("j",), ("wi",), ("zzz",)], "prefix string"
    )
    batch = suggest_many(lexicon, prefixes, max_suggestions=3).collect()
    by_prefix = {}
    for r in batch:
        by_prefix.setdefault(r["prefix"], []).append((r["rank"], r["term"], r["tf"]))
    for p in ("sp", "j", "wi"):
        single = suggest(lexicon, p, max_suggestions=3).collect()
        expect = [(i + 1, r["term"], r["tf"]) for i, r in enumerate(single)]
        assert sorted(by_prefix[p]) == expect, p
    assert "zzz" not in by_prefix


def test_suggest_many_no_nested_loop_join(spark, lexicon):
    prefixes = spark.createDataFrame([("sp",), ("j",)], "prefix string")
    plan = suggest_many(lexicon, prefixes)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_server_matches_spark_path(spark, lexicon):
    srv = AutocompleteServer(lexicon)
    for p in ("sp", "spa", "j", "w", "zzz", "SPAR"):
        expect = [
            (r["term"], r["tf"]) for r in suggest(lexicon, p, max_suggestions=5).collect()
        ]
        assert srv.suggest(p, max_suggestions=5) == expect, p


def test_server_warm_latency_under_100ms(spark, lexicon):
    srv = AutocompleteServer(lexicon)
    srv.suggest("s")  # warm
    t0 = time.time()
    for _ in range(100):
        srv.suggest("sp", max_suggestions=5)
    per_call_ms = (time.time() - t0) * 1000 / 100
    assert per_call_ms < 100, per_call_ms


def test_server_tiebreak_at_topk_boundary(spark):
    """All-equal tf forces the k-th-boundary tie: the serving path must
    pick the same term set AND order as the Spark path (tf desc, term
    asc) — argpartition on tf alone chose arbitrarily (r2 advice)."""
    rows = [(t, 7) for t in ("se", "sd", "sa", "sc", "sb", "sf")] + [("sx", 9)]
    lex = spark.createDataFrame(rows, "term string, tf long")
    srv = AutocompleteServer(lex)
    expect = [
        (r["term"], r["tf"]) for r in suggest(lex, "s", max_suggestions=4).collect()
    ]
    assert expect == [("sx", 9), ("sa", 7), ("sb", 7), ("sc", 7)]
    assert srv.suggest("s", max_suggestions=4) == expect
