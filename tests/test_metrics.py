"""Metrics operators: latency stats (A10/T6), metrics sink (K8),
memory/index-size reporting (Perfomance-monitor parity)."""

import json
from pathlib import Path

import pytest

from large_scale_hypertextual_search_engine_spark.operators.metrics import (
    index_size_metrics,
    latency_stats,
    memory_metrics,
)
from large_scale_hypertextual_search_engine_spark.plans.lineage import (
    record_metrics,
)


def test_latency_stats_exact_percentiles(spark):
    vals = [(float(i),) for i in range(1, 101)]  # 1..100 ms
    df = spark.createDataFrame(vals, "latency_ms double")
    row = latency_stats(df).collect()[0]
    assert row["n"] == 100
    assert row["min"] == 1.0 and row["max"] == 100.0
    assert row["avg"] == pytest.approx(50.5)
    # exact percentiles of 1..100 (linear interpolation, reference
    # sorts the full vector: Perfomance-monitor.hpp:59-155)
    assert row["p50"] == pytest.approx(50.5)
    assert row["p95"] == pytest.approx(95.05)
    assert row["p99"] == pytest.approx(99.01)


def test_latency_stats_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "q string, latency_ms double"
    )
    rows = {r["q"]: r for r in latency_stats(df, group_by=["q"]).collect()}
    assert rows["a"]["n"] == 2 and rows["a"]["avg"] == 2.0
    assert rows["b"]["max"] == 10.0


def test_record_metrics_sink(tmp_path):
    record_metrics(str(tmp_path), "run1", [
        {"stage": "index", "key": "n_docs", "value": 10},
    ])
    record_metrics(str(tmp_path), "run2", [
        {"stage": "query", "key": "p95", "value": 1.5},
    ])
    lines = [
        json.loads(l)
        for l in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert len(lines) == 2
    assert lines[0]["run_id"] == "run1" and lines[0]["value"] == 10
    assert lines[1]["stage"] == "query"


def test_memory_and_size_metrics(spark, tmp_path):
    m = memory_metrics(spark)
    assert m["driver_peak_rss_bytes"] > 10_000_000
    assert m.get("jvm_heap_used_bytes", 1) > 0
    (tmp_path / "postings").mkdir()
    (tmp_path / "postings" / "f.parquet").write_bytes(b"x" * 100)
    s = index_size_metrics(str(tmp_path))
    assert s["postings_bytes"] == 100 and s["total_bytes"] == 100
