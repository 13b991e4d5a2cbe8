"""Latency/throughput metrics aggregation.

Spark rebuild of the reference monitor (Perfomance-monitor.hpp:59-155,
SURVEY.md A10/K8): count/avg/min/max plus exact P50/P95/P99 as one
native aggregate (the reference fully sorts its latency vector;
``percentile`` is the built-in equivalent, ``percentile_approx`` the
sketch-based scale path for billions of samples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def latency_stats(
    df: DataFrame, value_col: str = "latency_ms", exact: bool = True,
    group_by: list[str] | None = None,
) -> DataFrame:
    pct = (
        F.percentile(value_col, F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
        if exact
        else F.percentile_approx(
            value_col, F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), 10000
        )
    )
    agg = [
        F.count("*").alias("n"),
        F.avg(value_col).alias("avg"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
        pct[0].alias("p50"),
        pct[1].alias("p95"),
        pct[2].alias("p99"),
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*agg)
    return df.agg(*agg)


def indexing_throughput(n_docs: int, wall_sec: float) -> dict:
    """docs/sec — the monitor's indexing metric
    (Perfomance-monitor.hpp:147-155)."""
    return {
        "docs": n_docs,
        "wall_sec": round(wall_sec, 3),
        "docs_per_sec": round(n_docs / wall_sec, 2) if wall_sec > 0 else None,
    }
