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


def memory_metrics(spark=None) -> dict:
    """Current/peak RSS of the driver plus JVM heap usage — the engine
    analog of Perfomance-monitor.hpp:40-54,110-113 (get_memory_usage /
    peak tracking). RSS via stdlib resource (no psutil dependency);
    ru_maxrss is KiB on Linux."""
    import resource

    ru = resource.getrusage(resource.RUSAGE_SELF)
    out = {
        "driver_peak_rss_bytes": int(ru.ru_maxrss) * 1024,
    }
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    out["driver_rss_bytes"] = int(line.split()[1]) * 1024
                    break
    except OSError:
        pass
    if spark is not None:
        try:
            rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
            out["jvm_heap_used_bytes"] = int(rt.totalMemory() - rt.freeMemory())
            out["jvm_heap_max_bytes"] = int(rt.maxMemory())
        except Exception:
            pass
    return out


def index_size_metrics(index_dir: str) -> dict:
    """On-disk size per index table (Perfomance-monitor's index-size
    report): bytes and file counts under each stage directory."""
    from pathlib import Path

    base = Path(index_dir)
    out: dict = {"total_bytes": 0}
    for sub in sorted(p for p in base.iterdir() if p.is_dir()):
        nbytes = sum(f.stat().st_size for f in sub.rglob("*") if f.is_file())
        out[f"{sub.name}_bytes"] = nbytes
        out["total_bytes"] += nbytes
    return out


def missing_term_count(tokens, lexicon) -> int:
    """F5 (indexer4.cpp:413-419): tokens whose term is absent from the
    lexicon during the forward-index remap. The reference logs
    '[MISSING_TERM]' per occurrence; at scale that is a metric, not a
    log line — one anti-join count, zero rows shipped to the driver."""
    return (
        tokens.select("term")
        .join(lexicon.select("term"), "term", "left_anti")
        .count()
    )
