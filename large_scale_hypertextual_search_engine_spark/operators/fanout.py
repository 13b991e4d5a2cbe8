"""Input fan-out for compute-heavy narrow stages.

A small parquet input scans as very few splits (128 MB split size), so
a narrow stage downstream — a Python kernel or a heavy codegen
expression like per-gram hashing — runs on fewer tasks than cores
(guide §2.5 "input skew": fix at the source or repartition after the
read). ``fan_out`` repartitions UP to the session default parallelism
only when the input has fewer partitions; at scale, where scans
already produce more partitions than cores, it is a no-op and costs
nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to ``defaultParallelism`` iff the
    input has fewer partitions; identity otherwise."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
