"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the configs below are the ones that
matter identically on a real cluster: AQE (runtime re-planning + skew-join
splitting), Arrow for every pandas UDF boundary, and a shuffle-partition
count sized to the parallelism level instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lshse-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores defaults to $SPARK_GRAFT_CPUS (driver contract) else all cores.
    shuffle_partitions defaults to 2x cores — on a real cluster this would
    be ~2-3x total executor cores; AQE coalesces small partitions anyway.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # an undersized heap burns whole cores on GC at high parallelism
        # (measured: 8g heap at local[16] spent ~200 CPU-s of a 60k-doc
        # build in GC; 24g spent ~0). On a cluster this is executor
        # memory sizing; locally default to 24g (the box has 128 GiB).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # dump a Python traceback when a worker dies mid-task (segfault /
        # oom-kill); free in normal operation, and turns an opaque
        # "Python worker exited unexpectedly (EOFException)" into a
        # diagnosable fault (one such crash ate a measured scaling level)
        .config("spark.python.worker.faulthandler.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
