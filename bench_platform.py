"""Platform scaling controls for BENCH/BASELINE.md.

The north-rule evidence compares the ENGINE's 4-vs-16-core efficiency
against what this host can physically deliver for each kind of work.
Two controls, both affinity-pinned like bench_scaling.py:

* ``python_burn``  — pure-Python/numpy compute in N processes (no JVM,
  no shuffle): the CPU ceiling. Measured ~0.95 at 4->16.
* ``jvm_shuffle`` — a pure Spark groupBy/agg over generated rows (no
  Python anywhere): the JVM shuffle/aggregation ceiling. Measured
  ~0.3-0.5 at 4->16 on this VM — memory-bandwidth/GC bound, NOT a
  property of any query plan. Any shuffle-bound workload inherits it.

Prints one JSON object with both controls' throughput and efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_BURN = """
import json, os, sys, time
import numpy as np
from multiprocessing import Process, Queue
cores = int(sys.argv[1])
os.sched_setaffinity(0, set(range(cores)))

def work(q):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 30, size=200_000).astype(np.uint64)
    t0 = time.time(); n = 0
    while time.time() - t0 < 6.0:
        h = a
        for _ in range(8):
            h = (h * np.uint64(0x9E3779B97F4A7C15)) ^ (h >> np.uint64(29))
        n += 1
    q.put(n)

q = Queue()
ps = [Process(target=work, args=(q,)) for _ in range(cores)]
[p.start() for p in ps]
total = sum(q.get() for _ in ps)
[p.join() for p in ps]
print("RESULT", json.dumps({"cores": cores, "iters_per_sec": round(total / 6.0, 1)}))
"""

_JVM = """
import json, os, sys, time
cores = int(sys.argv[1])
os.sched_setaffinity(0, set(range(cores)))
sys.path.insert(0, os.getcwd())
from pyspark.sql import functions as F
from large_scale_hypertextual_search_engine_spark.session import get_spark
spark = get_spark(app_name=f"jvmctl{cores}", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).groupBy((F.col("id") % 1000).alias("k")).count().count()
best = 1e18
for _ in range(3):
    t0 = time.time()
    spark.range(120_000_000).select(
        (F.col("id") % 3_000_000).alias("k"), (F.col("id") * 7).alias("v")
    ).groupBy("k").agg(F.sum("v"), F.count("*")).count()
    best = min(best, time.time() - t0)
spark.stop()
print("RESULT", json.dumps(
    {"cores": cores, "rows_per_sec": round(120_000_000 / best, 1),
     "sec": round(best, 2)}))
"""


def _run(code: str, cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-1000:] + out.stderr[-1000:])


def _best(code: str, cores: int, key: str, reps: int) -> dict:
    """Best-of-reps per level — the same peak-throughput estimator as
    bench_scaling.py (hypervisor steal bursts make single samples a
    dice roll; measured: the identical burn binary scores 347-426
    iters/s at 4 cores run-to-run)."""
    runs = [_run(code, cores) for _ in range(reps)]
    best = max(runs, key=lambda r: r[key])
    best["reps"] = [r[key] for r in runs]
    return best


def main() -> None:
    n = int(os.environ.get("SCALING_N", "4"))
    reps = int(os.environ.get("SCALING_REPS", "3"))
    burn_n = _best(_BURN, n, "iters_per_sec", reps)
    burn_4n = _best(_BURN, 4 * n, "iters_per_sec", reps)
    jvm_n = _best(_JVM, n, "rows_per_sec", reps)
    jvm_4n = _best(_JVM, 4 * n, "rows_per_sec", reps)
    print(json.dumps({
        "python_burn": {
            "n": burn_n, "4n": burn_4n,
            "efficiency": round(
                burn_4n["iters_per_sec"] / (4 * burn_n["iters_per_sec"]), 3
            ),
        },
        "jvm_shuffle": {
            "n": jvm_n, "4n": jvm_4n,
            "efficiency": round(
                jvm_4n["rows_per_sec"] / (4 * jvm_n["rows_per_sec"]), 3
            ),
        },
    }, indent=2))


if __name__ == "__main__":
    main()
