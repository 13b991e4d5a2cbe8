"""Does the spimi encode KERNEL itself scale 4->16 concurrent workers?

Isolates the Python/numpy/Arrow kernel from everything JVM (parquet scan,
Arrow bridge, shuffle, GC): each worker process pins to its own core,
reads one real tokens-parquet file (~1.5M rows, one spimi chunk) with
pyarrow, and runs the REAL phase-1 kernel (_spimi_encode_partition) over
its batches. If per-worker kernel time is flat from 1 to 16 concurrent
workers, the kernel scales and the stage's non-scaling lives JVM-side;
if it inflates, the kernel is cache/bandwidth-bound and the fix belongs
in the kernel (motivated the int32 fast path in encode_runs_batched).

Usage:
  python BENCH/probe_encode_concurrency.py <tokens_dir> [chunk_rows ...]
"""
import glob
import json
import os
import subprocess
import sys
import time

WORKER = r"""
import os, sys, time, json
core = int(sys.argv[1]); path = sys.argv[2]; chunk_rows = int(sys.argv[3])
os.sched_setaffinity(0, {core})
sys.path.insert(0, os.getcwd())
import pyarrow.parquet as pq
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    _spimi_encode_partition,
)

t0 = time.perf_counter()
tbl = pq.read_table(path, columns=["term", "doc_int", "positions", "doc_len"])
batches = tbl.to_batches(max_chunksize=65536)
read_s = time.perf_counter() - t0

t0 = time.perf_counter()
n_runs = 0
for rb in _spimi_encode_partition(128, chunk_rows)(iter(batches)):
    n_runs += rb.num_rows
kernel_s = time.perf_counter() - t0
print("W " + json.dumps({
    "rows": tbl.num_rows, "runs": n_runs,
    "read_s": round(read_s, 2), "kernel_s": round(kernel_s, 2),
}))
"""


def run_level(files, k, chunk_rows):
    procs = []
    t0 = time.perf_counter()
    for i in range(k):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER, str(i),
                 files[i % len(files)], str(chunk_rows)],
                stdout=subprocess.PIPE, text=True, cwd=os.getcwd(),
            )
        )
    outs = [json.loads(p.communicate()[0].strip().split("W ", 1)[1]) for p in procs]
    wall = time.perf_counter() - t0
    mean = lambda key: round(sum(o[key] for o in outs) / len(outs), 2)
    return {
        "workers": k, "chunk_rows": chunk_rows, "wall_s": round(wall, 2),
        "mean_read_s": mean("read_s"), "mean_kernel_s": mean("kernel_s"),
        "runs": outs[0]["runs"],
    }


if __name__ == "__main__":
    tokens_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_16_idx/tokens"
    chunk_sizes = [int(a) for a in sys.argv[2:]] or [4_000_000]
    files = sorted(glob.glob(f"{tokens_dir}/*.parquet"))
    for f in files[:16]:
        open(f, "rb").read()  # warm page cache uniformly
    for cr in chunk_sizes:
        for k in (1, 4, 16):
            print(json.dumps(run_level(files, k, cr)), flush=True)
