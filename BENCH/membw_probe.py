"""Memory-bandwidth ceiling probe for the single-host scaling protocol.

The north rule's criterion is throughput scaling between two CLUSTER
sizes (N and 4N executors). This sandbox evidences it with one host at
two core counts — which confounds the engine's scaling with a substrate
effect a real cluster does not have: 4x the cores on ONE socket share
one set of memory controllers, so per-core bandwidth drops as the level
rises, while 4x the NODES would bring 4x the bandwidth with them.

This probe measures that ceiling directly: K pinned worker processes
(one per core, disjoint cpusets) each stream-sum a private array far
larger than L3 for a fixed wall window; the aggregate GB/s at K=N vs
K=4N bounds what ANY bandwidth-bound job can show in the paired rounds:

    eff_ceiling(bw) = agg_bw(4N) / (4 * agg_bw(N))

If the engine's measured paired efficiency matches this ceiling, the
residual loss is the host's memory system, not engine serialization —
the quantity the event-log analysis estimated indirectly in round 4
(salted encode task-seconds inflating 6.3x at 16 concurrent tasks,
compute-bound analyzer only 1.45x).

Each worker also reports a tiny in-L1 compute loop rate (same windows)
as a control: compute scales with cores unless frequency changes, so
the pair (bw_eff, compute_eff) separates "bandwidth wall" from
"frequency/steal wall".

Usage: python BENCH/membw_probe.py [N] [reps]   (default N=4, reps=3)
Appends one JSON line per rep to stdout; run it inside the same quiet
windows the gated scaling driver uses.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

ARRAY_MB = 256
WINDOW_S = 2.0


def _steal_cs() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _worker(core: int, kind: str, out, barrier) -> None:
    import numpy as np

    os.sched_setaffinity(0, {core})
    if kind == "bw":
        a = np.random.default_rng(core).random(ARRAY_MB * 1024 * 1024 // 8)
        barrier.wait()
        t0 = time.perf_counter()
        passes = 0
        while time.perf_counter() - t0 < WINDOW_S:
            a.sum()  # streaming read of the whole array
            passes += 1
        dt = time.perf_counter() - t0
        out.put(passes * a.nbytes / dt / 1e9)  # GB/s read
    else:  # in-cache compute control
        a = np.random.default_rng(core).random(2048)  # 16 KB, in L1
        barrier.wait()
        t0 = time.perf_counter()
        iters = 0
        while time.perf_counter() - t0 < WINDOW_S:
            for _ in range(200):
                (a * 1.0000001).sum()
            iters += 200
        dt = time.perf_counter() - t0
        out.put(iters / dt)  # kernel iterations / s


def _run_level(cores: int, kind: str) -> float:
    ctx = mp.get_context("spawn")
    out = ctx.Queue()
    barrier = ctx.Barrier(cores)
    procs = [
        ctx.Process(target=_worker, args=(c, kind, out, barrier))
        for c in range(cores)
    ]
    for p in procs:
        p.start()
    vals = [out.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(vals)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    for rep in range(reps):
        rec = {"rep": rep, "n": n, "array_mb": ARRAY_MB,
               "window_s": WINDOW_S}
        s0 = _steal_cs()
        for kind in ("bw", "compute"):
            lo = _run_level(n, kind)
            hi = _run_level(4 * n, kind)
            unit = "GBps" if kind == "bw" else "iters"
            rec[f"{kind}_agg_{unit}_n"] = round(lo, 2)
            rec[f"{kind}_agg_{unit}_4n"] = round(hi, 2)
            rec[f"{kind}_eff_ceiling"] = round(hi / (4 * lo), 3)
        rec["steal_s"] = round((_steal_cs() - s0) / 100.0, 2)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
