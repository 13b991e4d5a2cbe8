"""Weather-gated driver for the paired scaling protocol.

Round 5's host exhibits sustained hypervisor steal (observed 0.5-0.9
steal-seconds per wall-second for hours at a stretch), which
contaminates the north-rule measurement in a way the in-round
burn-symmetry gate cannot repair: raw efficiency is structurally
biased DOWN under steal because the 4N level exposes 4x the CPUs to
it (see bench_scaling.py's steal-adjusted note). The r4 clean windows
had TOTAL recorded steal of 0.2-3.2 s per level; the first three r5
paired rounds recorded 73-687 s.

So instead of burning rounds into bad weather, this driver polls
/proc/stat steal cheaply (no Spark, one thread, ~0 load) and launches
ONE paired round (bench_scaling.py SCALING_PAIRED=1 SCALING_ROUNDS=1)
only when a probe window shows a quiet host. After each attempted
round it inspects the recorded per-level steal and stops on the first
round that is both steal-quiet (< STEAL_CLEAN_S per level) and
burn-symmetric; otherwise it keeps waiting/probing until DEADLINE_S.

Usage:  python BENCH/run_scaling_when_quiet.py >> BENCH/scaling_r05_gated.log
Env:    QUIET_PROBE_S (60), QUIET_MAX_STEAL_S (2.0), STEAL_CLEAN_S (8.0),
        DEADLINE_S (14400), SCALING_* passed through to bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PROBE_S = float(os.environ.get("QUIET_PROBE_S", "60"))
QUIET_MAX_STEAL_S = float(os.environ.get("QUIET_MAX_STEAL_S", "2.0"))
STEAL_CLEAN_S = float(os.environ.get("STEAL_CLEAN_S", "8.0"))
DEADLINE_S = float(os.environ.get("DEADLINE_S", "14400"))
RETRY_SLEEP_S = float(os.environ.get("RETRY_SLEEP_S", "180"))


def _steal_cs() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _probe(seconds: float) -> float:
    s0, t0 = _steal_cs(), time.time()
    time.sleep(seconds)
    return (_steal_cs() - s0) / 100.0


def main() -> None:
    t_start = time.time()
    env = dict(os.environ)
    env.setdefault("SCALING_PAIRED", "1")
    env.setdefault("SCALING_ROUNDS", "1")
    env.setdefault("SCALING_DOCS", "300000")
    attempt = 0
    while time.time() - t_start < DEADLINE_S:
        steal = _probe(PROBE_S)
        print(json.dumps({"probe_steal_s": round(steal, 2),
                          "window_s": PROBE_S,
                          "t": round(time.time() - t_start, 0)}),
              flush=True)
        if steal > QUIET_MAX_STEAL_S:
            time.sleep(RETRY_SLEEP_S)
            continue
        if os.path.exists("/tmp/lshse_busy"):
            # repo-side workloads (pytest, bench) hold this lock so a
            # measured round never shares the box with our own jobs
            print(json.dumps({"skipped": "busy lock"}), flush=True)
            time.sleep(RETRY_SLEEP_S)
            continue
        attempt += 1
        print(json.dumps({"launching_round": attempt}), flush=True)
        out = subprocess.run(
            [sys.executable, "bench_scaling.py"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, capture_output=True, text=True,
        )
        sys.stdout.write(out.stdout)
        sys.stdout.flush()
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            time.sleep(RETRY_SLEEP_S)
            continue
        # last per-round record printed by paired mode is a JSON line
        rec = None
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith('{"n":'):
                rec = json.loads(line)
        if rec is None:
            continue
        steals = (rec["n"].get("steal_sec", 1e9),
                  rec["4n"].get("steal_sec", 1e9))
        clean = (max(steals) < STEAL_CLEAN_S) and rec["steal_symmetric"]
        print(json.dumps({"round_clean": clean,
                          "steals": steals,
                          "eff": rec["eff"]}), flush=True)
        if clean:
            print(json.dumps({"stopping": "clean round recorded"}),
                  flush=True)
            return
    print(json.dumps({"stopping": "deadline"}), flush=True)


if __name__ == "__main__":
    main()
