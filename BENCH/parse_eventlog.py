"""Sum task metrics from Spark JSON event logs.

Usage: python BENCH/parse_eventlog.py /tmp/evlog/*

For each application log, prints total executorRunTime, executorCpuTime,
jvmGcTime, shuffle bytes, task count, and per-stage breakdown — the
inputs for the steal-free CPU-work accounting in BENCH/BASELINE.md
(does the 16-core level do MORE work, or the same work slower?).
"""
import json
import sys
from collections import defaultdict


def parse(path):
    tot = defaultdict(float)
    stages = defaultdict(lambda: defaultdict(float))
    app = ""
    for line in open(path, errors="replace"):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app = ev.get("App Name", "")
        elif e == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            sid = ev.get("Stage ID")
            row = {
                "run_ms": m.get("Executor Run Time", 0),
                "cpu_ms": m.get("Executor CPU Time", 0) / 1e6,  # ns -> ms
                "gc_ms": m.get("JVM GC Time", 0),
                "deser_ms": m.get("Executor Deserialize Time", 0),
                "shuf_write_b": (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                ),
                "shuf_read_b": (
                    (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
                    + (m.get("Shuffle Read Metrics") or {}).get(
                        "Remote Bytes Read", 0
                    )
                ),
                "tasks": 1,
            }
            for k, v in row.items():
                tot[k] += v
                stages[sid][k] += v
    return app, tot, stages


def fmt(t):
    return (
        f"run {t['run_ms']/1000:8.1f}s  cpu {t['cpu_ms']/1000:8.1f}s  "
        f"gc {t['gc_ms']/1000:7.1f}s  deser {t['deser_ms']/1000:6.1f}s  "
        f"shufW {t['shuf_write_b']/2**20:8.1f}MiB  "
        f"shufR {t['shuf_read_b']/2**20:8.1f}MiB  tasks {int(t['tasks']):5d}"
    )


if __name__ == "__main__":
    for path in sys.argv[1:]:
        app, tot, stages = parse(path)
        print(f"== {app} ({path})")
        print("   TOTAL " + fmt(tot))
        for sid in sorted(stages, key=lambda s: -stages[s]["run_ms"])[:12]:
            print(f"   stage {sid:4d} " + fmt(stages[sid]))
