"""Collect per-round JSON lines from a bench_scaling paired-mode log
into BENCH/scaling_rounds_r{N}.json (the runner also prints a final
summary, but this works on partial logs if the run is cut short)."""
import json
import sys

src, dst = sys.argv[1], sys.argv[2]
rounds = []
for line in open(src):
    line = line.strip()
    if line.startswith('{"n": {'):
        rounds.append(json.loads(line))
sym = [r for r in rounds if r.get("steal_symmetric")]


def best(rs):
    if not rs:
        return None
    keys = rs[0]["eff"].keys()
    return {k: max(r["eff"].get(k, 0) for r in rs) for k in keys}


out = {
    "rounds": rounds,
    "n_rounds": len(rounds),
    "n_symmetric": len(sym),
    "best_paired_eff": best(rounds),
    "best_symmetric_eff": best(sym),
}
json.dump(out, open(dst, "w"), indent=2)
print(json.dumps({k: out[k] for k in ("n_rounds", "n_symmetric", "best_paired_eff", "best_symmetric_eff")}))
